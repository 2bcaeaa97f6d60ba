"""Uniqueness ceiling of the DATA itself at a given sample size.

Round-2 left an open question (VERDICT r2 weak #5): cata uniqueness drops
to ~0.69 at 1,024 generated samples — finite-space coverage or mode
collapse? This probe separates the two by measuring the same metric on the
ground truth: draw n molecules FROM THE TRAINING SET with the sampler's own
node-count prior (bootstrap with replacement, like generation implicitly
does when it re-draws coverage of a finite space), judge uniqueness with
the identical chemical-identity function used for generated molecules.

If train-data uniqueness at n=1024 is ~= generated uniqueness, the drop is
a property of the finite molecule space under the node-count prior, not of
the model.

Run: python scripts/uniqueness_baseline.py --root runs/r4 --dataset cata --n 1024
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="runs/r4")
    ap.add_argument("--dataset", default="cata")
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--max-nodes", type=int, default=0, help="0 = auto")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from gaudi_tpu.data import DatasetConfig, NodesDistribution, create_datasets

    max_nodes = args.max_nodes or (10 if args.dataset == "hetro" else 11)
    cfg = DatasetConfig(
        dataset=args.dataset,
        csv_file=os.path.join(args.root, f"{args.dataset}.csv"),
        xyz_root=os.path.join(args.root, f"{args.dataset}-xyz"),
        max_nodes=max_nodes,
        target_features="",
    )
    train, _, _ = create_datasets(cfg)
    nodes_dist = NodesDistribution.from_dataset(train)

    # identity of every training molecule (disk-cached; same identity
    # function the generated-molecule uniqueness metric uses), grouped by
    # ring count so draws can follow the node-count prior like the sampler
    ids = np.asarray(train.chem_identities(8), object)
    n_nodes = np.asarray(train.data["n_nodes"])
    ok = np.array([bool(i) for i in ids])
    by_count = {
        int(c): np.where((n_nodes == c) & ok)[0]
        for c in np.unique(n_nodes)
    }

    out = {"dataset": args.dataset, "n": args.n, "train_size": len(train)}
    fracs = []
    for s in range(args.seeds):
        rng = np.random.default_rng(s)
        counts = nodes_dist.sample(args.n, rng)
        picks = []
        for c in counts:
            pool = by_count.get(int(c))
            if pool is None or len(pool) == 0:
                continue
            picks.append(int(pool[rng.integers(len(pool))]))
        uniq = len(set(ids[picks])) / max(len(picks), 1)
        fracs.append(uniq)
    out["unique_fracs"] = [round(f, 4) for f in fracs]
    out["unique_mean"] = round(float(np.mean(fracs)), 4)
    # and the no-prior ceiling: distinct identities in the whole train set
    valid_ids = ids[ok]
    out["train_distinct_frac"] = round(
        len(set(valid_ids)) / max(len(valid_ids), 1), 4
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
