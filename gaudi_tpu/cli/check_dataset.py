"""Oracle self-check: run the evaluators over ground-truth data.

The reference's de-facto regression tests are scripts that pipe the
*training set* through its own checkers and expect ~100% pass rates:
`analyze/analyze.py` main_check_stability (:103-136) for geometric
stability, and `data/gor2goa.py` __main__ (:327-367) for the ring->atom
round-trip + chemical validity. This CLI is both of those at once:

    python -m gaudi_tpu.cli.check_dataset --dataset cata --synthetic 500

Prints the stability and validity fractions over real molecules; anything
far from 1.0 means a checker (or the data pipeline) regressed.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from gaudi_tpu.cli.common import add_data_args, resolve_data, setup_platform


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    add_data_args(p)
    p.add_argument("--max-molecules", type=int, default=0, help="0 = all")
    p.add_argument("--target-features", default="GAP_eV")
    p.add_argument("--max-nodes", type=int, default=0, help="0 = dataset default")
    p.add_argument("--tol", type=float, default=0.1)
    p.add_argument("--eval-workers", type=int, default=8)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_platform(args.platform)

    from gaudi_tpu.data.dataset import DatasetConfig, create_datasets
    from gaudi_tpu.eval_chem import (
        analyze_chemical_validity_for_molecules,
        analyze_validity_for_molecules,
    )

    csv_file, xyz_root = resolve_data(args)
    max_nodes = args.max_nodes or (10 if args.dataset == "hetro" else 11)
    cfg = DatasetConfig(
        dataset=args.dataset,
        csv_file=csv_file,
        xyz_root=xyz_root,
        max_nodes=max_nodes,
        target_features=args.target_features,
    )
    train, _, _ = create_datasets(cfg)

    orientation = args.dataset == "hetro"
    mols = []
    for b in train.iter_batches(256, shuffle=False):
        for i in np.nonzero(b["weight"] > 0)[0]:
            x, h = b["x"][i], b["h"][i]
            if orientation:
                alive = np.abs(h[:max_nodes]).sum(-1) > 0
                xi = np.concatenate([x[:max_nodes][alive], x[max_nodes:][alive]])
                ti = np.concatenate(
                    [h[:max_nodes][alive].argmax(-1), h[max_nodes:][alive].argmax(-1)]
                )
            else:
                nn = b["n_nodes"][i]
                xi, ti = x[:nn], h[:nn].argmax(-1)
            mols.append((xi, ti))
        if args.max_molecules and len(mols) >= args.max_molecules:
            mols = mols[: args.max_molecules]
            break

    t0 = time.time()
    vd, _ = analyze_validity_for_molecules(mols, tol=args.tol, dataset=args.dataset)
    cd = analyze_chemical_validity_for_molecules(
        mols, tol=args.tol, dataset=args.dataset, n_workers=args.eval_workers
    )
    out = {
        "n_molecules": len(mols),
        "mol_stable": round(vd["mol_stable"], 4),
        "dist_stable": round(vd["dist_stable"], 4),
        "connected": round(vd["connected"], 4),
        "mol_valid": round(cd["mol_valid"], 4),
        "mol_unique": round(cd["mol_unique"], 4),
        "eval_seconds": round(time.time() - t0, 2),
    }
    print(json.dumps(out))
    ok = vd["mol_stable"] > 0.95 and cd["mol_valid"] > 0.95
    print("CHECK " + ("PASSED" if ok else "FAILED (expected ~1.0 on ground truth)"))
    return out


if __name__ == "__main__":
    main()
