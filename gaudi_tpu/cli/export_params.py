"""Export a trained experiment to a portable, committable artifact dir.

    python -m gaudi_tpu.cli.export_params \
        --exp-dir runs/r4/summary/longrun-edm --out artifacts/cata-edm

Writes <out>/args.json (restore cleared — the loader finds weights.npz by
convention) and <out>/weights.npz (live + EMA params, step, metadata).
The artifact dir then works anywhere an experiment dir does:

    python -m gaudi_tpu.cli.eval_validity --exp-dir artifacts/cata-edm ...

Rationale: orbax full-state checkpoints live under the gitignored runs/
tree and die with the VM; artifacts persist the judge-relevant weights in
git. The reference's equivalent is committing model.pt (train_edm.py:180).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--predictor", action="store_true",
                    help="exp-dir holds a predictor, not an EDM")
    ap.add_argument("--note", default="")
    args = ap.parse_args(argv)

    from gaudi_tpu.cli.common import setup_platform

    setup_platform("cpu")  # restore + export is host work; keep the chip free

    if args.predictor:
        from gaudi_tpu.cli.common import load_predictor_from_dir as load
    else:
        from gaudi_tpu.cli.common import load_edm_from_dir as load
    cfg, trainer = load(args.exp_dir)

    from gaudi_tpu.data import NodesDistribution, PropertyDistribution
    from gaudi_tpu.utils.artifacts import collect_dataset_stats, save_params_npz

    os.makedirs(args.out, exist_ok=True)
    d = dataclasses.asdict(dataclasses.replace(cfg, restore=None))
    with open(os.path.join(args.out, "args.json"), "w") as f:
        json.dump(d, f, indent=2)

    # Record the train-split statistics the weights were trained with, so
    # the artifact is self-contained: restoring it never recomputes
    # normalization/priors from a CSV that may be gone or regenerated
    # differently (round-2 ADVICE.md medium finding).
    train_ds = trainer.train_ds
    nodes_dist = getattr(trainer, "nodes_dist", None) or (
        NodesDistribution.from_dataset(train_ds)
    )
    prop_dist = getattr(trainer, "prop_dist", None)
    if prop_dist is None and train_ds.cfg.targets:
        prop_dist = PropertyDistribution(train_ds)
    stats = collect_dataset_stats(train_ds, nodes_dist, prop_dist)

    st = trainer.state
    path = save_params_npz(
        os.path.join(args.out, "weights.npz"),
        st.params,
        ema_params=st.ema_params,
        step=int(st.step),
        meta={"source": args.exp_dir, "note": args.note},
        stats=stats,
    )
    size_mb = os.path.getsize(path) / 1e6
    print(f"exported step={int(st.step)} -> {path} ({size_mb:.1f} MB)")


if __name__ == "__main__":
    main()
