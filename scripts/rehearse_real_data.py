"""Real-dataset rehearsal: prove the WHOLE pipeline on a COMPAS/PASs download.

The reference trains on COMPAS-1x / PASs CSV+xyz trees
(reference data/aromatic_dataloader.py:253-271) that neither repo
distributes. The loader's format compatibility is unit-proven against
committed 20-row fixtures (tests/fixtures/refformat/); this script is the
missing end-to-end leg: point the two flags at a real download and it

  1. validates the file format (columns, xyz parse, row<->file pairing),
  2. builds the preprocessing cache and dense batches,
  3. runs the oracle self-check over ground truth (stability + validity
     fractions should be near the paper's Table-1 numbers for real data),
  4. runs --steps jitted train steps of the production EDM config,
  5. samples --eval-samples molecules and pushes them through the full
     evaluator stack.

Usage (real data):
    python scripts/rehearse_real_data.py \
        --csv-file /data/COMPAS-1x.csv --xyz-root /data/pbh-xyz --dataset cata

Exit code 0 = every stage ran; the printed fractions are the judgment call
(ground truth far from 1.0 means a mismatched dataset/--dataset flag).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--csv-file", required=True)
    p.add_argument("--xyz-root", required=True)
    p.add_argument("--dataset", default="cata", choices=["cata", "peri", "hetro"])
    p.add_argument("--max-nodes", type=int, default=0,
                   help="0 = reference default (11; 10 for hetro)")
    p.add_argument("--target-features", default="GAP_eV,HOMO_eV")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--eval-samples", type=int, default=64)
    p.add_argument("--oracle-molecules", type=int, default=100,
                   help="ground-truth molecules for the oracle self-check")
    p.add_argument("--nf", type=int, default=192)
    p.add_argument("--n-layers", type=int, default=9)
    p.add_argument("--diffusion-steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--platform", default="")
    p.add_argument("--work-dir", default="runs/rehearse")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from gaudi_tpu.cli.common import setup_platform

    setup_platform(args.platform)

    import jax
    import numpy as np
    import pandas as pd

    report = {}

    # ---- stage 1: format validation -------------------------------------
    print("[1/5] validating format ...", flush=True)
    df = pd.read_csv(args.csv_file)
    name_col = "name" if "name" in df.columns else "molecule"
    if name_col not in df.columns:
        raise SystemExit("csv has neither 'name' (reference schema) nor "
                         "'molecule' column")
    missing_targets = [
        t for t in args.target_features.split(",") if t and t not in df.columns
    ]
    if missing_targets and args.dataset != "hetro":
        raise SystemExit(f"csv lacks target columns {missing_targets}; "
                         f"available: {sorted(df.columns)[:20]} ...")
    from gaudi_tpu.data.mol import load_xyz

    probe = df[name_col].astype(str).head(5)
    n_found = 0
    for nm in probe:
        path = os.path.join(args.xyz_root, nm + ".xyz")
        if os.path.exists(path):
            mol = load_xyz(path)
            assert len(mol.elements) > 0, f"empty xyz {path}"
            n_found += 1
    if n_found == 0:
        raise SystemExit(f"none of the first 5 csv rows have a .xyz under "
                         f"{args.xyz_root} — wrong --xyz-root?")
    report["format"] = f"{len(df)} rows, {n_found}/5 probe xyz parsed"
    print(f"      {report['format']}", flush=True)

    # ---- stage 2: cache + dense batches ---------------------------------
    print("[2/5] building preprocessing cache + dense batches ...", flush=True)
    from gaudi_tpu.config import EDMConfig

    max_nodes = args.max_nodes or (10 if args.dataset == "hetro" else 11)
    cfg = EDMConfig(
        dataset=args.dataset, csv_file=args.csv_file, xyz_root=args.xyz_root,
        max_nodes=max_nodes, target_features=args.target_features,
        nf=args.nf, n_layers=args.n_layers,
        diffusion_steps=args.diffusion_steps, batch_size=args.batch_size,
        save_dir=args.work_dir, name=f"rehearse-{args.dataset}",
    )
    t0 = time.time()
    from gaudi_tpu.data import create_datasets

    train, val, test = create_datasets(cfg.data_config())
    batch = next(train.iter_batches(min(args.batch_size, len(train)),
                                    rng=np.random.default_rng(0)))
    report["cache"] = (f"train/val/test = {len(train)}/{len(val)}/{len(test)}"
                       f" in {time.time()-t0:.0f}s; batch x{batch['x'].shape}")
    print(f"      {report['cache']}", flush=True)

    # ---- stage 3: oracle self-check -------------------------------------
    print("[3/5] oracle self-check over ground truth ...", flush=True)
    from gaudi_tpu.eval_chem import (
        analyze_chemical_validity_for_molecules,
        analyze_validity_for_molecules,
    )

    from gaudi_tpu.sampling import to_molecule_list

    n_or = min(args.oracle_molecules, len(train))
    gt = train.collate(np.arange(n_or), rng=np.random.default_rng(0))
    mols = to_molecule_list(
        gt["x"], gt["h"], gt["node_mask"],
        orientation=args.dataset == "hetro", max_nodes=max_nodes,
    )
    sd, _ = analyze_validity_for_molecules(mols, dataset=args.dataset)
    cd = analyze_chemical_validity_for_molecules(mols, dataset=args.dataset)
    report["oracle"] = (f"n={n_or}: mol_stable {sd['mol_stable']:.3f}, "
                        f"mol_valid {cd['mol_valid']:.3f}")
    print(f"      {report['oracle']}", flush=True)

    # ---- stage 4: train steps -------------------------------------------
    print(f"[4/5] {args.steps} jitted train steps ...", flush=True)
    from gaudi_tpu.train.trainer_edm import EDMTrainer

    trainer = EDMTrainer(cfg, datasets=(train, val, test))
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    losses, steps_done = [], 0
    t0 = time.time()
    while steps_done < args.steps:
        key, k = jax.random.split(key)
        m = trainer.train_epoch(0, rng, k)
        steps_done = int(trainer.state.step)
        losses.append(m["loss"])
    report["train"] = (f"{steps_done} steps in {time.time()-t0:.0f}s; "
                       f"loss {losses[0]:.4f} -> {losses[-1]:.4f}")
    print(f"      {report['train']}", flush=True)

    # ---- stage 5: sample + evaluate -------------------------------------
    print(f"[5/5] sampling {args.eval_samples} molecules + full eval ...",
          flush=True)
    from gaudi_tpu.sampling import Sampler, to_molecule_list

    sampler = Sampler(trainer.edm, cfg.max_nodes, args.dataset == "hetro",
                      dataset=args.dataset)
    counts = trainer.nodes_dist.sample(args.eval_samples, rng)
    x, h, nm, _ = sampler.sample(
        trainer.sampling_params, jax.random.PRNGKey(1), counts, std=0.7,
    )
    jax.block_until_ready(x)
    smols = to_molecule_list(x, h, nm, orientation=args.dataset == "hetro",
                             max_nodes=cfg.max_nodes)
    sd, _ = analyze_validity_for_molecules(smols, dataset=args.dataset)
    cd = analyze_chemical_validity_for_molecules(smols, dataset=args.dataset)
    report["sample_eval"] = (f"n={len(smols)}: mol_stable {sd['mol_stable']:.3f}, "
                             f"mol_valid {cd['mol_valid']:.3f} "
                             f"(an un-trained model scores ~0 here; the point "
                             f"is the full loop ran)")
    print(f"      {report['sample_eval']}", flush=True)

    print("\nREHEARSAL PASSED — all five stages ran on this dataset.")
    for k, v in report.items():
        print(f"  {k:12s} {v}")
    return report


if __name__ == "__main__":
    main()
