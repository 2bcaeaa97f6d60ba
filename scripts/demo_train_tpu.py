"""End-to-end TPU demonstration: train EDM + predictor on synthetic cata
data, evaluate sample quality, run guided design. Produces artifacts under
runs/demo/ and prints a summary JSON.

Run: python scripts/demo_train_tpu.py [--epochs N] [--molecules M]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--pred-epochs", type=int, default=150)
    ap.add_argument("--molecules", type=int, default=4000)
    ap.add_argument("--root", default="runs/demo")
    ap.add_argument("--n-samples", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--diffusion-steps", type=int, default=1000)
    ap.add_argument("--nf", type=int, default=192)
    ap.add_argument("--n-layers", type=int, default=9)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from gaudi_tpu.cli.eval_validity import sample_molecules
    from gaudi_tpu.config import EDMConfig, PredictorConfig
    from gaudi_tpu.data.synthetic import generate_dataset
    from gaudi_tpu.eval_chem import (
        analyze_chemical_validity_for_molecules,
        analyze_validity_for_molecules,
    )
    from gaudi_tpu.train.trainer_edm import EDMTrainer
    from gaudi_tpu.train.trainer_predictor import PredictorTrainer

    os.makedirs(args.root, exist_ok=True)
    csv = os.path.join(args.root, "cata.csv")
    if not os.path.exists(csv):
        print("generating synthetic dataset...", flush=True)
        generate_dataset(args.root, "cata", n_molecules=args.molecules, seed=0)

    cfg = EDMConfig(
        dataset="cata",
        csv_file=csv,
        xyz_root=os.path.join(args.root, "cata-xyz"),
        max_nodes=11,
        target_features="GAP_eV,HOMO_eV",
        name="demo-edm",
        save_dir=os.path.join(args.root, "summary"),
        num_epochs=args.epochs,
        batch_size=args.batch_size,
        nf=args.nf,
        n_layers=args.n_layers,
        diffusion_steps=args.diffusion_steps,
        dtype=args.dtype,
    )
    t0 = time.time()
    trainer = EDMTrainer(cfg)
    print(f"train set: {len(trainer.train_ds)} molecules", flush=True)
    fit = trainer.fit(args.epochs, sample_every=0)
    train_secs = time.time() - t0
    print(f"EDM trained in {train_secs:.0f}s: {fit}", flush=True)

    # sample + evaluate
    t0 = time.time()
    mols, samp_secs = sample_molecules(
        trainer, args.n_samples, args.n_samples, std=0.7, seed=1
    )
    vd, _ = analyze_validity_for_molecules(mols, dataset="cata")
    cd = analyze_chemical_validity_for_molecules(mols, dataset="cata", n_workers=8)
    print(
        json.dumps(
            {
                "mol_stable": vd["mol_stable"],
                "dist_stable": vd["dist_stable"],
                "connected": vd["connected"],
                "angels3": vd["angels3"],
                "mol_valid": cd["mol_valid"],
                "mol_unique": cd["mol_unique"],
                "sampling_secs": samp_secs,
                "train_secs": train_secs,
            }
        ),
        flush=True,
    )

    # predictor
    pcfg = PredictorConfig(
        dataset="cata",
        csv_file=csv,
        xyz_root=os.path.join(args.root, "cata-xyz"),
        max_nodes=11,
        target_features="GAP_eV,HOMO_eV",
        name="demo-pred",
        save_dir=os.path.join(args.root, "psummary"),
        num_epochs=args.pred_epochs,
        batch_size=args.batch_size,
        dtype=args.dtype,
    )
    t0 = time.time()
    ptrainer = PredictorTrainer(
        pcfg, edm_cfg=EDMConfig(diffusion_steps=args.diffusion_steps)
    )
    pfit = ptrainer.fit(args.pred_epochs)
    print(
        f"predictor trained in {time.time()-t0:.0f}s: "
        f"best_val={pfit['best_val']:.4f} test={pfit['test_loss']:.4f}",
        flush=True,
    )
    print("sweep:", {k: round(v, 4) for k, v in pfit["test_sweep"].items()}, flush=True)
    print("DEMO DONE", flush=True)


if __name__ == "__main__":
    main()
