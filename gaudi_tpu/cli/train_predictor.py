"""Train the time-conditioned property predictor.

Usage:
    python -m gaudi_tpu.cli.train_predictor --dataset cata --synthetic 2000 \
        --name my-predictor --epochs 100 \
        --target-features GAP_eV,HOMO_eV

Reference counterpart: cond_prediction/train_cond_predictor.py.
"""

from __future__ import annotations

import argparse

from gaudi_tpu.cli.common import add_data_args, resolve_data, setup_platform


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    add_data_args(p)
    p.add_argument("--name", default="cond-predictor")
    p.add_argument("--save-dir", default="prediction_summary")
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=6e-4)
    p.add_argument("--n-layers", type=int, default=12)
    p.add_argument("--nf", type=int, default=196)
    p.add_argument("--diffusion-steps", type=int, default=1000)
    p.add_argument(
        "--target-features", default="LUMO_eV,GAP_eV,Erel_eV,aIP_eV,aEA_eV"
    )
    p.add_argument("--max-nodes", type=int, default=11)
    p.add_argument("--restore", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dp", action="store_true")
    p.add_argument("--loss", default="l1", choices=["l1", "bce"],
                   help="l1 = reference regression; bce = binary "
                        "classification head (validity classifiers)")
    p.add_argument("--dtype", default="float32",
                   help="network compute dtype (bfloat16 for TPU production)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    jax = setup_platform(args.platform)
    csv_file, xyz_root = resolve_data(args)

    from gaudi_tpu.config import EDMConfig, PredictorConfig
    from gaudi_tpu.train.trainer_predictor import PredictorTrainer

    max_nodes = min(args.max_nodes, 10) if args.dataset == "hetro" else args.max_nodes
    cfg = PredictorConfig(
        dataset=args.dataset,
        csv_file=csv_file,
        xyz_root=xyz_root,
        max_nodes=max_nodes,
        target_features=args.target_features,
        name=args.name,
        save_dir=args.save_dir,
        num_epochs=args.epochs,
        batch_size=args.batch_size,
        lr=args.lr,
        n_layers=args.n_layers,
        nf=args.nf,
        restore=args.restore,
        loss=args.loss,
        seed=args.seed,
        dtype=args.dtype,
    )
    edm_cfg = EDMConfig(diffusion_steps=args.diffusion_steps)

    mesh = None
    if args.dp and len(jax.devices()) > 1:
        from gaudi_tpu.parallel import create_mesh

        mesh = create_mesh()

    trainer = PredictorTrainer(cfg, edm_cfg=edm_cfg, mesh=mesh)
    print(f"experiment dir: {cfg.exp_dir}")
    result = trainer.fit()
    print({k: v for k, v in result.items() if k != "test_sweep"})
    print("MAE by noise level:", result["test_sweep"])
    return result


if __name__ == "__main__":
    main()
