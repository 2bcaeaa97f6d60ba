"""Train the unconditional E(3) diffusion model.

Usage (synthetic stand-in data):
    python -m gaudi_tpu.cli.train_edm --dataset cata --synthetic 2000 \
        --name my-run --epochs 100

Reference counterpart: train_edm.py.
"""

from __future__ import annotations

import argparse

from gaudi_tpu.cli.common import add_data_args, resolve_data, setup_platform


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    add_data_args(p)
    p.add_argument("--name", default="cata-edm")
    p.add_argument("--save-dir", default="summary")
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--n-layers", type=int, default=9)
    p.add_argument("--nf", type=int, default=192)
    p.add_argument("--diffusion-steps", type=int, default=1000)
    p.add_argument("--noise-schedule", default="polynomial_2",
                   help="polynomial_<power> | cosine | learned (trainable "
                        "VDM GammaNetwork; requires --loss-type vlb)")
    p.add_argument("--loss-type", default="l2", choices=["l2", "vlb"],
                   help="training objective (reference --diffusion_loss_type)")
    p.add_argument("--target-features", default="GAP_eV")
    p.add_argument("--max-nodes", type=int, default=11)
    p.add_argument("--restore", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dp", action="store_true", help="shard the batch over all devices")
    p.add_argument("--dtype", default="float32",
                   help="network compute dtype (bfloat16 for TPU production)")
    p.add_argument("--ema", type=float, default=0.0,
                   help="EMA decay for sampling weights (0 = off, reference "
                        "behavior; 0.999 is the standard diffusion upgrade)")
    p.add_argument("--t-bias-frac", type=float, default=0.0,
                   help="fraction of each batch drawing t from the low range "
                        "U[0, t_bias_cap*T] (low-t fine-tune; 0 = uniform t)")
    p.add_argument("--t-bias-cap", type=float, default=0.1,
                   help="upper edge (fraction of T) of the biased t range")
    p.add_argument("--planar-boost", type=float, default=0.0,
                   help="planarity-weighted train sampling mixture weight "
                        "(0 = reference-style shuffled epochs)")
    p.add_argument("--planar-tau", type=float, default=0.1,
                   help="ease-weight temperature in A of plane-fit RMS")
    p.add_argument("--context-features", default="",
                   help="comma-separated target columns to condition the "
                        "EDM on (trains a conditional model ready for "
                        "classifier-free guidance; must be a subset of "
                        "--target-features)")
    p.add_argument("--context-dropout", type=float, default=0.1,
                   help="per-sample probability of dropping the context to "
                        "the CFG null token during training")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    jax = setup_platform(args.platform)
    csv_file, xyz_root = resolve_data(args)

    from gaudi_tpu.config import EDMConfig
    from gaudi_tpu.train.trainer_edm import EDMTrainer

    max_nodes = min(args.max_nodes, 10) if args.dataset == "hetro" else args.max_nodes
    cfg = EDMConfig(
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
        diffusion_steps=args.diffusion_steps,
        diffusion_noise_schedule=args.noise_schedule,
        diffusion_loss_type=args.loss_type,
        restore=args.restore,
        seed=args.seed,
        dtype=args.dtype,
        ema_decay=args.ema,
        t_bias_frac=args.t_bias_frac,
        t_bias_cap=args.t_bias_cap,
        planar_boost=args.planar_boost,
        planar_tau=args.planar_tau,
        context_features=args.context_features,
        context_dropout=args.context_dropout,
    )

    mesh = None
    if args.dp and len(jax.devices()) > 1:
        from gaudi_tpu.parallel import create_mesh

        mesh = create_mesh()
        print(f"data-parallel over {mesh.size} devices")

    trainer = EDMTrainer(cfg, mesh=mesh)
    print(f"experiment dir: {cfg.exp_dir}")
    result = trainer.fit()
    print(result)
    return result


if __name__ == "__main__":
    main()
