"""Long training campaign: train the EDM in rounds with periodic
sampling-quality evaluation, full-state checkpoints, and resume.

Each round = N epochs -> full-state checkpoint -> 512-sample quality eval
(geometric stability + chemical validity) appended to <root>/quality.jsonl.
Re-running the script with the same --root resumes from the last checkpoint
(step counter, optimizer state and EMA weights all restore via orbax).

Run: python scripts/longrun_tpu.py --root runs/longrun --max-hours 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gaudi_tpu.cli.common import default_compile_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="runs/longrun")
    ap.add_argument("--dataset", default="cata")
    ap.add_argument("--molecules", type=int, default=27593)
    ap.add_argument("--round-epochs", type=int, default=100)
    ap.add_argument("--max-hours", type=float, default=8.0)
    ap.add_argument("--max-rounds", type=int, default=0, help="0 = unlimited")
    ap.add_argument("--n-samples", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--ema", type=float, default=0.999)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--lr-warmup", type=int, default=0,
                    help="linear lr warmup steps (use ~500 when restoring "
                         "from a weights-only artifact: cold amsgrad moments "
                         "at full lr damage converged weights)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--nf", type=int, default=192)
    ap.add_argument("--n-layers", type=int, default=9)
    ap.add_argument("--diffusion-steps", type=int, default=1000)
    ap.add_argument("--t-bias-frac", type=float, default=0.0,
                    help="low-t fine-tune: fraction of each batch drawing t "
                         "from U[0, t_bias_cap*T]")
    ap.add_argument("--t-bias-cap", type=float, default=0.1)
    ap.add_argument("--planar-boost", type=float, default=0.0,
                    help="planarity-weighted train sampling mixture weight "
                         "(config.py planar_boost)")
    ap.add_argument("--planar-tau", type=float, default=0.1,
                    help="ease-weight temperature in A of plane RMS")
    ap.add_argument("--target-features", default="GAP_eV,HOMO_eV")
    ap.add_argument("--labeled", action="store_true",
                    help="generate oracle-labeled data (keeps invalid "
                         "skeletons, adds a VALID target column)")
    ap.add_argument("--context-features", default="",
                    help="train a conditional EDM on these target columns "
                         "(classifier-free guidance ready)")
    ap.add_argument("--context-dropout", type=float, default=0.1)
    ap.add_argument("--eval-context-set", default="",
                    help="pin conditioning columns for the round evals, "
                         "e.g. 'VALID=1'")
    ap.add_argument("--eval-cfg-weight", type=float, default=0.0)
    ap.add_argument("--platform", default="")
    ap.add_argument("--restore", default="",
                    help="seed weights when exp_dir has no orbax state yet "
                         "(committed artifact dir with weights.npz; the "
                         "VM-recycle recovery path — optimizer state "
                         "restarts fresh, params/EMA/step restore)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cache_dir = default_compile_cache()
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import numpy as np

    from gaudi_tpu.config import EDMConfig
    from gaudi_tpu.data.synthetic import generate_dataset
    from gaudi_tpu.eval_chem import (
        analyze_chemical_validity_for_molecules,
        analyze_validity_for_molecules,
    )
    from gaudi_tpu.sampling import Sampler, to_molecule_list
    from gaudi_tpu.train.checkpoints import save_checkpoint
    from gaudi_tpu.train.trainer_edm import EDMTrainer

    os.makedirs(args.root, exist_ok=True)
    csv = os.path.join(args.root, f"{args.dataset}.csv")
    if not os.path.exists(csv):
        print(f"generating {args.molecules} synthetic {args.dataset} molecules...",
              flush=True)
        t0 = time.time()
        generate_dataset(
            args.root, args.dataset, n_molecules=args.molecules,
            seed=args.seed, labeled=args.labeled,
        )
        print(f"dataset generated in {time.time()-t0:.0f}s", flush=True)

    exp_dir = os.path.join(args.root, "summary", "longrun-edm")
    restore = exp_dir if os.path.exists(os.path.join(exp_dir, "model")) else None
    if restore is None and args.restore:
        restore = args.restore
    cfg = EDMConfig(
        dataset=args.dataset,
        csv_file=csv,
        xyz_root=os.path.join(args.root, f"{args.dataset}-xyz"),
        max_nodes=11 if args.dataset != "hetro" else 10,
        target_features=args.target_features,
        context_features=args.context_features,
        context_dropout=args.context_dropout,
        name="longrun-edm",
        save_dir=os.path.join(args.root, "summary"),
        batch_size=args.batch_size,
        lr=args.lr,
        lr_warmup_steps=args.lr_warmup,
        nf=args.nf,
        n_layers=args.n_layers,
        diffusion_steps=args.diffusion_steps,
        dtype=args.dtype,
        ema_decay=args.ema,
        restore=restore,
        seed=args.seed,
        t_bias_frac=args.t_bias_frac,
        t_bias_cap=args.t_bias_cap,
        planar_boost=args.planar_boost,
        planar_tau=args.planar_tau,
    )
    trainer = EDMTrainer(cfg)
    if getattr(trainer, "_ctx_idx", None) is None and (
        args.eval_cfg_weight or args.eval_context_set
    ):
        # fail loudly before burning hours: on an unconditional model
        # draw_context returns None and Sampler zeroes cfg_weight, so the
        # flags would silently produce plain unconditional round evals
        raise SystemExit(
            "--eval-cfg-weight/--eval-context-set require "
            "--context-features (this model is unconditional)"
        )
    cfg.save()
    start_step = int(trainer.state.step)
    print(
        f"train set: {len(trainer.train_ds)} molecules | "
        f"resume step: {start_step}",
        flush=True,
    )

    sampler = Sampler(trainer.edm, cfg.max_nodes, cfg.dataset == "hetro",
                      dataset=cfg.dataset)
    qlog = open(os.path.join(args.root, "quality.jsonl"), "a")

    deadline = time.time() + args.max_hours * 3600.0
    rng = np.random.default_rng(args.seed + start_step)
    key = jax.random.PRNGKey(args.seed + 1 + start_step)
    round_i = 0
    while time.time() < deadline:
        round_i += 1
        if args.max_rounds and round_i > args.max_rounds:
            break
        t0 = time.time()
        tm = {}
        for e in range(args.round_epochs):
            key, k_tr = jax.random.split(key)
            tm = trainer.train_epoch(e, rng, k_tr)
        key, k_val, k_s = jax.random.split(key, 3)
        val_loss = trainer.eval_epoch(trainer.val_ds, k_val)
        save_checkpoint(cfg.exp_dir, trainer.state)
        train_secs = time.time() - t0

        t0 = time.time()
        counts = trainer.nodes_dist.sample(args.n_samples, rng)
        from gaudi_tpu.cli.common import draw_context

        eval_ctx = draw_context(trainer, counts, rng, args.eval_context_set)
        x, h, nm, _ = sampler.sample(
            trainer.sampling_params, k_s, counts, std=0.7,
            context=eval_ctx, cfg_weight=args.eval_cfg_weight,
        )
        jax.block_until_ready(x)
        mols = to_molecule_list(
            x, h, nm, orientation=cfg.dataset == "hetro", max_nodes=cfg.max_nodes
        )
        sample_secs = time.time() - t0
        t0 = time.time()
        vd, _ = analyze_validity_for_molecules(mols, dataset=cfg.dataset)
        cd = analyze_chemical_validity_for_molecules(
            mols, dataset=cfg.dataset, n_workers=8
        )
        eval_secs = time.time() - t0

        rec = {
            "round": round_i,
            "step": int(trainer.state.step),
            "train_loss": round(tm.get("loss", float("nan")), 4),
            "val_loss": round(val_loss, 4),
            "mol_valid": round(cd["mol_valid"], 4),
            "mol_unique": round(cd["mol_unique"], 4),
            "mol_stable": round(vd["mol_stable"], 4),
            "dist_stable": round(vd["dist_stable"], 4),
            "connected": round(vd["connected"], 4),
            "angels3": round(vd.get("angels3", float("nan")), 4),
            "angels4": round(vd.get("angels4", float("nan")), 4),
            "train_secs": round(train_secs, 1),
            "sample_secs": round(sample_secs, 1),
            "eval_secs": round(eval_secs, 1),
        }
        print(json.dumps(rec), flush=True)
        qlog.write(json.dumps(rec) + "\n")
        qlog.flush()
    print("LONGRUN DONE", flush=True)


if __name__ == "__main__":
    main()
