"""Batch sweep + single-pipeline end-to-end benchmark (PERF.md data).

Two modes, both on the real chip (run solo — kill/pause training first,
the chip time-slices between processes):

  python scripts/bench_sweep.py sweep      # batch {128..2048} mol/s + MFU
  python scripts/bench_sweep.py e2e --exp-dir runs/r2/summary/longrun-edm
      # ONE measured pipeline: 1k guided molecules sampled in chunks with
      # host chemistry+stability eval of chunk k overlapped with device
      # sampling of chunk k+1 (double buffering)

Results append to bench_sweep.jsonl.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gaudi_tpu.cli.common import default_compile_cache


def _setup():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", default_compile_cache())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return jax


def _build(batch, timesteps, dtype_str="bfloat16"):
    import jax
    import jax.numpy as jnp

    from gaudi_tpu.core import masked as M
    from gaudi_tpu.diffusion.edm import EDM
    from gaudi_tpu.diffusion.schedule import NoiseSchedule
    from gaudi_tpu.models.egnn import EGNNDynamics
    from gaudi_tpu.models.predictor import EGNNPredictor

    dtype = jnp.dtype(dtype_str)
    max_nodes, n_nodes, in_nf, n_targets = 11, 10, 1, 2
    dynamics = EGNNDynamics(in_node_nf=in_nf, hidden_nf=192, n_layers=9, dtype=dtype)
    predictor = EGNNPredictor(
        in_nf=in_nf, out_nf=n_targets, hidden_nf=196, n_layers=12, dtype=dtype
    )
    edm = EDM(
        apply_fn=dynamics.apply,
        schedule=NoiseSchedule.create("polynomial_2", timesteps),
        in_node_nf=in_nf,
    )
    key = jax.random.PRNGKey(0)
    counts = jnp.full((batch,), n_nodes, jnp.int32)
    node_mask, edge_mask = M.build_masks(counts, max_nodes)
    z = M.sample_combined_noise(key, batch, max_nodes, 3, in_nf, node_mask)
    params = dynamics.init(key, jnp.zeros((batch, 1)), z, node_mask, edge_mask)
    pred_params = predictor.init(key, z, node_mask, edge_mask, jnp.zeros((batch, 1)))

    def target_fn(zt, nm, em, t):
        return predictor.apply(pred_params, zt, nm, em, t)[:, 0]

    @jax.jit
    def run(params, key):
        return edm.sample_guidance(
            params, key, target_fn, node_mask, edge_mask, scale=0.6, std=1.0
        )

    return run, params, node_mask


def cmd_sweep(args):
    jax = _setup()
    out = open("bench_sweep.jsonl", "a")
    for batch in args.batches:
        run, params, _ = _build(batch, args.T)
        compiled = run.lower(params, jax.random.PRNGKey(0)).compile()
        x, _ = compiled(params, jax.random.PRNGKey(0))
        jax.block_until_ready(x)
        t0 = time.time()
        x, _ = compiled(params, jax.random.PRNGKey(1))
        jax.block_until_ready(x)
        secs = time.time() - t0
        rec = {
            "bench": "guided_sweep", "batch": batch, "T": args.T,
            "secs": round(secs, 3), "mol_per_s": round(batch / secs, 2),
        }
        # analytic matmul-floor FLOPs (utils/flops.py): XLA cost_analysis
        # counts the scan body once, ~T-fold under the true count
        from gaudi_tpu.utils.flops import guided_step_flops

        flops = args.T * guided_step_flops(batch, 11, 192, 9, 196, 12)
        # 197 TFLOP/s = v5e bf16 peak (394 is the int8 rate) — keep in
        # sync with bench.py
        peak = float(os.environ.get("GAUDI_TPU_PEAK_FLOPS", 197e12))
        rec["tflops_per_s"] = round(flops / secs / 1e12, 2)
        rec["mfu_floor"] = round(flops / secs / peak, 4)
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
        out.flush()


def cmd_e2e(args):
    """One measured pipeline: sample chunks on device, eval chunk k on the
    host (process-pool chemistry + stability) while chunk k+1 samples."""
    jax = _setup()
    import threading

    import numpy as np

    from gaudi_tpu.cli.common import load_edm_from_dir
    from gaudi_tpu.eval_chem import (
        analyze_chemical_validity_for_molecules,
        analyze_validity_for_molecules,
    )
    from gaudi_tpu.sampling import Sampler, to_molecule_list

    cfg, trainer = load_edm_from_dir(args.exp_dir)
    sampler = Sampler(trainer.edm, cfg.max_nodes, cfg.dataset == "hetro")
    rng = np.random.default_rng(0)
    chunk = args.chunk
    n_chunks = (args.n + chunk - 1) // chunk

    # warm the compile outside the timed region (compilation is a one-time
    # cost amortized over a production campaign)
    counts = trainer.nodes_dist.sample(chunk, rng)
    x, h, nm, _ = sampler.sample(
        trainer.sampling_params, jax.random.PRNGKey(99), counts, args.std
    )
    jax.block_until_ready(x)

    results = []
    lock = threading.Lock()

    def eval_host(mols):
        vd, _ = analyze_validity_for_molecules(mols, dataset=cfg.dataset)
        cd = analyze_chemical_validity_for_molecules(
            mols, dataset=cfg.dataset, n_workers=args.eval_workers
        )
        with lock:
            results.append((vd, cd, len(mols)))

    t0 = time.time()
    key = jax.random.PRNGKey(args.seed)
    threads = []
    for c in range(n_chunks):
        counts = trainer.nodes_dist.sample(chunk, rng)
        key, sub = jax.random.split(key)
        x, h, nm, _ = sampler.sample(trainer.sampling_params, sub, counts, args.std)
        jax.block_until_ready(x)
        mols = to_molecule_list(
            x, h, nm, orientation=cfg.dataset == "hetro", max_nodes=cfg.max_nodes
        )
        th = threading.Thread(target=eval_host, args=(mols,))
        th.start()
        threads.append(th)
    for th in threads:
        th.join()
    secs = time.time() - t0

    n_total = sum(r[2] for r in results)
    stable = sum(r[0]["mol_stable"] * r[2] for r in results) / n_total
    valid = sum(r[1]["mol_valid"] * r[2] for r in results) / n_total
    rec = {
        "bench": "e2e_pipeline", "n": n_total, "chunk": chunk,
        "secs": round(secs, 2), "mol_per_s": round(n_total / secs, 2),
        "mol_stable": round(stable, 4), "mol_valid": round(valid, 4),
        "exp_dir": args.exp_dir, "std": args.std,
    }
    print(json.dumps(rec), flush=True)
    with open("bench_sweep.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    s1 = sub.add_parser("sweep")
    s1.add_argument("--batches", type=int, nargs="+",
                    default=[128, 256, 512, 1024, 2048])
    s1.add_argument("--T", type=int, default=1000)
    s1.set_defaults(fn=cmd_sweep)
    s2 = sub.add_parser("e2e")
    s2.add_argument("--exp-dir", required=True)
    s2.add_argument("--n", type=int, default=1024)
    s2.add_argument("--chunk", type=int, default=256)
    s2.add_argument("--std", type=float, default=0.7)
    s2.add_argument("--seed", type=int, default=0)
    s2.add_argument("--eval-workers", type=int, default=8)
    s2.set_defaults(fn=cmd_e2e)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
