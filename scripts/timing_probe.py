"""Solo-chip throughput probe: unconditional + guided sampling at several
n_steps on a trained experiment dir. Compile-cache friendly (same graphs
as sweep_tpu.py). Prints one JSON line per config.

Run: python scripts/timing_probe.py --edm-dir ... [--predictor-dir ...]
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
    ap.add_argument("--edm-dir", required=True)
    ap.add_argument("--predictor-dir", default="")
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--strided", default="0,250,100,50")
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            default_compile_cache(),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import numpy as np

    from gaudi_tpu.cli.common import load_edm_from_dir, load_predictor_from_dir
    from gaudi_tpu.sampling import Sampler

    cfg, tr = load_edm_from_dir(args.edm_dir)
    sampler = Sampler(tr.edm, cfg.max_nodes, cfg.dataset == "hetro")
    rng = np.random.default_rng(1)
    counts = tr.nodes_dist.sample(args.batch_size, rng)
    key = jax.random.PRNGKey(0)

    for s in (int(v) for v in args.strided.split(",")):
        n_steps = s or None
        fn_key = jax.random.fold_in(key, s or 0)
        x, *_ = sampler.sample(tr.sampling_params, fn_key, counts, 0.7, n_steps)
        jax.block_until_ready(x)  # warm / compile
        t0 = time.time()
        x, *_ = sampler.sample(
            tr.sampling_params, jax.random.fold_in(fn_key, 1), counts, 0.7, n_steps
        )
        jax.block_until_ready(x)
        secs = time.time() - t0
        print(json.dumps({
            "kind": "uncond", "n_steps": s or tr.edm.T,
            "secs": round(secs, 3),
            "mol_per_s": round(args.batch_size / secs, 1),
        }), flush=True)

    if args.predictor_dir:
        from gaudi_tpu.cli.generate import make_target_function
        from gaudi_tpu.data import PropertyDistribution

        pcfg, ptr = load_predictor_from_dir(args.predictor_dir)
        prop_dist = PropertyDistribution(ptr.train_ds)
        target_fn = make_target_function(
            "min:GAP_eV", ptr.model, ptr.state.params, prop_dist,
            pcfg.data_config().targets,
        )
        g_counts = np.full(args.batch_size, 10, np.int64)
        for s in (0, 100):
            n_steps = s or None
            x, *_ = sampler.sample_guidance(
                tr.sampling_params, key, target_fn, g_counts, 0.2, 1.0, n_steps
            )
            jax.block_until_ready(x)
            t0 = time.time()
            x, *_ = sampler.sample_guidance(
                tr.sampling_params, jax.random.fold_in(key, 9), target_fn,
                g_counts, 0.2, 1.0, n_steps,
            )
            jax.block_until_ready(x)
            secs = time.time() - t0
            print(json.dumps({
                "kind": "guided", "n_steps": s or tr.edm.T,
                "secs": round(secs, 3),
                "mol_per_s": round(args.batch_size / secs, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
