"""Post-training measurement sweeps on trained EDM + predictor dirs:

1. guidance-scale sweep (one compiled guided sampler, scale is a traced
   argument): property shift vs validity at each scale;
2. strided-sampler sweep: unconditional quality + throughput at
   n_steps in {full T, 250, 100, 50, 25};
3. optional guided strided probe (n_steps=100) — separate compile.

Appends JSON lines to <out>/sweep.jsonl and prints them.

Run: python scripts/sweep_tpu.py --edm-dir ... --predictor-dir ...
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
    ap.add_argument("--predictor-dir", required=True)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--n-nodes", type=int, default=10)
    ap.add_argument("--target", default="min:GAP_eV")
    ap.add_argument("--scales", default="0,0.1,0.2,0.3,0.6")
    ap.add_argument("--strided", default="0,250,100,50,25",
                    help="0 = full T")
    ap.add_argument("--guided-strided", type=int, default=100,
                    help="0 disables the guided strided probe")
    ap.add_argument("--out", default="")
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

    import jax.numpy as jnp
    import numpy as np

    from gaudi_tpu.cli.common import load_edm_from_dir, load_predictor_from_dir
    from gaudi_tpu.cli.generate import make_target_function
    from gaudi_tpu.data import PropertyDistribution
    from gaudi_tpu.eval_chem import (
        analyze_chemical_validity_for_molecules,
        analyze_validity_for_molecules,
    )
    from gaudi_tpu.sampling import Sampler, to_molecule_list

    edm_cfg, edm_tr = load_edm_from_dir(args.edm_dir)
    pred_cfg, pred_tr = load_predictor_from_dir(args.predictor_dir)
    features = pred_cfg.data_config().targets
    prop_dist = PropertyDistribution(pred_tr.train_ds)
    target_fn = make_target_function(
        args.target, pred_tr.model, pred_tr.state.params, prop_dist, features
    )
    feat = args.target.split(":")[1] if ":" in args.target else features[0]
    feat_idx = features.index(feat)

    out_dir = args.out or args.edm_dir
    log = open(os.path.join(out_dir, "sweep.jsonl"), "a")

    def emit(rec):
        line = json.dumps(rec)
        print(line, flush=True)
        log.write(line + "\n")
        log.flush()

    orientation = edm_cfg.dataset == "hetro"
    sampler = Sampler(edm_tr.edm, edm_cfg.max_nodes, orientation)
    counts = np.full(args.batch_size, args.n_nodes, np.int64)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def score(x, h, nm, em):
        xs, hs, _ = edm_tr.edm.normalize(x, h, nm)
        z = jnp.concatenate([xs, hs], -1)
        t = jnp.zeros((x.shape[0], 1))
        return pred_tr.model.apply(pred_tr.state.params, z, nm, em, t)

    def evaluate(x, h, nm, em, secs, **tags):
        pred = prop_dist.unnormalize(np.asarray(score(x, h, nm, em)))
        mols = to_molecule_list(x, h, nm, orientation, edm_cfg.max_nodes)
        cd = analyze_chemical_validity_for_molecules(mols, dataset=edm_cfg.dataset)
        vd, _ = analyze_validity_for_molecules(mols, dataset=edm_cfg.dataset)
        valid = np.asarray(cd["molecule_valid_bool"])
        rec = dict(tags)
        rec.update(
            {
                "secs": round(secs, 2),
                "mol_per_s": round(len(mols) / secs, 1),
                "mol_valid": round(cd["mol_valid"], 4),
                "mol_unique": round(cd["mol_unique"], 4),
                "mol_stable": round(vd["mol_stable"], 4),
                "connected": round(vd["connected"], 4),
                f"mean_{feat}": round(float(pred[:, feat_idx].mean()), 4),
            }
        )
        if valid.any():
            rec[f"mean_{feat}_valid"] = round(
                float(pred[valid, feat_idx].mean()), 4
            )
        emit(rec)

    # ---- 1. guidance-scale sweep (scale traced -> one compile) ----------
    guided = sampler.make_guided_sampler(target_fn, std=1.0)
    for i, scale in enumerate(float(s) for s in args.scales.split(",")):
        k = jax.random.fold_in(key, i)
        t0 = time.time()
        x, h, nm, em = guided(
            edm_tr.sampling_params, k, jnp.asarray(counts, jnp.int32),
            jnp.float32(scale),
        )
        jax.block_until_ready(x)
        evaluate(x, h, nm, em, time.time() - t0, sweep="scale", scale=scale)

    # ---- 2. strided unconditional sweep ---------------------------------
    rng = np.random.default_rng(1)
    dist_counts = edm_tr.nodes_dist.sample(args.batch_size, rng)
    for s in (int(v) for v in args.strided.split(",")):
        n_steps = s or None
        k = jax.random.fold_in(key, 1000 + (s or 0))
        t0 = time.time()
        x, h, nm, em = sampler.sample(
            edm_tr.sampling_params, k, dist_counts, std=0.7, n_steps=n_steps
        )
        jax.block_until_ready(x)
        evaluate(
            x, h, nm, em, time.time() - t0,
            sweep="strided", n_steps=s or edm_tr.edm.T,
        )

    # ---- 3. guided strided probe ----------------------------------------
    if args.guided_strided:
        k = jax.random.fold_in(key, 77)
        t0 = time.time()
        x, h, nm, em = sampler.sample_guidance(
            edm_tr.sampling_params, k, target_fn, counts,
            scale=0.2, std=1.0, n_steps=args.guided_strided,
        )
        jax.block_until_ready(x)
        evaluate(
            x, h, nm, em, time.time() - t0,
            sweep="guided_strided", n_steps=args.guided_strided, scale=0.2,
        )

    print("SWEEP DONE", flush=True)


if __name__ == "__main__":
    main()
