"""Guidance-effectiveness demonstration: unconditional vs guided sampling.

Loads trained EDM + predictor experiment dirs, samples both ways, and
reports the property shift (the paper's core result: guidance moves the
generated distribution toward the target) plus validity.

Run: python scripts/demo_guidance_tpu.py --edm-dir ... --predictor-dir ...
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edm-dir", default="runs/demo16kj/summary/demo-edm")
    ap.add_argument("--predictor-dir", default="runs/demo16kj/psummary/demo-pred")
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--n-nodes", type=int, default=10)
    ap.add_argument("--scale", type=float, default=0.6)
    ap.add_argument("--target", default="min:GAP_eV")
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from gaudi_tpu.cli.common import load_edm_from_dir, load_predictor_from_dir
    from gaudi_tpu.cli.generate import make_target_function
    from gaudi_tpu.data import PropertyDistribution
    from gaudi_tpu.eval_chem import analyze_chemical_validity_for_molecules
    from gaudi_tpu.sampling import Sampler, to_molecule_list

    edm_cfg, edm_tr = load_edm_from_dir(args.edm_dir)
    pred_cfg, pred_tr = load_predictor_from_dir(args.predictor_dir)
    features = pred_cfg.data_config().targets
    prop_dist = PropertyDistribution(pred_tr.train_ds)
    target_fn = make_target_function(
        args.target, pred_tr.model, pred_tr.state.params, prop_dist, features
    )

    sampler = Sampler(edm_tr.edm, edm_cfg.max_nodes, edm_cfg.dataset == "hetro")
    counts = np.full(args.batch_size, args.n_nodes, np.int64)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def score(x, h, nm, em):
        xs, hs, _ = edm_tr.edm.normalize(x, h, nm)
        z = jnp.concatenate([xs, hs], -1)
        t = jnp.zeros((x.shape[0], 1))
        pred = pred_tr.model.apply(pred_tr.state.params, z, nm, em, t)
        return pred

    results = {}
    for mode in ("unconditional", "guided"):
        t0 = time.time()
        if mode == "guided":
            x, h, nm, em = sampler.sample_guidance(
                edm_tr.sampling_params, key, target_fn, counts,
                scale=args.scale, std=1.0,
            )
        else:
            x, h, nm, em = sampler.sample(
                edm_tr.sampling_params, key, counts, std=1.0
            )
        jax.block_until_ready(x)
        secs = time.time() - t0
        pred = prop_dist.unnormalize(np.asarray(score(x, h, nm, em)))
        mols = to_molecule_list(x, h, nm, edm_cfg.dataset == "hetro",
                                edm_cfg.max_nodes)
        cd = analyze_chemical_validity_for_molecules(mols, dataset=edm_cfg.dataset)
        results[mode] = {
            "pred_mean": pred.mean(0).tolist(),
            "pred_std": pred.std(0).tolist(),
            "mol_valid": cd["mol_valid"],
            "mol_unique": cd["mol_unique"],
            "seconds": secs,
        }
        print(mode, json.dumps(results[mode]), flush=True)

    # headline: did guidance shift the targeted feature?
    feat_idx = features.index(args.target.split(":")[1]) if ":" in args.target else 0
    shift = (results["guided"]["pred_mean"][feat_idx]
             - results["unconditional"]["pred_mean"][feat_idx])
    print(json.dumps({
        "target": args.target,
        "feature_shift": shift,
        "uncond_mean": results["unconditional"]["pred_mean"][feat_idx],
        "guided_mean": results["guided"]["pred_mean"][feat_idx],
    }), flush=True)
    print("GUIDANCE DEMO DONE", flush=True)


if __name__ == "__main__":
    main()
