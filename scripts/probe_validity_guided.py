"""Probe: validity-classifier guidance for hetro/peri chemical validity.

Samples with the guidance engine steering toward a trained validity
classifier (target max:VALID — the same hook the reference uses for
property targets, generation_guidance.py:200-211), optionally followed by
SDEdit polish, and scores chemical validity + geometric stability.
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edm-dir", required=True)
    ap.add_argument("--predictor-dir", required=True)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--std", type=float, default=0.7)
    ap.add_argument("--scale", type=float, nargs="+", default=[0.0, 0.3, 1.0])
    ap.add_argument("--polish", type=int, default=0)
    ap.add_argument("--polish-t", type=float, default=0.05)
    ap.add_argument("--noise", type=float, default=0.3)
    ap.add_argument("--platform", default="")
    ap.add_argument("--n-steps", type=int, default=0)
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--t-window", type=float, default=0.0,
                    help="apply guidance only below this t fraction")
    ap.add_argument("--prob", action="store_true",
                    help="guide on sigmoid(logit) instead of the raw head "
                         "(gradient self-damps where the classifier is "
                         "confident)")
    args = ap.parse_args()

    from gaudi_tpu.cli.common import (
        load_edm_from_dir,
        load_predictor_from_dir,
        setup_platform,
    )
    setup_platform(args.platform)
    import jax

    from gaudi_tpu.cli.generate import make_target_function
    from gaudi_tpu.data import PropertyDistribution
    from gaudi_tpu.eval_chem import analyze_chemical_validity_for_molecules
    from gaudi_tpu.eval_chem.stability import analyze_validity_for_molecules
    from gaudi_tpu.sampling import Sampler, to_molecule_list

    cfg, trainer = load_edm_from_dir(args.edm_dir)
    pred_cfg, pred_trainer = load_predictor_from_dir(args.predictor_dir)
    features = pred_cfg.data_config().targets
    prop_dist = PropertyDistribution(pred_trainer.train_ds)
    target_fn = make_target_function(
        "max:VALID", pred_trainer.model, pred_trainer.state.params,
        prop_dist, features,
    )
    if args.prob:
        import jax.nn as _nn

        base_fn = target_fn

        def target_fn(z, nm, em, t):
            return -_nn.sigmoid(-base_fn(z, nm, em, t))
        # note: make_target_function("max:F") returns -F (minimized), so
        # -sigmoid(-(-logit)) keeps "maximize p(valid)" semantics

    if args.t_window:
        from gaudi_tpu.diffusion.priors import t_windowed

        target_fn = t_windowed(target_fn, args.t_window)

    sampler = Sampler(trainer.edm, cfg.max_nodes, cfg.dataset == "hetro",
                      dataset=cfg.dataset)
    rng = np.random.default_rng(3)
    counts = trainer.nodes_dist.sample(args.n, rng)

    polish_jit = None
    if args.polish:
        # jit once outside the scale loop (masks passed as arguments) so
        # every scale reuses the same compiled polish program
        @jax.jit
        def polish_jit(params, key, x, h, nm, em):
            return trainer.edm.polish(
                params, key, x, h, nm, em,
                t_start=args.polish_t, rounds=args.polish,
                noise_scale=args.noise,
            )

    for scale in args.scale:
        t0 = time.time()
        key = jax.random.PRNGKey(args.seed)
        x, h, nm, em = sampler.sample_guidance(
            trainer.sampling_params, key, target_fn, counts,
            scale=scale, std=args.std, n_steps=args.n_steps or None,
        )
        if polish_jit is not None:
            x, h = polish_jit(
                trainer.sampling_params, jax.random.PRNGKey(11), x, h, nm, em
            )
        jax.block_until_ready(x)
        secs = time.time() - t0
        mols = to_molecule_list(x, h, nm, orientation=cfg.dataset == "hetro",
                                max_nodes=cfg.max_nodes)
        vd, _ = analyze_validity_for_molecules(mols, dataset=cfg.dataset)
        cd = analyze_chemical_validity_for_molecules(mols, dataset=cfg.dataset)
        print({
            "scale": scale, "std": args.std, "polish": args.polish,
            "secs": round(secs, 1),
            "mol_valid": round(cd["mol_valid"], 4),
            "mol_unique": round(cd["mol_unique"], 4),
            "mol_stable": round(vd["mol_stable"], 4),
            "connected": round(vd["connected"], 4),
        }, flush=True)


if __name__ == "__main__":
    main()
