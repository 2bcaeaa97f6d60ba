"""A/B probe: does SDEdit polish lift stability on the current checkpoint?"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp-dir", default="runs/r2/summary/longrun-edm")
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--std", type=float, default=0.7)
    ap.add_argument("--polish-t", type=float, nargs="+", default=[0.08])
    ap.add_argument("--rounds", type=int, nargs="+", default=[2])
    ap.add_argument("--noise", type=float, nargs="+", default=[1.0])
    ap.add_argument("--decay", type=float, default=0.6)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--guide", default="")
    ap.add_argument("--platform", default="")
    ap.add_argument("--n-steps", type=int, default=0,
                    help="strided sampler steps (0 = full T)")
    ap.add_argument("--guide-scale", type=float, nargs="+", default=[0.0])
    ap.add_argument("--skip-baseline", action="store_true")
    args = ap.parse_args()

    from gaudi_tpu.cli.common import load_edm_from_dir, setup_platform
    setup_platform(args.platform)
    import jax

    from gaudi_tpu.eval_chem.stability import analyze_validity_for_molecules
    from gaudi_tpu.eval_chem import analyze_chemical_validity_for_molecules
    from gaudi_tpu.sampling import Sampler, to_molecule_list

    cfg, trainer = load_edm_from_dir(args.exp_dir)
    sampler = Sampler(trainer.edm, cfg.max_nodes, cfg.dataset == "hetro",
                      dataset=cfg.dataset)
    rng = np.random.default_rng(3)
    counts = trainer.nodes_dist.sample(args.n, rng)

    def run(polish, pt, pn=1.0, gs=0.0):
        t0 = time.time()
        x, h, nm, _ = sampler.sample(
            trainer.sampling_params, jax.random.PRNGKey(5), counts, args.std,
            n_steps=args.n_steps or None,
            polish=polish, polish_t=pt, polish_noise=pn, polish_steps=args.steps,
            polish_decay=args.decay,
            polish_guide=args.guide if gs else "", polish_guide_scale=gs,
        )
        jax.block_until_ready(x)
        secs = time.time() - t0
        mols = to_molecule_list(x, h, nm, orientation=cfg.dataset == "hetro",
                                max_nodes=cfg.max_nodes)
        vd, _ = analyze_validity_for_molecules(mols, dataset=cfg.dataset)
        cd = analyze_chemical_validity_for_molecules(mols, dataset=cfg.dataset)
        return {
            "polish": polish, "t": pt, "noise": pn, "decay": args.decay,
            "guide": (args.guide if gs else ""), "gs": gs,
            "std": args.std, "secs": round(secs, 1),
            "mol_stable": round(vd["mol_stable"], 4),
            "angels3": round(vd["angels3"], 4),
            "angels4": round(vd["angels4"], 4),
            "connected": round(vd["connected"], 4),
            "mol_valid": round(cd["mol_valid"], 4),
            "mol_unique": round(cd["mol_unique"], 4),
        }

    if not args.skip_baseline:
        print(run(0, 0.08))
    for pt in args.polish_t:
        for r in args.rounds:
            for pn in args.noise:
                for gs in args.guide_scale:
                    print(run(r, pt, pn, gs), flush=True)


if __name__ == "__main__":
    main()
