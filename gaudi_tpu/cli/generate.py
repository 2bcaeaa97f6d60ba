"""Classifier-guided inverse design — the flagship pipeline.

Usage:
    python -m gaudi_tpu.cli.generate \
        --edm-dir summary/my-run --predictor-dir prediction_summary/my-pred \
        --batch-size 512 --scale 0.6 --n-nodes 10 --target min:GAP_eV

Targets: `min:FEAT` / `max:FEAT` on any predicted feature, `eq:FEAT=V`
(guide toward a raw property value), or a weighted combination
`w1*FEAT1+w2*FEAT2` (always minimized, matching the reference's
convention where the best molecule has the lowest target value,
generation_guidance.py:137,159).

Reference counterpart: generation_guidance.py.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from gaudi_tpu.cli.common import (
    load_edm_from_dir,
    load_predictor_from_dir,
    setup_platform,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--edm-dir", required=True)
    p.add_argument("--predictor-dir", required=True)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--scale", type=float, default=0.6)
    p.add_argument("--n-nodes", type=int, default=10)
    p.add_argument("--target", default="min:GAP_eV")
    p.add_argument("--std", type=float, default=1.0)
    p.add_argument("--solver", default="ancestral",
                   choices=["ancestral", "dpmpp"],
                   help="dpmpp = DPM-Solver++(2M) ODE sampler (pair with "
                        "--n-steps 10-25)")
    p.add_argument("--solver-order", type=int, default=2, choices=[1, 2])
    p.add_argument("--n-steps", type=int, default=0,
                   help="0 = full T reverse steps (reference; 25 ODE steps "
                        "under --solver dpmpp); K < T uses the strided "
                        "few-step sampler (~T/K speedup)")
    p.add_argument("--top-k", type=int, default=5)
    p.add_argument("--polish", type=int, default=0,
                   help="SDEdit manifold-projection rounds after guidance "
                        "(t small enough that predicted properties are "
                        "preserved; beyond-reference quality knob)")
    p.add_argument("--polish-t", type=float, default=0.05)
    p.add_argument("--polish-noise", type=float, default=0.5)
    p.add_argument("--polish-decay", type=float, default=0.6,
                   help="per-round melt-temperature decay for --polish")
    p.add_argument("--polish-guide", default="",
                   help="physics prior from diffusion/priors.py applied "
                        "inside polish rounds (e.g. 'planarity')")
    p.add_argument("--polish-guide-scale", type=float, default=0.0)
    p.add_argument("--cfg-weight", type=float, default=0.0,
                   help="classifier-free guidance weight for a conditional "
                        "EDM (--context-features at train time); with "
                        "--scale 0 designs purely by conditioning, with "
                        "--scale > 0 composes with classifier guidance")
    p.add_argument("--context-set", default="",
                   help="pin conditioning columns to raw values for the "
                        "conditional-EDM design path, e.g. 'GAP_eV=0.5'")
    p.add_argument("--anneal", default="",
                   help="t-dependent guidance-scale annealing: "
                        "'linear'|'sqrt'|'cos2', optionally ':floor' "
                        "(e.g. 'cos2:0.1') — full strength early, fading "
                        "as geometry crystallizes near t=0. Lets "
                        "multi-objective targets run at the reference's "
                        "scale 0.6 without the validity collapse")
    p.add_argument("--grad-norm-per-property", action="store_true",
                   help="for weighted-combo targets: compute each "
                        "property's guidance gradient separately and "
                        "normalize to unit per-sample norm before "
                        "weighting (stops one property's raw-unit "
                        "gradient from drowning the others)")
    p.add_argument("--out-dir", default="best")
    p.add_argument("--platform", default="")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-workers", type=int, default=8)
    p.add_argument("--no-warm-timing", action="store_true",
                   help="skip the extra warm run that separates compile "
                        "time from steady-state throughput")
    p.add_argument("--profile", default="", help="capture a jax.profiler trace to this dir")
    return p


def make_target_function(spec: str, predictor, pred_params, prop_dist, features,
                         per_property: bool = False):
    """Build f(z, node_mask, edge_mask, t) -> [B] (minimized by guidance).

    Mirrors the reference's example target closures
    (generation_guidance.py:200-211): predictor output, optionally
    unnormalized, combined into a scalar score.

    per_property=True (weighted-combo specs only) returns a list of
    (weight, fn) terms instead — the guided step then normalizes each
    term's gradient to unit per-sample norm before weighting
    (EDM.sample_zs_given_zt_guidance).
    """
    import jax.numpy as jnp

    mean = jnp.asarray(prop_dist.mean)
    std = jnp.asarray(prop_dist.std)

    def predict(z, node_mask, edge_mask, t):
        return predictor.apply(pred_params, z, node_mask, edge_mask, t)

    if per_property and (spec.startswith(("min:", "max:", "eq:"))):
        raise SystemExit(
            "--grad-norm-per-property applies to weighted-combo targets "
            "(w1*F1+w2*F2); single-property targets have one gradient"
        )

    if spec.startswith(("min:", "max:")):
        mode, feat = spec.split(":", 1)
        idx = features.index(feat)
        sign = 1.0 if mode == "min" else -1.0

        def f(z, node_mask, edge_mask, t):
            return sign * predict(z, node_mask, edge_mask, t)[:, idx]

        return f

    if spec.startswith("eq:"):
        # target a property VALUE: energy (pred - v)^2 in raw units —
        # the classifier-guidance counterpart of conditional-EDM design
        # with --context-set FEAT=v
        feat, val = spec[3:].split("=")
        idx = features.index(feat.strip())
        v = float(val)

        def f(z, node_mask, edge_mask, t):
            pred = predict(z, node_mask, edge_mask, t)[:, idx]
            return (pred * std[idx] + mean[idx] - v) ** 2

        return f

    # weighted combination "w1*F1+w2*F2" on unnormalized predictions
    terms = []
    for part in spec.replace("-", "+-").split("+"):
        part = part.strip()
        if not part:
            continue
        if "*" in part:
            w, feat = part.split("*")
            terms.append((float(w), features.index(feat.strip())))
        else:
            w = -1.0 if part.startswith("-") else 1.0
            terms.append((w, features.index(part.lstrip("-").strip())))

    if per_property:
        # per-term fns in NORMALIZED units: the per-sample gradient
        # normalization cancels any per-property scale factor, so only the
        # weight (and its sign) matters
        def term_fn(i):
            def f(z, node_mask, edge_mask, t):
                return predict(z, node_mask, edge_mask, t)[:, i]

            return f

        return [(w, term_fn(i)) for w, i in terms]

    def f(z, node_mask, edge_mask, t):
        pred = predict(z, node_mask, edge_mask, t) * std + mean
        return sum(w * pred[:, i] for w, i in terms)

    return f


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_platform(args.platform)

    import jax
    import jax.numpy as jnp

    from gaudi_tpu.eval_chem import analyze_chemical_validity_for_molecules
    from gaudi_tpu.sampling import Sampler, to_molecule_list
    from gaudi_tpu.utils.plotting import plot_graph_of_rings

    edm_cfg, edm_trainer = load_edm_from_dir(args.edm_dir)
    pred_cfg, pred_trainer = load_predictor_from_dir(args.predictor_dir)
    features = pred_cfg.data_config().targets
    from gaudi_tpu.data import PropertyDistribution

    prop_dist = PropertyDistribution(pred_trainer.train_ds)

    # scalar score fn (t=0 scoring of finished designs) is always the plain
    # combo; the GUIDANCE target may differ (per-property terms, annealing)
    score_fn = make_target_function(
        args.target,
        pred_trainer.model,
        pred_trainer.state.params,
        prop_dist,
        features,
    )
    target_fn = score_fn
    if args.grad_norm_per_property:
        if args.solver != "ancestral":
            raise SystemExit("--grad-norm-per-property requires the "
                             "ancestral solver")
        target_fn = make_target_function(
            args.target, pred_trainer.model, pred_trainer.state.params,
            prop_dist, features, per_property=True,
        )
    if args.anneal:
        from gaudi_tpu.diffusion.priors import anneal_weight, t_annealed

        mode, _, floor = args.anneal.partition(":")
        floor = float(floor) if floor else 0.0
        if isinstance(target_fn, list):
            # annealing must scale the normalized per-term gradients, so it
            # rides the weight, not the term fn (see guided-step docstring)
            target_fn = [
                (anneal_weight(w, mode, floor), f) for w, f in target_fn
            ]
        else:
            target_fn = t_annealed(target_fn, mode, floor)
    if isinstance(target_fn, list):
        target_fn = tuple(target_fn)  # hashable for the sampler cache

    orientation = edm_cfg.dataset == "hetro"
    sampler = Sampler(edm_trainer.edm, edm_cfg.max_nodes, orientation,
                      dataset=edm_cfg.dataset)
    counts = np.full(args.batch_size, args.n_nodes, np.int64)
    key = jax.random.PRNGKey(args.seed)

    conditional = getattr(edm_trainer, "_ctx_idx", None) is not None
    if not conditional and (args.cfg_weight or args.context_set):
        raise SystemExit(
            "--cfg-weight/--context-set require an EDM trained with "
            "context_features (this --edm-dir model is unconditional)"
        )
    ctx = None
    if conditional:
        from gaudi_tpu.cli.common import draw_context

        ctx = draw_context(
            edm_trainer, counts, np.random.default_rng(args.seed),
            args.context_set,
        )

    print(f"designing {args.batch_size} molecules "
          f"(scale={args.scale}, n_nodes={args.n_nodes}, target={args.target})")
    t0 = time.time()

    def draw(key):
        if conditional and not args.scale:
            # pure conditional/CFG design path (polish runs inside the
            # Sampler so the context flows through)
            return sampler.sample(
                edm_trainer.sampling_params, key, counts, std=args.std,
                n_steps=args.n_steps or None, polish=args.polish,
                polish_t=args.polish_t, polish_noise=args.polish_noise,
                polish_decay=args.polish_decay,
                polish_guide=args.polish_guide,
                polish_guide_scale=args.polish_guide_scale,
                context=ctx, cfg_weight=args.cfg_weight,
                solver=args.solver, solver_order=args.solver_order,
            )
        # classifier guidance; for a conditional EDM the context conditions
        # the denoiser in every guided step (and cfg_weight composes)
        return sampler.sample_guidance(
            edm_trainer.sampling_params, key, target_fn, counts,
            scale=args.scale, std=args.std, n_steps=args.n_steps or None,
            context=ctx, cfg_weight=args.cfg_weight,
            solver=args.solver, solver_order=args.solver_order,
        )

    # Build the (jitted) polish step ONCE so the warm-timing run hits the
    # jit cache instead of re-tracing a fresh closure.
    polish_fn = None
    if args.polish and (args.scale or not conditional):
        guide_fn = None
        if args.polish_guide and args.polish_guide_scale:
            from gaudi_tpu.diffusion.priors import get_prior

            guide_fn = get_prior(
                args.polish_guide, dataset=edm_cfg.dataset,
                max_nodes=edm_cfg.max_nodes, orientation=orientation,
                norm_x=edm_trainer.edm.norm_values[0],
            )

        polish_edm = edm_trainer.edm
        if conditional and args.cfg_weight:
            from gaudi_tpu.diffusion.cfg import with_cfg

            # polish with the same CFG-combined score the sampler used
            polish_edm = with_cfg(edm_trainer.edm, args.cfg_weight)

        @jax.jit
        def polish_fn(params, key, x, h, node_mask, edge_mask):
            node_ctx = None
            if conditional:
                from gaudi_tpu.diffusion.cfg import build_context

                node_ctx = build_context(
                    jnp.asarray(ctx, jnp.float32), node_mask
                )
            return polish_edm.polish(
                params, key, x, h, node_mask, edge_mask,
                t_start=args.polish_t, rounds=args.polish,
                noise_scale=args.polish_noise, t_decay=args.polish_decay,
                guide_fn=guide_fn, guide_scale=args.polish_guide_scale,
                context=node_ctx,
            )

    def pipeline(key):
        x, h, node_mask, edge_mask = draw(key)
        # the pure conditional path already polished inside the Sampler
        if polish_fn is not None:
            x, h = polish_fn(
                edm_trainer.sampling_params,
                jax.random.fold_in(key, 7), x, h, node_mask, edge_mask,
            )
        jax.block_until_ready(x)
        return x, h, node_mask, edge_mask

    if args.profile:
        from gaudi_tpu.utils.profiling import device_trace

        with device_trace(args.profile):
            x, h, node_mask, edge_mask = pipeline(key)
    else:
        x, h, node_mask, edge_mask = pipeline(key)
    gen_secs = time.time() - t0
    print(f"generated {args.batch_size} molecules in {gen_secs:.2f}s "
          f"({args.batch_size/gen_secs:.1f} mol/s)")

    # Cold/warm split (first call pays the XLA compile; steady-state
    # throughput is what a serve deployment sees): one extra warm run on a
    # fresh key — its samples are discarded, only the wall-clock is kept.
    warm_secs = warm_mol_per_s = compile_s = None
    if not args.no_warm_timing and not args.profile:
        tw = time.time()
        pipeline(jax.random.PRNGKey(args.seed + 1009))
        warm_secs = time.time() - tw
        warm_mol_per_s = args.batch_size / warm_secs
        compile_s = max(gen_secs - warm_secs, 0.0)
        print(f"warm run: {warm_secs:.2f}s ({warm_mol_per_s:.1f} mol/s "
              f"steady-state; compile+first-run overhead {compile_s:.1f}s)")

    # score at t=0 (reference predict/get_target_function_values, :33-66)
    @jax.jit
    def score(x, h, node_mask, edge_mask):
        xs, hs, _ = edm_trainer.edm.normalize(x, h, node_mask)
        z = jnp.concatenate([xs, hs], axis=-1)
        t = jnp.zeros((x.shape[0], 1))
        values = score_fn(z, node_mask, edge_mask, t)
        pred = pred_trainer.model.apply(
            pred_trainer.state.params, z, node_mask, edge_mask, t
        )
        return values, pred

    values, pred = score(x, h, node_mask, edge_mask)
    values = np.asarray(values)
    pred_un = prop_dist.unnormalize(np.asarray(pred))
    print(f"mean target value: {values.mean():.4f}")

    # validity filter
    mols = to_molecule_list(x, h, node_mask, orientation, edm_cfg.max_nodes)
    cd = analyze_chemical_validity_for_molecules(
        mols, dataset=edm_cfg.dataset, n_workers=args.eval_workers
    )
    valid = np.asarray(cd["molecule_valid_bool"])
    print(f"valid: {valid.mean():.2%} of {len(mols)}")
    if valid.any():
        print(f"mean target value (valid): {values[valid].mean():.4f}")

    os.makedirs(args.out_dir, exist_ok=True)
    stamp = time.strftime("%m%d_%H%M%S")
    run_dir = os.path.join(args.out_dir, f"{stamp}_{args.scale}")
    os.makedirs(run_dir, exist_ok=True)

    best = int(values.argmin())
    plot_graph_of_rings(
        mols[best][0], mols[best][1], f"{run_dir}/all.png",
        dataset=edm_cfg.dataset,
        title=f"{values[best]:.3f} | " + ", ".join(f"{v:.2f}" for v in pred_un[best]),
    )

    valid_order = np.argsort(np.where(valid, values, np.inf))
    results = []
    for rank in range(min(args.top_k, int(valid.sum()))):
        i = int(valid_order[rank])
        print(f"top-{rank}: target={values[i]:.4f} pred={pred_un[i]}")
        title = f"{values[i]:.3f} | " + ", ".join(f"{v:.2f}" for v in pred_un[i])
        plot_graph_of_rings(
            mols[i][0], mols[i][1], f"{run_dir}/{rank}.png",
            dataset=edm_cfg.dataset, title=title,
        )
        # molecule-level drawing of each top pick — the reference draws
        # every top-5 molecule as an RDKit structure next to its ring
        # graph (generation_guidance.py:159-179). RDKit Draw when rdkit is
        # importable; the matplotlib atom-graph rendering otherwise.
        try:
            from gaudi_tpu.utils.plotting import plot_rdkit

            drew = plot_rdkit(
                mols[i][0], mols[i][1], f"{run_dir}/mol_{rank}.png",
                dataset=edm_cfg.dataset, title=title,
            )
            if not drew:
                from gaudi_tpu.eval_chem.gor2goa import gor2goa
                from gaudi_tpu.utils.plotting import plot_molecule_atoms

                pos2, atom_types, bonds = gor2goa(
                    mols[i][0], mols[i][1], dataset=edm_cfg.dataset
                )
                plot_molecule_atoms(
                    pos2, atom_types, bonds, f"{run_dir}/mol_{rank}.png",
                    dataset=edm_cfg.dataset, title=title,
                )
        except Exception:
            pass  # invalid geometry: ring plot above still saved
        results.append({"target": float(values[i]), "pred": pred_un[i].tolist()})

    # target-value histogram over the batch (generation_guidance.py:183-185)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(5, 3.5))
        plt.hist(values, bins=40, density=True, alpha=0.5, label="all")
        if valid.any():
            plt.hist(values[valid], bins=40, density=True, alpha=0.5,
                     label="valid")
        plt.xlabel("target value")
        plt.ylabel("density")
        plt.legend()
        plt.tight_layout()
        plt.savefig(f"{run_dir}/target_hist.png", dpi=120)
        plt.close()
    except Exception:
        pass

    return {
        "gen_seconds": gen_secs,
        "compile_s": compile_s,
        "warm_mol_per_s": warm_mol_per_s,
        "mol_valid": cd["mol_valid"],
        "mean_target": float(values.mean()),
        "top": results,
        "run_dir": run_dir,
    }


if __name__ == "__main__":
    main()
