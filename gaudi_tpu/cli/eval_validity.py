"""Sample unconditional molecules and report stability/validity metrics.

Usage:
    python -m gaudi_tpu.cli.eval_validity --exp-dir summary/my-run \
        --n-samples 1000

Reference counterpart: eval_validity.py (Table-1 reproduction).
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from gaudi_tpu.cli.common import load_edm_from_dir, setup_platform


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp-dir", required=True)
    p.add_argument("--n-samples", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=0, help="0 = n_samples")
    p.add_argument("--std", type=float, default=0.7)
    p.add_argument("--n-steps", type=int, default=0,
                   help="0 = full T reverse steps (reference; 25 ODE steps "
                        "under --solver dpmpp); K < T uses the strided "
                        "few-step sampler (~T/K speedup)")
    p.add_argument("--solver", default="ancestral",
                   choices=["ancestral", "dpmpp"],
                   help="dpmpp = DPM-Solver++(2M) PF-ODE integrator "
                        "(diffusion/solvers.py): quality holds at "
                        "--n-steps 10-25 denoiser calls")
    p.add_argument("--solver-order", type=int, default=2, choices=[1, 2],
                   help="1 = DDIM on the same log-SNR grid")
    p.add_argument("--polish", type=int, default=0,
                   help="SDEdit manifold-projection rounds after sampling "
                        "(beyond-reference quality knob; ~2%% extra compute "
                        "per round)")
    p.add_argument("--polish-t", type=float, default=0.08,
                   help="re-noise level (fraction of T) for --polish")
    p.add_argument("--polish-noise", type=float, default=1.0,
                   help="damping of per-step posterior noise inside polish "
                        "(<1 is DDIM-ward)")
    p.add_argument("--polish-decay", type=float, default=0.6,
                   help="per-round melt-temperature decay for --polish")
    p.add_argument("--polish-guide", default="",
                   help="physics prior from diffusion/priors.py applied "
                        "inside polish rounds (e.g. 'planarity')")
    p.add_argument("--polish-guide-scale", type=float, default=0.0)
    p.add_argument("--guide-predictor-dir", default="",
                   help="sample with classifier guidance from this trained "
                        "predictor instead of unconditionally (e.g. a "
                        "validity classifier trained on labeled synthetic "
                        "data)")
    p.add_argument("--guide-target", default="max:VALID",
                   help="target spec for --guide-predictor-dir "
                        "(generate.py syntax)")
    p.add_argument("--guide-scale", type=float, default=1.0)
    p.add_argument("--guide-t-window", type=float, default=0.0,
                   help="apply classifier guidance only below this t "
                        "fraction (diffusion/priors.py t_windowed)")
    p.add_argument("--cfg-weight", type=float, default=0.0,
                   help="classifier-free guidance weight for a model trained "
                        "with --context-features (0 = plain conditional "
                        "sampling; contexts drawn from the train-set "
                        "property histograms)")
    p.add_argument("--context-set", default="",
                   help="pin conditioning columns to fixed raw values, e.g. "
                        "'VALID=1' (others still drawn from the histograms)")
    p.add_argument("--guide-prob", action="store_true",
                   help="guide on sigmoid of the head (gradient self-damps "
                        "where the classifier is confident; for BCE-trained "
                        "validity classifiers)")
    p.add_argument("--reject", type=int, default=0,
                   help="rejection-resampling rounds (beyond-reference "
                        "production mode): after sampling, judge each "
                        "molecule on the host and resample the failing "
                        "slots up to N times. First-pass (reference-"
                        "semantics) metrics are always reported alongside.")
    p.add_argument("--reject-criterion", default="valid",
                   choices=["valid", "stable", "both"],
                   help="what a kept molecule must satisfy under --reject: "
                        "chemical validity, geometric stability, or both")
    p.add_argument("--tol", type=float, default=0.1)
    p.add_argument("--novelty", action="store_true")
    p.add_argument("--holdout-csv", default="",
                   help="with --novelty: csv of held-out identities (same "
                        "xyz tree as the train csv); reports how many novel "
                        "samples land in the holdout vs outside the "
                        "generated space")
    p.add_argument("--plots", type=int, default=5, help="save N stable/unstable plots")
    p.add_argument("--chain-gif", action="store_true")
    p.add_argument("--platform", default="")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-workers", type=int, default=8)
    p.add_argument("--dp", action="store_true", help="shard sampling over all devices")
    p.add_argument("--profile", default="", help="capture a jax.profiler trace to this dir")
    return p


def make_drawer(
    trainer, batch_size, std, mesh=None, n_steps=None,
    polish=0, polish_t=0.08, polish_noise=1.0, polish_decay=0.6,
    polish_guide="", polish_guide_scale=0.0,
    target_fn=None, guide_scale=0.0, cfg_weight=0.0, context_set="",
    solver="ancestral", solver_order=2,
):
    """Build a reusable ``draw(n, seed) -> (molecules, seconds)`` closure.

    The Sampler (and the jitted guided-polish program) is constructed
    once and shared across calls: rejection-resampling rounds then hit
    the instance-level jit caches instead of re-tracing the T-step
    reverse-diffusion program every round.

    With target_fn/guide_scale set, samples through the guidance engine
    (classifier guidance, e.g. toward a validity classifier) instead of
    unconditionally; polish still applies afterwards.
    """
    import jax

    from gaudi_tpu.sampling import Sampler, to_molecule_list

    cfg = trainer.cfg
    sampler = Sampler(trainer.edm, cfg.max_nodes, cfg.dataset == "hetro",
                      mesh=mesh, dataset=cfg.dataset)

    guided = target_fn is not None and guide_scale
    # Conditional model (EDMConfig.context_features): contexts are drawn from
    # the per-node-count property histograms; cfg_weight applies
    # classifier-free guidance (diffusion/cfg.py).
    conditional = getattr(trainer, "_ctx_idx", None) is not None
    if not conditional and (cfg_weight or context_set):
        # fail loudly: in an unattended sweep a silently-ignored flag would
        # produce five identical "conditional" evals
        raise ValueError(
            "--cfg-weight/--context-set require a model trained with "
            "context_features (this exp dir's model is unconditional)"
        )
    polish_fn = None
    if guided and polish:
        pg_fn = None
        if polish_guide and polish_guide_scale:
            from gaudi_tpu.diffusion.priors import get_prior

            pg_fn = get_prior(
                polish_guide, dataset=cfg.dataset, max_nodes=cfg.max_nodes,
                orientation=cfg.dataset == "hetro",
                norm_x=trainer.edm.norm_values[0],
            )

        from gaudi_tpu.diffusion.cfg import build_context, with_cfg

        # polish must denoise with the SAME score the sampler used —
        # including the CFG combination (the unguided path wraps edm
        # inside Sampler._jit_sample; mirror it here)
        polish_edm = (
            with_cfg(trainer.edm, cfg_weight)
            if conditional and cfg_weight else trainer.edm
        )

        @jax.jit
        def polish_fn(params, key, x, h, nm, em, y_ctx=None):
            ctx = build_context(y_ctx, nm) if conditional else None
            return polish_edm.polish(
                params, key, x, h, nm, em, t_start=polish_t, rounds=polish,
                noise_scale=polish_noise, t_decay=polish_decay,
                guide_fn=pg_fn, guide_scale=polish_guide_scale, context=ctx,
            )

    def draw(n_samples, seed):
        rng = np.random.default_rng(seed)
        key = jax.random.PRNGKey(seed)
        mols = []
        t0 = time.time()
        remaining = n_samples
        while remaining > 0:
            b = min(batch_size, remaining)
            counts = trainer.nodes_dist.sample(batch_size, rng)
            key, sub = jax.random.split(key)
            ctx = None
            if conditional:
                from gaudi_tpu.cli.common import draw_context

                ctx = draw_context(trainer, counts, rng, context_set)
            if guided:
                x, h, node_mask, em = sampler.sample_guidance(
                    trainer.sampling_params, sub, target_fn, counts,
                    scale=guide_scale, std=std, n_steps=n_steps,
                    context=ctx, cfg_weight=cfg_weight,
                    solver=solver, solver_order=solver_order,
                )
                if polish_fn is not None:
                    key, kp = jax.random.split(key)
                    pargs = (ctx,) if conditional else ()
                    x, h = polish_fn(
                        trainer.sampling_params, kp, x, h, node_mask, em,
                        *pargs,
                    )
            else:
                x, h, node_mask, _ = sampler.sample(
                    trainer.sampling_params, sub, counts, std, n_steps=n_steps,
                    polish=polish, polish_t=polish_t,
                    polish_noise=polish_noise, polish_decay=polish_decay,
                    polish_guide=polish_guide,
                    polish_guide_scale=polish_guide_scale,
                    context=ctx, cfg_weight=cfg_weight,
                    solver=solver, solver_order=solver_order,
                )
            jax.block_until_ready(x)
            mols += to_molecule_list(
                x[:b], h[:b], node_mask[:b],
                orientation=cfg.dataset == "hetro", max_nodes=cfg.max_nodes,
            )
            remaining -= b
        return mols, time.time() - t0

    return draw


def sample_molecules(trainer, n_samples, batch_size, std, seed=0, **kwargs):
    """One-shot draw; see make_drawer for the reusable form and kwargs."""
    return make_drawer(trainer, batch_size, std, **kwargs)(n_samples, seed)


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_platform(args.platform)

    from gaudi_tpu.eval_chem import (
        analyze_chemical_validity_for_molecules,
        analyze_validity_for_molecules,
    )

    cfg, trainer = load_edm_from_dir(args.exp_dir)
    target_fn = None
    if args.guide_predictor_dir:
        from gaudi_tpu.cli.common import load_predictor_from_dir
        from gaudi_tpu.cli.generate import make_target_function
        from gaudi_tpu.data import PropertyDistribution

        pred_cfg, pred_trainer = load_predictor_from_dir(args.guide_predictor_dir)
        target_fn = make_target_function(
            args.guide_target, pred_trainer.model, pred_trainer.state.params,
            PropertyDistribution(pred_trainer.train_ds),
            pred_cfg.data_config().targets,
        )
        if args.guide_prob:
            import jax.nn as _nn

            base_fn = target_fn

            def target_fn(z, nm, em, t):
                # make_target_function("max:F") returns -F (minimized);
                # -sigmoid(-(-logit)) keeps "maximize p" semantics
                return -_nn.sigmoid(-base_fn(z, nm, em, t))

        if args.guide_t_window:
            from gaudi_tpu.diffusion.priors import t_windowed

            target_fn = t_windowed(target_fn, args.guide_t_window)
    mesh = None
    if args.dp:
        import jax as _jax

        if len(_jax.devices()) > 1:
            from gaudi_tpu.parallel import create_mesh

            mesh = create_mesh()
    batch = args.batch_size or args.n_samples

    draw = make_drawer(
        trainer, batch, args.std, mesh=mesh,
        n_steps=args.n_steps or None,
        polish=args.polish, polish_t=args.polish_t,
        polish_noise=args.polish_noise, polish_decay=args.polish_decay,
        polish_guide=args.polish_guide,
        polish_guide_scale=args.polish_guide_scale,
        target_fn=target_fn, guide_scale=args.guide_scale,
        cfg_weight=args.cfg_weight, context_set=args.context_set,
        solver=args.solver, solver_order=args.solver_order,
    )

    if args.profile:
        from gaudi_tpu.utils.profiling import device_trace

        with device_trace(args.profile):
            mols, secs = draw(args.n_samples, args.seed)
    else:
        mols, secs = draw(args.n_samples, args.seed)
    print(f"sampled {len(mols)} molecules in {secs:.2f}s "
          f"({len(mols)/secs:.1f} mol/s)")

    train_ids = None
    if args.novelty:
        # disk-cached next to the geometry cache: warm calls are instant.
        # chem_identities() is row-aligned ("" for judge-invalid rows);
        # drop the empties so they never enter the novelty reference set.
        train_ids = [
            i for i in trainer.train_ds.chem_identities(args.eval_workers) if i
        ]

    def evaluate(ms, ids=None):
        sd, _ = analyze_validity_for_molecules(ms, tol=args.tol, dataset=cfg.dataset)
        chem = analyze_chemical_validity_for_molecules(
            ms, tol=args.tol, dataset=cfg.dataset,
            train_identities=ids, n_workers=args.eval_workers,
        )
        return sd, chem

    def failing(sd, chem):
        stable_ok = sd["molecule_stable_bool"]
        valid_ok = chem["molecule_valid_bool"]
        if args.reject_criterion == "valid":
            keep = valid_ok
        elif args.reject_criterion == "stable":
            keep = stable_ok
        else:
            keep = [s and v for s, v in zip(stable_ok, valid_ok)]
        return [i for i, ok in enumerate(keep) if not ok]

    t0 = time.time()
    vd, cd = evaluate(mols, train_ids)
    first_pass = {"stability": vd, "chemistry": cd}
    print("stability:", {k: round(v, 4) for k, v in vd.items()
                         if k != "molecule_stable_bool"})
    print("chemistry:", {k: round(v, 4) for k, v in cd.items()
                         if isinstance(v, float)})
    print(f"eval wall-clock: {time.time()-t0:.2f}s")

    if args.holdout_csv and train_ids is not None:
        # Where do the NOVEL identities land? With an identity-holdout
        # train/holdout split (scripts/r10_train.sh stage A0), novel
        # samples recovered from the held-out 55% are direct evidence of
        # generalization beyond the training identities (VERDICT r4
        # next-step #5); "outside" identities are new even to the
        # generator's saturated enumeration.
        from gaudi_tpu.cli.common import holdout_identity_set

        hold = holdout_identity_set(
            args.holdout_csv, cfg.dataset, n_workers=args.eval_workers
        )
        sample_ids = set(cd.get("valid_identity", [])) - {""}
        train_set = set(train_ids)
        novel = sample_ids - train_set
        in_hold = novel & hold
        print("novelty split:", {
            "sampled_identities": len(sample_ids),
            "novel_vs_train": len(novel),
            "novel_in_holdout": len(in_hold),
            "novel_outside_generated_space": len(novel - hold),
            "holdout_size": len(hold),
            "holdout_recovered_frac": round(len(in_hold) / max(len(hold), 1), 4),
        })

    reject_stats = None
    if args.reject:
        # Production rejection-resampling: redraw with fresh keys and fill
        # failing slots from fresh molecules that PASS the criterion (a
        # slot is never swapped for another failing molecule, so no metric
        # can regress). The reference's own design driver discards invalid
        # molecules before scoring (generation_guidance.py:69-80); this
        # makes the same filter a yield-preserving sampler mode with
        # honestly measured device overhead: static shapes mean the device
        # computes a full batch per chunk regardless of how many are kept,
        # so accounting is in device batches, not retained molecules.
        total_device = -(-args.n_samples // batch) * batch
        bad = failing(vd, cd)
        rounds_used = 0
        for r in range(args.reject):
            if not bad:
                break
            rounds_used = r + 1
            # a full device chunk is computed either way; judging extra
            # fresh molecules on the host buys pool depth for the fill
            n_fresh = min(batch, max(4 * len(bad), 32))
            fresh, secs_r = draw(n_fresh, args.seed + 7919 * rounds_used)
            secs += secs_r
            total_device += -(-n_fresh // batch) * batch
            sd_f, cd_f = evaluate(fresh)
            fail_f = set(failing(sd_f, cd_f))
            pool = [j for j in range(len(fresh)) if j not in fail_f]
            for i, j in zip(bad, pool):
                mols[i] = fresh[j]
            bad = bad[len(pool):]
        if rounds_used:
            vd, cd = evaluate(mols, train_ids)
        reject_stats = {
            "criterion": args.reject_criterion,
            "rounds_used": rounds_used,
            "device_sampled": total_device,
            "oversampling_factor": total_device / max(args.n_samples, 1),
            "unresolved": len(bad),
        }
        print("post-rejection stability:",
              {k: round(v, 4) for k, v in vd.items()
               if k != "molecule_stable_bool"})
        print("post-rejection chemistry:",
              {k: round(v, 4) for k, v in cd.items() if isinstance(v, float)})
        print("rejection:", reject_stats)

    if args.plots:
        from gaudi_tpu.utils.plotting import plot_graph_of_rings

        flags = vd["molecule_stable_bool"]
        stable_idx = [i for i, s in enumerate(flags) if s][: args.plots]
        unstable_idx = [i for i, s in enumerate(flags) if not s][: args.plots]
        for tag, idxs in (("stable", stable_idx), ("unstable", unstable_idx)):
            for i in idxs:
                plot_graph_of_rings(
                    mols[i][0], mols[i][1],
                    filename=f"{args.exp_dir}/eval/{tag}_{i}.png",
                    dataset=cfg.dataset,
                )

    if args.chain_gif:
        import jax

        from gaudi_tpu.sampling import Sampler
        from gaudi_tpu.utils.plotting import plot_chain

        sampler = Sampler(trainer.edm, cfg.max_nodes, cfg.dataset == "hetro",
                          dataset=cfg.dataset)
        from gaudi_tpu.cli.common import draw_context

        chain_ctx = draw_context(
            trainer, [10], np.random.default_rng(args.seed + 1),
            args.context_set,
        )
        chain = sampler.sample_chain(
            trainer.sampling_params, jax.random.PRNGKey(args.seed + 1),
            std=args.std, n_steps=args.n_steps or None, context=chain_ctx,
            solver=args.solver, solver_order=args.solver_order,
        )
        plot_chain(np.asarray(chain), f"{args.exp_dir}/eval/chain.gif", cfg.dataset)

    out = {"stability": vd, "chemistry": cd, "sampling_seconds": secs}
    if args.reject:
        out["first_pass"] = first_pass
        out["rejection"] = reject_stats
    return out


if __name__ == "__main__":
    main()
