#!/usr/bin/env python
"""Oracle-measured dose-response probe for property-conditioned (CFG) design.

Samples from a GAP-conditioned EDM at several pinned `GAP_eV` targets and
CFG weights, converts each generated ring-graph to its atom graph
(gor2goa), and recomputes the Hueckel tight-binding gap from the resulting
carbon skeleton — the SAME oracle that labeled the training data
(data/synthetic.py:_huckel_targets), minus its 0.02 eV label noise. A
working conditional model must show achieved oracle GAP tracking the
requested target monotonically; this is the conditional-EDM analogue of
the reference's predictor-guided design loop
(/root/reference/generation_guidance.py:83-184), judged by ground truth
instead of a learned predictor.

Emits one JSON line per arm:
  {"target": v|null, "cfg_weight": w, "n": n, "mol_valid": f,
   "oracle_gap_mean": m, "oracle_gap_std": s, "n_oracle": k}
plus control arms: histogram-drawn context (target=null) and the
dataset ground-truth oracle distribution.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def oracle_gap(pos, type_idx, bonds, elements) -> float:
    """Hueckel gap (eV) from an atom graph (heavy atoms + explicit bonds).

    Mirrors data/synthetic.py:_huckel_targets but builds the adjacency from
    gor2goa's explicit bond list instead of idealized distances, so it is
    exact on template-snapped geometry.
    """
    import numpy as np

    from gaudi_tpu.data.synthetic import HUCKEL_BETA_EV

    on_site = {"C": 0.0, "N": 0.5, "B": -0.45, "O": 1.0, "S": 0.6}
    heavy = [i for i in range(len(type_idx)) if elements[type_idx[i]] != "H"]
    if len(heavy) < 2:
        return float("nan")
    remap = {a: j for j, a in enumerate(heavy)}
    n = len(heavy)
    h = np.zeros((n, n))
    for a, b in bonds:
        if a in remap and b in remap:
            h[remap[a], remap[b]] = h[remap[b], remap[a]] = 1.0
    for j, a in enumerate(heavy):
        h[j, j] = on_site[elements[type_idx[a]]]
    ev = np.linalg.eigvalsh(h)[::-1]
    n_occ = n // 2
    if n_occ < 1 or n_occ >= n:
        return float("nan")
    return float((ev[n_occ - 1] - ev[n_occ]) * HUCKEL_BETA_EV)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp-dir", required=True)
    ap.add_argument("--targets", default="1.0,1.7,2.4",
                    help="comma list of raw GAP_eV values to pin")
    ap.add_argument("--cfg-weights", default="0,1,2")
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--n-steps", type=int, default=60)
    ap.add_argument("--std", type=float, default=0.7)
    ap.add_argument("--seed", type=int, default=31)
    ap.add_argument("--platform", default="")
    ap.add_argument("--guide-predictor-dir", default="",
                    help="also run classifier-guidance arms (eq:GAP_eV=v "
                         "targets through this trained predictor) at the "
                         "same targets, judged by the same oracle — the "
                         "reference-style design path for comparison")
    ap.add_argument("--guide-scale", type=float, default=0.6)
    args = ap.parse_args(argv)

    from gaudi_tpu.cli.common import (
        draw_context,
        load_edm_from_dir,
        setup_platform,
    )

    setup_platform(args.platform)

    import jax
    import numpy as np

    from gaudi_tpu.data.rings import ATOMS_LIST
    from gaudi_tpu.eval_chem import analyze_chemical_validity_for_molecules
    from gaudi_tpu.eval_chem.gor2goa import gor2goa
    from gaudi_tpu.sampling import Sampler, to_molecule_list

    cfg, trainer = load_edm_from_dir(args.exp_dir)
    if getattr(trainer, "_ctx_idx", None) is None:
        raise SystemExit(f"{args.exp_dir} is not a conditional model")
    sampler = Sampler(trainer.edm, cfg.max_nodes, cfg.dataset == "hetro")
    elements = ATOMS_LIST[cfg.dataset]  # gor2goa type_idx vocabulary

    guide_fn_for = None
    if args.guide_predictor_dir:
        from gaudi_tpu.cli.common import load_predictor_from_dir
        from gaudi_tpu.cli.generate import make_target_function
        from gaudi_tpu.data import PropertyDistribution

        pcfg, ptr = load_predictor_from_dir(args.guide_predictor_dir)
        pfeats = pcfg.data_config().targets
        ppd = PropertyDistribution(ptr.train_ds)

        def guide_fn_for(v):
            return make_target_function(
                f"eq:GAP_eV={v}", ptr.model, ptr.state.params, ppd, pfeats
            )

    def one_arm(target, weight, seed, guided=False):
        rng = np.random.default_rng(seed)
        counts = trainer.nodes_dist.sample(args.n, rng)
        cset = "" if target is None else f"GAP_eV={target}"
        ctx = draw_context(trainer, counts, rng, cset)
        if guided:
            # classifier-guidance arm: eq-target through the predictor,
            # no conditioning signal (histogram context, weight 0)
            hist_ctx = draw_context(trainer, counts, rng, "")
            x, h, node_mask, _ = sampler.sample_guidance(
                trainer.sampling_params, jax.random.PRNGKey(seed),
                guide_fn_for(target), counts, scale=args.guide_scale,
                std=args.std, n_steps=args.n_steps, context=hist_ctx,
            )
        else:
            x, h, node_mask, _ = sampler.sample(
                trainer.sampling_params, jax.random.PRNGKey(seed), counts,
                std=args.std, n_steps=args.n_steps, context=ctx,
                cfg_weight=weight,
            )
        jax.block_until_ready(x)
        mols = to_molecule_list(
            x, h, node_mask, orientation=cfg.dataset == "hetro",
            max_nodes=cfg.max_nodes,
        )
        chem = analyze_chemical_validity_for_molecules(
            mols, dataset=cfg.dataset
        )
        gaps = []
        for (pos, types), ok in zip(mols, chem["molecule_valid_bool"]):
            if not ok:
                continue
            try:
                gpos, gtypes, gbonds = gor2goa(
                    np.asarray(pos), np.asarray(types), cfg.dataset
                )
            except Exception:
                continue
            g = oracle_gap(gpos, gtypes, gbonds, elements)
            if np.isfinite(g):
                gaps.append(g)
        return {
            "target": target,
            "cfg_weight": weight,
            "guided": bool(guided),
            "n": args.n,
            "mol_valid": round(float(chem["mol_valid"]), 4),
            "oracle_gap_mean": round(float(np.mean(gaps)), 4) if gaps else None,
            "oracle_gap_std": round(float(np.std(gaps)), 4) if gaps else None,
            "mae_vs_target": round(
                float(np.mean(np.abs(np.array(gaps) - target))), 4
            ) if gaps and target is not None else None,
            "n_oracle": len(gaps),
        }

    t0 = time.time()
    targets = [float(v) for v in args.targets.split(",") if v]
    weights = [float(w) for w in args.cfg_weights.split(",") if w != ""]
    # histogram-context control: what the marginal conditional model does
    print(json.dumps(one_arm(None, 0.0, args.seed)), flush=True)
    for w in weights:
        for v in targets:
            out = one_arm(v, w, args.seed + int(100 * v) + int(10 * w) + 1)
            print(json.dumps(out), flush=True)
    if guide_fn_for is not None:
        for v in targets:
            out = one_arm(v, 0.0, args.seed + int(100 * v) + 7, guided=True)
            print(json.dumps(out), flush=True)
    # ground-truth oracle distribution on the train CSV, for scale
    import pandas as pd

    df = pd.read_csv(cfg.csv_file)
    print(json.dumps({
        "target": "dataset",
        "oracle_gap_mean": round(float(df["GAP_eV"].mean()), 4),
        "oracle_gap_std": round(float(df["GAP_eV"].std()), 4),
        "n_oracle": len(df),
    }), flush=True)
    print(json.dumps({"probe_secs": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
