"""Model-only polish sweep: find the config that crosses 96% mol-stable.

Round-2 plateaued at ~89-91% model-only (polish 5, t=0.15, noise 0.3) on
the r2lt checkpoint; VERDICT r2 next-step #3 asks for >=96% with NO physics
prior (paper Table-1 bar). This sweeps polish depth/temperature/noise on a
trained checkpoint at n per config, prints a ranked table, and emits the
best config as a ready-to-run eval_validity command for the n>=1024
confirmation.

Run: python scripts/polish_sweep.py --exp-dir runs/r4/summary/longrun-edm --n 256
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gaudi_tpu.cli.common import default_compile_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp-dir", required=True)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--std", type=float, default=0.7)
    ap.add_argument("--rounds", default="5,8")
    ap.add_argument("--ts", default="0.10,0.15,0.20")
    ap.add_argument("--noises", default="0.2,0.3")
    ap.add_argument("--out", default="")
    ap.add_argument("--platform", default="",
                    help="e.g. cpu — each grid point compiles its own "
                         "graph, so CPU ranking + one TPU confirmation "
                         "beats 12 remote compiles")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        jax.config.update("jax_compilation_cache_dir", default_compile_cache())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import numpy as np

    from gaudi_tpu.cli.common import load_edm_from_dir
    from gaudi_tpu.eval_chem import (
        analyze_chemical_validity_for_molecules,
        analyze_validity_for_molecules,
    )
    from gaudi_tpu.sampling import Sampler, to_molecule_list

    cfg, trainer = load_edm_from_dir(args.exp_dir)
    sampler = Sampler(trainer.edm, cfg.max_nodes, cfg.dataset == "hetro",
                      dataset=cfg.dataset)
    rng = np.random.default_rng(args.seed)
    counts = trainer.nodes_dist.sample(args.n, rng)

    rows = []
    grid = list(itertools.product(
        [int(x) for x in args.rounds.split(",")],
        [float(x) for x in args.ts.split(",")],
        [float(x) for x in args.noises.split(",")],
    ))
    for k, t, nz in grid:
        t0 = time.time()
        key = jax.random.PRNGKey(args.seed + 1)
        x, h, nm, _ = sampler.sample(
            trainer.sampling_params, key, counts, std=args.std,
            polish=k, polish_t=t, polish_noise=nz, polish_decay=0.6,
        )
        jax.block_until_ready(x)
        mols = to_molecule_list(
            x, h, nm, orientation=cfg.dataset == "hetro",
            max_nodes=cfg.max_nodes,
        )
        vd, _ = analyze_validity_for_molecules(mols, dataset=cfg.dataset)
        cd = analyze_chemical_validity_for_molecules(
            mols, dataset=cfg.dataset, n_workers=8
        )
        row = {
            "polish": k, "t": t, "noise": nz,
            "mol_stable": round(vd["mol_stable"], 4),
            "mol_valid": round(cd["mol_valid"], 4),
            "unique": round(cd["mol_unique"], 4),
            "angels3": round(vd.get("angels3", float("nan")), 4),
            "angels4": round(vd.get("angels4", float("nan")), 4),
            "secs": round(time.time() - t0, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    rows.sort(key=lambda r: (-r["mol_stable"], -r["mol_valid"]))
    best = rows[0]
    print("\nranked (top 5):")
    for r in rows[:5]:
        print(json.dumps(r))
    print(
        "\nconfirmation command:\n"
        f"python -m gaudi_tpu.cli.eval_validity --exp-dir {args.exp_dir} "
        f"--n-samples 1024 --batch-size 512 --plots 0 --std {args.std} "
        f"--polish {best['polish']} --polish-t {best['t']} "
        f"--polish-noise {best['noise']} --polish-decay 0.6"
    )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
