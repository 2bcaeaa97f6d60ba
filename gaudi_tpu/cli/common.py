"""Shared CLI plumbing: platform selection, data resolution, model loading."""

from __future__ import annotations

import argparse
import os


def setup_platform(platform: str = ""):
    """Optionally force the JAX platform (cpu for debugging) and enable the
    persistent compilation cache.

    Note: on machines where a sitecustomize force-registers a TPU backend
    via jax.config, env vars are ignored — jax.config.update is the only
    reliable override. The on-disk compile cache matters on remote-compile
    TPU setups where a fresh T=1000 reverse-scan graph takes minutes.
    """
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    try:
        jax.config.update("jax_compilation_cache_dir", default_compile_cache())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return jax


def default_compile_cache() -> str:
    """Per-user persistent compile-cache dir (GAUDI_COMPILE_CACHE overrides).

    A world-shared fixed /tmp path would let another user pre-create the
    directory (cache poisoning / permission failures on a multi-user host).
    """
    cache = os.environ.get("GAUDI_COMPILE_CACHE")
    if cache:
        return cache
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(base, "gaudi_jax")


def resolve_data(args) -> tuple[str, str]:
    """(csv_file, xyz_root) for the requested dataset.

    Unlike the reference's hardcoded absolute paths
    (data/aromatic_dataloader.py:253-271), data roots come from --data-root
    (default ./data); --synthetic generates a stand-in dataset there when
    the CSV is missing.
    """
    csv_file = args.csv_file or os.path.join(args.data_root, f"{args.dataset}.csv")
    xyz_root = args.xyz_root or os.path.join(args.data_root, f"{args.dataset}-xyz")
    if not os.path.exists(csv_file):
        if getattr(args, "synthetic", 0):
            from gaudi_tpu.data.synthetic import generate_dataset

            os.makedirs(args.data_root, exist_ok=True)
            print(f"generating synthetic {args.dataset} dataset ({args.synthetic} molecules)...")
            generate_dataset(
                args.data_root, args.dataset, n_molecules=args.synthetic, seed=0
            )
        else:
            raise FileNotFoundError(
                f"{csv_file} not found; pass --csv-file/--xyz-root or --synthetic N"
            )
    return csv_file, xyz_root


def add_data_args(p: argparse.ArgumentParser):
    p.add_argument("--dataset", default="cata", choices=["cata", "peri", "hetro"])
    p.add_argument("--data-root", default="data")
    p.add_argument("--csv-file", default="")
    p.add_argument("--xyz-root", default="")
    p.add_argument(
        "--synthetic",
        type=int,
        default=0,
        metavar="N",
        help="generate a synthetic dataset of N molecules if the CSV is missing",
    )
    p.add_argument("--platform", default="", help="force JAX platform (e.g. cpu)")


def load_edm_from_dir(exp_dir: str):
    """Rebuild (cfg, trainer) from an experiment directory (args.json +
    checkpoint) — the reference's get_edm_args + get_model(restore) workflow
    (utils/helpers.py:204-213, models_edm.py:100-102)."""
    from gaudi_tpu.config import EDMConfig
    from gaudi_tpu.train.trainer_edm import EDMTrainer

    cfg = EDMConfig.load(exp_dir)
    return cfg, EDMTrainer(cfg)


def load_predictor_from_dir(exp_dir: str):
    from gaudi_tpu.config import PredictorConfig
    from gaudi_tpu.train.trainer_predictor import PredictorTrainer

    cfg = PredictorConfig.load(exp_dir)
    return cfg, PredictorTrainer(cfg)


def draw_context(trainer, counts, rng, context_set: str = ""):
    """[B, C] normalized conditioning values for a conditional EDM.

    Base draws come from the train-set per-node-count property histograms
    (PropertyDistribution); `context_set` ("COL=V,COL2=V2", raw units)
    pins named columns to fixed values — e.g. "VALID=1" to condition on
    chemical validity. Returns None for unconditional trainers.
    """
    if getattr(trainer, "_ctx_idx", None) is None:
        return None
    import numpy as np

    from gaudi_tpu.train.trainer_edm import context_columns

    y = trainer.prop_dist.sample_batch(np.asarray(counts), rng)
    ctx = y[:, trainer._ctx_idx]
    if context_set:
        fixed = {}
        for kv in context_set.split(","):
            if not kv:
                continue
            k, v = kv.split("=")
            fixed[k.strip()] = float(v)
        cols = context_columns(trainer.cfg)
        unknown = set(fixed) - set(cols)
        if unknown:
            raise ValueError(f"context_set columns {unknown} not in {cols}")
        for j, col in enumerate(cols):
            if col in fixed:
                ti = int(trainer._ctx_idx[j])
                raw = fixed[col]
                if trainer.train_ds.cfg.normalize:
                    raw = (raw - trainer.train_ds.mean[ti]) / trainer.train_ds.std[ti]
                ctx[:, j] = raw
    return ctx


def holdout_identity_set(csv_path: str, dataset: str, n_workers: int = 0):
    """Chemical-identity set of every row in an identity-holdout csv.

    The xyz tree is expected at <csv dir>/<dataset>-xyz (the layout
    scripts/r10_train.sh stage A0 writes). Identities come from the same
    judge that scores samples (eval_chem.metrics), so set membership is
    exact. Disk-cached next to the csv — the first call pays one pass of
    GOR->GOA + judging.
    """
    import numpy as np
    import pandas as pd

    cache = csv_path + ".ids.npz"
    if os.path.exists(cache):
        with np.load(cache) as z:
            return set(z["ids"].tolist()) - {""}

    from gaudi_tpu.data.mol import load_xyz
    from gaudi_tpu.data.rings import extract_ring_graph
    from gaudi_tpu.eval_chem import analyze_chemical_validity_for_molecules

    xyz_root = os.path.join(os.path.dirname(csv_path), f"{dataset}-xyz")
    df = pd.read_csv(csv_path)
    name_col = "name" if "name" in df.columns else "molecule"
    mols = []
    for nm in df[name_col].astype(str):
        path = os.path.join(xyz_root, nm + ".xyz")
        try:
            rg = extract_ring_graph(load_xyz(path), dataset)
            mols.append((rg.centers, rg.ring_types))
        except Exception:
            continue
    d = analyze_chemical_validity_for_molecules(
        mols, dataset=dataset, n_workers=n_workers
    )
    ids = [i for i in d.get("valid_identity", []) if i]
    np.savez_compressed(cache, ids=np.asarray(ids))  # unicode dtype: no pickle
    return set(ids)
