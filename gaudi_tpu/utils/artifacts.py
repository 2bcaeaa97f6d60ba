"""Portable params-only artifacts (.npz) for cross-machine persistence.

Orbax checkpoints (train/checkpoints.py) carry the full train state —
params, optimizer moments, EMA, step — which is right for resume but heavy
and directory-shaped, so it lives under the gitignored runs/ tree and dies
with the VM. This module exports just the weights (live + EMA) as one
compressed .npz that is small enough to commit, letting a trained model
survive infrastructure recycling and load on any backend.

Keys are '/'-joined flax param paths prefixed with 'params/' or 'ema/';
loading matches keys against a freshly initialized state's tree paths, so
the artifact is robust to pytree-registration details but strict about
structure drift in both directions (missing keys raise; unconsumed
param/ema keys raise too).

Artifacts also carry the train-split statistics the weights were trained
with ('stats/' keys + '__stats_json__'): target normalization mean/std,
the node-count histogram, the per-node-count property histograms, and
dataset provenance (row count + content hash). Restoring from an artifact
uses these recorded stats instead of recomputing them from the CSV, so a
committed artifact keeps sampling/eval semantics even after the gitignored
data tree is destroyed or regenerated with a different seed (the round-2
failure mode: EDMTrainer recomputed conditioning normalization from a CSV
that no longer existed).

The reference's analogue is the bare `model.pt` state_dict save
(train_edm.py:180-183); this adds EMA + metadata and stays framework-portable.
"""

from __future__ import annotations

import json
from typing import Any, Optional

import jax
import numpy as np


def _flatten(tree: Any, prefix: str) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = prefix + "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def save_params_npz(
    path: str,
    params: Any,
    ema_params: Optional[Any] = None,
    step: int = 0,
    meta: Optional[dict] = None,
    stats: Optional[tuple] = None,
) -> str:
    """`stats` is the (arrays, meta) pair from collect_dataset_stats; when
    given, the artifact is self-contained for sampling/eval (no CSV read)."""
    arrays = _flatten(params, "params/")
    if ema_params is not None:
        arrays.update(_flatten(ema_params, "ema/"))
    arrays["__step__"] = np.asarray(int(step), np.int64)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    if stats is not None:
        stat_arrays, stat_meta = stats
        for k, v in stat_arrays.items():
            arrays["stats/" + k] = np.asarray(v)
        arrays["__stats_json__"] = np.frombuffer(
            json.dumps(stat_meta).encode(), dtype=np.uint8
        )
    np.savez_compressed(path, **arrays)
    return path


def collect_dataset_stats(train_ds, nodes_dist, prop_dist=None) -> tuple:
    """(arrays, meta) snapshot of everything a trained model's sampling/eval
    path derives from the train split: normalization mean/std, node-count
    histogram, per-node-count property histograms (PropertyDistribution
    state), model input width (n_classes), and CSV provenance.

    The reference derives all of these implicitly from hardcoded dataset
    paths at load time (aromatic_dataloader.py:71-84, models_edm.py:21-58,
    :107-192); recording them with the weights is what makes the artifact
    portable across machines that lack the data tree."""
    import hashlib
    import os

    arrays: dict = {"n_classes": np.asarray(train_ds.n_classes, np.int64)}
    meta: dict = {
        "targets": list(train_ds.cfg.targets),
        "normalize": bool(train_ds.cfg.normalize),
        "train_size": int(len(train_ds)),
    }
    if train_ds.mean is not None:
        arrays["mean"] = np.asarray(train_ds.mean, np.float32)
        arrays["std"] = np.asarray(train_ds.std, np.float32)
    # node-count categorical as parallel arrays (counts/probs both work:
    # NodesDistribution renormalizes)
    arrays["nodes_hist_n"] = np.asarray(nodes_dist.n_nodes, np.int64)
    arrays["nodes_hist_p"] = np.asarray(nodes_dist.prob, np.float64)
    if prop_dist is not None:
        st = prop_dist.state()
        meta["prop_dist"] = {
            "num_bins": st["num_bins"],
            "properties": st["properties"],
            "entries": [
                [p, n] for p in st["properties"] for n in sorted(st["hists"][p])
            ],
        }
        for p in st["properties"]:
            for n, d in st["hists"][p].items():
                arrays[f"prop/{p}/{n}/probs"] = d["probs"]
                arrays[f"prop/{p}/{n}/params"] = np.asarray(
                    d["params"], np.float64
                )
    csv = getattr(train_ds.cfg, "csv_file", "")
    if csv and os.path.exists(csv):
        h = hashlib.sha256()
        with open(csv, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        meta["csv_sha16"] = h.hexdigest()[:16]
        meta["csv_bytes"] = os.path.getsize(csv)
    return arrays, meta


def load_artifact_stats(path: str) -> Optional[dict]:
    """Decode recorded dataset stats from an artifact .npz (or a directory
    containing weights.npz). Returns None when the artifact predates stats
    (round-2 exports) or the path isn't an artifact."""
    import os

    if os.path.isdir(path):
        path = os.path.join(path, "weights.npz")
    if not os.path.exists(path) or not path.endswith(".npz"):
        return None
    with np.load(path) as z:
        if "__stats_json__" not in z.files:
            return None
        meta = json.loads(bytes(z["__stats_json__"]).decode())
        arrays = {
            k[len("stats/"):]: z[k] for k in z.files if k.startswith("stats/")
        }
    out = {
        "n_classes": int(arrays["n_classes"]),
        "mean": arrays.get("mean"),
        "std": arrays.get("std"),
        "nodes_hist": {
            int(n): float(p)
            for n, p in zip(arrays["nodes_hist_n"], arrays["nodes_hist_p"])
        },
        "targets": meta["targets"],
        "normalize": meta["normalize"],
        "meta": meta,
        "prop_dist": None,
    }
    pd = meta.get("prop_dist")
    if pd is not None:
        hists: dict = {p: {} for p in pd["properties"]}
        for p, n in pd["entries"]:
            hists[p][int(n)] = {
                "probs": arrays[f"prop/{p}/{n}/probs"],
                "params": tuple(arrays[f"prop/{p}/{n}/params"]),
            }
        out["prop_dist"] = {
            "num_bins": pd["num_bins"],
            "properties": pd["properties"],
            "hists": hists,
            "mean": out["mean"],
            "std": out["std"],
        }
    return out


def _fill(tree: Any, flat: dict, prefix: str) -> Any:
    paths, treedef = jax.tree_util.tree_flatten_with_path(tree)
    leaves = []
    consumed = set()
    for path, leaf in paths:
        key = prefix + "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        if key not in flat:
            raise KeyError(f"artifact missing {key}")
        arr = flat[key]
        if arr.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch at {key}: artifact {arr.shape} vs model {leaf.shape}"
            )
        leaves.append(arr.astype(leaf.dtype))
        consumed.add(key)
    # structure drift in the other direction — the artifact carrying params
    # the model no longer has — must also fail loudly, not load half a net
    leftover = {
        k for k in flat if k.startswith(prefix) and k not in consumed
    }
    if leftover:
        raise KeyError(
            f"artifact has {len(leftover)} unconsumed '{prefix}' keys "
            f"(model shrank or was renamed): {sorted(leftover)[:5]}..."
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_state_npz(path: str, state: Any) -> Any:
    """Fill `state`'s params (+ EMA when both sides have it) from an .npz
    artifact produced by save_params_npz. Optimizer state is left at init —
    artifacts are for sampling/eval/fine-tune-from, not exact resume."""
    import jax.numpy as jnp

    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    params = _fill(state.params, flat, "params/")
    ema = state.ema_params
    if ema is not None:
        if any(k.startswith("ema/") for k in flat):
            ema = _fill(ema, flat, "ema/")
        else:
            ema = jax.tree.map(jnp.copy, params)
    # mirror the target's step dtype so restore never retriggers jit
    # recompilation; the saved step stays available via artifact_meta
    step = jnp.asarray(int(flat.get("__step__", 0)), state.step.dtype)
    return state.replace(params=params, ema_params=ema, step=step)


def artifact_meta(path: str) -> dict:
    with np.load(path) as z:
        if "__meta__" not in z.files:
            return {}
        return json.loads(bytes(z["__meta__"]).decode())
