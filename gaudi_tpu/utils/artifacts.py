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
structure drift (missing/extra keys raise).

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
) -> str:
    arrays = _flatten(params, "params/")
    if ema_params is not None:
        arrays.update(_flatten(ema_params, "ema/"))
    arrays["__step__"] = np.asarray(int(step), np.int64)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)
    return path


def _fill(tree: Any, flat: dict, prefix: str) -> Any:
    paths, treedef = jax.tree_util.tree_flatten_with_path(tree)
    leaves = []
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
    step = jnp.asarray(int(flat.get("__step__", 0)), jnp.int32)
    return state.replace(params=params, ema_params=ema, step=step)


def artifact_meta(path: str) -> dict:
    with np.load(path) as z:
        if "__meta__" not in z.files:
            return {}
        return json.loads(bytes(z["__meta__"]).decode())
