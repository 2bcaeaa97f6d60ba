"""Checkpointing: params + optimizer state + step, via orbax.

Upgrade over the reference, which saves only model weights with no optimizer
state or step counter (train_edm.py:180-183) — so mid-training resume was
impossible. Here `save_checkpoint` persists the full train state and
`load_checkpoint` restores it; the experiment config travels separately as
args.json (gaudi_tpu.config).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def _path(exp_dir: str, name: str) -> str:
    return os.path.abspath(os.path.join(exp_dir, name))


def save_checkpoint(exp_dir: str, state: Any, name: str = "model") -> str:
    """Persist a pytree train state to <exp_dir>/<name>/ (overwrites)."""
    path = _path(exp_dir, name)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(path, state, force=True)
    return path


def load_checkpoint(
    exp_dir: str, target: Optional[Any] = None, name: str = "model"
) -> Any:
    """Restore a pytree train state; `target` provides structure/shapes.

    Restore args are constructed from the target so checkpoints written on
    one device type (e.g. TPU) restore onto another (e.g. CPU) — orbax
    otherwise refuses with a missing-sharding error.
    """
    path = _path(exp_dir, name)
    ckpt = ocp.PyTreeCheckpointer()
    if target is None:
        return ckpt.restore(path)
    restore_args = ocp.checkpoint_utils.construct_restore_args(target)
    try:
        return ckpt.restore(
            path, args=ocp.args.PyTreeRestore(target, restore_args=restore_args)
        )
    except ValueError:
        # optional fields (e.g. ema_params) added/removed since the
        # checkpoint was written — restore the target/disk intersection and
        # keep target values for everything else
        from flax import serialization

        disk_meta = ckpt.metadata(path)
        meta_dict = serialization.to_state_dict(disk_meta)
        state_dict = serialization.to_state_dict(target)

        def prune(t, m):
            """target subtree restricted to keys that exist on disk."""
            if isinstance(t, dict) and isinstance(m, dict):
                return {k: prune(v, m[k]) for k, v in t.items() if k in m}
            return t

        disk_like = prune(state_dict, meta_dict)
        restore_args = ocp.checkpoint_utils.construct_restore_args(disk_like)
        raw = ckpt.restore(
            path, args=ocp.args.PyTreeRestore(disk_like, restore_args=restore_args)
        )

        def merge(t, r):
            if isinstance(t, dict):
                return {
                    k: merge(v, r[k]) if isinstance(r, dict) and k in r else v
                    for k, v in t.items()
                }
            return t if r is None else r

        merged = merge(state_dict, raw)
        return serialization.from_state_dict(target, merged)


def best_val_tracker():
    """Tiny helper reproducing the best-val checkpoint policy
    (train_edm.py:164,180-183)."""
    state = {"best": float("inf"), "epoch": -1}

    def update(val_loss: float, epoch: int) -> bool:
        if val_loss < state["best"]:
            state["best"] = val_loss
            state["epoch"] = epoch
            return True
        return False

    update.state = state
    return update
