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

    Known structure break (documented, not papered over): the lr-warmup
    change wrapped the lr in an optax schedule even when warmup is off,
    which adds a ScaleByScheduleState count leaf to the optimizer state.
    Orbax checkpoints written BEFORE that commit (round ≤4 session 1) no
    longer restore into the new state template and raise ValueError after
    the ema_params retry below also fails. No such checkpoints survive
    (the runs/ tree predating the change was lost to a VM recycle); if one
    ever resurfaces, restore its weights via the portable .npz artifact
    path instead of the orbax tree.
    """
    if not exp_dir.endswith(".npz") and not os.path.exists(
        _path(exp_dir, name)
    ) and os.path.exists(_path(exp_dir, "weights.npz")):
        # committed artifact dir (args.json + weights.npz, no orbax state)
        exp_dir = _path(exp_dir, "weights.npz")
    if exp_dir.endswith(".npz"):
        # portable params-only artifact (utils/artifacts.py) — loads the
        # weights into `target`, optimizer state stays at init
        from gaudi_tpu.utils.artifacts import load_state_npz

        if target is None:
            raise ValueError("npz artifact restore requires a target state")
        return load_state_npz(exp_dir, target)
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
        # Known structure drift: `ema_params` was enabled after the
        # checkpoint was written (or vice versa). Retry with the matching
        # structure and fill the EMA tree from the restored params.
        import jax
        import jax.numpy as jnp

        if getattr(target, "ema_params", None) is None:
            raise
        bare = target.replace(ema_params=None)
        restored = load_checkpoint(exp_dir, bare, name)
        return restored.replace(
            ema_params=jax.tree.map(jnp.copy, restored.params)
        )


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
