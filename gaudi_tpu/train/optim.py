"""Optimizer stack: AdamW(amsgrad) + device-resident adaptive grad clipping.

The reference clips gradients at 1.5*mean + 2*std of the last 50 global grad
norms, tracked in a host-side Python queue with a .item() sync every step
(edm/utils.py:31-70, train_edm.py:77-79). Here the norm history is a ring
buffer *inside the optax state*, so the entire train step — including the
adaptive threshold — stays jitted and on-device with no host round trips.

Semantics match the reference: the buffer seeds with one large value (3000)
that flushes out; the recorded value is min(norm, threshold).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AdaptiveClipState(NamedTuple):
    norms: jax.Array  # [max_len] ring buffer of recent global norms
    filled: jax.Array  # [] int32 number of valid entries
    cursor: jax.Array  # [] int32 next write position
    last_norm: jax.Array  # [] f32 diagnostic: unclipped norm of latest step


def adaptive_grad_clip(max_len: int = 50, init_value: float = 3000.0):
    """optax transform: clip global norm at 1.5*mean + 2*std of history."""

    def init_fn(params):
        del params
        norms = jnp.zeros((max_len,), jnp.float32).at[0].set(init_value)
        return AdaptiveClipState(
            norms=norms,
            filled=jnp.array(1, jnp.int32),
            cursor=jnp.array(1, jnp.int32),
            last_norm=jnp.array(0.0, jnp.float32),
        )

    def update_fn(updates, state, params=None):
        del params
        mask = (
            jnp.arange(state.norms.shape[0]) < state.filled
        ).astype(jnp.float32)
        denom = jnp.maximum(state.filled.astype(jnp.float32), 1.0)
        mean = (state.norms * mask).sum() / denom
        var = ((state.norms - mean) ** 2 * mask).sum() / denom
        max_norm = 1.5 * mean + 2.0 * jnp.sqrt(var)

        g_norm = optax.global_norm(updates)
        scale = jnp.minimum(1.0, max_norm / (g_norm + 1e-12))
        updates = jax.tree.map(lambda u: u * scale, updates)

        recorded = jnp.minimum(g_norm, max_norm)
        norms = state.norms.at[state.cursor].set(recorded)
        cursor = (state.cursor + 1) % state.norms.shape[0]
        filled = jnp.minimum(state.filled + 1, state.norms.shape[0])
        return updates, AdaptiveClipState(norms, filled, cursor, g_norm)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    lr: float,
    weight_decay: float = 1e-12,
    clip: bool = True,
    max_len: int = 50,
    warmup_steps: int = 0,
) -> optax.GradientTransformation:
    """AdamW with amsgrad (reference train_edm.py:152-154) + adaptive clip.

    `warmup_steps > 0` ramps the lr linearly 0 -> lr over that many steps.
    The reference trains from scratch with a warm optimizer throughout, so
    its runs never need this; it exists for continuations restored from
    weights-only artifacts, where amsgrad's second moments restart at zero
    and a cold step at the full lr visibly damages converged weights
    (measured: a restored cata EDM fell 0.92 -> 0.32 mol_valid within
    1000 steps at lr 3e-4; see QUALITY.md round-4 session 2).
    """
    parts = []
    if clip:
        parts.append(adaptive_grad_clip(max_len))
    # Both branches are schedules so the optax state tree (and therefore
    # orbax checkpoints) has the same shape whether warmup is on or off —
    # a warmup leg's checkpoint restores cleanly into a constant-lr leg.
    schedule = (
        optax.linear_schedule(0.0, lr, warmup_steps)
        if warmup_steps > 0
        else optax.constant_schedule(lr)
    )
    parts += [
        optax.scale_by_amsgrad(),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(schedule),
    ]
    return optax.chain(*parts)


def last_grad_norm(opt_state) -> jax.Array:
    """Unclipped global grad norm of the latest step (diagnostic)."""
    for s in jax.tree.leaves(opt_state, is_leaf=lambda x: isinstance(x, AdaptiveClipState)):
        if isinstance(s, AdaptiveClipState):
            return s.last_norm
    return jnp.array(jnp.nan)
