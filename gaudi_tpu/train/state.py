"""Train state pytree shared by both trainers."""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array
    ema_params: Optional[Any] = None  # EMA of params when ema_decay > 0

    @classmethod
    def create(cls, params, optimizer, ema: bool = False):
        import jax.numpy as jnp

        return cls(
            params=params,
            opt_state=optimizer.init(params),
            step=jnp.array(0, jnp.int32),
            # real copies: aliasing params would donate the same buffer twice
            # in the donated train step
            ema_params=jax.tree.map(jnp.copy, params) if ema else None,
        )
