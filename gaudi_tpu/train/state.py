"""Train state pytree shared by both trainers."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array

    @classmethod
    def create(cls, params, optimizer):
        import jax.numpy as jnp

        return cls(
            params=params,
            opt_state=optimizer.init(params),
            step=jnp.array(0, jnp.int32),
        )
