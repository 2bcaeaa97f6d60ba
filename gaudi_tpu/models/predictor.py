"""Time-conditioned EGNN property predictor (dense, masked).

TPU-first redesign of the reference's predictor stack
(reference: edm/egnn_predictor/models.py:390-560, edm/egnn_predictor/gcl.py:157-316).
The predictor's layer (`E_GCL`) differs from the diffusion trunk's in four
live ways, all reproduced here:

1. the edge MLP additionally sees the *current* squared distance alongside the
   initial squared-distance edge attribute (gcl.py:225-229, models.py:452);
2. the coordinate gate is an MLP on the *message* (H -> H -> 1), not on
   [h_i, h_j, e_ij] (gcl.py:252-259);
3. coordinates are updated *before* node features within a layer
   (gcl.py:291-299);
4. the tanh clamp range is coords_range / n_layers (models.py:515).

The graph-level readout is a mean over the *padded* node axis
(models.py:456-457) — a reference quirk (divides by max_nodes, not the true
node count). It is self-consistent between training and guidance, so we
reproduce it exactly; `mean_over_real_nodes=True` opts into the fixed version.

Same dense/masked/split-weight design notes as gaudi_tpu.models.egnn.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from gaudi_tpu.models.egnn import (
    EDGE_LOGICAL_AXES,
    TORCH_LINEAR_INIT,
    EdgeMLPIn,
    _small_init,
    coord2diff,
)


class PredictorEGCL(nn.Module):
    """One predictor layer. Mirrors reference E_GCL (gcl.py:157-316)."""

    hidden_nf: int
    attention: bool = True
    tanh: bool = True
    coords_range: float = 1.0
    recurrent: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        h: jax.Array,
        x: jax.Array,
        edge_attr0: jax.Array,
        node_mask: jax.Array,
        edge_mask: jax.Array,
    ) -> tuple[jax.Array, jax.Array]:
        radial, coord_diff = coord2diff(x, norm_constant=1.0)  # gcl.py:308-316
        edge_in = jnp.concatenate([radial, edge_attr0], axis=-1)

        # Edge model (gcl.py:225-238).
        m = EdgeMLPIn(self.hidden_nf, dtype=self.dtype, name="edge_in")(h, edge_in)
        m = nn.with_logical_constraint(m, EDGE_LOGICAL_AXES)
        m = nn.silu(m)
        m = nn.Dense(self.hidden_nf, kernel_init=TORCH_LINEAR_INIT, dtype=self.dtype, name="edge_out")(m)
        m = nn.silu(m)
        if self.attention:
            m = m * nn.sigmoid(nn.Dense(1, kernel_init=TORCH_LINEAR_INIT, dtype=self.dtype, name="att")(m))
        m = m * edge_mask[..., None].astype(m.dtype)

        # Coordinate model first (gcl.py:252-279, 291-297).
        gate = nn.Dense(self.hidden_nf, kernel_init=TORCH_LINEAR_INIT, dtype=self.dtype, name="coord_mid")(m)
        gate = nn.silu(gate)
        gate = nn.Dense(
            1, use_bias=False, kernel_init=_small_init(0.001), dtype=self.dtype,
            name="coord_gate"
        )(gate)
        # coordinate path stays f32 (tiny gate, accumulating positions)
        gate = gate.astype(jnp.float32)
        if self.tanh:
            trans = coord_diff * jnp.tanh(gate) * self.coords_range
        else:
            trans = coord_diff * gate
        trans = trans * edge_mask[..., None]
        x = x + trans.sum(axis=2)

        # Node model (gcl.py:240-250).
        agg = m.sum(axis=2)
        upd = nn.Dense(self.hidden_nf, kernel_init=TORCH_LINEAR_INIT, dtype=self.dtype, name="node_in")(
            jnp.concatenate([h, agg], axis=-1)
        )
        upd = nn.silu(upd)
        upd = nn.Dense(self.hidden_nf, kernel_init=TORCH_LINEAR_INIT, dtype=self.dtype, name="node_out")(upd)
        h = h + upd if self.recurrent else upd

        return h * node_mask.astype(h.dtype), x * node_mask.astype(x.dtype)


class EGNNPredictor(nn.Module):
    """Per-graph property regressor over noisy ring graphs.

    forward(xh, node_mask, edge_mask, t) -> [B, out_nf]. Mirrors reference
    EGNN_predictor.forward (edm/egnn_predictor/models.py:433-457).
    """

    in_nf: int
    out_nf: int
    hidden_nf: int = 196
    n_layers: int = 12
    n_dims: int = 3
    attention: bool = True
    tanh: bool = True
    coords_range: float = 4.0
    condition_time: bool = True
    recurrent: bool = True
    mean_over_real_nodes: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xh: jax.Array,
        node_mask: jax.Array,
        edge_mask: jax.Array,
        t: jax.Array,
    ) -> jax.Array:
        b, n, _ = xh.shape
        x = xh[:, :, : self.n_dims] * node_mask
        h = xh[:, :, self.n_dims :] * node_mask

        if self.condition_time:
            t_arr = jnp.asarray(t, dtype=xh.dtype).reshape(-1, 1, 1)
            h_time = jnp.broadcast_to(t_arr, (b, n, 1))
            h = jnp.concatenate([h, h_time], axis=-1)

        # Initial squared-distance edge attribute (models.py:452).
        edge_attr0, _ = coord2diff(x)
        # coord2diff returns exact squared distances (no eps inside radial).

        h = nn.Dense(self.hidden_nf, kernel_init=TORCH_LINEAR_INIT, dtype=self.dtype, name="embedding")(
            h.astype(self.dtype)
        )
        coords_range_layer = float(self.coords_range) / self.n_layers
        for i in range(self.n_layers):
            h, x = PredictorEGCL(
                hidden_nf=self.hidden_nf,
                attention=self.attention,
                tanh=self.tanh,
                coords_range=coords_range_layer,
                recurrent=self.recurrent,
                dtype=self.dtype,
                name=f"gcl_{i}",
            )(h, x, edge_attr0, node_mask.astype(self.dtype), edge_mask.astype(self.dtype))
        h = nn.Dense(self.out_nf, kernel_init=TORCH_LINEAR_INIT, dtype=self.dtype, name="embedding_out")(h)
        h = h.astype(jnp.float32) * node_mask

        if self.mean_over_real_nodes:
            denom = jnp.clip(node_mask.sum(axis=1), 1, None)
            return h.sum(axis=1) / denom
        return h.mean(axis=1)
