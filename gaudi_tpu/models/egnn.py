"""Dense masked E(3)-equivariant graph network (diffusion dynamics trunk).

TPU-first redesign of the reference's EGNN (reference: edm/egnn/egnn_new.py,
edm/egnn/models.py). The reference materializes an explicit fully-connected
COO edge list of B*N*N rows and aggregates with `scatter_add_`
(edm/egnn/egnn_new.py:403-421, edm/egnn/models.py:154-175) — a GPU/PyTorch
idiom. Here graphs are tiny (N <= 22) and *fully connected with masks*, so we
keep everything dense: messages live in [B, N, N, H], aggregation is a masked
sum over axis 2, and every op is a static-shape matmul/elementwise op that XLA
tiles straight onto the MXU.

Two deliberate performance departures from a naive translation (both exact
mathematical identities, verified against the reference in
tests/test_parity_torch.py):

1. **Split-weight edge input layer.** The reference computes
   Linear(concat([h_i, h_j, e_ij])) over all N^2 edges — an
   [B*N^2, 2H+E] x [2H+E, H] matmul. We split the weight matrix into its
   source/target/edge-feature blocks: Dense_src(h) and Dense_dst(h) are
   [B*N, H] x [H, H] matmuls (N x fewer rows) broadcast-added across the edge
   grid, and only the (tiny) edge-feature block runs at N^2 rows. This cuts
   first-layer FLOPs by ~2N/1 and, more importantly, HBM traffic.
2. **No self-edge special-casing.** The diagonal is computed and then killed
   by the edge mask, exactly like the reference's mask-multiply — branch-free.

Masking points replicate the reference exactly: messages are multiplied by
edge_mask post-MLP, node features by node_mask post-update, coordinates by
node_mask post-update.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

# compute dtype convention: `dtype` controls activation/matmul precision
# (bfloat16 doubles MXU throughput and halves HBM traffic on TPU); parameters
# always stay float32 (flax param_dtype default), and the diffusion algebra
# upstream/downstream runs float32 — models cast in at entry and cast out at
# exit.

from gaudi_tpu.core.masked import remove_mean_with_mask

# Logical activation axes for SPMD partitioning (flax linen spmd). These are
# no-ops unless a `flax.linen.logical_axis_rules` context maps them to mesh
# axes — gaudi_tpu.parallel.mesh.PARALLELISM_RULES defines the supported
# mappings (dp: batch only; tp: hidden channels; sp: receiver nodes). The
# constraints sit on the [B, N, N, H] edge tensors — the memory- and
# FLOP-dominant intermediates — and on node features after each update; XLA's
# SPMD partitioner propagates the sharding through the rest of the layer and
# inserts the collectives.
EDGE_LOGICAL_AXES = ("batch", "nodes_recv", "nodes_send", "embed")
NODE_LOGICAL_AXES = ("batch", "nodes", "embed")


def coord2diff(
    x: jax.Array, norm_constant: float = 1.0
) -> tuple[jax.Array, jax.Array]:
    """Pairwise squared distances and normalized difference vectors.

    x: [B, N, 3] -> (radial [B, N, N, 1], coord_diff [B, N, N, 3]) where
    coord_diff[b,i,j] = (x_i - x_j) / (|x_i - x_j| + norm_constant).
    Mirrors reference edm/egnn/egnn_new.py:394-400.
    """
    diff = x[:, :, None, :] - x[:, None, :, :]
    radial = jnp.sum(jnp.square(diff), axis=-1, keepdims=True)
    norm = jnp.sqrt(radial + 1e-8)
    return radial, diff / (norm + norm_constant)


class SinusoidsEmbedding(nn.Module):
    """Multi-frequency sinusoidal embedding of squared distances.

    Mirrors reference edm/egnn/egnn_new.py:378-391 (SinusoidsEmbeddingNew).
    """

    max_res: float = 15.0
    min_res: float = 15.0 / 2000.0
    div_factor: int = 4

    @property
    def n_frequencies(self) -> int:
        return int(math.log(self.max_res / self.min_res, self.div_factor)) + 1

    @property
    def dim(self) -> int:
        return 2 * self.n_frequencies

    @nn.compact
    def __call__(self, radial: jax.Array) -> jax.Array:
        freqs = (
            2
            * math.pi
            * self.div_factor ** jnp.arange(self.n_frequencies, dtype=jnp.float32)
            / self.max_res
        )
        x = jnp.sqrt(radial + 1e-8)
        emb = x * freqs  # [..., 1] * [F] -> [..., F]
        return jax.lax.stop_gradient(
            jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
        )


class EdgeMLPIn(nn.Module):
    """First edge-MLP layer with the split-weight identity (see module doc).

    Equivalent to Dense(concat([h_i, h_j, e_ij]) @ W + b) with
    W = [W_src; W_dst; W_edge] row-blocks.
    """

    hidden_nf: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jax.Array, edge_attr: jax.Array) -> jax.Array:
        # h: [B, N, H_in], edge_attr: [B, N, N, E] -> [B, N, N, hidden]
        src = nn.Dense(self.hidden_nf, use_bias=False, kernel_init=TORCH_LINEAR_INIT, dtype=self.dtype, name="src")(h)
        dst = nn.Dense(self.hidden_nf, use_bias=True, kernel_init=TORCH_LINEAR_INIT, dtype=self.dtype, name="dst")(h)
        out = src[:, :, None, :] + dst[:, None, :, :]
        if edge_attr.shape[-1] > 0:  # edge-attr-free GCLs (DenseGNN) skip this
            out = out + nn.Dense(self.hidden_nf, use_bias=False, kernel_init=TORCH_LINEAR_INIT, dtype=self.dtype, name="edge")(edge_attr)
        return out


class DenseGCL(nn.Module):
    """Invariant message-passing layer (feature update).

    Mirrors reference GCL (edm/egnn/egnn_new.py:6-89): edge MLP ->
    optional sigmoid attention gate -> edge-mask -> sum over senders ->
    residual node MLP -> node-mask.

    The dense [B,N,N,H] formulation is deliberate: XLA fuses the
    elementwise chain into the two H x H matmuls and keeps the MXU fed.
    (A hand-written Pallas fusion of this block was built, measured 6.7x
    slower than XLA's schedule, and removed — see PERF.md "Pallas
    post-mortem".)
    """

    hidden_nf: int
    attention: bool = True
    normalization_factor: float = 1.0
    aggregation_method: str = "sum"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        h: jax.Array,
        edge_attr: jax.Array,
        node_mask: jax.Array,
        edge_mask: jax.Array,
    ) -> jax.Array:
        # Edge model (reference egnn_new.py:42-57).
        mij = EdgeMLPIn(self.hidden_nf, dtype=self.dtype, name="edge_in")(h, edge_attr)
        mij = nn.with_logical_constraint(mij, EDGE_LOGICAL_AXES)
        mij = nn.silu(mij)
        mij = nn.Dense(self.hidden_nf, kernel_init=TORCH_LINEAR_INIT, dtype=self.dtype, name="edge_out")(mij)
        mij = nn.silu(mij)
        if self.attention:
            att = nn.sigmoid(nn.Dense(1, kernel_init=TORCH_LINEAR_INIT, dtype=self.dtype, name="att")(mij))
            out = mij * att
        else:
            out = mij
        out = out * edge_mask[..., None]

        # Aggregate over senders j (reference unsorted_segment_sum,
        # egnn_new.py:403-421). 'mean' divides by the static N like the
        # reference's unmasked ones-scatter does for full connectivity.
        agg = out.sum(axis=2)
        if self.aggregation_method == "sum":
            agg = agg / self.normalization_factor
        elif self.aggregation_method == "mean":
            agg = agg / h.shape[1]
        else:
            raise ValueError(self.aggregation_method)

        # Node model (reference egnn_new.py:59-73): residual MLP on [h, agg].
        upd = nn.Dense(self.hidden_nf, kernel_init=TORCH_LINEAR_INIT, dtype=self.dtype, name="node_in")(
            jnp.concatenate([h, agg], axis=-1)
        )
        upd = nn.silu(upd)
        upd = nn.Dense(self.hidden_nf, kernel_init=TORCH_LINEAR_INIT, dtype=self.dtype, name="node_out")(upd)
        h = h + upd
        return nn.with_logical_constraint(h * node_mask, NODE_LOGICAL_AXES)


# torch.nn.Linear's default init (kaiming_uniform(a=sqrt(5))) has variance
# 1/(3*fan_in) — one third of flax's lecun_normal. With 2-layer edge MLPs,
# ~11-sender sums and 9 residual blocks the difference compounds to
# activation explosions at init (observed: initial loss ~1e5 with
# lecun_normal vs ~10 with this). Matching the reference init keeps the
# network in the regime the reference's hyperparameters were tuned for.
TORCH_LINEAR_INIT = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def _small_init(scale: float):
    """Xavier-uniform init scaled by `scale` (reference gain=0.001 for the
    final coord layer, egnn_new.py:107-108)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        limit = scale * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -limit, limit)

    return init


class DenseEquivariantUpdate(nn.Module):
    """Equivariant coordinate update.

    Mirrors reference EquivariantUpdate (edm/egnn/egnn_new.py:92-155):
    scalar gate per edge from [h_i, h_j, e_ij], optionally tanh-clamped to
    +-coords_range, multiplied by the normalized difference vector,
    edge-masked, summed over senders, added to coords, node-masked.
    """

    hidden_nf: int
    tanh: bool = True
    coords_range: float = 15.0
    normalization_factor: float = 1.0
    aggregation_method: str = "sum"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        h: jax.Array,
        x: jax.Array,
        coord_diff: jax.Array,
        edge_attr: jax.Array,
        node_mask: jax.Array,
        edge_mask: jax.Array,
    ) -> jax.Array:
        m = EdgeMLPIn(self.hidden_nf, dtype=self.dtype, name="coord_in")(h, edge_attr)
        m = nn.with_logical_constraint(m, EDGE_LOGICAL_AXES)
        m = nn.silu(m)
        m = nn.Dense(self.hidden_nf, kernel_init=TORCH_LINEAR_INIT, dtype=self.dtype, name="coord_mid")(m)
        m = nn.silu(m)
        gate = nn.Dense(
            1, use_bias=False, kernel_init=_small_init(0.001), dtype=self.dtype,
            name="coord_gate"
        )(m)
        # coordinate arithmetic stays f32: the tanh gate output is tiny
        # (init gain 1e-3) and position updates accumulate over layers
        gate = gate.astype(jnp.float32)
        if self.tanh:
            trans = coord_diff * jnp.tanh(gate) * self.coords_range
        else:
            trans = coord_diff * gate
        trans = trans * edge_mask[..., None]
        agg = trans.sum(axis=2)
        if self.aggregation_method == "sum":
            agg = agg / self.normalization_factor
        elif self.aggregation_method == "mean":
            agg = agg / h.shape[1]
        else:
            raise ValueError(self.aggregation_method)
        return (x + agg) * node_mask


class EquivariantBlock(nn.Module):
    """inv_sublayers x DenseGCL followed by one coordinate update.

    Mirrors reference EquivariantBlock (edm/egnn/egnn_new.py:158-235). Note the
    reference passes the *full* coords_range to every block (egnn_new.py:290)
    even though it precomputes coords_range/n_layers — we reproduce the live
    behavior (full range per block).
    """

    hidden_nf: int
    inv_sublayers: int = 1
    attention: bool = True
    tanh: bool = True
    coords_range: float = 15.0
    norm_constant: float = 1.0
    sin_embedding: bool = False
    normalization_factor: float = 1.0
    aggregation_method: str = "sum"
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
        radial, coord_diff = coord2diff(x, self.norm_constant)
        if self.sin_embedding:
            radial = SinusoidsEmbedding(name="sin_emb")(radial)
        edge_attr = jnp.concatenate([radial, edge_attr0], axis=-1)
        for i in range(self.inv_sublayers):
            h = DenseGCL(
                hidden_nf=self.hidden_nf,
                attention=self.attention,
                normalization_factor=self.normalization_factor,
                aggregation_method=self.aggregation_method,
                dtype=self.dtype,
                name=f"gcl_{i}",
            )(h, edge_attr, node_mask, edge_mask)
        x = DenseEquivariantUpdate(
            hidden_nf=self.hidden_nf,
            tanh=self.tanh,
            coords_range=self.coords_range,
            normalization_factor=self.normalization_factor,
            aggregation_method=self.aggregation_method,
            dtype=self.dtype,
            name="equiv",
        )(h, x, coord_diff, edge_attr, node_mask, edge_mask)
        h = h * node_mask
        return h, x


class DynamicsEGNN(nn.Module):
    """Embedding -> n_layers EquivariantBlocks -> output embedding.

    Mirrors reference EGNN (edm/egnn/egnn_new.py:238-321).
    """

    hidden_nf: int
    out_node_nf: int
    n_layers: int = 9
    inv_sublayers: int = 1
    attention: bool = True
    tanh: bool = True
    coords_range: float = 4.0
    norm_constant: float = 1.0
    sin_embedding: bool = False
    normalization_factor: float = 1.0
    aggregation_method: str = "sum"
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # jax.checkpoint each block (memory <-> recompute)

    @nn.compact
    def __call__(
        self,
        h: jax.Array,
        x: jax.Array,
        node_mask: jax.Array,
        edge_mask: jax.Array,
    ) -> tuple[jax.Array, jax.Array]:
        radial0, _ = coord2diff(x)
        if self.sin_embedding:
            edge_attr0 = SinusoidsEmbedding(name="sin_emb0")(radial0)
        else:
            edge_attr0 = radial0
        # masks participate in [B,N,N,H]-sized products — cast once so they
        # don't promote bfloat16 activations back to float32
        node_mask = node_mask.astype(self.dtype)
        edge_mask = edge_mask.astype(self.dtype)
        h = nn.Dense(self.hidden_nf, kernel_init=TORCH_LINEAR_INIT, dtype=self.dtype, name="embedding")(h)
        block_cls = nn.remat(EquivariantBlock) if self.remat else EquivariantBlock
        for i in range(self.n_layers):
            h, x = block_cls(
                hidden_nf=self.hidden_nf,
                inv_sublayers=self.inv_sublayers,
                attention=self.attention,
                tanh=self.tanh,
                coords_range=self.coords_range,
                norm_constant=self.norm_constant,
                sin_embedding=self.sin_embedding,
                normalization_factor=self.normalization_factor,
                aggregation_method=self.aggregation_method,
                dtype=self.dtype,
                name=f"block_{i}",
            )(h, x, edge_attr0, node_mask, edge_mask)
        h = nn.Dense(self.out_node_nf, kernel_init=TORCH_LINEAR_INIT, dtype=self.dtype, name="embedding_out")(h)
        h = h * node_mask
        return h, x


class DenseGNN(nn.Module):
    """Non-equivariant message-passing trunk (ablation baseline).

    Mirrors reference GNN (edm/egnn/egnn_new.py:324-375) as used by the
    'gnn_dynamics' mode of EGNN_dynamics (edm/egnn/models.py:51-66,119-123):
    embedding -> n_layers plain GCLs with *no* edge attributes -> output
    embedding -> node mask. Two reference quirks reproduced deliberately:

    - the GNN-mode call passes no edge_mask (models.py:121), so messages are
      aggregated over ALL padded slots and self-loops; padded-node inputs are
      zero but MLP biases still contribute. We pass an all-ones edge mask to
      the dense GCL to match.
    - the embedding output is not masked before the first GCL (egnn_new.py:365),
      so padded nodes enter layer 0 with the embedding bias.
    """

    hidden_nf: int
    out_node_nf: int
    n_layers: int = 4
    attention: bool = False
    normalization_factor: float = 1.0
    aggregation_method: str = "sum"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jax.Array, node_mask: jax.Array) -> jax.Array:
        b, n, _ = h.shape
        node_mask = node_mask.astype(self.dtype)
        ones_edge = jnp.ones((b, n, n), dtype=self.dtype)
        empty_edge_attr = jnp.zeros((b, n, n, 0), dtype=self.dtype)
        h = nn.Dense(self.hidden_nf, kernel_init=TORCH_LINEAR_INIT, dtype=self.dtype, name="embedding")(h)
        for i in range(self.n_layers):
            h = DenseGCL(
                hidden_nf=self.hidden_nf,
                attention=self.attention,
                normalization_factor=self.normalization_factor,
                aggregation_method=self.aggregation_method,
                dtype=self.dtype,
                name=f"gcl_{i}",
            )(h, empty_edge_attr, node_mask, ones_edge)
        h = nn.Dense(self.out_node_nf, kernel_init=TORCH_LINEAR_INIT, dtype=self.dtype, name="embedding_out")(h)
        return h * node_mask


class EGNNDynamics(nn.Module):
    """eps-prediction head for the diffusion model.

    Takes xh = [x | h] in [B, N, 3 + K], appends a per-node time channel
    (+ optional context), runs the trunk, and returns the CoM-projected
    velocity concatenated with the feature output. Mirrors reference
    EGNN_dynamics._forward (edm/egnn/models.py:83-152), with the branchless
    `nan_to_num` replacing the reference's NaN-warning guard
    (models.py:138-141).
    """

    in_node_nf: int  # feature count K (without time/context channels)
    hidden_nf: int = 192
    n_dims: int = 3
    n_layers: int = 9
    inv_sublayers: int = 1
    attention: bool = True
    tanh: bool = True
    coords_range: float = 4.0
    norm_constant: float = 1.0
    sin_embedding: bool = False
    normalization_factor: float = 1.0
    aggregation_method: str = "sum"
    condition_time: bool = True
    context_node_nf: int = 0
    mode: str = "egnn_dynamics"  # or "gnn_dynamics" (reference models.py:21,51)
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        t: jax.Array,
        xh: jax.Array,
        node_mask: jax.Array,
        edge_mask: jax.Array,
        context: Optional[jax.Array] = None,
    ) -> jax.Array:
        b, n, _ = xh.shape
        xh = xh * node_mask
        x = xh[:, :, : self.n_dims]
        h = xh[:, :, self.n_dims :]

        if self.condition_time:
            # t: scalar, [B], or [B, 1] -> per-node channel [B, N, 1].
            # Like the reference (models.py:97-105) the time channel is NOT
            # masked; padded nodes are killed downstream by node/edge masks.
            t_arr = jnp.asarray(t, dtype=xh.dtype).reshape(-1, 1, 1)
            h_time = jnp.broadcast_to(t_arr, (b, n, 1))
            h = jnp.concatenate([h, h_time], axis=-1)
        if self.context_node_nf > 0:
            assert context is not None
            h = jnp.concatenate(
                [h, context.reshape(b, n, self.context_node_nf)], axis=-1
            )

        if self.mode == "gnn_dynamics":
            # Reference models.py:119-123: run the plain GNN over [x | h] and
            # slice velocity from the first 3 output channels. Note the
            # reference sizes the output as 3 + in_node_nf (+time, no context
            # slot, models.py:55) — reproduced, including the fact that the
            # context slice below would misalign if context were ever used
            # with this dead-by-default mode.
            out = DenseGNN(
                hidden_nf=self.hidden_nf,
                out_node_nf=3 + self.in_node_nf + int(self.condition_time),
                n_layers=self.n_layers,
                attention=self.attention,
                normalization_factor=self.normalization_factor,
                aggregation_method=self.aggregation_method,
                dtype=self.dtype,
                name="gnn",
            )(jnp.concatenate([x, h], axis=-1).astype(self.dtype), node_mask)
            out = out.astype(jnp.float32)
            vel = out[:, :, :3] * node_mask
            h_final = out[:, :, 3:]
        else:
            h_final, x_final = DynamicsEGNN(
                hidden_nf=self.hidden_nf,
                out_node_nf=self.in_node_nf
                + int(self.condition_time)
                + self.context_node_nf,
                n_layers=self.n_layers,
                inv_sublayers=self.inv_sublayers,
                attention=self.attention,
                tanh=self.tanh,
                coords_range=self.coords_range,
                norm_constant=self.norm_constant,
                sin_embedding=self.sin_embedding,
                normalization_factor=self.normalization_factor,
                aggregation_method=self.aggregation_method,
                dtype=self.dtype,
                remat=self.remat,
                name="egnn",
            )(h.astype(self.dtype), x, node_mask, edge_mask)
            h_final = h_final.astype(jnp.float32)
            vel = (x_final - x) * node_mask
        if self.context_node_nf > 0:
            h_final = h_final[:, :, : -self.context_node_nf]
        if self.condition_time:
            h_final = h_final[:, :, :-1]

        vel = jnp.nan_to_num(vel, nan=0.0)
        vel = remove_mean_with_mask(vel, node_mask)
        return jnp.concatenate([vel, h_final], axis=-1)
