"""Fused EGNN edge-block kernels (Pallas/TPU).

The hot loop of every network here is the dense edge computation
(SURVEY.md §3.1): for each of B*N^2 node pairs build the message
m2 = silu(silu(src_i + dst_j + e_ij @ We) @ W2 + b2), gate it, mask it, and
reduce over senders. Left to XLA, each matmul/elementwise stage materializes
a [B, N, N, H] tensor in HBM (~50 MB per stage at the flagship batch),
making the op bandwidth-bound. These kernels keep the whole pipeline in
VMEM per batch tile and write only the [B, N, H] (or [B, N, 3]) reduction.

Two heads cover all three usages in the models:
- attn_sum: sigmoid-attention-gated message sum (DenseGCL / PredictorEGCL
  feature update; reference edm/egnn/egnn_new.py:42-67)
- coord: scalar gate (optionally tanh-clamped) times normalized coordinate
  difference, summed (DenseEquivariantUpdate / predictor coordinate path;
  reference egnn_new.py:92-155, egnn_predictor/gcl.py:252-279)

Gradients: `jax.custom_vjp` with the forward running the Pallas kernel and
the backward differentiating the pure-jnp reference implementation
(recompute-style, like flash-attention backward). The jnp reference is also
the fallback on non-TPU platforms, so all of this is exercised by CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu import works everywhere; kernels only run on TPU
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _silu(x):
    # compute the logistic in f32: Mosaic lowers bf16 `logistic` with an f32
    # constant broadcast into a bf16 vector, which fails verification; the
    # upcast is VPU-cheap and also slightly improves bf16 accuracy
    x32 = x.astype(jnp.float32)
    return (x32 * jax.nn.sigmoid(x32)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Reference (jnp) implementations — ground truth + backward + CPU fallback
# ---------------------------------------------------------------------------


def _trunk_jnp(src, dst, edge_attr, w_e, w2, b2):
    """m2 [B, N, N, H] from the shared edge trunk."""
    e2 = edge_attr @ w_e  # [B,N,N,H] (E tiny)
    m0 = e2 + src[:, :, None, :] + dst[:, None, :, :]
    m1 = _silu(m0)
    return _silu(m1 @ w2 + b2)


def _attn_sum_jnp(src, dst, edge_attr, edge_mask, w_e, w2, b2, w_a, b_a):
    m2 = _trunk_jnp(src, dst, edge_attr, w_e, w2, b2)
    att = jax.nn.sigmoid(m2 @ w_a[:, None] + b_a)
    out = m2 * att * edge_mask[..., None]
    return out.sum(axis=2)


def _coord_jnp(
    src, dst, edge_attr, edge_mask, coord_diff, w_e, w2, b2, w_g, tanh, rng
):
    m2 = _trunk_jnp(src, dst, edge_attr, w_e, w2, b2)
    gate = (m2 @ w_g[:, None]).astype(jnp.float32)
    if tanh:
        trans = coord_diff * jnp.tanh(gate) * rng
    else:
        trans = coord_diff * gate
    trans = trans * edge_mask[..., None]
    return trans.sum(axis=2)


def _predictor_jnp(
    src, dst, edge_attr, edge_mask, coord_diff,
    w_e, w2, b2, w_a, b_a, w_mid, b_mid, w_g, tanh, rng,
):
    """Predictor layer edge pipeline: both heads from one attention-masked
    message (reference edm/egnn_predictor/gcl.py:225-279 — the coordinate
    gate MLP consumes the gated message)."""
    m2 = _trunk_jnp(src, dst, edge_attr, w_e, w2, b2)
    att = jax.nn.sigmoid(m2 @ w_a[:, None] + b_a)
    m_att = m2 * att * edge_mask[..., None]
    agg_h = m_att.sum(axis=2)

    g1 = _silu(m_att @ w_mid + b_mid)
    gate = (g1 @ w_g[:, None]).astype(jnp.float32)
    if tanh:
        trans = coord_diff * jnp.tanh(gate) * rng
    else:
        trans = coord_diff * gate
    trans = trans * edge_mask[..., None]
    return agg_h, trans.sum(axis=2)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _batch_tile(n: int) -> int:
    """Batch elements per grid step: a few f32 [TB*N*N, H] stage tensors
    must fit VMEM (~16 MB); larger tiles amortize per-program overhead."""
    return max(1, 1024 // (n * n))  # N=11 -> 8, N=22 -> 2


def _attn_sum_kernel(src_ref, dst_ref, ea_ref, em_ref, we_ref, w2_ref, b2_ref,
                     wa_ref, ba_ref, out_ref):
    tb, n, h = src_ref.shape
    e = ea_ref.shape[-1]
    acc = jnp.float32

    # dtype strategy: HBM traffic stays in the compute dtype (bf16 halves
    # bandwidth); ALL in-kernel compute runs f32 — this Mosaic version cannot
    # lay out any 4D bf16 broadcast/reshape/dot, and the kernel's win is
    # bandwidth, not MXU rate. E is tiny (1-2): broadcast-accumulate.
    ea = ea_ref[:].astype(acc)
    we = we_ref[:].astype(acc)
    e2 = ea[..., 0:1] * we[0]
    for kk in range(1, e):
        e2 += ea[..., kk:kk + 1] * we[kk]
    src = src_ref[:].astype(acc)
    dst = dst_ref[:].astype(acc)
    m0 = e2 + src[:, :, None, :] + dst[:, None, :, :]
    m1 = _silu(m0)
    z2 = jax.lax.dot_general(
        m1, w2_ref[:].astype(acc), (((3,), (0,)), ((), ())),
        preferred_element_type=acc,
    ) + b2_ref[:].astype(acc)
    m2 = _silu(z2)
    a = jax.nn.sigmoid(
        jax.lax.dot_general(
            m2, wa_ref[:].astype(acc), (((3,), (0,)), ((), ())),
            preferred_element_type=acc,
        )
        + ba_ref[0:1, 0:1]
    )
    o = (m2 * a) * em_ref[:].astype(acc)[..., None]
    out_ref[:] = o.sum(axis=2).astype(out_ref.dtype)


def _coord_kernel(tanh: bool, rng: float,
                  src_ref, dst_ref, ea_ref, em_ref, cd_ref, we_ref, w2_ref,
                  b2_ref, wg_ref, out_ref):
    tb, n, h = src_ref.shape
    e = ea_ref.shape[-1]
    acc = jnp.float32

    # dtype strategy: HBM traffic stays in the compute dtype (bf16 halves
    # bandwidth); ALL in-kernel compute runs f32 — this Mosaic version cannot
    # lay out any 4D bf16 broadcast/reshape/dot, and the kernel's win is
    # bandwidth, not MXU rate. E is tiny (1-2): broadcast-accumulate.
    ea = ea_ref[:].astype(acc)
    we = we_ref[:].astype(acc)
    e2 = ea[..., 0:1] * we[0]
    for kk in range(1, e):
        e2 += ea[..., kk:kk + 1] * we[kk]
    src = src_ref[:].astype(acc)
    dst = dst_ref[:].astype(acc)
    m0 = e2 + src[:, :, None, :] + dst[:, None, :, :]
    m1 = _silu(m0)
    z2 = jax.lax.dot_general(
        m1, w2_ref[:].astype(acc), (((3,), (0,)), ((), ())),
        preferred_element_type=acc,
    ) + b2_ref[:].astype(acc)
    m2 = _silu(z2)
    gate = jax.lax.dot_general(
        m2, wg_ref[:].astype(acc), (((3,), (0,)), ((), ())),
        preferred_element_type=acc,
    )
    if tanh:
        gate = jnp.tanh(gate) * rng
    em32 = em_ref[:].astype(acc)[..., None]
    trans = cd_ref[:].astype(acc) * gate * em32
    out_ref[:] = trans.sum(axis=2).astype(out_ref.dtype)


def _predictor_kernel(tanh: bool, rng: float,
                      src_ref, dst_ref, ea_ref, em_ref, cd_ref, we_ref,
                      w2_ref, b2_ref, wa_ref, ba_ref, wmid_ref, bmid_ref,
                      wg_ref, outh_ref, outx_ref):
    tb, n, h = src_ref.shape
    e = ea_ref.shape[-1]
    acc = jnp.float32

    # dtype strategy: HBM traffic stays in the compute dtype (bf16 halves
    # bandwidth); ALL in-kernel compute runs f32 — this Mosaic version cannot
    # lay out any 4D bf16 broadcast/reshape/dot, and the kernel's win is
    # bandwidth, not MXU rate. E is tiny (1-2): broadcast-accumulate.
    ea = ea_ref[:].astype(acc)
    we = we_ref[:].astype(acc)
    e2 = ea[..., 0:1] * we[0]
    for kk in range(1, e):
        e2 += ea[..., kk:kk + 1] * we[kk]
    src = src_ref[:].astype(acc)
    dst = dst_ref[:].astype(acc)
    m0 = e2 + src[:, :, None, :] + dst[:, None, :, :]
    m1 = _silu(m0)
    z2 = jax.lax.dot_general(
        m1, w2_ref[:].astype(acc), (((3,), (0,)), ((), ())),
        preferred_element_type=acc,
    ) + b2_ref[:].astype(acc)
    m2 = _silu(z2)
    a = jax.nn.sigmoid(
        jax.lax.dot_general(
            m2, wa_ref[:].astype(acc), (((3,), (0,)), ((), ())),
            preferred_element_type=acc,
        )
        + ba_ref[0:1, 0:1]
    )
    m_att = (m2 * a) * em_ref[:].astype(acc)[..., None]
    outh_ref[:] = m_att.sum(axis=2).astype(outh_ref.dtype)

    g1 = _silu(
        jax.lax.dot_general(
            m_att, wmid_ref[:].astype(acc),
            (((3,), (0,)), ((), ())), preferred_element_type=acc,
        )
        + bmid_ref[:].astype(acc)
    )
    gate = jax.lax.dot_general(
        g1, wg_ref[:].astype(acc), (((3,), (0,)), ((), ())),
        preferred_element_type=acc,
    )
    if tanh:
        gate = jnp.tanh(gate) * rng
    em32 = em_ref[:].astype(acc)[..., None]
    trans = cd_ref[:].astype(acc) * gate * em32
    outx_ref[:] = trans.sum(axis=2).astype(outx_ref.dtype)


def _pallas_predictor(src, dst, edge_attr, edge_mask, coord_diff,
                      w_e, w2, b2, w_a, b_a, w_mid, b_mid, w_g, tanh, rng):
    b, n, h = src.shape
    tb = _batch_tile(n)
    assert b % tb == 0
    grid = (b // tb,)
    bspec = lambda blk, rank: pl.BlockSpec(  # noqa: E731
        blk, lambda i: (i,) + (0,) * (rank - 1), memory_space=pltpu.VMEM
    )
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_predictor_kernel, bool(tanh), float(rng))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            bspec((tb, n, h), 3),
            bspec((tb, n, h), 3),
            bspec((tb, n, n, edge_attr.shape[-1]), 4),
            bspec((tb, n, n), 3),
            bspec((tb, n, n, 3), 4),
            wspec, wspec, wspec, wspec, wspec, wspec, wspec, wspec,
        ],
        out_specs=(bspec((tb, n, h), 3), bspec((tb, n, 3), 3)),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, h), src.dtype),
            jax.ShapeDtypeStruct((b, n, 3), coord_diff.dtype),
        ),
    )(
        src, dst, edge_attr, edge_mask, coord_diff,
        w_e, w2, b2.reshape(1, -1), w_a.reshape(-1, 1),
        jnp.asarray(b_a, jnp.float32).reshape(1, 1),
        w_mid, b_mid.reshape(1, -1), w_g.reshape(-1, 1),
    )


def _pallas_attn_sum(src, dst, edge_attr, edge_mask, w_e, w2, b2, w_a, b_a):
    b, n, h = src.shape
    tb = _batch_tile(n)
    assert b % tb == 0
    grid = (b // tb,)
    bspec = lambda blk, rank: pl.BlockSpec(  # noqa: E731
        blk, lambda i: (i,) + (0,) * (rank - 1), memory_space=pltpu.VMEM
    )
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _attn_sum_kernel,
        grid=grid,
        in_specs=[
            bspec((tb, n, h), 3),
            bspec((tb, n, h), 3),
            bspec((tb, n, n, edge_attr.shape[-1]), 4),
            bspec((tb, n, n), 3),
            wspec,
            wspec,
            wspec,
            wspec,
            wspec,
        ],
        out_specs=bspec((tb, n, h), 3),
        out_shape=jax.ShapeDtypeStruct((b, n, h), src.dtype),
    )(
        src, dst, edge_attr, edge_mask,
        w_e, w2, b2.reshape(1, -1), w_a.reshape(-1, 1),
        jnp.asarray(b_a, jnp.float32).reshape(1, 1),
    )


def _pallas_coord(src, dst, edge_attr, edge_mask, coord_diff, w_e, w2, b2,
                  w_g, tanh, rng):
    b, n, h = src.shape
    tb = _batch_tile(n)
    assert b % tb == 0
    grid = (b // tb,)
    bspec = lambda blk, rank: pl.BlockSpec(  # noqa: E731
        blk, lambda i: (i,) + (0,) * (rank - 1), memory_space=pltpu.VMEM
    )
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_coord_kernel, bool(tanh), float(rng))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            bspec((tb, n, h), 3),
            bspec((tb, n, h), 3),
            bspec((tb, n, n, edge_attr.shape[-1]), 4),
            bspec((tb, n, n), 3),
            bspec((tb, n, n, 3), 4),
            wspec,
            wspec,
            wspec,
            wspec,
        ],
        out_specs=bspec((tb, n, 3), 3),
        out_shape=jax.ShapeDtypeStruct((b, n, 3), coord_diff.dtype),
    )(
        src, dst, edge_attr, edge_mask, coord_diff,
        w_e, w2, b2.reshape(1, -1), w_g.reshape(-1, 1),
    )


# ---------------------------------------------------------------------------
# custom_vjp wrappers (Pallas forward, jnp-reference backward)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def edge_block_attn_sum(src, dst, edge_attr, edge_mask, w_e, w2, b2, w_a, b_a):
    """Fused silu-MLP edge messages with sigmoid-attention masked sum.

    src/dst [B,N,H] (pre-projected h), edge_attr [B,N,N,E], edge_mask
    [B,N,N]; returns [B,N,H] = sum_j m2*att*mask.
    """
    if _on_tpu():
        return _pallas_attn_sum(src, dst, edge_attr, edge_mask, w_e, w2, b2, w_a, b_a)
    return _attn_sum_jnp(src, dst, edge_attr, edge_mask, w_e, w2, b2, w_a, b_a)


def _attn_sum_fwd(src, dst, edge_attr, edge_mask, w_e, w2, b2, w_a, b_a):
    out = edge_block_attn_sum(src, dst, edge_attr, edge_mask, w_e, w2, b2, w_a, b_a)
    return out, (src, dst, edge_attr, edge_mask, w_e, w2, b2, w_a, b_a)


def _attn_sum_bwd(res, g):
    _, vjp = jax.vjp(_attn_sum_jnp, *res)
    return vjp(g)


edge_block_attn_sum.defvjp(_attn_sum_fwd, _attn_sum_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def edge_block_coord(src, dst, edge_attr, edge_mask, coord_diff, w_e, w2, b2,
                     w_g, tanh, rng):
    """Fused coordinate update: gate(m2) (tanh-clamped to +-rng when `tanh`)
    times coord_diff, masked, summed over senders. Returns [B,N,3] f32."""
    if _on_tpu():
        return _pallas_coord(
            src, dst, edge_attr, edge_mask, coord_diff, w_e, w2, b2, w_g, tanh, rng
        )
    return _coord_jnp(
        src, dst, edge_attr, edge_mask, coord_diff, w_e, w2, b2, w_g, tanh, rng
    )


def _coord_fwd(src, dst, edge_attr, edge_mask, coord_diff, w_e, w2, b2, w_g,
               tanh, rng):
    out = edge_block_coord(
        src, dst, edge_attr, edge_mask, coord_diff, w_e, w2, b2, w_g, tanh, rng
    )
    return out, (src, dst, edge_attr, edge_mask, coord_diff, w_e, w2, b2, w_g)


def _coord_bwd(tanh, rng, res, g):
    fn = lambda *a: _coord_jnp(*a, tanh, rng)  # noqa: E731
    _, vjp = jax.vjp(fn, *res)
    return vjp(g)


edge_block_coord.defvjp(_coord_fwd, _coord_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14))
def edge_block_predictor(src, dst, edge_attr, edge_mask, coord_diff,
                         w_e, w2, b2, w_a, b_a, w_mid, b_mid, w_g, tanh, rng):
    """Fused predictor edge layer: (feature reduce, coordinate reduce) from
    a single attention-masked message. Returns ([B,N,H], [B,N,3])."""
    if _on_tpu():
        return _pallas_predictor(
            src, dst, edge_attr, edge_mask, coord_diff,
            w_e, w2, b2, w_a, b_a, w_mid, b_mid, w_g, tanh, rng,
        )
    return _predictor_jnp(
        src, dst, edge_attr, edge_mask, coord_diff,
        w_e, w2, b2, w_a, b_a, w_mid, b_mid, w_g, tanh, rng,
    )


def _predictor_fwd(src, dst, edge_attr, edge_mask, coord_diff,
                   w_e, w2, b2, w_a, b_a, w_mid, b_mid, w_g, tanh, rng):
    out = edge_block_predictor(
        src, dst, edge_attr, edge_mask, coord_diff,
        w_e, w2, b2, w_a, b_a, w_mid, b_mid, w_g, tanh, rng,
    )
    res = (src, dst, edge_attr, edge_mask, coord_diff,
           w_e, w2, b2, w_a, b_a, w_mid, b_mid, w_g)
    return out, res


def _predictor_bwd(tanh, rng, res, g):
    fn = lambda *a: _predictor_jnp(*a, tanh, rng)  # noqa: E731
    _, vjp = jax.vjp(fn, *res)
    return vjp(g)


edge_block_predictor.defvjp(_predictor_fwd, _predictor_bwd)
