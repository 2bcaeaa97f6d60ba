"""Classifier-free guidance (CFG) for the conditional EDM.

Beyond-reference capability: the reference conditions generation only via a
separately trained property predictor (classifier guidance,
generation_guidance.py); its EGNN context slot exists but no live config
trains a conditional diffusion model (SURVEY §2.6). Here the EDM can be
trained conditionally (EDMConfig.context_features + context_dropout) and
sampled with the standard CFG score combination

    eps_cfg = (1 + w) * eps(z_t, c) - w * eps(z_t, null)

(Ho & Salimans, 2022). Design: rather than forking every sampler, `with_cfg`
derives a new EDM whose `apply_fn` performs the two-forward combination —
EDM is a frozen dataclass pytree whose every reverse path (plain, strided,
polish, chain, even classifier guidance on top) calls `phi`, so the derived
instance composes with all of them unchanged.

The null token is the all-zeros context INCLUDING the trailing
is-conditioned indicator channel that `build_context` appends; zeroing the
indicator (not just the property values, whose normalized mean is also 0)
is what distinguishes "unconditioned" from "conditioned on the dataset
mean".
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from gaudi_tpu.diffusion.edm import EDM


def build_context(y_ctx, node_mask):
    """[B, C] per-graph conditioning values -> [B, N, C+1] per-node context.

    Appends the is-conditioned indicator channel (1.0), broadcasts over
    nodes, and masks padded slots (reference models.py:109-117 masks context
    the same way). The returned tensor is what EDM.loss / EDM.sample expect
    as `context`.
    """
    y_ctx = jnp.asarray(y_ctx, jnp.float32)
    b, n = node_mask.shape[0], node_mask.shape[1]
    ctx = jnp.concatenate([y_ctx, jnp.ones((b, 1), jnp.float32)], axis=1)
    return jnp.broadcast_to(ctx[:, None, :], (b, n, ctx.shape[1])) * node_mask


def null_context(context):
    """The CFG null token: zeros, including the indicator channel."""
    return jnp.zeros_like(context)


def with_cfg(edm: EDM, weight: float) -> EDM:
    """Derive an EDM whose denoiser applies classifier-free guidance.

    weight w: 0 = plain conditional sampling; >0 amplifies the conditional
    direction. The derived instance is only meaningful for SAMPLING — its
    apply_fn runs two forwards per call; don't train with it.
    """
    if weight == 0.0:
        return edm
    base = edm.apply_fn

    def apply_cfg(params, t, zt, node_mask, edge_mask, context):
        assert context is not None, "CFG sampling requires a context"
        eps_c = base(params, t, zt, node_mask, edge_mask, context)
        eps_u = base(params, t, zt, node_mask, edge_mask, null_context(context))
        return (1.0 + weight) * eps_c - weight * eps_u

    return dataclasses.replace(edm, apply_fn=apply_cfg)
