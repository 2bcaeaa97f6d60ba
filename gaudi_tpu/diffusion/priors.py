"""Differentiable geometric prior energies for guided sampling/polish.

The guidance engine (edm.py `sample_zs_given_zt_guidance`, mirroring
reference en_diffusion.py:854-935) accepts any target function
``fn(z, node_mask, edge_mask, t) -> [B]``. The reference only ever plugs
learned property predictors into it (generation_guidance.py:200-211);
this module supplies *physics* priors usable through the identical hook —
e.g. a planarity energy encoding the near-planarity of polycyclic
aromatic systems (the training data is inertia-aligned with sub-angstrom
thickness; see QUALITY.md round-2 diagnosis).

All energies are E(3)-invariant (they see only masked pairwise/principal
geometry), so guiding with them preserves the equivariance of the model
distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def planarity_energy(z: jax.Array, node_mask: jax.Array, edge_mask=None,
                     t=None) -> jax.Array:
    """Mean squared distance of the masked point cloud to its best-fit plane.

    z: [B, N, 3+nf] latent (coordinates first, normalized); returns [B].
    Computed as the smallest eigenvalue of the masked coordinate
    covariance — rotation-invariant and differentiable (the thin
    principal direction of a near-planar cloud is well-separated, so the
    eigenvalue is simple and eigvalsh's gradient is stable; the guided
    step's NaN scrub covers the degenerate corner).
    """
    x = z[..., :3]
    m = node_mask
    if m.ndim == 2:
        m = m[..., None]
    n = jnp.maximum(m.sum(axis=(1, 2)), 1.0)
    mean = (x * m).sum(axis=1) / n[:, None]
    xc = (x - mean[:, None, :]) * m
    cov = jnp.einsum("bni,bnj->bij", xc, xc) / n[:, None, None]
    return jnp.linalg.eigvalsh(cov)[:, 0]


PRIORS = {"planarity": planarity_energy}


def get_prior(name: str):
    """Look up a prior energy by name (CLI surface)."""
    try:
        return PRIORS[name]
    except KeyError:
        raise ValueError(
            f"unknown prior {name!r}; available: {sorted(PRIORS)}"
        ) from None


def t_windowed(fn, t_max: float):
    """Restrict a guidance target to t < t_max (fraction of the schedule).

    Classifier guidance is only as good as the classifier at the current
    noise level; a head that discriminates sharply at t=0 can emit
    destructive gradients at high t (measured: hetro validity classifier,
    AUC 0.996 at t=0, collapses connectivity when applied unwindowed).
    Zeroing the energy outside the window zeroes its gradient there, so
    the reverse process is the plain sampler until t drops into the
    window. Works with any fn(z, node_mask, edge_mask, t) -> [B].
    """

    def wrapped(z, node_mask, edge_mask, t):
        w = (t[:, 0] < t_max).astype(z.dtype)
        return w * fn(z, node_mask, edge_mask, t)

    return wrapped
