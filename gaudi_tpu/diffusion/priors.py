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


def ring_angles3_energy(dataset: str = "cata", max_nodes=None,
                        orientation: bool = False, norm_x: float = 3.0,
                        window_tol: float = 0.05, adj_tol: float = 0.1,
                        adj_sharpness: float = 0.03,
                        bond_restraint: float = 1e4):
    """Factory: differentiable 3-ring-angle window energy for a dataset.

    The stability checker (eval_chem/stability.py check_angels3, mirroring
    reference analyze/analyze.py:21-36) requires every bonded ring triplet's
    center angle to fall inside one of the center-type's empirical windows.
    This builds the soft/differentiable counterpart: bonded-ness becomes a
    product of distance-window sigmoids (sharpness `adj_sharpness` in
    angstroms around the checker's tol=`adj_tol` windows), and each
    triplet pays a flat-bottom quadratic to its NEAREST allowed window,
    shrunk to `window_tol` < the eval's 0.1 so guidance pushes samples
    comfortably inside what the checker accepts. E(3)-invariant (distances
    and angles only). Returns fn(z, node_mask, edge_mask, t) -> [B].

    z coordinates are the EDM's normalized latent; `norm_x` (EDMConfig
    normalize_factors[0]) rescales to angstroms so the distance windows
    apply. In orientation mode only the first `max_nodes` rows are rings
    (the tail rows are orientation markers) and the rest are ignored.
    """
    import numpy as np

    from gaudi_tpu.data.rings import RINGS_LIST
    from gaudi_tpu.eval_chem.stability import (
        ANGELS3,
        _distance_window_matrices,
    )

    names = RINGS_LIST[dataset]
    k = len(names)
    lo_np, hi_np, _ = _distance_window_matrices(dataset)
    # unknown type pairs (inf/-inf sentinels) -> zero-weight adjacency
    d_lo = jnp.asarray(np.where(np.isfinite(lo_np), lo_np * (1 - adj_tol), 1e6))
    d_hi = jnp.asarray(np.where(np.isfinite(hi_np), hi_np * (1 + adj_tol), -1e6))

    table = ANGELS3.get(dataset, {})
    c_max = max((len(v) for v in table.values()), default=1)
    # [K, C, 2] angle windows; pad entries get lo=hi=1e9 so their
    # flat-bottom penalty is astronomically large and the min() ignores
    # them; a type with NO windows is unconstrained (masked via has_win)
    win = np.full((k, c_max, 2), 1e9)
    has_win = np.zeros((k,), np.float32)
    for tname, clusters in table.items():
        ti = names.index(tname)
        has_win[ti] = 1.0
        for ci, (lo, hi) in enumerate(clusters.values()):
            win[ti, ci] = (lo * (1 - window_tol), hi * (1 + window_tol))
    win = jnp.asarray(win)
    has_win = jnp.asarray(has_win)

    def energy(z, node_mask, edge_mask=None, t=None) -> jax.Array:
        x = z[..., :3] * norm_x
        types = jnp.argmax(z[..., 3:3 + k], axis=-1)  # categorical: no grad
        m = node_mask
        if m.ndim == 3:
            m = m[..., 0]
        if orientation and max_nodes is not None:
            x = x[:, :max_nodes]
            types = types[:, :max_nodes]
            m = m[:, :max_nodes]
        n = x.shape[1]
        diff = x[:, :, None, :] - x[:, None, :, :]
        d = jnp.sqrt((diff**2).sum(-1) + 1e-12)
        plo = d_lo[types[:, :, None], types[:, None, :]]
        phi = d_hi[types[:, :, None], types[:, None, :]]
        a = (
            jax.nn.sigmoid((d - plo) / adj_sharpness)
            * jax.nn.sigmoid((phi - d) / adj_sharpness)
            * m[:, :, None] * m[:, None, :]
            * (1.0 - jnp.eye(n))[None]
        )  # [B, N, N] soft bonded-ness
        # the bond weights only SELECT which triplets are penalized — they
        # must not carry gradient, or descending the energy dissolves the
        # offending bond (lowers w) instead of fixing the angle (measured:
        # hetro polish guided at scale 30 dropped connectivity
        # 0.984 -> 0.891 before this stop_gradient)
        a = jax.lax.stop_gradient(a)
        # angle at center j between neighbors i and k (degrees, arccos
        # range [0, 180] — matches the checker's _angle3)
        v = diff / d[..., None]  # v[b, i, j] = unit(x_i - x_j)
        cos = jnp.einsum("bijc,bkjc->bjik", v, v)
        cos = jnp.clip(cos, -1.0 + 1e-6, 1.0 - 1e-6)
        ang = jnp.degrees(jnp.arccos(cos))  # [B, J(center), N, N]
        wlo = win[types][:, :, None, None, :, 0]  # [B, J, 1, 1, C]
        whi = win[types][:, :, None, None, :, 1]
        pen = (
            jax.nn.relu(wlo - ang[..., None]) ** 2
            + jax.nn.relu(ang[..., None] - whi) ** 2
        ).min(axis=-1)  # nearest window, flat bottom inside
        w = (
            a.transpose(0, 2, 1)[:, :, :, None]  # bond j-i -> [B, J, I, 1]
            * a[:, :, None, :]                   # bond j-k -> [B, J, 1, K]
            * (1.0 - jnp.eye(n))[None, None]     # i != k
            * has_win[types][:, :, None, None]
        )
        e_ang = (w * pen).sum(axis=(1, 2, 3)) / 2.0  # each triplet twice
        # flat-bottom restraint keeping (detached-)bonded pairs inside
        # their distance window, so angle corrections cannot drift
        # distances out of the dist_stable check (angstrom^2, weighted up
        # to the degrees^2 scale of the angle term)
        pen_d = (
            jax.nn.relu(plo - d) ** 2 + jax.nn.relu(d - phi) ** 2
        )
        e_bond = bond_restraint * (a * pen_d).sum(axis=(1, 2)) / 2.0
        return e_ang + e_bond

    return energy


PRIORS = {"planarity": planarity_energy, "angles3": ring_angles3_energy}


def get_prior(name: str, dataset: str = "cata", max_nodes=None,
              orientation: bool = False, norm_x: float = 3.0):
    """Look up a prior energy by name (CLI surface).

    Dataset-aware priors ("angles3") are built from the calling context;
    dataset-independent ones ("planarity") ignore it. Composite specs sum
    weighted terms: "planarity+angles3", "100*planarity+0.3*angles3"
    (the overall --polish-guide-scale still multiplies the sum).
    """
    if "+" in name:
        terms = []
        for part in name.split("+"):
            part = part.strip()
            w = 1.0
            if "*" in part:
                ws, part = part.split("*", 1)
                w = float(ws)
            terms.append((w, get_prior(
                part.strip(), dataset=dataset, max_nodes=max_nodes,
                orientation=orientation, norm_x=norm_x,
            )))

        def combined(z, node_mask, edge_mask=None, t=None):
            return sum(w * f(z, node_mask, edge_mask, t) for w, f in terms)

        return combined
    try:
        p = PRIORS[name]
    except KeyError:
        raise ValueError(
            f"unknown prior {name!r}; available: {sorted(PRIORS)}"
        ) from None
    if p is ring_angles3_energy:
        return ring_angles3_energy(
            dataset, max_nodes=max_nodes, orientation=orientation,
            norm_x=norm_x,
        )
    return p


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


def t_annealed(fn, mode: str, floor: float = 0.0):
    """Scale a guidance target by a t-dependent factor (guidance annealing).

    The inverse of `t_windowed`: full strength early in the reverse process
    (t ~ 1, where guidance steers topology cheaply) and fading toward t = 0,
    where geometry crystallizes and strong multi-property gradients drag
    samples off-manifold (measured: the reference's 5-term OPV combo at its
    own scale 0.6, generation_guidance.py:189-211, collapses validity to
    ~63% unannealed; see QUALITY.md round 5). Because the guided step's
    energy is scale * sum(fn), multiplying fn by the factor anneals the
    EFFECTIVE scale without touching the engine.

    Modes (t is the schedule fraction in [0, 1]):
      linear  factor = t
      sqrt    factor = sqrt(t)          (gentler fade)
      cos2    factor = sin^2(pi/2 * t)  (smooth at both ends)
    `floor` lower-bounds the factor so guidance never fully vanishes.
    """
    factor = _anneal_factor(mode, floor)

    def wrapped(z, node_mask, edge_mask, t):
        return factor(t[:, 0]).astype(z.dtype) * fn(z, node_mask, edge_mask, t)

    return wrapped


def _anneal_factor(mode: str, floor: float):
    import jax.numpy as jnp

    def factor(tt):
        if mode == "linear":
            f = tt
        elif mode == "sqrt":
            f = jnp.sqrt(tt)
        elif mode == "cos2":
            f = jnp.sin(jnp.pi / 2.0 * tt) ** 2
        else:
            raise ValueError(f"unknown anneal mode {mode!r}")
        return jnp.maximum(f, floor)

    return factor


def anneal_weight(w: float, mode: str, floor: float = 0.0):
    """Annealed per-term guidance weight: callable t -> [B, 1] factor * w.

    Used with the per-property-normalized guidance terms
    (EDM.sample_zs_given_zt_guidance): there the annealing must multiply
    the unit-normalized gradient — wrapping the term fn instead would be
    cancelled by the normalization.
    """
    factor = _anneal_factor(mode, floor)

    def weight(t):
        return w * factor(t)

    return weight
