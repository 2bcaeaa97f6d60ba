"""High-order deterministic ODE samplers (DPM-Solver++ 2M).

Beyond-reference throughput feature: the reference's only sampler is the
T-step ancestral loop (reference edm/equivariant_diffusion/en_diffusion.py:
958-1008), and the framework's strided ancestral sampler (EDM._reverse_grid)
holds headline quality down to K~100 steps. A second-order exponential
integrator for the probability-flow ODE (DPM-Solver++, Lu et al. 2022,
multistep data-prediction variant "2M") holds quality at K~10-25 denoiser
calls — a further ~4-10x sampler speedup on top of the 10x strided knee.

Math. The VDM forward process q(z_t|x) = N(alpha_t x, sigma_t^2) with
gamma = -log(alpha^2/sigma^2) (diffusion/schedule.py) gives half-log-SNR
lambda_t = -gamma_t / 2, monotone decreasing in t. In lambda the
probability-flow ODE has the exact "variation of constants" solution

    z_i = (sigma_i / sigma_{i-1}) z_{i-1}
          - alpha_i (e^{-h_i} - 1) * [approx of x0-prediction over the step]

with h_i = lambda_i - lambda_{i-1} > 0 (we integrate from t=T toward t=0,
so lambda increases). DPM-Solver++(2M) approximates the x0-prediction with
a first-order extrapolation from the previous grid node:

    r_i = h_{i-1} / h_i
    D_i = (1 + 1/(2 r_i)) x0(z_{i-1}, t_{i-1}) - 1/(2 r_i) x0(z_{i-2}, t_{i-2})

(first step: D_1 = x0(z_0, t_0); `order=1` forces that everywhere, which is
exactly DDIM on the lambda grid). One denoiser call per step, deterministic
given the prior draw; for a point-mass data distribution the integrator is
exact for ANY step count (the x0-prediction is constant), which is what
tests/test_solvers.py asserts against a closed-form oracle.

Composition:
- classifier guidance: after each ODE update the same bounded move as the
  ancestral guided sampler (en_diffusion.py:854-935) is applied —
  `z <- z - sigma_step * clip(grad E)` with sigma_step the stride's
  posterior std, per-sample norm clip and CoM projection. (Routing the
  gradient through eps instead — the textbook score-offset form — gets
  amplified by sigma^2/alpha inside the exponential integrator, ~300x at
  t=T for this schedule, and diverges; the post-step form keeps the
  user-facing `scale` knob calibrated identically to the ancestral
  sampler on the same grid.);
- classifier-free guidance / conditional models: everything goes through
  `edm.phi`, so the `with_cfg`-derived EDM (diffusion/cfg.py) and contexts
  compose unchanged;
- CoM-free subspace: every update is a linear combination of z and the
  (CoM-projected) eps-hat, so z stays in the subspace; coordinates are
  re-projected each step for numerical hygiene.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gaudi_tpu.core import masked as M
from gaudi_tpu.diffusion.edm import EDM, TargetFn
from gaudi_tpu.diffusion.schedule import NoiseSchedule


def _guidance_move(
    edm: EDM,
    z: jax.Array,
    t: jax.Array,
    sigma_step: jax.Array,
    node_mask: jax.Array,
    edge_mask: jax.Array,
    target_fn: TargetFn,
    scale: float,
    max_grad_norm: float,
) -> jax.Array:
    """The ancestral guided sampler's bounded gradient move on z.

    Mirrors sample_zs_given_zt_guidance (edm.py / en_diffusion.py:900-920):
    per-sample norm clip, CoM projection, step size sigma_step.
    """

    def energy(zz):
        return scale * target_fn(zz, node_mask, edge_mask, t).sum()

    grad = jax.grad(energy)(z)
    gn = jnp.sqrt(jnp.sum(grad**2, axis=(1, 2)))
    grad = grad * jnp.minimum(max_grad_norm / (gn + 1e-6), 1.0)[:, None, None]
    grad = edm._project_z(grad, node_mask)
    z = edm._project_z(z - sigma_step * grad, node_mask)
    return jnp.nan_to_num(z, nan=0.0)


def dpmpp_core(
    edm: EDM,
    params,
    z: jax.Array,
    node_mask: jax.Array,
    edge_mask: jax.Array,
    n_steps: int,
    order: int = 2,
    context=None,
    target_fn: Optional[TargetFn] = None,
    scale: float = 0.0,
    max_grad_norm: float = 10.0,
    collect_frames: bool = False,
):
    """Integrate the probability-flow ODE from z at t=T down to t=0.

    Returns z_0 (normalized feature space); decode with
    `edm.sample_xh_given_z0`. One denoiser call per step (`n_steps` total).
    With collect_frames, returns (z_0, frames) where frames is the
    [n_steps, B, N, 3+K] unnormalized trajectory (for chain GIFs).
    """
    if order not in (1, 2):
        raise ValueError(f"order must be 1 or 2, got {order}")
    from_idx, to_idx = edm._reverse_grid(n_steps)
    # First step has no history; the final step takes the largest jump in
    # lambda (t -> 0 crosses most of the log-SNR range), where the 2M
    # extrapolation overshoots — run both at order 1 (the standard
    # `lower_order_final` practice in DPM-Solver++ implementations).
    is_last = jnp.arange(from_idx.shape[0]) == from_idx.shape[0] - 1

    def lam(idx):
        return -0.5 * edm.schedule.gamma_int(idx)

    def body(carry, inp):
        z, prev_x0, prev_lam, first = carry
        i_from, i_to, last = inp
        gamma_from = edm.schedule.gamma_int(i_from)
        gamma_to = edm.schedule.gamma_int(i_to)
        lam_from, lam_to = -0.5 * gamma_from, -0.5 * gamma_to
        h = lam_to - lam_from

        b = z.shape[0]
        t_from = jnp.full((b, 1), i_from, jnp.float32) / edm.T
        eps = edm.phi(params, z, t_from, node_mask, edge_mask, context)
        eps = jnp.nan_to_num(eps, nan=0.0)
        alpha_from = NoiseSchedule.alpha(gamma_from)
        sigma_from = NoiseSchedule.sigma(gamma_from)
        x0 = (z - sigma_from * eps) / alpha_from

        if order == 2:
            # 1/(2 r) with r = h_prev / h; first/last steps run order 1.
            h_prev = lam_from - prev_lam
            coef = jnp.where(
                jnp.logical_or(first > 0.5, last),
                0.0,
                h / (2.0 * jnp.maximum(h_prev, 1e-8)),
            )
        else:
            coef = 0.0
        d = (1.0 + coef) * x0 - coef * prev_x0

        alpha_to = NoiseSchedule.alpha(gamma_to)
        sigma_to = NoiseSchedule.sigma(gamma_to)
        z_next = (sigma_to / sigma_from) * z - alpha_to * jnp.expm1(-h) * d
        z_next = edm._project_z(z_next, node_mask)
        # `scale` may be a traced scalar (the Sampler passes it as a jit
        # argument) — gate on target_fn only; scale multiplies inside the
        # energy, so scale=0 is the unguided trajectory.
        if target_fn is not None:
            # the stride's posterior std, as in _posterior_mu_sigma
            _, sigma_ts, _ = NoiseSchedule.sigma_and_alpha_t_given_s(
                gamma_from, gamma_to
            )
            sigma_step = sigma_ts * sigma_to / sigma_from
            # The ancestral guided step evaluates the target at the FROM
            # time on the post-step state (reference quirk,
            # en_diffusion.py:900: energy(zs, t) with t the pre-step time);
            # reuse t_from here so --guide-scale is calibrated identically
            # across solvers on the same grid.
            z_next = _guidance_move(
                edm, z_next, t_from, sigma_step, node_mask, edge_mask,
                target_fn, scale, max_grad_norm,
            )
        frame = edm.unnormalize_z(z_next, node_mask) if collect_frames else None
        return (z_next, x0, lam_from, jnp.zeros(())), frame

    init = (z, jnp.zeros_like(z), lam(from_idx[0]), jnp.ones(()))
    (z, _, _, _), frames = jax.lax.scan(
        body, init, (from_idx, to_idx, is_last)
    )
    if collect_frames:
        return z, frames
    return z


def sample_dpmpp(
    edm: EDM,
    params,
    key: jax.Array,
    node_mask: jax.Array,
    edge_mask: jax.Array,
    std: float = 1.0,
    n_steps: int = 25,
    order: int = 2,
    context=None,
    target_fn: Optional[TargetFn] = None,
    scale: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Generate (x, h_onehot) with the DPM-Solver++ ODE sampler.

    Drop-in alternative to `EDM.sample` / `EDM.sample_guidance` (same
    decode, same prior-temperature `std` knob, same guidance semantics via
    `target_fn`/`scale`); deterministic given the prior draw, so sample
    diversity comes entirely from the prior key.
    """
    b, n = node_mask.shape[0], node_mask.shape[1]
    k_init, k_final = jax.random.split(key)
    z = M.sample_combined_noise(
        k_init, b, n, edm.n_dims, edm.in_node_nf, node_mask, std
    )
    z = dpmpp_core(
        edm, params, z, node_mask, edge_mask, n_steps, order=order,
        context=context, target_fn=target_fn, scale=scale,
    )
    x, h = edm.sample_xh_given_z0(params, k_final, z, node_mask, edge_mask, context)
    x = M.remove_mean_with_mask(x, node_mask)
    return x, h


def sample_dpmpp_chain(
    edm: EDM,
    params,
    key: jax.Array,
    node_mask: jax.Array,
    edge_mask: jax.Array,
    std: float = 1.0,
    n_steps: int = 25,
    order: int = 2,
    context=None,
) -> jax.Array:
    """ODE-sampler counterpart of `EDM.sample_chain` for visualization.

    Returns [n_steps + 1, B, N, 3+K] unnormalized frames, frame 0 = the
    final decoded sample (matching sample_chain's ordering contract so
    `Sampler.sample_chain` reverses it identically)."""
    b, n = node_mask.shape[0], node_mask.shape[1]
    k_init, k_final = jax.random.split(key)
    z = M.sample_combined_noise(
        k_init, b, n, edm.n_dims, edm.in_node_nf, node_mask, std
    )
    z, frames = dpmpp_core(
        edm, params, z, node_mask, edge_mask, n_steps, order=order,
        context=context, collect_frames=True,
    )
    x, h = edm.sample_xh_given_z0(params, k_final, z, node_mask, edge_mask, context)
    xh_final = jnp.concatenate([x, h], axis=-1)
    # frames are noisiest-first along the scan; flip so frame 0 = final
    chain = jnp.concatenate([xh_final[None], frames[::-1]], axis=0)
    return chain
