"""E(3) variational diffusion over dense masked ring graphs.

TPU-first redesign of the reference's `EnVariationalDiffusion`
(reference: edm/equivariant_diffusion/en_diffusion.py:279-1174). Key design
departures, all behavior-preserving:

- **Pure functions, explicit params + PRNG keys.** No module state; every
  sampler/loss is jit-able and shard-able as-is.
- **Reverse diffusion is a `lax.scan`** over the T steps, fully resident on
  device (the reference runs a Python loop with a host sync per step,
  en_diffusion.py:983-991). Guidance gradients come from `jax.grad` of the
  target function inside the scan body (reference re-enables autograd per
  step, en_diffusion.py:900-903).
- **Branchless numerics.** The reference's per-step asserts and NaN warnings
  become `jnp.nan_to_num` and an unconditional final CoM projection (the
  projection is idempotent, so "project only if drifted > 5e-2"
  (en_diffusion.py:1000-1007) is equivalent up to the skipped print).
- **No charge/`integer` machinery.** The reference always constructs the live
  models with include_charges=False (models_edm.py:94), making `h["integer"]`
  an empty tensor everywhere; we drop it (SURVEY.md §2.6).

Feature layout: xh = concat([x, h], -1) with x [B,N,3] normalized coords and
h [B,N,K] normalized one-hot ring types.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaudi_tpu.core import masked as M
from gaudi_tpu.diffusion.schedule import NoiseSchedule

Params = Any
TargetFn = Callable[[jax.Array, jax.Array, jax.Array, jax.Array], jax.Array]


@dataclasses.dataclass
class EDMState:
    """Bundle of learnable state for convenience in training code."""

    params: Params


def _cdf_standard_gaussian(x):
    return 0.5 * (1.0 + jax.lax.erf(x / np.sqrt(2.0)))


def _inflate(array: jax.Array, ndim: int) -> jax.Array:
    """[B] or [B,1] -> [B, 1, ..., 1] with `ndim` axes."""
    return array.reshape(array.shape[0], *([1] * (ndim - 1)))


@dataclasses.dataclass(frozen=True)
class EDM:
    """Config + pure-function API for the equivariant diffusion model.

    `apply_fn(params, t, xh, node_mask, edge_mask, context)` is the dynamics
    network (eps-prediction); see gaudi_tpu.models.egnn.EGNNDynamics.
    """

    apply_fn: Callable[..., jax.Array]
    schedule: NoiseSchedule
    in_node_nf: int
    n_dims: int = 3
    loss_type: str = "l2"
    norm_values: tuple = (3.0, 4.0, 10.0)
    norm_biases: tuple = (0.0, 0.0, 0.0)
    # lax.scan unroll factor for the reverse samplers: >1 lets XLA fuse and
    # schedule across consecutive denoise steps at the cost of program size
    # (a measured perf knob — see PERF.md round 5; semantics identical)
    scan_unroll: int = 1

    @property
    def T(self) -> int:
        return self.schedule.timesteps

    # ------------------------------------------------------------------
    # Normalization (reference en_diffusion.py:384-431)
    # ------------------------------------------------------------------

    def normalize(
        self, x: jax.Array, h: jax.Array, node_mask: jax.Array
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        x = x / self.norm_values[0]
        delta_log_px = -self.subspace_dimensionality(node_mask) * np.log(
            self.norm_values[0]
        )
        h = (h - self.norm_biases[1]) / self.norm_values[1] * node_mask
        return x, h, delta_log_px

    def unnormalize(
        self, x: jax.Array, h: jax.Array, node_mask: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        x = x * self.norm_values[0]
        h = (h * self.norm_values[1] + self.norm_biases[1]) * node_mask
        return x, h

    def unnormalize_z(self, z: jax.Array, node_mask: jax.Array) -> jax.Array:
        x, h = z[..., : self.n_dims], z[..., self.n_dims :]
        x, h = self.unnormalize(x, h, node_mask)
        return jnp.concatenate([x, h], axis=-1)

    def subspace_dimensionality(self, node_mask: jax.Array) -> jax.Array:
        """(n_nodes - 1) * n_dims, per graph (en_diffusion.py:379-382)."""
        n = node_mask[..., 0].sum(axis=1)
        return (n - 1.0) * self.n_dims

    # ------------------------------------------------------------------
    # Forward-noising building blocks
    # ------------------------------------------------------------------

    def phi(self, params, zt, t, node_mask, edge_mask, context=None):
        return self.apply_fn(params, t, zt, node_mask, edge_mask, context)

    def sample_zt(
        self,
        key: jax.Array,
        xh: jax.Array,
        t: jax.Array,
        node_mask: jax.Array,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """q(z_t | x, h): returns (z_t, eps, gamma_t). t: [B, 1] in [0,1]."""
        gamma_t = _inflate(self.schedule.gamma(t), xh.ndim)
        alpha_t = NoiseSchedule.alpha(gamma_t)
        sigma_t = NoiseSchedule.sigma(gamma_t)
        eps = M.sample_combined_noise(
            key, xh.shape[0], xh.shape[1], self.n_dims, self.in_node_nf, node_mask
        )
        z_t = alpha_t * xh + sigma_t * eps
        return z_t, eps, gamma_t

    # ------------------------------------------------------------------
    # Loss terms (reference en_diffusion.py:459-775)
    # ------------------------------------------------------------------

    def kl_prior(self, xh: jax.Array, node_mask: jax.Array) -> jax.Array:
        """KL(q(z_T | x) || N(0, I)) — diagnostic term (en_diffusion.py:459-491)."""
        gamma_T = self.schedule.gamma(jnp.ones((xh.shape[0],)))
        alpha_T = _inflate(NoiseSchedule.alpha(gamma_T), xh.ndim)
        mu_T = alpha_T * xh
        mu_T_x, mu_T_h = mu_T[..., : self.n_dims], mu_T[..., self.n_dims :]
        sigma_T = NoiseSchedule.sigma(gamma_T)  # [B]

        # h-part: diagonal KL with unit-variance prior, masked.
        sigma_T_h = _inflate(sigma_T, xh.ndim)
        kl_h = M.sum_except_batch(
            (
                jnp.log(1.0 / sigma_T_h)
                + 0.5 * (sigma_T_h**2 + mu_T_h**2)
                - 0.5
            )
            * node_mask
        )

        # x-part: KL on the (n-1)*d subspace (en_diffusion.py:111-129).
        mu_norm2 = M.sum_except_batch(mu_T_x**2)
        d = self.subspace_dimensionality(node_mask)
        kl_x = d * jnp.log(1.0 / sigma_T) + 0.5 * (d * sigma_T**2 + mu_norm2) - 0.5 * d
        return kl_x + kl_h

    def compute_error(
        self, net_out: jax.Array, eps: jax.Array, simple: bool
    ) -> jax.Array:
        """||eps - eps_hat||^2, averaged per-entry when `simple` (training l2).

        Mirrors en_diffusion.py:507-515.
        """
        err = M.sum_except_batch((eps - net_out) ** 2)
        if simple:
            denom = (self.n_dims + self.in_node_nf) * net_out.shape[1]
            err = err / denom
        return err

    def log_constants_p_x_given_z0(self, node_mask: jax.Array) -> jax.Array:
        """Constant part of log p(x | z0) (en_diffusion.py:517-531)."""
        b = node_mask.shape[0]
        n = node_mask[..., 0].sum(axis=1)
        dof_x = (n - 1.0) * self.n_dims
        gamma_0 = self.schedule.gamma(jnp.zeros((b,)))
        log_sigma_x = 0.5 * gamma_0
        return dof_x * (-log_sigma_x - 0.5 * jnp.log(2 * jnp.pi))

    def log_pxh_given_z0_without_constants(
        self,
        h: jax.Array,
        z_t: jax.Array,
        gamma_0: jax.Array,
        eps: jax.Array,
        net_out: jax.Array,
        node_mask: jax.Array,
        simple: bool,
        epsilon: float = 1e-10,
    ) -> jax.Array:
        """Reconstruction term at t=0 (en_diffusion.py:568-642), charges-free.

        `h` is the *normalized* one-hot features; `simple` selects the
        training-l2 error normalization inside the x-term (matching the
        reference's self.training coupling).
        """
        z_h_cat = z_t[..., self.n_dims :]
        eps_x = eps[..., : self.n_dims]
        net_x = net_out[..., : self.n_dims]

        sigma_0 = NoiseSchedule.sigma(gamma_0)  # [B,1,..]
        sigma_0_cat = sigma_0 * self.norm_values[1]

        log_p_x = -0.5 * self.compute_error(net_x, eps_x, simple)

        # Categorical part: integrate the Gaussian over the one-hot bins.
        onehot = h * self.norm_values[1] + self.norm_biases[1]
        estimated = z_h_cat * self.norm_values[1] + self.norm_biases[1]
        centered = estimated - 1.0
        log_ph_cat_prop = jnp.log(
            _cdf_standard_gaussian((centered + 0.5) / sigma_0_cat)
            - _cdf_standard_gaussian((centered - 0.5) / sigma_0_cat)
            + epsilon
        )
        log_Z = jax.nn.logsumexp(log_ph_cat_prop, axis=2, keepdims=True)
        log_probs = log_ph_cat_prop - log_Z
        log_ph_cat = M.sum_except_batch(log_probs * onehot * node_mask)

        return log_p_x + log_ph_cat

    def loss(
        self,
        params: Params,
        key: jax.Array,
        x: jax.Array,
        h: jax.Array,
        node_mask: jax.Array,
        edge_mask: jax.Array,
        context: Optional[jax.Array] = None,
        training: bool = True,
        t_int: Optional[jax.Array] = None,
        eps: Optional[jax.Array] = None,
        eps0: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, dict]:
        """Per-sample loss. training=True -> simple l2 estimator; False -> NLL.

        Mirrors reference forward + compute_loss (en_diffusion.py:644-805).
        `t_int`/`eps`/`eps0` may be injected for deterministic parity tests
        (`eps0` is the separate L0-term draw of the t0_always eval
        estimator, en_diffusion.py:717-739).
        Returns ([B] loss, aux dict).
        """
        simple = training and self.loss_type == "l2"
        t0_always = not training
        x, h, delta_log_px = self.normalize(x, h, node_mask)
        if simple:
            delta_log_px = jnp.zeros_like(delta_log_px)

        b = x.shape[0]
        k_t, k_eps, k_eps0 = jax.random.split(key, 3)
        lowest_t = 1 if t0_always else 0
        if t_int is None:
            t_int = jax.random.randint(
                k_t, (b, 1), lowest_t, self.T + 1
            ).astype(jnp.float32)
        s_int = t_int - 1
        t_is_zero = (t_int == 0).astype(jnp.float32)[:, 0]
        s = s_int / self.T
        t = t_int / self.T

        gamma_s = _inflate(self.schedule.gamma(s), x.ndim)
        gamma_t = _inflate(self.schedule.gamma(t), x.ndim)
        alpha_t = NoiseSchedule.alpha(gamma_t)
        sigma_t = NoiseSchedule.sigma(gamma_t)

        if eps is None:
            eps = M.sample_combined_noise(
                k_eps, b, x.shape[1], self.n_dims, self.in_node_nf, node_mask
            )
        xh = jnp.concatenate([x, h], axis=2)
        z_t = alpha_t * xh + sigma_t * eps

        net_out = self.phi(params, z_t, t, node_mask, edge_mask, context)
        error = self.compute_error(net_out, eps, simple)

        if simple:
            snr_weight = jnp.ones_like(error)
        else:
            snr_weight = NoiseSchedule.snr(gamma_s - gamma_t)[:, 0, 0] - 1.0
        loss_t_larger_than_zero = 0.5 * snr_weight * error

        neg_log_constants = -self.log_constants_p_x_given_z0(node_mask)
        if simple:
            neg_log_constants = jnp.zeros_like(neg_log_constants)

        kl_prior = self.kl_prior(xh, node_mask)

        if t0_always:
            loss_t = loss_t_larger_than_zero
            estimator_loss_terms = self.T * loss_t

            t_zeros = jnp.zeros_like(s)
            gamma_0 = _inflate(self.schedule.gamma(t_zeros), x.ndim)
            alpha_0 = NoiseSchedule.alpha(gamma_0)
            sigma_0 = NoiseSchedule.sigma(gamma_0)
            eps_0 = eps0 if eps0 is not None else M.sample_combined_noise(
                k_eps0, b, x.shape[1], self.n_dims, self.in_node_nf, node_mask
            )
            z_0 = alpha_0 * xh + sigma_0 * eps_0
            net_out_0 = self.phi(params, z_0, t_zeros, node_mask, edge_mask, context)
            loss_term_0 = -self.log_pxh_given_z0_without_constants(
                h, z_0, gamma_0, eps_0, net_out_0, node_mask, simple
            )
            loss = kl_prior + estimator_loss_terms + neg_log_constants + loss_term_0
        else:
            loss_term_0 = -self.log_pxh_given_z0_without_constants(
                h, z_t, gamma_t, eps, net_out, node_mask, simple
            )
            loss_t = (
                loss_term_0 * t_is_zero + (1.0 - t_is_zero) * loss_t_larger_than_zero
            )
            if simple:
                estimator_loss_terms = loss_t
            else:
                estimator_loss_terms = (self.T + 1) * loss_t
            loss = kl_prior + estimator_loss_terms + neg_log_constants

        loss = loss - delta_log_px
        aux = {
            "t_int": t_int[:, 0],
            "error": error,
            "kl_prior": kl_prior,
        }
        return loss, aux

    # ------------------------------------------------------------------
    # Reverse diffusion (sampling)
    # ------------------------------------------------------------------

    def _posterior_mu_sigma(self, params, zt, s, t, node_mask, edge_mask, context):
        """mu, sigma of p(z_s | z_t) given the eps-net (en_diffusion.py:807-852)."""
        gamma_s = _inflate(self.schedule.gamma(s), zt.ndim)
        gamma_t = _inflate(self.schedule.gamma(t), zt.ndim)
        sigma2_ts, sigma_ts, alpha_ts = NoiseSchedule.sigma_and_alpha_t_given_s(
            gamma_t, gamma_s
        )
        sigma_s = NoiseSchedule.sigma(gamma_s)
        sigma_t = NoiseSchedule.sigma(gamma_t)
        eps_t = self.phi(params, zt, t, node_mask, edge_mask, context)
        eps_t = jnp.nan_to_num(eps_t, nan=0.0)
        mu = zt / alpha_ts - (sigma2_ts / alpha_ts / sigma_t) * eps_t
        sigma = sigma_ts * sigma_s / sigma_t
        return mu, sigma

    def _project_z(self, z: jax.Array, node_mask: jax.Array) -> jax.Array:
        """CoM-project the coordinate part (en_diffusion.py:843-852)."""
        return jnp.concatenate(
            [
                M.remove_mean_with_mask(z[..., : self.n_dims], node_mask),
                z[..., self.n_dims :],
            ],
            axis=-1,
        )

    def sample_zs_given_zt(
        self, params, key, s, t, zt, node_mask, edge_mask, context=None
    ) -> jax.Array:
        """One reverse step z_t -> z_s (en_diffusion.py:807-852)."""
        mu, sigma = self._posterior_mu_sigma(
            params, zt, s, t, node_mask, edge_mask, context
        )
        eps = M.sample_combined_noise(
            key, zt.shape[0], zt.shape[1], self.n_dims, self.in_node_nf, node_mask
        )
        zs = mu + sigma * eps
        return self._project_z(zs, node_mask)

    def sample_zs_given_zt_guidance(
        self,
        params,
        key,
        s,
        t,
        zt,
        node_mask,
        edge_mask,
        target_function: TargetFn,
        scale: float,
        max_grad_norm: float = 10.0,
        context=None,
    ) -> jax.Array:
        """One guided reverse step (en_diffusion.py:854-935).

        After the stochastic posterior step, descend along
        grad_z scale * sum(target_function(z, ..., t)) with per-sample norm
        clipping, CoM projection of the coordinate gradient, and a final CoM
        projection + NaN scrub of z_s. `context` conditions the denoiser
        (conditional EDM); the guidance energy itself is context-free.

        `target_function` may instead be a sequence of (weight, fn) terms:
        then each term's gradient is computed separately, normalized to unit
        per-sample norm, and combined by weight before the usual clip. This
        per-property gradient normalization stops one property's gradient
        magnitude from drowning the others in multi-objective targets (the
        reference's OPV combo sums raw-unit gradients whose scales differ
        by the property std, generation_guidance.py:205-211).
        """
        mu, sigma = self._posterior_mu_sigma(
            params, zt, s, t, node_mask, edge_mask, context
        )
        eps = M.sample_combined_noise(
            key, zt.shape[0], zt.shape[1], self.n_dims, self.in_node_nf, node_mask
        )
        zs = mu + sigma * eps

        if isinstance(target_function, (list, tuple)):
            # Per-term weights may be callables of t (guidance annealing has
            # to scale the NORMALIZED gradient — wrapping the term fn would
            # be cancelled by the unit-normalization below).
            grad = jnp.zeros_like(zs)
            for w, fn in target_function:
                g = jax.grad(lambda z, f=fn: f(z, node_mask, edge_mask, t).sum())(zs)
                gn = jnp.sqrt(jnp.sum(g**2, axis=(1, 2), keepdims=True))
                wt = w(t)[:, :, None] if callable(w) else w
                grad = grad + scale * wt * g / (gn + 1e-6)
        else:
            def energy(z):
                return scale * target_function(z, node_mask, edge_mask, t).sum()

            grad = jax.grad(energy)(zs)

        # Per-sample grad-norm clip to max_grad_norm (en_diffusion.py:905-909).
        grad_norm = jnp.sqrt(jnp.sum(grad**2, axis=(1, 2)))
        clip_coef = jnp.minimum(max_grad_norm / (grad_norm + 1e-6), 1.0)
        grad = grad * clip_coef[:, None, None]

        grad = self._project_z(grad, node_mask)
        zs = zs - sigma * grad
        zs = self._project_z(zs, node_mask)
        return jnp.nan_to_num(zs, nan=0.0)

    def _reverse_grid(self, n_steps: Optional[int] = None, t_hi: Optional[int] = None):
        """(t_indices, s_indices) for the reverse scan, each [K] int32.

        n_steps=None (or T) reproduces the reference's full T-step ancestral
        sampler exactly: t = T..1, s = t-1. A smaller K strides the schedule
        (t_k = round(linspace(T, 0, K+1))) — the posterior algebra in
        `_posterior_mu_sigma` is exact for any s < t, so this is ancestral
        sampling on a sub-schedule (a DDPM-style few-step sampler), giving
        ~T/K throughput at a small quality cost. `t_hi` starts the grid
        below T (used by `polish`).
        """
        top = int(t_hi) if t_hi else self.T
        K = int(n_steps) if n_steps else top
        ts = np.round(np.linspace(top, 0, K + 1)).astype(np.int32)
        if len(np.unique(ts)) != K + 1:
            raise ValueError(f"n_steps={K} too large for t_hi={top}")
        return jnp.asarray(ts[:-1]), jnp.asarray(ts[1:])

    def _scan_reverse(self, step_fn, key, z0, n_steps: Optional[int] = None):
        """Run step_fn(z, s_idx, t_idx, key) over the reverse grid."""
        t_idx, s_idx = self._reverse_grid(n_steps)
        keys = jax.random.split(key, t_idx.shape[0])

        def body(z, inp):
            s_i, t_i, k = inp
            z = step_fn(z, s_i, t_i, k)
            return z, None

        z, _ = jax.lax.scan(
            body, z0, (s_idx, t_idx, keys), unroll=max(int(self.scan_unroll), 1)
        )
        return z

    def sample_xh_given_z0(
        self, params, key, z0, node_mask, edge_mask, context=None
    ) -> tuple[jax.Array, jax.Array]:
        """Final decode p(x, h | z_0) (en_diffusion.py:533-560).

        Returns unnormalized (x, h_onehot).
        """
        b = z0.shape[0]
        zeros = jnp.zeros((b, 1))
        gamma_0 = _inflate(self.schedule.gamma(zeros), z0.ndim)
        # sigma_x = sqrt(sigma_0^2 / alpha_0^2) = SNR(-0.5 gamma_0)
        sigma_x = NoiseSchedule.snr(-0.5 * gamma_0)
        net_out = self.phi(params, z0, zeros, node_mask, edge_mask, context)

        alpha_0 = NoiseSchedule.alpha(gamma_0)
        sigma_0 = NoiseSchedule.sigma(gamma_0)
        mu_x = (z0 - sigma_0 * net_out) / alpha_0

        eps = M.sample_combined_noise(
            key, b, z0.shape[1], self.n_dims, self.in_node_nf, node_mask
        )
        xh = mu_x + sigma_x * eps

        x = xh[..., : self.n_dims]
        h_cat = z0[..., self.n_dims :]
        x, h_cat = self.unnormalize(x, h_cat, node_mask)
        h_onehot = (
            jax.nn.one_hot(jnp.argmax(h_cat, axis=2), self.in_node_nf) * node_mask
        )
        return x, h_onehot

    def sample(
        self,
        params: Params,
        key: jax.Array,
        node_mask: jax.Array,
        edge_mask: jax.Array,
        context: Optional[jax.Array] = None,
        std: float = 1.0,
        n_steps: Optional[int] = None,
    ) -> tuple[jax.Array, jax.Array]:
        """Unconditional generation (en_diffusion.py:958-1008).

        `std` scales only the initial prior noise (temperature knob;
        sampling_edm.py:128 uses 0.7 for unconditional). `n_steps` < T
        selects the strided few-step sampler (see `_reverse_grid`).
        """
        b, n = node_mask.shape[0], node_mask.shape[1]
        k_init, k_scan, k_final = jax.random.split(key, 3)
        z = M.sample_combined_noise(
            k_init, b, n, self.n_dims, self.in_node_nf, node_mask, std
        )

        def step(z, s_idx, t_idx, k):
            s = jnp.full((b, 1), s_idx, jnp.float32) / self.T
            t = jnp.full((b, 1), t_idx, jnp.float32) / self.T
            return self.sample_zs_given_zt(
                params, k, s, t, z, node_mask, edge_mask, context
            )

        z = self._scan_reverse(step, k_scan, z, n_steps)
        x, h = self.sample_xh_given_z0(
            params, k_final, z, node_mask, edge_mask, context
        )
        # Unconditional final CoM projection (idempotent; replaces the
        # reference's drift-triggered projection, en_diffusion.py:1000-1007).
        x = M.remove_mean_with_mask(x, node_mask)
        return x, h

    def sample_guidance(
        self,
        params: Params,
        key: jax.Array,
        target_function: TargetFn,
        node_mask: jax.Array,
        edge_mask: jax.Array,
        scale: float = 1.0,
        std: float = 1.0,
        n_steps: Optional[int] = None,
        context=None,
    ) -> tuple[jax.Array, jax.Array]:
        """Classifier-guided generation (en_diffusion.py:1010-1067).
        `context` conditions the denoiser throughout (conditional EDM)."""
        b, n = node_mask.shape[0], node_mask.shape[1]
        k_init, k_scan, k_final = jax.random.split(key, 3)
        z = M.sample_combined_noise(
            k_init, b, n, self.n_dims, self.in_node_nf, node_mask, std
        )

        def step(z, s_idx, t_idx, k):
            s = jnp.full((b, 1), s_idx, jnp.float32) / self.T
            t = jnp.full((b, 1), t_idx, jnp.float32) / self.T
            return self.sample_zs_given_zt_guidance(
                params, k, s, t, z, node_mask, edge_mask, target_function,
                scale, context=context,
            )

        z = self._scan_reverse(step, k_scan, z, n_steps)
        x, h = self.sample_xh_given_z0(
            params, k_final, z, node_mask, edge_mask, context
        )
        x = M.remove_mean_with_mask(x, node_mask)
        return x, h

    def polish(
        self,
        params: Params,
        key: jax.Array,
        x: jax.Array,
        h_onehot: jax.Array,
        node_mask: jax.Array,
        edge_mask: jax.Array,
        t_start: float = 0.08,
        n_steps: int = 12,
        rounds: int = 2,
        noise_scale: float = 1.0,
        t_decay: float = 0.6,
        context: Optional[jax.Array] = None,
        guide_fn: Optional[TargetFn] = None,
        guide_scale: float = 0.0,
    ) -> tuple[jax.Array, jax.Array]:
        """Manifold-projection polish of finished samples (SDEdit rounds).

        Framework extension beyond the reference sampler: re-noise a
        finished sample to a small t (alpha_t ~ 1 keeps the global ring
        arrangement) and run the ancestral reverse scan back to 0, so
        small-scale geometry — bond-length wobble, out-of-plane dihedral
        drift — is re-drawn from the model's learned small-sigma
        conditional, which concentrates inside the empirical stability
        windows the training data was filtered through. Iterating a few
        shrinking rounds projects near-miss geometries onto the learned
        manifold at the cost of rounds*n_steps extra denoiser calls
        (~2% of a T=1000 generation). noise_scale < 1 damps the per-step
        posterior noise inside the polish scan (DDIM-ward interpolation:
        stronger contraction onto the conditional modes). Round r melts to
        t_start * t_decay**r; a larger t_start with the default decay gives
        an annealed deep-melt schedule that can flip samples out of a wrong
        dihedral basin, not just tighten in-basin geometry.

        `guide_fn`/`guide_scale` optionally apply the same gradient-descent
        move as the guided sampler inside each polish step (per-sample norm
        clip, CoM projection) — intended for the physics priors in
        `diffusion/priors.py` (e.g. planarity), not just learned targets.
        """
        b = x.shape[0]
        for r in range(rounds):
            key, k_noise, k_scan, k_final = jax.random.split(key, 4)
            xs, hs, _ = self.normalize(x, h_onehot, node_mask)
            z = jnp.concatenate([xs, hs], axis=-1)
            t_hi = max(int(round(t_start * (t_decay**r) * self.T)), n_steps)
            tt = jnp.full((b, 1), t_hi, jnp.float32) / self.T
            gamma_t = _inflate(self.schedule.gamma(tt), z.ndim)
            alpha_t = NoiseSchedule.alpha(gamma_t)
            sigma_t = NoiseSchedule.sigma(gamma_t)
            eps = M.sample_combined_noise(
                k_noise, b, z.shape[1], self.n_dims, self.in_node_nf, node_mask
            )
            z = alpha_t * z + sigma_t * eps

            def step(z, s_idx, t_idx, k):
                s = jnp.full((b, 1), s_idx, jnp.float32) / self.T
                t = jnp.full((b, 1), t_idx, jnp.float32) / self.T
                mu, sigma = self._posterior_mu_sigma(
                    params, z, s, t, node_mask, edge_mask, context
                )
                eps_n = M.sample_combined_noise(
                    k, b, z.shape[1], self.n_dims, self.in_node_nf, node_mask
                )
                zs = self._project_z(
                    mu + noise_scale * sigma * eps_n, node_mask
                )
                if guide_fn is not None and guide_scale:
                    def energy(zz):
                        return guide_scale * guide_fn(
                            zz, node_mask, edge_mask, t
                        ).sum()

                    grad = jax.grad(energy)(zs)
                    gn = jnp.sqrt(jnp.sum(grad**2, axis=(1, 2)))
                    grad = grad * jnp.minimum(10.0 / (gn + 1e-6), 1.0)[:, None, None]
                    grad = self._project_z(grad, node_mask)
                    zs = self._project_z(zs - sigma * grad, node_mask)
                    zs = jnp.nan_to_num(zs, nan=0.0)
                return zs

            t_idx, s_idx = self._reverse_grid(n_steps, t_hi=t_hi)
            keys = jax.random.split(k_scan, t_idx.shape[0])

            def body(zc, inp):
                s_i, t_i, k = inp
                return step(zc, s_i, t_i, k), None

            z, _ = jax.lax.scan(body, z, (s_idx, t_idx, keys))
            x, h_onehot = self.sample_xh_given_z0(
                params, k_final, z, node_mask, edge_mask, context
            )
            x = M.remove_mean_with_mask(x, node_mask)
        return x, h_onehot

    def sample_chain(
        self,
        params: Params,
        key: jax.Array,
        node_mask: jax.Array,
        edge_mask: jax.Array,
        context: Optional[jax.Array] = None,
        keep_frames: int = 100,
        std: float = 1.0,
        n_steps: Optional[int] = None,
    ) -> jax.Array:
        """Generation that records intermediate frames for visualization.

        Returns [keep_frames, B, N, 3+K] unnormalized frames, frame 0 being
        the final decoded sample. Mirrors en_diffusion.py:1118-1174 (the
        frame buffer lives in the scan carry).
        """
        b, n = node_mask.shape[0], node_mask.shape[1]
        k_init, k_scan, k_final = jax.random.split(key, 3)
        z = M.sample_combined_noise(
            k_init, b, n, self.n_dims, self.in_node_nf, node_mask, std
        )
        chain = jnp.zeros((keep_frames,) + z.shape, z.dtype)

        t_grid, s_grid = self._reverse_grid(n_steps)
        keys = jax.random.split(k_scan, t_grid.shape[0])

        def body(carry, inp):
            z, chain = carry
            s_idx, t_idx, k = inp
            s = jnp.full((b, 1), s_idx, jnp.float32) / self.T
            t = jnp.full((b, 1), t_idx, jnp.float32) / self.T
            z = self.sample_zs_given_zt(
                params, k, s, t, z, node_mask, edge_mask, context
            )
            write_index = (s_idx * keep_frames) // self.T
            chain = jax.lax.dynamic_update_slice(
                chain, self.unnormalize_z(z, node_mask)[None], (write_index, 0, 0, 0)
            )
            return (z, chain), None

        (z, chain), _ = jax.lax.scan(body, (z, chain), (s_grid, t_grid, keys))

        x, h = self.sample_xh_given_z0(
            params, k_final, z, node_mask, edge_mask, context
        )
        xh_final = jnp.concatenate([x, h], axis=-1)
        chain = chain.at[0].set(xh_final)
        return chain
