"""Guided reverse-step math verified against an independent torch
implementation of the reference update rule (en_diffusion.py:854-935):

    zs ~ N(mu(z_t, eps_hat), sigma)
    g = grad_z [ scale * sum_b f(z, t) ]        (autograd)
    g <- g * min(1, 10 / ||g||_b)               (per-sample norm clip)
    g_x <- CoM-project(g_x)
    zs <- zs - sigma * g ; CoM-project ; nan_to_num

The denoiser and target function are simple closed-form surrogates so the
torch side needs no EGNN — this isolates the guidance algebra itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gaudi_tpu.core import masked as M
from gaudi_tpu.diffusion.edm import EDM
from gaudi_tpu.diffusion.schedule import NoiseSchedule


def _setup():
    in_nf = 2
    schedule = NoiseSchedule.create("polynomial_2", 50)

    def apply_fn(params, t, xh, node_mask, edge_mask, context=None):
        # deterministic surrogate eps-net: linear mix of coords/features
        x = xh[..., :3]
        h = xh[..., 3:]
        vel = M.remove_mean_with_mask(0.1 * x, node_mask) * node_mask
        return jnp.concatenate([vel, 0.05 * h * node_mask], axis=-1)

    edm = EDM(apply_fn=apply_fn, schedule=schedule, in_node_nf=in_nf)
    return edm, in_nf


def _torch_reference_step(zt, node_mask, gamma_s, gamma_t, eps_hat, eps_noise, scale):
    """Reference update in torch, written from the formulas."""
    zt = torch.tensor(np.asarray(zt), dtype=torch.float64)
    nm = torch.tensor(np.asarray(node_mask), dtype=torch.float64)
    eps_hat = torch.tensor(np.asarray(eps_hat), dtype=torch.float64)
    eps_noise = torch.tensor(np.asarray(eps_noise), dtype=torch.float64)
    g_s = torch.tensor(float(gamma_s), dtype=torch.float64)
    g_t = torch.tensor(float(gamma_t), dtype=torch.float64)

    sigma2_ts = -torch.expm1(torch.nn.functional.softplus(g_s) - torch.nn.functional.softplus(g_t))
    log_a2_t = torch.nn.functional.logsigmoid(-g_t)
    log_a2_s = torch.nn.functional.logsigmoid(-g_s)
    alpha_ts = torch.exp(0.5 * (log_a2_t - log_a2_s))
    sigma_s = torch.sqrt(torch.sigmoid(g_s))
    sigma_t = torch.sqrt(torch.sigmoid(g_t))
    sigma_ts = torch.sqrt(sigma2_ts)

    mu = zt / alpha_ts - (sigma2_ts / alpha_ts / sigma_t) * eps_hat
    sigma = sigma_ts * sigma_s / sigma_t
    zs = mu + sigma * eps_noise

    def com_project(z):
        x = z[..., :3]
        n = nm.sum(dim=1, keepdim=True).clamp(min=1)
        mean = (x * nm).sum(dim=1, keepdim=True) / n
        x = x - mean * nm
        return torch.cat([x, z[..., 3:]], dim=-1)

    zs = zs.detach().requires_grad_(True)
    energy = scale * (zs**2).sum()
    (grad,) = torch.autograd.grad(energy, zs)
    gnorm = grad.flatten(1).norm(dim=1)
    coef = torch.clamp(10.0 / (gnorm + 1e-6), max=1.0)
    grad = grad * coef[:, None, None]
    grad = com_project(grad)
    zs = zs.detach() - sigma * grad
    zs = com_project(zs)
    return zs.numpy()


class TestGuidanceParity:
    def test_guided_step_matches_torch(self):
        edm, in_nf = _setup()
        b, n = 3, 5
        counts = jnp.array([5, 4, 3])
        nm, em = M.build_masks(counts, n)
        key = jax.random.PRNGKey(0)
        zt = M.sample_combined_noise(key, b, n, 3, in_nf, nm)

        s_idx = 20
        s = jnp.full((b, 1), s_idx / edm.T)
        t = jnp.full((b, 1), (s_idx + 1) / edm.T)

        def target_fn(z, node_mask, edge_mask, tt):
            return (z**2).reshape(b, -1).sum(-1)

        scale = 2.0
        # deterministic: inject the same posterior noise on both sides
        k_noise = jax.random.PRNGKey(7)

        # jax step (re-derive with the same noise by calling internals)
        mu, sigma = edm._posterior_mu_sigma(None, zt, s, t, nm, em, None)
        eps = M.sample_combined_noise(k_noise, b, n, 3, in_nf, nm)
        zs_jax = mu + sigma * eps

        def energy(z):
            return scale * target_fn(z, nm, em, t).sum()

        grad = jax.grad(energy)(zs_jax)
        gn = jnp.sqrt(jnp.sum(grad**2, axis=(1, 2)))
        grad = grad * jnp.minimum(10.0 / (gn + 1e-6), 1.0)[:, None, None]
        grad = edm._project_z(grad, nm)
        zs_jax = edm._project_z(zs_jax - sigma * grad, nm)

        # torch reference with identical inputs
        gamma_s = float(edm.schedule.gamma(s)[0, 0])
        gamma_t = float(edm.schedule.gamma(t)[0, 0])
        eps_hat = edm.phi(None, zt, t, nm, em)
        zs_torch = _torch_reference_step(
            zt, nm, gamma_s, gamma_t, eps_hat, eps, scale
        )
        np.testing.assert_allclose(
            np.asarray(zs_jax), zs_torch, rtol=1e-4, atol=1e-5
        )

    def test_module_step_equals_manual_composition(self):
        """EDM.sample_zs_given_zt_guidance == the hand-composed update above
        given identical keys."""
        edm, in_nf = _setup()
        b, n = 2, 4
        counts = jnp.array([4, 3])
        nm, em = M.build_masks(counts, n)
        zt = M.sample_combined_noise(jax.random.PRNGKey(1), b, n, 3, in_nf, nm)
        s = jnp.full((b, 1), 0.4)
        t = jnp.full((b, 1), 0.42)

        def target_fn(z, node_mask, edge_mask, tt):
            return (z**3).reshape(b, -1).sum(-1)

        key = jax.random.PRNGKey(9)
        got = edm.sample_zs_given_zt_guidance(
            None, key, s, t, zt, nm, em, target_fn, scale=1.5
        )

        mu, sigma = edm._posterior_mu_sigma(None, zt, s, t, nm, em, None)
        eps = M.sample_combined_noise(key, b, n, 3, in_nf, nm)
        zs = mu + sigma * eps
        grad = jax.grad(lambda z: 1.5 * target_fn(z, nm, em, t).sum())(zs)
        gn = jnp.sqrt(jnp.sum(grad**2, axis=(1, 2)))
        grad = grad * jnp.minimum(10.0 / (gn + 1e-6), 1.0)[:, None, None]
        grad = edm._project_z(grad, nm)
        want = jnp.nan_to_num(edm._project_z(zs - sigma * grad, nm), nan=0.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


class TestPerPropertyNormalization:
    """Multi-term guidance: per-term unit-normalized gradients + annealed
    weights (round-5 additions for the OPV combo at reference scale 0.6)."""

    def _common(self):
        edm, in_nf = _setup()
        b, n = 2, 4
        counts = jnp.array([4, 3])
        nm, em = M.build_masks(counts, n)
        zt = M.sample_combined_noise(jax.random.PRNGKey(3), b, n, 3, in_nf, nm)
        s = jnp.full((b, 1), 0.3)
        t = jnp.full((b, 1), 0.32)
        return edm, in_nf, b, n, nm, em, zt, s, t

    def test_terms_combine_unit_normalized(self):
        edm, in_nf, b, n, nm, em, zt, s, t = self._common()

        f1 = lambda z, *a: (z**2).reshape(b, -1).sum(-1)
        f2 = lambda z, *a: z.reshape(b, -1).sum(-1)
        key = jax.random.PRNGKey(5)
        got = edm.sample_zs_given_zt_guidance(
            None, key, s, t, zt, nm, em, ((1.0, f1), (3.0, f2)), scale=0.5
        )

        mu, sigma = edm._posterior_mu_sigma(None, zt, s, t, nm, em, None)
        eps = M.sample_combined_noise(key, b, n, 3, in_nf, nm)
        zs = mu + sigma * eps
        grad = jnp.zeros_like(zs)
        for w, f in ((1.0, f1), (3.0, f2)):
            g = jax.grad(lambda z: f(z).sum())(zs)
            gn = jnp.sqrt(jnp.sum(g**2, axis=(1, 2), keepdims=True))
            grad = grad + 0.5 * w * g / (gn + 1e-6)
        gn = jnp.sqrt(jnp.sum(grad**2, axis=(1, 2)))
        grad = grad * jnp.minimum(10.0 / (gn + 1e-6), 1.0)[:, None, None]
        grad = edm._project_z(grad, nm)
        want = jnp.nan_to_num(edm._project_z(zs - sigma * grad, nm), nan=0.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_annealed_weight_at_t0_is_unguided(self):
        """With linear annealing the guided step at t=0 must equal the plain
        posterior step — geometry near t=0 is left to the model."""
        from gaudi_tpu.diffusion.priors import anneal_weight

        edm, in_nf, b, n, nm, em, zt, _, _ = self._common()
        s = jnp.full((b, 1), 0.0)
        t = jnp.full((b, 1), 0.0)

        f1 = lambda z, *a: (z**2).reshape(b, -1).sum(-1)
        key = jax.random.PRNGKey(11)
        guided = edm.sample_zs_given_zt_guidance(
            None, key, s, t, zt, nm, em,
            ((anneal_weight(5.0, "linear"), f1),), scale=1.0,
        )
        plain = edm.sample_zs_given_zt(None, key, s, t, zt, nm, em)
        np.testing.assert_allclose(
            np.asarray(guided), np.asarray(plain), atol=1e-6
        )

    def test_anneal_weight_scales_normalized_grad(self):
        """At mid-schedule t the annealed weight must multiply the
        unit-normalized gradient by w * factor(t)."""
        from gaudi_tpu.diffusion.priors import anneal_weight

        edm, in_nf, b, n, nm, em, zt, s, t = self._common()
        f1 = lambda z, *a: (z**2).reshape(b, -1).sum(-1)
        key = jax.random.PRNGKey(13)
        got = edm.sample_zs_given_zt_guidance(
            None, key, s, t, zt, nm, em,
            ((anneal_weight(2.0, "linear"), f1),), scale=1.0,
        )
        # same update with the pre-multiplied constant weight 2.0 * t
        wt = 2.0 * float(t[0, 0])
        want = edm.sample_zs_given_zt_guidance(
            None, key, s, t, zt, nm, em, ((wt, f1),), scale=1.0
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_t_annealed_single_fn(self):
        """t_annealed on a scalar target scales the (pre-clip) gradient."""
        from gaudi_tpu.diffusion.priors import t_annealed

        edm, in_nf, b, n, nm, em, zt, s, t = self._common()
        f1 = lambda z, nm_, em_, tt: (z**2).reshape(b, -1).sum(-1)
        key = jax.random.PRNGKey(17)
        got = edm.sample_zs_given_zt_guidance(
            None, key, s, t, zt, nm, em, t_annealed(f1, "linear"), scale=1.0
        )
        want = edm.sample_zs_given_zt_guidance(
            None, key, s, t, zt, nm, em, f1, scale=float(t[0, 0])
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
