"""Schedule tests: closed-form properties + golden parity vs the reference's
numpy schedule construction (reimplemented formulas; values cross-checked
against /root/reference when present)."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from gaudi_tpu.diffusion.schedule import (
    NoiseSchedule,
    cosine_beta_schedule,
    polynomial_schedule,
)

REFERENCE = "/root/reference"


class TestPolynomial:
    def test_monotone_decreasing(self):
        a2 = polynomial_schedule(1000, s=1e-5, power=2.0)
        assert np.all(np.diff(a2) <= 0)

    def test_range(self):
        a2 = polynomial_schedule(1000, s=1e-5, power=2.0)
        assert a2[0] <= 1.0 and a2[-1] >= 0.0

    def test_precision_floor(self):
        s = 1e-5
        a2 = polynomial_schedule(1000, s=s, power=2.0)
        assert a2[-1] >= s * 0.99


class TestCosine:
    def test_monotone_decreasing(self):
        a2 = cosine_beta_schedule(1000)
        assert np.all(np.diff(a2) <= 1e-12)


class TestNoiseSchedule:
    def test_gamma_lookup_endpoints(self):
        ns = NoiseSchedule.create("polynomial_2", 1000, 1e-5)
        assert ns.gamma_table.shape == (1001,)
        g0 = float(ns.gamma(jnp.array(0.0)))
        g1 = float(ns.gamma(jnp.array(1.0)))
        assert g0 < g1  # gamma increases with t (noise increases)

    def test_alpha_sigma_identity(self):
        # alpha^2 + sigma^2 = 1 for every gamma.
        ns = NoiseSchedule.create("polynomial_2", 1000, 1e-5)
        g = ns.gamma_table
        total = NoiseSchedule.alpha(g) ** 2 + NoiseSchedule.sigma(g) ** 2
        np.testing.assert_allclose(np.asarray(total), 1.0, rtol=1e-6)

    def test_transition_consistency(self):
        # alpha_{t|s} * alpha_s == alpha_t and
        # sigma_t^2 == alpha_{t|s}^2 sigma_s^2 + sigma_{t|s}^2.
        ns = NoiseSchedule.create("polynomial_2", 1000, 1e-5)
        t = jnp.array([0.5]); s = jnp.array([0.3])
        gt, gs = ns.gamma(t), ns.gamma(s)
        s2, _, a_ts = NoiseSchedule.sigma_and_alpha_t_given_s(gt, gs)
        np.testing.assert_allclose(
            float((a_ts * NoiseSchedule.alpha(gs))[0]),
            float(NoiseSchedule.alpha(gt)[0]),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            float((a_ts**2 * NoiseSchedule.sigma(gs) ** 2 + s2)[0]),
            float((NoiseSchedule.sigma(gt) ** 2)[0]),
            rtol=1e-5,
        )

    def test_snr(self):
        ns = NoiseSchedule.create("polynomial_2", 100, 1e-5)
        g = ns.gamma_table
        want = NoiseSchedule.alpha(g) ** 2 / NoiseSchedule.sigma(g) ** 2
        np.testing.assert_allclose(
            np.asarray(NoiseSchedule.snr(g)), np.asarray(want), rtol=1e-4
        )


@pytest.mark.skipif(
    not __import__("os").path.isdir(REFERENCE), reason="reference repo not mounted"
)
class TestGoldenParity:
    """Compare gamma tables against the reference implementation directly."""

    def _ref_gamma(self, name, T, precision):
        if REFERENCE not in sys.path:
            sys.path.insert(0, REFERENCE)
        from edm.equivariant_diffusion.en_diffusion import PredefinedNoiseSchedule

        sched = PredefinedNoiseSchedule(name, T, precision)
        return sched.gamma.detach().numpy()

    def test_polynomial_2_matches_reference(self):
        torch = pytest.importorskip("torch")
        del torch
        ref = self._ref_gamma("polynomial_2", 1000, 1e-5)
        ours = np.asarray(NoiseSchedule.create("polynomial_2", 1000, 1e-5).gamma_table)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_cosine_matches_reference(self):
        pytest.importorskip("torch")
        ref = self._ref_gamma("cosine", 500, 1e-4)
        ours = np.asarray(NoiseSchedule.create("cosine", 500, 1e-4).gamma_table)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
