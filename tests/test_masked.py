"""Unit tests for masked dense-graph primitives (gaudi_tpu.core.masked)."""

import jax
import jax.numpy as jnp
import numpy as np

from gaudi_tpu.core import masked as M


def _random_masks(key, b=4, n=7):
    counts = jax.random.randint(key, (b,), 1, n + 1)
    nm = M.nodes_to_node_mask(counts, n)
    return counts, nm


class TestRemoveMean:
    def test_masked_mean_is_zero(self):
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        _, nm = _random_masks(k1)
        x = jax.random.normal(k2, (4, 7, 3)) * nm[..., None]
        out = M.remove_mean_with_mask(x, nm[..., None])
        np.testing.assert_allclose(np.asarray(out.sum(axis=1)), 0.0, atol=1e-5)

    def test_padded_slots_stay_zero(self):
        key = jax.random.PRNGKey(1)
        k1, k2 = jax.random.split(key)
        _, nm = _random_masks(k1)
        x = jax.random.normal(k2, (4, 7, 3)) * nm[..., None]
        out = M.remove_mean_with_mask(x, nm[..., None])
        assert bool(M.is_correctly_masked(out, nm[..., None]))

    def test_idempotent(self):
        key = jax.random.PRNGKey(2)
        k1, k2 = jax.random.split(key)
        _, nm = _random_masks(k1)
        x = jax.random.normal(k2, (4, 7, 3)) * nm[..., None]
        once = M.remove_mean_with_mask(x, nm[..., None])
        twice = M.remove_mean_with_mask(once, nm[..., None])
        np.testing.assert_allclose(np.asarray(once), np.asarray(twice), atol=1e-6)


class TestNoiseSamplers:
    def test_com_free_sampler(self):
        key = jax.random.PRNGKey(3)
        k1, k2 = jax.random.split(key)
        _, nm = _random_masks(k1, b=8, n=11)
        z = M.sample_center_gravity_zero_gaussian_with_mask(
            k2, (8, 11, 3), nm[..., None]
        )
        np.testing.assert_allclose(np.asarray(z.sum(axis=1)), 0.0, atol=1e-5)
        assert bool(M.is_correctly_masked(z, nm[..., None]))

    def test_feature_noise_masked(self):
        key = jax.random.PRNGKey(4)
        k1, k2 = jax.random.split(key)
        _, nm = _random_masks(k1, b=8, n=11)
        z = M.sample_gaussian_with_mask(k2, (8, 11, 5), nm[..., None])
        assert bool(M.is_correctly_masked(z, nm[..., None]))

    def test_combined_noise_shape_and_std(self):
        # Marginal std of the feature part should be ~1 on real nodes.
        key = jax.random.PRNGKey(5)
        nm = jnp.ones((64, 11, 1))
        z = M.sample_combined_noise(key, 64, 11, 3, 4, nm)
        assert z.shape == (64, 11, 7)
        std = np.asarray(z[..., 3:]).std()
        assert abs(std - 1.0) < 0.05

    def test_std_scaling(self):
        key = jax.random.PRNGKey(6)
        nm = jnp.ones((64, 11, 1))
        z = M.sample_combined_noise(key, 64, 11, 3, 4, nm, std=0.7)
        assert abs(np.asarray(z[..., 3:]).std() - 0.7) < 0.05


class TestLogLikelihoods:
    def test_standard_gaussian_matches_closed_form(self):
        key = jax.random.PRNGKey(7)
        nm = jnp.ones((2, 3, 1))
        x = jax.random.normal(key, (2, 3, 4))
        got = M.standard_gaussian_log_likelihood_with_mask(x, nm)
        want = (-0.5 * np.square(np.asarray(x)) - 0.5 * np.log(2 * np.pi)).reshape(
            2, -1
        ).sum(-1)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)

    def test_subspace_likelihood_dof(self):
        # For x = 0 the log-likelihood equals the normalizing constant with
        # (n-1)*d degrees of freedom.
        nm = jnp.ones((1, 5, 1))
        x = jnp.zeros((1, 5, 3))
        got = float(
            M.center_gravity_zero_gaussian_log_likelihood_with_mask(x, nm)[0]
        )
        want = -0.5 * (5 - 1) * 3 * np.log(2 * np.pi)
        assert abs(got - want) < 1e-5


class TestMasks:
    def test_node2edge_mask_no_diagonal(self):
        nm = jnp.ones((2, 5))
        em = M.node2edge_mask(nm)
        assert em.shape == (2, 5, 5)
        np.testing.assert_allclose(np.asarray(em[:, np.arange(5), np.arange(5)]), 0.0)

    def test_node2edge_mask_respects_padding(self):
        nm = M.nodes_to_node_mask(jnp.array([3]), 5)
        em = np.asarray(M.node2edge_mask(nm))[0]
        assert em[:3, :3].sum() == 3 * 3 - 3
        assert em[3:, :].sum() == 0 and em[:, 3:].sum() == 0

    def test_orientation_edge_mask_structure(self):
        nm = M.nodes_to_node_mask(jnp.array([2]), 3)
        em = M.node2edge_mask(nm)
        oem = np.asarray(M.orientation_edge_mask(em))[0]
        n = 3
        # ring<->ring block
        assert oem[0, 1] == 1 and oem[0, 0] == 0
        # ring<->orientation identity couplings (reference uses full identity)
        for i in range(n):
            assert oem[i, n + i] == 1 and oem[n + i, i] == 1
        # orientation<->orientation block is zero
        assert oem[n:, n:].sum() == 0

    def test_build_masks_roundtrip(self):
        counts = jnp.array([2, 3])
        nm, em = M.build_masks(counts, 4, orientation=True)
        assert nm.shape == (2, 8, 1)
        assert em.shape == (2, 8, 8)
        np.testing.assert_allclose(
            np.asarray(nm[..., 0].sum(axis=1)), 2 * np.asarray(counts)
        )
