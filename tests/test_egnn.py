"""EGNN model tests: E(3) equivariance/invariance, mask independence, shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaudi_tpu.core import masked as M
from gaudi_tpu.models.egnn import EGNNDynamics, coord2diff
from gaudi_tpu.models.predictor import EGNNPredictor

B, N, K, H = 3, 7, 2, 32


def _setup_dynamics(sin_embedding=False):
    model = EGNNDynamics(
        in_node_nf=K, hidden_nf=H, n_layers=2, sin_embedding=sin_embedding
    )
    key = jax.random.PRNGKey(0)
    counts = jnp.array([4, 7, 2])
    nm, em = M.build_masks(counts, N)
    kx, kh, kp = jax.random.split(key, 3)
    x = M.sample_center_gravity_zero_gaussian_with_mask(kx, (B, N, 3), nm)
    h = M.sample_gaussian_with_mask(kh, (B, N, K), nm)
    xh = jnp.concatenate([x, h], axis=-1)
    t = jnp.full((B, 1), 0.5)
    params = model.init(kp, t, xh, nm, em)
    return model, params, t, xh, nm, em


def _random_rotation(seed):
    # numpy float64 QR: this jax build's f32 QR is only ~1e-3 orthogonal.
    m = np.random.default_rng(seed).standard_normal((3, 3))
    q, _ = np.linalg.qr(m)
    return jnp.asarray(q.astype(np.float32))


class TestDynamicsEquivariance:
    def test_rotation_equivariance(self):
        model, params, t, xh, nm, em = _setup_dynamics()
        out = model.apply(params, t, xh, nm, em)
        q = _random_rotation(42)
        x_rot = (xh[..., :3] @ q) * nm
        xh_rot = jnp.concatenate([x_rot, xh[..., 3:]], axis=-1)
        out_rot = model.apply(params, t, xh_rot, nm, em)
        # Velocity rotates, features invariant.
        np.testing.assert_allclose(
            np.asarray(out[..., :3] @ q), np.asarray(out_rot[..., :3]), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out[..., 3:]), np.asarray(out_rot[..., 3:]), atol=1e-4
        )

    def test_output_velocity_is_com_free(self):
        model, params, t, xh, nm, em = _setup_dynamics()
        out = model.apply(params, t, xh, nm, em)
        np.testing.assert_allclose(
            np.asarray(out[..., :3].sum(axis=1)), 0.0, atol=1e-4
        )

    def test_mask_independence(self):
        # Garbage in padded slots must not change real-node outputs.
        model, params, t, xh, nm, em = _setup_dynamics()
        out = model.apply(params, t, xh, nm, em)
        garbage = jax.random.normal(jax.random.PRNGKey(9), xh.shape) * (1 - nm)
        out_g = model.apply(params, t, xh + garbage, nm, em)
        np.testing.assert_allclose(
            np.asarray(out * nm), np.asarray(out_g * nm), atol=1e-4
        )

    def test_sin_embedding_path(self):
        model, params, t, xh, nm, em = _setup_dynamics(sin_embedding=True)
        out = model.apply(params, t, xh, nm, em)
        assert out.shape == xh.shape

    def test_translation_invariance_of_com_free_input(self):
        # Inputs are CoM-free by construction; translating real nodes then
        # re-projecting gives identical input, so this checks the projection
        # convention end-to-end.
        model, params, t, xh, nm, em = _setup_dynamics()
        x = xh[..., :3]
        shifted = M.remove_mean_with_mask((x + 5.0) * nm, nm)
        np.testing.assert_allclose(np.asarray(shifted), np.asarray(x), atol=1e-4)


class TestPredictor:
    def _setup(self):
        model = EGNNPredictor(in_nf=K, out_nf=5, hidden_nf=H, n_layers=2)
        counts = jnp.array([4, 7, 2])
        nm, em = M.build_masks(counts, N)
        kx, kh, kp = jax.random.split(jax.random.PRNGKey(1), 3)
        x = M.sample_center_gravity_zero_gaussian_with_mask(kx, (B, N, 3), nm)
        h = M.sample_gaussian_with_mask(kh, (B, N, K), nm)
        xh = jnp.concatenate([x, h], axis=-1)
        t = jnp.full((B, 1), 0.25)
        params = model.init(kp, xh, nm, em, t)
        return model, params, t, xh, nm, em

    def test_rotation_invariance(self):
        model, params, t, xh, nm, em = self._setup()
        out = model.apply(params, xh, nm, em, t)
        q = _random_rotation(43)
        xh_rot = jnp.concatenate([(xh[..., :3] @ q) * nm, xh[..., 3:]], axis=-1)
        out_rot = model.apply(params, xh_rot, nm, em, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_rot), atol=1e-4)

    def test_output_shape(self):
        model, params, t, xh, nm, em = self._setup()
        assert model.apply(params, xh, nm, em, t).shape == (B, 5)

    def test_mask_independence(self):
        model, params, t, xh, nm, em = self._setup()
        out = model.apply(params, xh, nm, em, t)
        garbage = jax.random.normal(jax.random.PRNGKey(10), xh.shape) * (1 - nm)
        out_g = model.apply(params, xh + garbage, nm, em, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_g), atol=1e-4)

    def test_differentiable_wrt_input(self):
        # Guidance needs grad of the prediction wrt z.
        model, params, t, xh, nm, em = self._setup()

        def f(z):
            return model.apply(params, z, nm, em, t).sum()

        g = jax.grad(f)(xh)
        assert g.shape == xh.shape
        assert bool(jnp.all(jnp.isfinite(g)))


class TestCoord2Diff:
    def test_matches_definition(self):
        x = jnp.array([[[0.0, 0, 0], [3.0, 4.0, 0]]])
        radial, diff = coord2diff(x, norm_constant=1.0)
        assert float(radial[0, 0, 1, 0]) == pytest.approx(25.0)
        np.testing.assert_allclose(
            np.asarray(diff[0, 0, 1]), np.array([-3, -4, 0]) / (5 + 1), atol=1e-5
        )


class TestFlopsModel:
    def test_analytic_floor_tracks_xla_single_forward(self):
        """utils/flops.py must be a floor within ~2x of XLA's own count on
        an un-scanned forward (the scan-body undercount it exists to fix
        does not apply here)."""
        import jax
        import jax.numpy as jnp

        from gaudi_tpu.core import masked as M
        from gaudi_tpu.models.egnn import EGNNDynamics
        from gaudi_tpu.utils.flops import egnn_forward_flops

        B, N, H, L, K = 8, 11, 64, 3, 1
        dyn = EGNNDynamics(in_node_nf=K, hidden_nf=H, n_layers=L)
        nm, em = M.build_masks(jnp.full((B,), 10, jnp.int32), N)
        z = M.sample_combined_noise(jax.random.PRNGKey(0), B, N, 3, K, nm)
        params = dyn.init(jax.random.PRNGKey(0), jnp.zeros((B, 1)), z, nm, em)
        f = jax.jit(lambda p, zz: dyn.apply(p, jnp.zeros((B, 1)), zz, nm, em))
        ca = f.lower(params, z).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        xla = float(ca.get("flops", 0.0))
        if xla <= 0:
            import pytest
            pytest.skip("backend reports no flops")
        ana = egnn_forward_flops(N, H, L, B)
        assert 0.5 * xla <= ana <= 1.05 * xla
