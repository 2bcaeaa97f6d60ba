"""Fused edge-block kernels: exact equivalence with the unfused modules.

On CPU these tests exercise the jnp fallback + custom_vjp wiring; on TPU the
same call sites run the Pallas kernels (validated separately on hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaudi_tpu.core import masked as M
from gaudi_tpu.models.egnn import EGNNDynamics
from gaudi_tpu.models.fused_convert import params_to_fused
from gaudi_tpu.ops.fused_edge import (
    _attn_sum_jnp,
    _coord_jnp,
    edge_block_attn_sum,
    edge_block_coord,
)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    counts = jnp.array([8, 11, 5, 11])
    nm, em = M.build_masks(counts, 11)
    z = M.sample_combined_noise(key, 4, 11, 3, 2, nm)
    t = jnp.full((4, 1), 0.3)
    return z, nm, em, t


class TestOps:
    def _random_args(self, b=4, n=11, h=32, e=2, seed=0):
        ks = jax.random.split(jax.random.PRNGKey(seed), 9)
        return (
            jax.random.normal(ks[0], (b, n, h)),
            jax.random.normal(ks[1], (b, n, h)),
            jax.random.normal(ks[2], (b, n, n, e)),
            (jax.random.uniform(ks[3], (b, n, n)) > 0.3).astype(jnp.float32),
            jax.random.normal(ks[4], (h, h)) * 0.1,  # placeholder, w_e below
            jax.random.normal(ks[5], (e, h)) * 0.5,
            jax.random.normal(ks[6], (h, h)) * 0.2,
            jax.random.normal(ks[7], (h,)) * 0.1,
            jax.random.normal(ks[8], (h,)) * 0.3,
        )

    def test_attn_sum_matches_reference(self):
        src, dst, ea, em, _, w_e, w2, b2, w_a = self._random_args()
        b_a = jnp.float32(0.1)
        got = edge_block_attn_sum(src, dst, ea, em, w_e, w2, b2, w_a, b_a)
        want = _attn_sum_jnp(src, dst, ea, em, w_e, w2, b2, w_a, b_a)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_attn_sum_grads(self):
        src, dst, ea, em, _, w_e, w2, b2, w_a = self._random_args(seed=1)
        b_a = jnp.float32(-0.2)

        def f_fused(*a):
            return (edge_block_attn_sum(*a) ** 2).sum()

        def f_ref(*a):
            return (_attn_sum_jnp(*a) ** 2).sum()

        args = (src, dst, ea, em, w_e, w2, b2, w_a, b_a)
        g1 = jax.grad(f_fused, argnums=(0, 4, 5, 6, 7, 8))(*args)
        g2 = jax.grad(f_ref, argnums=(0, 4, 5, 6, 7, 8))(*args)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)

    @pytest.mark.parametrize("tanh", [True, False])
    def test_coord_matches_reference(self, tanh):
        src, dst, ea, em, _, w_e, w2, b2, w_g = self._random_args(seed=2)
        cd = jax.random.normal(jax.random.PRNGKey(9), (4, 11, 11, 3))
        got = edge_block_coord(src, dst, ea, em, cd, w_e, w2, b2, w_g, tanh, 4.0)
        want = _coord_jnp(src, dst, ea, em, cd, w_e, w2, b2, w_g, tanh, 4.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


class TestFusedModel:
    def test_fused_dynamics_matches_unfused(self, setup):
        z, nm, em, t = setup
        m_ref = EGNNDynamics(in_node_nf=2, hidden_nf=64, n_layers=2)
        m_fused = EGNNDynamics(in_node_nf=2, hidden_nf=64, n_layers=2, use_fused=True)
        p = m_ref.init(jax.random.PRNGKey(1), t, z, nm, em)
        pf = params_to_fused(p)
        o_ref = m_ref.apply(p, t, z, nm, em)
        o_fused = m_fused.apply(pf, t, z, nm, em)
        np.testing.assert_allclose(
            np.asarray(o_ref), np.asarray(o_fused), atol=5e-5
        )

    def test_fused_gradients_match(self, setup):
        z, nm, em, t = setup
        m_ref = EGNNDynamics(in_node_nf=2, hidden_nf=32, n_layers=2)
        m_fused = EGNNDynamics(in_node_nf=2, hidden_nf=32, n_layers=2, use_fused=True)
        p = m_ref.init(jax.random.PRNGKey(2), t, z, nm, em)
        pf = params_to_fused(p)
        g_ref = params_to_fused(
            jax.grad(lambda pp: (m_ref.apply(pp, t, z, nm, em) ** 2).sum())(p)
        )
        g_fused = jax.grad(
            lambda pp: (m_fused.apply(pp, t, z, nm, em) ** 2).sum()
        )(pf)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)):
            scale = float(jnp.abs(a).max()) + 1e-6
            assert float(jnp.abs(a - b).max()) / scale < 1e-4

    def test_fused_bf16(self, setup):
        z, nm, em, t = setup
        m32 = EGNNDynamics(in_node_nf=2, hidden_nf=32, n_layers=2, use_fused=True)
        mbf = EGNNDynamics(
            in_node_nf=2, hidden_nf=32, n_layers=2, use_fused=True,
            dtype=jnp.bfloat16,
        )
        pf = m32.init(jax.random.PRNGKey(3), t, z, nm, em)
        o32 = m32.apply(pf, t, z, nm, em)
        obf = mbf.apply(pf, t, z, nm, em)
        rel = float(jnp.abs(o32 - obf).max() / (jnp.abs(o32).max() + 1e-9))
        assert obf.dtype == jnp.float32 and rel < 0.1


class TestFusedPredictor:
    def test_fused_predictor_matches(self, setup):
        from gaudi_tpu.models.predictor import EGNNPredictor

        z, nm, em, t = setup
        m_ref = EGNNPredictor(in_nf=2, out_nf=3, hidden_nf=64, n_layers=3)
        m_fused = EGNNPredictor(
            in_nf=2, out_nf=3, hidden_nf=64, n_layers=3, use_fused=True
        )
        p = m_ref.init(jax.random.PRNGKey(4), z, nm, em, t)
        pf = params_to_fused(p)
        o1 = m_ref.apply(p, z, nm, em, t)
        o2 = m_fused.apply(pf, z, nm, em, t)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=5e-5)

    def test_fused_predictor_input_grads_match(self, setup):
        """The guidance path differentiates the predictor wrt its input —
        the fused custom_vjp must agree with the unfused autodiff."""
        from gaudi_tpu.models.predictor import EGNNPredictor

        z, nm, em, t = setup
        m_ref = EGNNPredictor(in_nf=2, out_nf=1, hidden_nf=32, n_layers=2)
        m_fused = EGNNPredictor(
            in_nf=2, out_nf=1, hidden_nf=32, n_layers=2, use_fused=True
        )
        p = m_ref.init(jax.random.PRNGKey(5), z, nm, em, t)
        pf = params_to_fused(p)
        g1 = jax.grad(lambda zz: m_ref.apply(p, zz, nm, em, t).sum())(z)
        g2 = jax.grad(lambda zz: m_fused.apply(pf, zz, nm, em, t).sum())(z)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
