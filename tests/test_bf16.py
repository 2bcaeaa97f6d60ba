"""bfloat16 compute-path tests: same params, close outputs, f32 interfaces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaudi_tpu.core import masked as M
from gaudi_tpu.models.egnn import EGNNDynamics
from gaudi_tpu.models.predictor import EGNNPredictor


@pytest.fixture(scope="module")
def graph():
    key = jax.random.PRNGKey(0)
    counts = jnp.array([8, 11, 5, 11])
    nm, em = M.build_masks(counts, 11)
    z = M.sample_combined_noise(key, 4, 11, 3, 2, nm)
    return z, nm, em


class TestBF16:
    def test_dynamics_bf16_close_to_f32(self, graph):
        z, nm, em = graph
        t = jnp.zeros((4, 1))
        m32 = EGNNDynamics(in_node_nf=2, hidden_nf=64, n_layers=3)
        mbf = EGNNDynamics(in_node_nf=2, hidden_nf=64, n_layers=3, dtype=jnp.bfloat16)
        p = m32.init(jax.random.PRNGKey(1), t, z, nm, em)
        o32 = m32.apply(p, t, z, nm, em)
        obf = mbf.apply(p, t, z, nm, em)
        assert obf.dtype == jnp.float32  # interface stays f32
        rel = float(jnp.abs(o32 - obf).max() / (jnp.abs(o32).max() + 1e-9))
        assert rel < 0.1
        # params are f32 regardless of compute dtype
        assert all(a.dtype == jnp.float32 for a in jax.tree.leaves(p))

    def test_dynamics_bf16_invariants(self, graph):
        z, nm, em = graph
        t = jnp.zeros((4, 1))
        m = EGNNDynamics(in_node_nf=2, hidden_nf=32, n_layers=2, dtype=jnp.bfloat16)
        p = m.init(jax.random.PRNGKey(2), t, z, nm, em)
        out = m.apply(p, t, z, nm, em)
        # padded slots exactly zero; velocity CoM-free
        assert float(jnp.abs(out * (1 - nm)).max()) == 0.0
        vel = out[..., :3]
        assert float(jnp.abs((vel * nm).sum(1)).max()) < 1e-2

    def test_predictor_bf16_close_to_f32(self, graph):
        z, nm, em = graph
        t = jnp.full((4, 1), 0.3)
        m32 = EGNNPredictor(in_nf=2, out_nf=3, hidden_nf=64, n_layers=3)
        mbf = EGNNPredictor(
            in_nf=2, out_nf=3, hidden_nf=64, n_layers=3, dtype=jnp.bfloat16
        )
        p = m32.init(jax.random.PRNGKey(3), z, nm, em, t)
        o32 = m32.apply(p, z, nm, em, t)
        obf = mbf.apply(p, z, nm, em, t)
        assert obf.dtype == jnp.float32
        rel = float(jnp.abs(o32 - obf).max() / (jnp.abs(o32).max() + 1e-9))
        assert rel < 0.1

    def test_bf16_guidance_gradients_finite(self, graph):
        """jax.grad through a bf16 predictor (the guidance path) stays finite
        and close to the f32 gradient direction."""
        z, nm, em = graph
        t = jnp.zeros((4, 1))
        m32 = EGNNPredictor(in_nf=2, out_nf=1, hidden_nf=32, n_layers=2)
        mbf = EGNNPredictor(
            in_nf=2, out_nf=1, hidden_nf=32, n_layers=2, dtype=jnp.bfloat16
        )
        p = m32.init(jax.random.PRNGKey(4), z, nm, em, t)

        g32 = jax.grad(lambda zz: m32.apply(p, zz, nm, em, t).sum())(z)
        gbf = jax.grad(lambda zz: mbf.apply(p, zz, nm, em, t).sum())(z)
        assert jnp.isfinite(gbf).all()
        cos = float(
            (g32 * gbf).sum()
            / (jnp.linalg.norm(g32.ravel()) * jnp.linalg.norm(gbf.ravel()) + 1e-12)
        )
        assert cos > 0.95

    def test_config_dtype_plumbs_through(self):
        from gaudi_tpu.config import EDMConfig
        from gaudi_tpu.train.trainer_edm import build_edm

        model, _ = build_edm(EDMConfig(dtype="bfloat16", nf=16, n_layers=1), 2)
        assert model.dtype == jnp.bfloat16
