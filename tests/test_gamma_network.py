"""Learned GammaNetwork parity vs the reference torch implementation."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"


def _ref_gamma():
    torch = pytest.importorskip("torch")
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo not mounted")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from edm.equivariant_diffusion.en_diffusion import GammaNetwork

    torch.manual_seed(3)
    return GammaNetwork()


def _params_from_torch(net):
    import jax.numpy as jnp

    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    return {
        "l1_w": jnp.asarray(sd["l1.weight"]),
        "l1_b": jnp.asarray(sd["l1.bias"]),
        "l2_w": jnp.asarray(sd["l2.weight"]),
        "l2_b": jnp.asarray(sd["l2.bias"]),
        "l3_w": jnp.asarray(sd["l3.weight"]),
        "l3_b": jnp.asarray(sd["l3.bias"]),
        "gamma_0": jnp.asarray(sd["gamma_0"]),
        "gamma_1": jnp.asarray(sd["gamma_1"]),
    }


class TestGammaNetwork:
    def test_forward_parity(self):
        torch = pytest.importorskip("torch")
        from gaudi_tpu.diffusion.schedule import GammaNetwork as JG

        ref = _ref_gamma()
        params = _params_from_torch(ref)
        t = np.linspace(0, 1, 33, dtype=np.float32)[:, None]
        with torch.no_grad():
            want = ref(torch.tensor(t)).numpy()
        got = np.asarray(JG.apply(params, t))
        np.testing.assert_allclose(got, want, atol=2e-3)  # f32 reduction order over the 1024-wide hidden layer

    def test_monotone_and_endpoints(self):
        import jax

        from gaudi_tpu.diffusion.schedule import GammaNetwork as JG

        params = JG.init(jax.random.PRNGKey(0))
        t = np.linspace(0, 1, 101, dtype=np.float32)[:, None]
        g = np.asarray(JG.apply(params, t))[:, 0]
        assert (np.diff(g) >= -1e-6).all()
        np.testing.assert_allclose(g[0], -5.0, atol=1e-5)
        np.testing.assert_allclose(g[-1], 10.0, atol=1e-5)

    def test_tabulated_schedule_serves_sampler(self):
        import jax
        import jax.numpy as jnp

        from gaudi_tpu.core import masked as M
        from gaudi_tpu.diffusion.edm import EDM
        from gaudi_tpu.diffusion.schedule import GammaNetwork as JG, NoiseSchedule
        from gaudi_tpu.models.egnn import EGNNDynamics

        params_g = JG.init(jax.random.PRNGKey(1))
        sched = NoiseSchedule.from_gamma_network(params_g, 30)
        assert sched.gamma_table.shape == (31,)

        dyn = EGNNDynamics(in_node_nf=1, hidden_nf=16, n_layers=1)
        edm = EDM(apply_fn=dyn.apply, schedule=sched, in_node_nf=1)
        key = jax.random.PRNGKey(0)
        nm, em = M.build_masks(jnp.array([4], jnp.int32), 6)
        z = M.sample_combined_noise(key, 1, 6, 3, 1, nm)
        p = dyn.init(key, jnp.zeros((1, 1)), z, nm, em)
        x, h = edm.sample(p, key, nm, em, std=0.7)
        assert np.isfinite(np.asarray(x)).all()
