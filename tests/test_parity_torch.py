"""Golden parity tests against the original PyTorch implementation.

These import the reference code directly from /root/reference (read-only) and
compare our dense JAX reformulation against the scatter-based torch modules
with *identical weights* (converted via gaudi_tpu.utils.torch_compat). Skipped
when the reference checkout or torch is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(REFERENCE):
    pytest.skip("reference repo not mounted", allow_module_level=True)
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

import jax
import jax.numpy as jnp

from gaudi_tpu.models.egnn import EGNNDynamics
from gaudi_tpu.models.predictor import EGNNPredictor
from gaudi_tpu.utils.torch_compat import (
    dynamics_params_from_torch,
    predictor_params_from_torch,
)

B, N, K, H = 2, 5, 2, 16
N_LAYERS, INV_SUB = 2, 2


def _np_inputs(seed=0):
    rng = np.random.default_rng(seed)
    counts = np.array([3, 5])
    nm = (np.arange(N)[None, :] < counts[:, None]).astype(np.float32)
    em = nm[:, :, None] * nm[:, None, :] * (1 - np.eye(N, dtype=np.float32))
    x = rng.standard_normal((B, N, 3)).astype(np.float32) * nm[..., None]
    x = (x - (x.sum(1, keepdims=True) / counts[:, None, None]) * nm[..., None]).astype(np.float32)
    h = rng.standard_normal((B, N, K)).astype(np.float32) * nm[..., None]
    t = np.full((B, 1), 0.4, np.float32)
    return x, h, nm, em, t


class TestDynamicsParity:
    def _torch_model(self):
        from edm.egnn.models import EGNN_dynamics

        torch.manual_seed(0)
        return EGNN_dynamics(
            in_node_nf=K,
            n_dims=3,
            hidden_nf=H,
            n_layers=N_LAYERS,
            attention=True,
            tanh=True,
            norm_constant=1,
            inv_sublayers=INV_SUB,
            sin_embedding=False,
            normalization_factor=1,
            aggregation_method="sum",
            coords_range=4,
            condition_time=True,
            device="cpu",
        )

    def test_forward_matches(self):
        x, h, nm, em, t = _np_inputs()
        ref = self._torch_model()
        xh_t = torch.tensor(np.concatenate([x, h], -1))
        with torch.no_grad():
            out_ref = ref._forward(
                torch.tensor(t),
                xh_t,
                torch.tensor(nm[..., None]),
                torch.tensor(em.reshape(B * N * N, 1)),
                context=None,
            ).numpy()

        model = EGNNDynamics(
            in_node_nf=K,
            hidden_nf=H,
            n_layers=N_LAYERS,
            inv_sublayers=INV_SUB,
            attention=True,
            tanh=True,
            coords_range=4.0,
            norm_constant=1.0,
        )
        params = {
            "params": dynamics_params_from_torch(
                ref.state_dict(), N_LAYERS, INV_SUB, H
            )
        }
        out = model.apply(
            params,
            jnp.asarray(t),
            jnp.asarray(np.concatenate([x, h], -1)),
            jnp.asarray(nm[..., None]),
            jnp.asarray(em),
        )
        np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-4, atol=1e-5)


class TestGNNDynamicsParity:
    """Parity for the non-equivariant 'gnn_dynamics' ablation mode
    (reference edm/egnn/models.py:51-66,119-123)."""

    def test_forward_matches(self):
        from gaudi_tpu.utils.torch_compat import gnn_dynamics_params_from_torch
        from edm.egnn.models import EGNN_dynamics

        x, h, nm, em, t = _np_inputs(seed=3)
        torch.manual_seed(4)
        ref = EGNN_dynamics(
            in_node_nf=K,
            n_dims=3,
            hidden_nf=H,
            n_layers=N_LAYERS,
            attention=False,
            condition_time=True,
            mode="gnn_dynamics",
            normalization_factor=1,
            aggregation_method="sum",
            device="cpu",
        )
        xh_t = torch.tensor(np.concatenate([x, h], -1))
        with torch.no_grad():
            out_ref = ref._forward(
                torch.tensor(t),
                xh_t,
                torch.tensor(nm[..., None]),
                # edge_mask unused by the gnn branch but required by signature
                torch.tensor(em.reshape(B * N * N, 1)),
                context=None,
            ).numpy()

        model = EGNNDynamics(
            in_node_nf=K,
            hidden_nf=H,
            n_layers=N_LAYERS,
            attention=False,
            mode="gnn_dynamics",
        )
        params = {
            "params": gnn_dynamics_params_from_torch(
                ref.state_dict(), N_LAYERS, H, attention=False
            )
        }
        out = model.apply(
            params,
            jnp.asarray(t),
            jnp.asarray(np.concatenate([x, h], -1)),
            jnp.asarray(nm[..., None]),
            jnp.asarray(em),
        )
        np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-4, atol=1e-5)


class TestPredictorParity:
    def _torch_model(self):
        from edm.egnn_predictor.models import EGNN_predictor

        torch.manual_seed(1)
        return EGNN_predictor(
            in_nf=K,
            out_nf=3,
            hidden_nf=H,
            n_layers=N_LAYERS,
            attention=True,
            tanh=True,
            condition_time=True,
            coords_range=4,
            device="cpu",
        )

    def test_forward_matches(self):
        x, h, nm, em, t = _np_inputs(seed=2)
        ref = self._torch_model()
        xh_t = torch.tensor(np.concatenate([x, h], -1))
        with torch.no_grad():
            out_ref = ref(
                xh_t,
                torch.tensor(nm[..., None]),
                torch.tensor(em.reshape(B * N * N, 1)),
                t=torch.tensor(t),
            ).numpy()

        model = EGNNPredictor(
            in_nf=K, out_nf=3, hidden_nf=H, n_layers=N_LAYERS, coords_range=4.0
        )
        params = {"params": predictor_params_from_torch(ref.state_dict(), N_LAYERS, H)}
        out = model.apply(
            params,
            jnp.asarray(np.concatenate([x, h], -1)),
            jnp.asarray(nm[..., None]),
            jnp.asarray(em),
            jnp.asarray(t),
        )
        np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-4, atol=1e-5)

    def test_gradient_matches(self):
        # Guidance relies on d(pred)/d(z); compare against torch autograd.
        x, h, nm, em, t = _np_inputs(seed=3)
        ref = self._torch_model()
        xh_np = np.concatenate([x, h], -1)
        xh_t = torch.tensor(xh_np, requires_grad=True)
        out_ref = ref(
            xh_t,
            torch.tensor(nm[..., None]),
            torch.tensor(em.reshape(B * N * N, 1)),
            t=torch.tensor(t),
        )
        out_ref.sum().backward()
        grad_ref = xh_t.grad.numpy()

        model = EGNNPredictor(
            in_nf=K, out_nf=3, hidden_nf=H, n_layers=N_LAYERS, coords_range=4.0
        )
        params = {"params": predictor_params_from_torch(ref.state_dict(), N_LAYERS, H)}

        def f(z):
            return model.apply(
                params, z, jnp.asarray(nm[..., None]), jnp.asarray(em), jnp.asarray(t)
            ).sum()

        grad = np.asarray(jax.grad(f)(jnp.asarray(xh_np)))
        np.testing.assert_allclose(grad, grad_ref, rtol=1e-3, atol=1e-5)
