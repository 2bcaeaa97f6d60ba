"""Strided few-step reverse sampler (beyond-reference throughput knob).

n_steps=T must be bit-identical to the default full-schedule path (same
PRNG key); n_steps=K<T must produce the same invariants (CoM-free, masked,
one-hot) with a K-length scan; the guided sampler must accept it too.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaudi_tpu.diffusion.edm import EDM
from gaudi_tpu.diffusion.schedule import NoiseSchedule
from gaudi_tpu.models.egnn import EGNNDynamics

B, N, K, H = 2, 5, 2, 16
T = 50


def _setup():
    model = EGNNDynamics(in_node_nf=K, hidden_nf=H, n_layers=2, inv_sublayers=1)
    schedule = NoiseSchedule.create("polynomial_2", T, 1e-5)
    edm = EDM(
        apply_fn=lambda p, t, xh, nm, em, ctx=None: model.apply(p, t, xh, nm, em),
        schedule=schedule,
        in_node_nf=K,
    )
    rng = np.random.default_rng(0)
    counts = np.array([3, 5])
    nm = (np.arange(N)[None, :] < counts[:, None]).astype(np.float32)
    em = nm[:, :, None] * nm[:, None, :] * (1 - np.eye(N, dtype=np.float32))
    x = rng.standard_normal((B, N, 3)).astype(np.float32) * nm[..., None]
    h = np.zeros((B, N, K), np.float32)
    h[..., 0] = 1.0
    h *= nm[..., None]
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, 1)),
        jnp.asarray(np.concatenate([x, h], -1)),
        jnp.asarray(nm[..., None]),
        jnp.asarray(em),
    )
    return edm, params, jnp.asarray(nm[..., None]), jnp.asarray(em), nm


def test_grid_full_schedule_matches_reference_order():
    edm, *_ = _setup()
    t_idx, s_idx = edm._reverse_grid(None)
    np.testing.assert_array_equal(np.asarray(t_idx), np.arange(T, 0, -1))
    np.testing.assert_array_equal(np.asarray(s_idx), np.arange(T - 1, -1, -1))
    t5, s5 = edm._reverse_grid(5)
    np.testing.assert_array_equal(np.asarray(t5), [50, 40, 30, 20, 10])
    np.testing.assert_array_equal(np.asarray(s5), [40, 30, 20, 10, 0])


def test_n_steps_equal_T_is_bit_identical():
    edm, params, nm, em, _ = _setup()
    key = jax.random.PRNGKey(7)
    x0, h0 = edm.sample(params, key, nm, em, std=0.7)
    x1, h1 = edm.sample(params, key, nm, em, std=0.7, n_steps=T)
    np.testing.assert_array_equal(np.asarray(x0), np.asarray(x1))
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))


@pytest.mark.parametrize("n_steps", [5, 10, 25])
def test_strided_sample_invariants(n_steps):
    edm, params, nm, em, nm_flat = _setup()
    x, h = edm.sample(params, jax.random.PRNGKey(3), nm, em, std=0.7,
                      n_steps=n_steps)
    x, h = np.asarray(x), np.asarray(h)
    np.testing.assert_allclose(x.sum(axis=1), 0.0, atol=1e-3)
    assert np.abs(x * (1 - nm_flat[..., None])).max() < 1e-6
    np.testing.assert_allclose(h.sum(-1), nm_flat, atol=1e-6)
    assert np.isfinite(x).all()


def test_strided_guidance_runs():
    edm, params, nm, em, _ = _setup()

    def target(z, node_mask, edge_mask, t):
        return jnp.square(z[..., :3]).sum(axis=(1, 2))

    x, h = edm.sample_guidance(
        params, jax.random.PRNGKey(4), target, nm, em, scale=0.5, n_steps=10
    )
    x = np.asarray(x)
    np.testing.assert_allclose(x.sum(axis=1), 0.0, atol=1e-3)
    assert np.isfinite(x).all()


def test_strided_chain_shapes():
    edm, params, nm, em, _ = _setup()
    chain = edm.sample_chain(
        params, jax.random.PRNGKey(5), nm, em, keep_frames=10, n_steps=10
    )
    assert chain.shape == (10, B, N, 3 + K)
    assert np.isfinite(np.asarray(chain)).all()


def test_n_steps_too_large_raises():
    edm, *_ = _setup()
    with pytest.raises(ValueError):
        edm._reverse_grid(T + 1)
