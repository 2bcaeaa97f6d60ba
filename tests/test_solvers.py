"""DPM-Solver++ ODE sampler tests (gaudi_tpu/diffusion/solvers.py).

The two oracle tests exercise the solver against closed-form solutions of
the probability-flow ODE:

- point-mass data: the x0-prediction is constant, so the exponential
  integrator is EXACT for any step count — this pins down every piece of
  the lambda/alpha/sigma algebra (a sign or ratio error shows up as O(1));
- Gaussian data: the PF-ODE is the affine map z(t) = m_t + sqrt(v_t/v_T)
  (z_T - m_T) with m_t = alpha_t*mu, v_t = alpha_t^2 tau^2 + sigma_t^2;
  here the x0-prediction varies along the trajectory, so the order-2
  multistep correction must measurably beat order 1 at equal step count.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaudi_tpu.core import masked as M
from gaudi_tpu.diffusion.edm import EDM
from gaudi_tpu.diffusion.schedule import NoiseSchedule
from gaudi_tpu.diffusion.solvers import dpmpp_core, sample_dpmpp
from gaudi_tpu.models.egnn import EGNNDynamics

B, N, K, T = 2, 6, 3, 1000


def _masks():
    counts = jnp.array([3, 5], jnp.int32)
    return M.build_masks(counts, N)


def _xh_star(node_mask):
    """A fixed masked target with CoM-free coordinates."""
    rng = np.random.default_rng(7)
    xh = jnp.asarray(rng.standard_normal((B, N, 3 + K)), jnp.float32)
    xh = xh * node_mask
    x = M.remove_mean_with_mask(xh[..., :3], node_mask)
    return jnp.concatenate([x, xh[..., 3:]], axis=-1)


def _schedule():
    return NoiseSchedule.create("polynomial_2", T, 1e-5)


def _gamma_at(schedule, idx):
    return schedule.gamma_table[idx]


def _oracle_edm(apply_fn):
    return EDM(apply_fn=apply_fn, schedule=_schedule(), in_node_nf=K)


class TestOracleExactness:
    def test_point_mass_exact_any_k(self):
        """With constant x0-prediction the solver must be exact to fp error."""
        node_mask, edge_mask = _masks()
        xh_star = _xh_star(node_mask)
        schedule = _schedule()

        def apply_fn(params, t, zt, nm, em, ctx=None):
            gamma = schedule.gamma(t)[:, :, None]
            alpha = NoiseSchedule.alpha(gamma)
            sigma = NoiseSchedule.sigma(gamma)
            return (zt - alpha * xh_star) / sigma

        edm = _oracle_edm(apply_fn)
        z_T = M.sample_combined_noise(jax.random.PRNGKey(0), B, N, 3, K, node_mask)

        gamma_T = _gamma_at(schedule, T)
        gamma_0 = _gamma_at(schedule, 0)
        a_T, s_T = NoiseSchedule.alpha(gamma_T), NoiseSchedule.sigma(gamma_T)
        a_0, s_0 = NoiseSchedule.alpha(gamma_0), NoiseSchedule.sigma(gamma_0)
        expected = a_0 * xh_star + (s_0 / s_T) * (z_T - a_T * xh_star)

        for n_steps in (2, 5, 25):
            for order in (1, 2):
                z0 = dpmpp_core(
                    edm, None, z_T, node_mask, edge_mask, n_steps, order=order
                )
                err = float(jnp.max(jnp.abs(z0 - expected)))
                assert err < 5e-4, (n_steps, order, err)

    def test_gaussian_order2_beats_order1(self):
        """Affine-flow oracle: order 2 must cut the error vs order 1."""
        node_mask, edge_mask = _masks()
        mu = _xh_star(node_mask)
        tau2 = 0.25
        schedule = _schedule()

        def apply_fn(params, t, zt, nm, em, ctx=None):
            gamma = schedule.gamma(t)[:, :, None]
            alpha = NoiseSchedule.alpha(gamma)
            sigma = NoiseSchedule.sigma(gamma)
            v = alpha**2 * tau2 + sigma**2
            x0_hat = (alpha * tau2 * zt + sigma**2 * mu) / v
            return (zt - alpha * x0_hat) / sigma

        edm = _oracle_edm(apply_fn)
        z_T = M.sample_combined_noise(jax.random.PRNGKey(1), B, N, 3, K, node_mask)

        def moments(idx):
            g = _gamma_at(schedule, idx)
            a, s = NoiseSchedule.alpha(g), NoiseSchedule.sigma(g)
            return a, a**2 * tau2 + s**2

        a_T, v_T = moments(T)
        a_0, v_0 = moments(0)
        expected = a_0 * mu + jnp.sqrt(v_0 / v_T) * (z_T - a_T * mu)

        errs = {}
        for order in (1, 2):
            z0 = dpmpp_core(
                edm, None, z_T, node_mask, edge_mask, 10, order=order
            )
            errs[order] = float(jnp.max(jnp.abs(z0 - expected)))
        assert errs[2] < 0.5 * errs[1], errs
        assert errs[2] < 0.05, errs


def _tiny_model():
    model = EGNNDynamics(in_node_nf=K, hidden_nf=16, n_layers=2, inv_sublayers=1)
    edm = EDM(
        apply_fn=lambda p, t, xh, nm, em, ctx=None: model.apply(p, t, xh, nm, em),
        schedule=_schedule(),
        in_node_nf=K,
    )
    node_mask, edge_mask = _masks()
    zdum = M.sample_combined_noise(jax.random.PRNGKey(0), B, N, 3, K, node_mask)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((B, 1)), zdum, node_mask, edge_mask
    )
    return edm, params, node_mask, edge_mask


class TestSamplerProperties:
    def test_output_invariants(self):
        edm, params, node_mask, edge_mask = _tiny_model()
        x, h = jax.jit(
            lambda p, k: sample_dpmpp(edm, p, k, node_mask, edge_mask, n_steps=8)
        )(params, jax.random.PRNGKey(3))
        assert np.all(np.isfinite(np.asarray(x)))
        # CoM-free coordinates
        com = np.asarray(M.mean_zero_error(x, node_mask))
        assert com < 1e-4
        # padded slots exactly zero
        dead = np.asarray(1.0 - node_mask)
        assert np.abs(np.asarray(x) * dead).max() == 0.0
        assert np.abs(np.asarray(h) * dead).max() == 0.0
        # h is one-hot over real nodes
        hs = np.asarray(h).sum(-1) * np.asarray(node_mask[..., 0])
        np.testing.assert_allclose(hs, np.asarray(node_mask[..., 0]))

    def test_guided_moves_toward_target(self):
        """Against the Gaussian oracle (finite terminal score — a delta
        oracle's 1/sigma^2 score would provably swamp any bounded guidance),
        descending energy = sum x^2 must land the guided trajectory
        measurably closer to the origin: the modified flow's stationary
        point shifts by -tau^2 * grad."""
        node_mask, edge_mask = _masks()
        mu = _xh_star(node_mask)
        tau2 = 0.25
        schedule = _schedule()

        def apply_fn(params, t, zt, nm, em, ctx=None):
            gamma = schedule.gamma(t)[:, :, None]
            alpha = NoiseSchedule.alpha(gamma)
            sigma = NoiseSchedule.sigma(gamma)
            v = alpha**2 * tau2 + sigma**2
            x0_hat = (alpha * tau2 * zt + sigma**2 * mu) / v
            return (zt - alpha * x0_hat) / sigma

        edm = _oracle_edm(apply_fn)

        def target(z, nm, em, t):
            return jnp.square(z[..., :3]).sum(axis=(1, 2))

        key = jax.random.PRNGKey(5)
        x0, _ = sample_dpmpp(edm, None, key, node_mask, edge_mask, n_steps=16)
        xg, _ = sample_dpmpp(
            edm, None, key, node_mask, edge_mask, n_steps=16,
            target_fn=target, scale=2.0,
        )
        assert np.isfinite(np.asarray(xg)).all()
        assert (
            float(jnp.square(xg).sum()) < 0.9 * float(jnp.square(x0).sum())
        ), (float(jnp.square(xg).sum()), float(jnp.square(x0).sum()))

    def test_cfg_composes(self):
        """with_cfg-derived EDM runs through the solver unchanged."""
        from gaudi_tpu.diffusion.cfg import build_context, with_cfg

        model = EGNNDynamics(
            in_node_nf=K, hidden_nf=16, n_layers=2, inv_sublayers=1,
            context_node_nf=2,
        )
        node_mask, edge_mask = _masks()
        ctx = build_context(jnp.ones((B, 1), jnp.float32), node_mask)
        zdum = M.sample_combined_noise(jax.random.PRNGKey(0), B, N, 3, K, node_mask)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((B, 1)), zdum, node_mask, edge_mask,
            ctx,
        )
        edm = EDM(
            apply_fn=lambda p, t, xh, nm, em, c=None: model.apply(
                p, t, xh, nm, em, c
            ),
            schedule=_schedule(),
            in_node_nf=K,
        )
        x, h = sample_dpmpp(
            with_cfg(edm, 1.0), params, jax.random.PRNGKey(9),
            node_mask, edge_mask, n_steps=6, context=ctx,
        )
        assert np.isfinite(np.asarray(x)).all()

    def test_sampler_front_end_dispatch(self):
        """Sampler(solver="dpmpp") routes through the ODE integrator: same
        invariants, distinct jit-cache entry, and the guided path accepts a
        traced scale (the CLI passes scale as a jit argument)."""
        from gaudi_tpu.sampling import Sampler

        edm, params, node_mask, edge_mask = _tiny_model()
        s = Sampler(edm, N)
        counts = jnp.array([3, 5], jnp.int32)
        key = jax.random.PRNGKey(11)
        x_a, h_a, nm, _ = s.sample(params, key, counts, n_steps=8)
        x_d, h_d, _, _ = s.sample(
            params, key, counts, n_steps=8, solver="dpmpp"
        )
        assert np.isfinite(np.asarray(x_d)).all()
        assert float(jnp.abs(x_d * (1.0 - nm)).max()) == 0.0
        # different integrators, same key -> different trajectories
        assert float(jnp.abs(x_a - x_d).max()) > 1e-3

        def target(z, nmk, emk, t):
            return jnp.square(z[..., :3]).sum(axis=(1, 2))

        xg, hg, _, _ = s.sample_guidance(
            params, key, target, counts, scale=1.0, n_steps=8,
            solver="dpmpp",
        )
        assert np.isfinite(np.asarray(xg)).all()
        # scale=0 through the same compiled program = unguided trajectory
        x0g, _, _, _ = s.sample_guidance(
            params, key, target, counts, scale=0.0, n_steps=8,
            solver="dpmpp", std=0.7,
        )
        x_plain, _, _, _ = s.sample(
            params, key, counts, n_steps=8, solver="dpmpp"
        )
        # the guided program adds a zero grad + extra projection, so the
        # compiled arithmetic differs at rounding level only
        np.testing.assert_allclose(
            np.asarray(x0g), np.asarray(x_plain), rtol=1e-5, atol=1e-4
        )

    def test_sampler_dpmpp_dp_sharding_transparent(self):
        """Batch-sharded dpmpp sampling equals the unsharded run bit-for-bit
        (same contract as the ancestral sampler, tests/test_training.py)."""
        from gaudi_tpu.parallel.mesh import create_mesh
        from gaudi_tpu.sampling import Sampler

        edm, params, node_mask, edge_mask = _tiny_model()
        counts = jnp.arange(8, dtype=jnp.int32) % (N - 2) + 2
        key = jax.random.PRNGKey(13)
        s1 = Sampler(edm, N)
        s2 = Sampler(edm, N, mesh=create_mesh(8))
        x1, h1, _, _ = s1.sample(params, key, counts, n_steps=6, solver="dpmpp")
        x2, h2, _, _ = s2.sample(params, key, counts, n_steps=6, solver="dpmpp")
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))

    def test_orientation_mode_invariants(self):
        """hetro-style doubled masks (ring rows + orientation rows, with the
        reference's dead-slot identity quirk) flow through the ODE sampler:
        finite output, dead slots zero, CoM-free over live rows."""
        from gaudi_tpu.sampling import Sampler

        model = EGNNDynamics(
            in_node_nf=K, hidden_nf=16, n_layers=2, inv_sublayers=1
        )
        counts = jnp.array([3, 5], jnp.int32)
        node_mask, edge_mask = M.build_masks(counts, N, orientation=True)
        edm = EDM(
            apply_fn=lambda p, t, xh, nm, em, ctx=None: model.apply(
                p, t, xh, nm, em
            ),
            schedule=_schedule(),
            in_node_nf=K,
        )
        zdum = M.sample_combined_noise(
            jax.random.PRNGKey(0), B, 2 * N, 3, K, node_mask
        )
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((B, 1)), zdum, node_mask,
            edge_mask,
        )
        s = Sampler(edm, N, orientation=True)
        x, h, nm, _ = s.sample(
            params, jax.random.PRNGKey(4), counts, n_steps=6, solver="dpmpp"
        )
        assert x.shape == (B, 2 * N, 3)
        assert np.isfinite(np.asarray(x)).all()
        assert float(jnp.abs(x * (1.0 - nm)).max()) == 0.0
        assert float(M.mean_zero_error(x, nm)) < 1e-4

    def test_chain_frames(self):
        """sample_chain(solver="dpmpp") returns an oldest-noise-first
        trajectory whose final frame matches the Sampler contract (finite,
        masked, one-hot h on real nodes)."""
        from gaudi_tpu.sampling import Sampler

        edm, params, node_mask, edge_mask = _tiny_model()
        s = Sampler(edm, N)
        chain = s.sample_chain(
            params, jax.random.PRNGKey(6), n_nodes=4, n_steps=7,
            solver="dpmpp",
        )
        assert chain.shape[0] == 8  # n_steps + 1 frames
        assert np.isfinite(np.asarray(chain)).all()
        final = np.asarray(chain[-1])  # oldest-first => last = decoded x,h
        h = final[:, 3:]
        live = h.sum(-1) > 0.5
        assert live.sum() == 4
        np.testing.assert_allclose(h[live].sum(-1), 1.0, atol=1e-5)

    def test_padded_slots_stay_zero(self):
        """The solver preserves the padded-zero invariant every masked op
        assumes (remove_mean_with_mask's documented precondition), so the
        scan cannot leak garbage into real nodes."""
        edm, params, node_mask, edge_mask = _tiny_model()
        z = M.sample_combined_noise(jax.random.PRNGKey(2), B, N, 3, K, node_mask)
        assert float(jnp.abs(z * (1.0 - node_mask)).max()) == 0.0
        z0 = dpmpp_core(edm, params, z, node_mask, edge_mask, 4)
        assert float(jnp.abs(z0 * (1.0 - node_mask)).max()) == 0.0
