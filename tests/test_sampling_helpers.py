"""Sampler front-end tests: shapes, masking, guidance-vs-unconditional."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaudi_tpu.core import masked as M
from gaudi_tpu.diffusion.edm import EDM
from gaudi_tpu.diffusion.schedule import NoiseSchedule
from gaudi_tpu.models.egnn import EGNNDynamics
from gaudi_tpu.sampling import Sampler, rotate_chain_frames, to_molecule_list


@pytest.fixture(scope="module")
def small_edm():
    in_nf = 2
    model = EGNNDynamics(in_node_nf=in_nf, hidden_nf=16, n_layers=1)
    edm = EDM(
        apply_fn=model.apply,
        schedule=NoiseSchedule.create("polynomial_2", 10),
        in_node_nf=in_nf,
    )
    key = jax.random.PRNGKey(0)
    nm = jnp.ones((2, 5, 1))
    em = M.node2edge_mask(nm)
    z = jnp.zeros((2, 5, 3 + in_nf))
    params = model.init(key, jnp.zeros((2, 1)), z, nm, em)
    return edm, params, in_nf


class TestSampler:
    def test_unconditional_shapes_and_masks(self, small_edm):
        edm, params, in_nf = small_edm
        s = Sampler(edm, max_nodes=5)
        x, h, nm, em = s.sample(params, jax.random.PRNGKey(1), np.array([3, 5, 4, 2]))
        assert x.shape == (4, 5, 3)
        assert h.shape == (4, 5, in_nf)
        # padded slots zero, CoM-free
        assert float(jnp.abs(x * (1 - nm)).max()) == 0
        assert float(jnp.abs((x * nm).sum(1)).max()) < 1e-4
        # h is one-hot on real nodes
        np.testing.assert_allclose(np.asarray(h.sum(-1)), np.asarray(nm[..., 0]))

    def test_zero_scale_guidance_equals_unconditional(self, small_edm):
        """With scale=0 the guidance gradient vanishes; identical keys must
        produce identical samples (the guided step reduces to the plain
        posterior step + idempotent projections)."""
        edm, params, _ = small_edm
        s = Sampler(edm, max_nodes=5)

        def target_fn(z, nm, em, t):
            return (z**2).sum(axis=(1, 2))

        key = jax.random.PRNGKey(2)
        counts = np.array([4, 5])
        xu, hu, _, _ = s.sample(params, key, counts, std=1.0)
        xg, hg, _, _ = s.sample_guidance(params, key, target_fn, counts, scale=0.0, std=1.0)
        np.testing.assert_allclose(np.asarray(xu), np.asarray(xg), atol=1e-5)
        np.testing.assert_allclose(np.asarray(hu), np.asarray(hg), atol=1e-5)

    def test_nonzero_scale_changes_samples(self, small_edm):
        edm, params, _ = small_edm
        s = Sampler(edm, max_nodes=5)

        def target_fn(z, nm, em, t):
            return (z**2).sum(axis=(1, 2))

        key = jax.random.PRNGKey(2)
        counts = np.array([4, 5])
        xu, _, _, _ = s.sample(params, key, counts, std=1.0)
        xg, _, _, _ = s.sample_guidance(params, key, target_fn, counts, scale=5.0, std=1.0)
        assert not np.allclose(np.asarray(xu), np.asarray(xg), atol=1e-4)

    def test_chain_frames(self, small_edm):
        edm, params, in_nf = small_edm
        s = Sampler(edm, max_nodes=5)
        chain = s.sample_chain(params, jax.random.PRNGKey(3), n_nodes=4, keep_frames=8)
        assert chain.shape == (8, 5, 3 + in_nf)
        assert jnp.isfinite(chain).all()
        # last frame is the decoded sample: one-hot features on real nodes
        h_last = np.asarray(chain[-1, :4, 3:])
        np.testing.assert_allclose(h_last.sum(-1), np.ones(4), rtol=1e-4)

    def test_orientation_layout(self, small_edm):
        edm, params, in_nf = small_edm
        s = Sampler(edm, max_nodes=5, orientation=True)
        x, h, nm, em = s.sample(params, jax.random.PRNGKey(4), np.array([3, 4]))
        assert x.shape == (2, 10, 3)
        np.testing.assert_array_equal(
            np.asarray(nm[:, :5, 0]), np.asarray(nm[:, 5:, 0])
        )


class TestHelpers:
    def test_rotate_chain_preserves_features_and_norms(self):
        xh = jnp.asarray(np.random.default_rng(0).normal(size=(4, 7)).astype(np.float32))
        frames = rotate_chain_frames(xh, n_steps=12)
        assert frames.shape == (12, 4, 7)
        np.testing.assert_allclose(
            np.asarray(frames[:, :, 3:]), np.tile(np.asarray(xh[:, 3:]), (12, 1, 1)),
            atol=1e-6,
        )
        norms = np.linalg.norm(np.asarray(frames[:, :, :3]), axis=-1)
        np.testing.assert_allclose(norms, np.tile(norms[:1], (12, 1)), rtol=1e-4)

    def test_to_molecule_list_strips_padding(self):
        x = np.arange(2 * 5 * 3, dtype=np.float32).reshape(2, 5, 3)
        h = np.eye(3, dtype=np.float32)[np.zeros((2, 5), int)]
        nm = np.zeros((2, 5, 1), np.float32)
        nm[0, :3] = 1
        nm[1, :5] = 1
        mols = to_molecule_list(x, h, nm)
        assert mols[0][0].shape == (3, 3)
        assert mols[1][0].shape == (5, 3)

    def test_to_molecule_list_orientation(self):
        # 2*max_nodes layout: ring rows then orientation rows
        max_nodes = 4
        x = np.random.default_rng(0).normal(size=(1, 8, 3)).astype(np.float32)
        h = np.zeros((1, 8, 3), np.float32)
        h[0, :4, 0] = 1
        h[0, 4:, 2] = 1
        nm = np.zeros((1, 8, 1), np.float32)
        nm[0, [0, 1, 4, 5]] = 1  # 2 alive rings
        mols = to_molecule_list(x, h, nm, orientation=True, max_nodes=max_nodes)
        xi, ti = mols[0]
        assert xi.shape == (4, 3)  # 2 rings + 2 orientation nodes
        assert list(ti) == [0, 0, 2, 2]


class TestPolish:
    def test_polish_preserves_contract(self, tiny_setup=None):
        """Polished samples keep the sampler contract: masked, CoM-free,
        one-hot types, finite."""
        import jax
        import jax.numpy as jnp

        from gaudi_tpu.core import masked as M
        from gaudi_tpu.diffusion.edm import EDM
        from gaudi_tpu.diffusion.schedule import NoiseSchedule
        from gaudi_tpu.models.egnn import EGNNDynamics
        from gaudi_tpu.sampling import Sampler

        dyn = EGNNDynamics(in_node_nf=1, hidden_nf=16, n_layers=1)
        edm = EDM(apply_fn=dyn.apply,
                  schedule=NoiseSchedule.create("polynomial_2", 40),
                  in_node_nf=1)
        key = jax.random.PRNGKey(0)
        nm, em = M.build_masks(jnp.array([4, 6], jnp.int32), 8)
        z = M.sample_combined_noise(key, 2, 8, 3, 1, nm)
        params = dyn.init(key, jnp.zeros((2, 1)), z, nm, em)

        s = Sampler(edm, 8)
        x, h, nm2, _ = s.sample(params, key, np.array([4, 6]), std=0.7,
                                polish=2, polish_t=0.1, polish_noise=0.5)
        x, h = np.asarray(x), np.asarray(h)
        nmb = np.asarray(nm2)[..., 0] > 0
        assert np.isfinite(x).all() and np.isfinite(h).all()
        # padded slots zero
        assert np.abs(x[~nmb]).max() == 0
        assert np.abs(h[~nmb]).max() == 0
        # CoM-free per molecule over live nodes
        for i in range(2):
            com = x[i][nmb[i]].mean(0)
            assert np.abs(com).max() < 1e-4
        # one-hot types on live nodes
        live_h = h[nmb]
        assert np.allclose(live_h.sum(-1), 1.0)


class TestPlanarityPrior:
    """diffusion/priors.py: physics-prior energies for guided polish."""

    def _cloud(self, twist):
        rng = np.random.default_rng(0)
        xy = rng.normal(size=(1, 6, 2)) * 2.0
        z = np.zeros((1, 6, 1))
        z[0, ::2, 0] = twist
        return np.concatenate([xy, z], -1).astype(np.float32)

    def test_zero_on_planar_positive_on_twisted(self):
        import jax.numpy as jnp

        from gaudi_tpu.diffusion.priors import planarity_energy

        nm = np.ones((1, 6, 1), np.float32)
        flat = planarity_energy(jnp.asarray(self._cloud(0.0)), jnp.asarray(nm))
        bent = planarity_energy(jnp.asarray(self._cloud(1.0)), jnp.asarray(nm))
        assert float(flat[0]) < 1e-6
        assert float(bent[0]) > 0.1

    def test_rotation_invariant_and_mask_respected(self):
        import jax.numpy as jnp
        from scipy.spatial.transform import Rotation

        from gaudi_tpu.diffusion.priors import planarity_energy

        x = self._cloud(0.7)
        R = Rotation.from_euler("xyz", [0.3, 1.1, -0.6]).as_matrix().astype(np.float32)
        xr = x @ R.T
        nm = np.ones((1, 6, 1), np.float32)
        e1 = planarity_energy(jnp.asarray(x), jnp.asarray(nm))
        e2 = planarity_energy(jnp.asarray(xr), jnp.asarray(nm))
        np.testing.assert_allclose(float(e1[0]), float(e2[0]), rtol=1e-4)
        # masking out the twisted nodes must zero the energy
        nm2 = nm.copy()
        nm2[0, ::2] = 0
        # masked slots may hold garbage — they must not contribute
        xg = x.copy()
        xg[0, ::2] += 99.0
        e3 = planarity_energy(jnp.asarray(xg), jnp.asarray(nm2))
        assert float(e3[0]) < 1e-5

    def test_gradient_flattens(self):
        """One gradient step must reduce the energy (descent direction)."""
        import jax
        import jax.numpy as jnp

        from gaudi_tpu.diffusion.priors import planarity_energy

        nm = jnp.ones((1, 6, 1))
        x = jnp.asarray(self._cloud(0.8))
        g = jax.grad(lambda z: planarity_energy(z, nm).sum())(x)
        assert np.isfinite(np.asarray(g)).all()
        e0 = float(planarity_energy(x, nm)[0])
        e1 = float(planarity_energy(x - 0.1 * g, nm)[0])
        assert e1 < e0

    def test_guided_polish_contract_and_flattening(self):
        """Sampler polish with the planarity guide keeps the sample contract
        and yields flatter clouds than unguided polish (same keys)."""
        import jax
        import jax.numpy as jnp

        from gaudi_tpu.core import masked as M
        from gaudi_tpu.diffusion.edm import EDM
        from gaudi_tpu.diffusion.priors import planarity_energy
        from gaudi_tpu.diffusion.schedule import NoiseSchedule
        from gaudi_tpu.models.egnn import EGNNDynamics
        from gaudi_tpu.sampling import Sampler

        dyn = EGNNDynamics(in_node_nf=1, hidden_nf=16, n_layers=1)
        edm = EDM(apply_fn=dyn.apply,
                  schedule=NoiseSchedule.create("polynomial_2", 40),
                  in_node_nf=1)
        key = jax.random.PRNGKey(0)
        nm, em = M.build_masks(jnp.array([5, 6], jnp.int32), 8)
        z = M.sample_combined_noise(key, 2, 8, 3, 1, nm)
        params = dyn.init(key, jnp.zeros((2, 1)), z, nm, em)

        s = Sampler(edm, 8)
        kw = dict(std=0.7, polish=2, polish_t=0.1, polish_noise=0.5)
        xg, hg, nmg, _ = s.sample(params, key, np.array([5, 6]),
                                  polish_guide="planarity",
                                  polish_guide_scale=50.0, **kw)
        xu, hu, _, _ = s.sample(params, key, np.array([5, 6]), **kw)
        xg, xu = np.asarray(xg), np.asarray(xu)
        assert np.isfinite(xg).all()
        nmb = np.asarray(nmg)[..., 0] > 0
        assert np.abs(xg[~nmb]).max() == 0            # masked slots zero
        for i in range(2):                             # CoM-free
            assert np.abs(xg[i][nmb[i]].mean(0)).max() < 1e-4
        eg = planarity_energy(jnp.asarray(xg), jnp.asarray(nmg)).sum()
        eu = planarity_energy(jnp.asarray(xu), jnp.asarray(nmg)).sum()
        assert float(eg) < float(eu)

    def test_unknown_prior_raises(self):
        import pytest as _pytest

        from gaudi_tpu.diffusion.priors import get_prior

        with _pytest.raises(ValueError, match="unknown prior"):
            get_prior("nope")

    def test_t_windowed_zeroes_energy_and_grad_outside_window(self):
        import jax
        import jax.numpy as jnp

        from gaudi_tpu.diffusion.priors import planarity_energy, t_windowed

        fn = t_windowed(planarity_energy, 0.3)
        nm = jnp.ones((1, 6, 1))
        x = jnp.asarray(self._cloud(0.8))
        hi = jnp.full((1, 1), 0.9)
        lo = jnp.full((1, 1), 0.1)
        assert float(fn(x, nm, None, hi)[0]) == 0.0
        assert float(fn(x, nm, None, lo)[0]) > 0.0
        g_hi = jax.grad(lambda z: fn(z, nm, None, hi).sum())(x)
        g_lo = jax.grad(lambda z: fn(z, nm, None, lo).sum())(x)
        assert float(jnp.abs(g_hi).max()) == 0.0
        assert float(jnp.abs(g_lo).max()) > 0.0


class TestRingAngles3Prior:
    """Differentiable 3-ring-angle window energy (diffusion/priors.py
    ring_angles3_energy) vs the hard checker it soft-mirrors
    (eval_chem/stability.py check_angels3)."""

    @staticmethod
    def _chain(angle_deg, d=2.45, norm_x=3.0, k_classes=1, bn_idx=0, n_pad=0):
        """z for a 3-ring Bn chain: i--j--k with the given center angle."""
        import jax.numpy as jnp

        a = np.radians(angle_deg)
        x = np.array([
            [d, 0.0, 0.0],
            [0.0, 0.0, 0.0],
            [d * np.cos(a), d * np.sin(a), 0.0],
        ])
        n = 3 + n_pad
        xs = np.zeros((1, n, 3))
        xs[0, :3] = x / norm_x
        h = np.zeros((1, n, k_classes))
        h[0, :3, bn_idx] = 1.0
        nm = np.zeros((1, n, 1))
        nm[0, :3] = 1.0
        return jnp.asarray(np.concatenate([xs, h], -1)), jnp.asarray(nm)

    def _energy(self, dataset="cata", **kw):
        from gaudi_tpu.data.rings import RINGS_LIST
        from gaudi_tpu.diffusion.priors import ring_angles3_energy

        names = RINGS_LIST[dataset]
        return ring_angles3_energy(dataset, **kw), len(names), names.index("Bn")

    def test_inside_window_zero_outside_positive(self):
        fn, k, bn = self._energy("cata")
        z_ok, nm = self._chain(120.0, k_classes=k, bn_idx=bn)
        z_bad, _ = self._chain(150.0, k_classes=k, bn_idx=bn)
        e_ok = float(fn(z_ok, nm)[0])
        e_bad = float(fn(z_bad, nm)[0])
        # 150 deg sits in the forbidden gap between cata's 120 and 180
        # windows; 120 deg is inside
        assert e_ok < 1e-3
        assert e_bad > 50.0

    def test_e3_invariance(self):
        import jax.numpy as jnp
        from scipy.spatial.transform import Rotation

        fn, k, bn = self._energy("cata")
        z, nm = self._chain(150.0, k_classes=k, bn_idx=bn)
        r = jnp.asarray(Rotation.from_euler("xyz", [0.3, -1.1, 0.7]).as_matrix())
        z2 = jnp.concatenate([z[..., :3] @ r.T + 0.37, z[..., 3:]], -1)
        # translation moves padded rows too -> mask them consistently
        z2 = z2 * nm + z * (1 - nm) * 0  # padded rows zeroed either way
        np.testing.assert_allclose(
            float(fn(z, nm)[0]), float(fn(z2, nm)[0]), rtol=1e-4
        )

    def test_gradient_descends_into_window(self):
        import jax
        import jax.numpy as jnp

        fn, k, bn = self._energy("cata")
        z, nm = self._chain(150.0, k_classes=k, bn_idx=bn)
        e0 = float(fn(z, nm)[0])
        g = jax.grad(lambda zz: fn(zz, nm).sum())(z)
        assert np.isfinite(np.asarray(g)).all()
        z1 = z - 1e-4 * g
        assert float(fn(z1, nm)[0]) < e0

    def test_dataset_tables_differ(self):
        # 60-degree fan triplets are real peri geometry (window 56.5-65.2)
        # but forbidden cata geometry
        fn_cata, kc, bc = self._energy("cata")
        fn_peri, kp, bp = self._energy("peri")
        zc, nmc = self._chain(60.0, k_classes=kc, bn_idx=bc)
        zp, nmp = self._chain(60.0, k_classes=kp, bn_idx=bp)
        assert float(fn_peri(zp, nmp)[0]) < 1e-3
        assert float(fn_cata(zc, nmc)[0]) > 100.0

    def test_orientation_mode_ignores_marker_rows(self):
        import jax

        from gaudi_tpu.data.rings import RINGS_LIST
        from gaudi_tpu.diffusion.priors import ring_angles3_energy

        names = RINGS_LIST["hetro"]
        k, bn = len(names), names.index("Bn")
        fn = ring_angles3_energy("hetro", max_nodes=4, orientation=True)
        # 4 ring slots (3 live) + 4 marker rows
        z, nm = self._chain(150.0, k_classes=k, bn_idx=bn, n_pad=5)
        nm = nm.at[0, 4:7].set(1.0)  # markers for the 3 live rings
        e = float(fn(z, nm)[0])
        assert e > 1.0  # hetro Bn windows exclude 150 too
        g = jax.grad(lambda zz: fn(zz, nm).sum())(z)
        # marker rows carry zero gradient: only the first max_nodes rows
        # are ring geometry
        assert float(np.abs(np.asarray(g)[0, 4:, :3]).max()) == 0.0

    def test_get_prior_builds_from_context(self):
        from gaudi_tpu.diffusion.priors import get_prior

        fn = get_prior("angles3", dataset="cata", max_nodes=11)
        _, k, bn = self._energy("cata")
        z, nm = self._chain(120.0, k_classes=k, bn_idx=bn)
        assert float(fn(z, nm)[0]) < 1e-3

    def test_composite_prior_spec(self):
        import jax

        from gaudi_tpu.diffusion.priors import get_prior, planarity_energy

        _, k, bn = self._energy("cata")
        z, nm = self._chain(150.0, k_classes=k, bn_idx=bn)
        fa = get_prior("angles3", dataset="cata")
        fc = get_prior("2*planarity+angles3", dataset="cata")
        want = 2.0 * float(planarity_energy(z, nm)[0]) + float(fa(z, nm)[0])
        np.testing.assert_allclose(float(fc(z, nm)[0]), want, rtol=1e-5)
        g = jax.grad(lambda zz: fc(zz, nm).sum())(z)
        assert np.isfinite(np.asarray(g)).all()
