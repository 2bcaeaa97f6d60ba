"""Training-layer tests: optimizer semantics, trainers, DP sharding, resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaudi_tpu.config import EDMConfig, PredictorConfig
from gaudi_tpu.data.synthetic import generate_dataset
from gaudi_tpu.train.optim import adaptive_grad_clip, make_optimizer


class TestAdaptiveClip:
    def _reference_queue(self, norms, max_len=50):
        """Host-side replica of the reference Queue policy (edm/utils.py:31-70)."""
        q = [3000.0]
        thresholds, recorded = [], []
        for n in norms:
            mx = 1.5 * np.mean(q) + 2 * np.std(q)
            thresholds.append(mx)
            rec = min(n, mx)
            recorded.append(rec)
            q.insert(0, rec)
            if len(q) > max_len:
                q.pop()
        return thresholds, recorded

    def test_threshold_matches_reference_queue(self):
        clip = adaptive_grad_clip()
        params = {"w": jnp.zeros(4)}
        state = clip.init(params)
        norms = [10.0, 5.0, 80.0, 3.0, 200.0, 1.0]
        thresholds, _ = self._reference_queue(norms)
        for n, want_thr in zip(norms, thresholds):
            g = {"w": jnp.full(4, n / 2.0)}  # global norm = n
            updates, state = clip.update(g, state)
            got_norm = float(jnp.sqrt(sum(jnp.sum(u**2) for u in jax.tree.leaves(updates))))
            want = min(n, want_thr)
            np.testing.assert_allclose(got_norm, want, rtol=2e-4)

    def test_clip_state_is_jittable(self):
        opt = make_optimizer(1e-3, clip=True)
        params = {"w": jnp.ones(8)}
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            g = {"w": jnp.ones(8)}
            updates, state = opt.update(g, state, params)
            return jax.tree.map(lambda p, u: p + u, params, updates), state

        p, s = step(params, state)
        p, s = step(p, s)
        assert jnp.isfinite(p["w"]).all()

    def test_large_grad_is_clipped(self):
        clip = adaptive_grad_clip()
        state = clip.init({"w": jnp.zeros(2)})
        # feed small norms to shrink the threshold
        for _ in range(60):
            _, state = clip.update({"w": jnp.array([0.6, 0.8])}, state)  # norm 1
        big = {"w": jnp.array([3000.0, 4000.0])}  # norm 5000
        updates, state = clip.update(big, state)
        out_norm = float(jnp.linalg.norm(updates["w"]))
        assert out_norm < 10.0  # threshold ~ 1.5*1 + 2*eps
        assert float(state.last_norm) == pytest.approx(5000.0, rel=1e-4)


@pytest.fixture(scope="module")
def tiny_exp(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("train"))
    csv = generate_dataset(root, "cata", n_molecules=60, seed=0)
    cfg = EDMConfig(
        dataset="cata", csv_file=csv, xyz_root=root + "/cata-xyz",
        max_nodes=11, target_features="GAP_eV",
        n_layers=1, nf=16, diffusion_steps=20, batch_size=16,
        num_epochs=2, save_dir=root + "/summary", name="tiny", lr=1e-3,
    )
    return root, cfg


class TestEDMTrainer:
    def test_loss_decreases(self, tiny_exp):
        from gaudi_tpu.train.trainer_edm import EDMTrainer

        _, cfg = tiny_exp
        tr = EDMTrainer(cfg)
        rng = np.random.default_rng(0)
        key = jax.random.PRNGKey(0)
        m0 = tr.train_epoch(0, rng, key)
        for e in range(1, 4):
            m = tr.train_epoch(e, rng, key)
        assert m["loss"] < m0["loss"]
        assert np.isfinite(m["grad_norm"])

    def test_fit_checkpoint_and_config_roundtrip(self, tiny_exp):
        from gaudi_tpu.train.trainer_edm import EDMTrainer

        _, cfg = tiny_exp
        tr = EDMTrainer(cfg)
        res = tr.fit(num_epochs=2)
        assert os.path.exists(os.path.join(cfg.exp_dir, "args.json"))
        assert np.isfinite(res["test_loss"])

        cfg2 = EDMConfig.load(cfg.exp_dir)
        assert cfg2.nf == cfg.nf and cfg2.restore == cfg.exp_dir
        tr2 = EDMTrainer(cfg2)
        # restored params equal the saved best
        a = jax.tree.leaves(tr2.state.params)[0]
        assert jnp.isfinite(a).all()
        v1 = tr2.eval_epoch(tr2.val_ds, jax.random.PRNGKey(7))
        v2 = tr2.eval_epoch(tr2.val_ds, jax.random.PRNGKey(7))
        assert v1 == pytest.approx(v2)  # deterministic given key

    def test_t_bias_caps_the_biased_slice(self, tiny_exp):
        """With t_bias_frac on, the leading batch slice draws t <= cap*T and
        the t draw is exactly uniform when the bias is off."""
        import dataclasses

        from gaudi_tpu.train.trainer_edm import EDMTrainer

        _, cfg = tiny_exp
        cfg_b = dataclasses.replace(cfg, t_bias_frac=0.5, t_bias_cap=0.1)
        tr = EDMTrainer(cfg_b)

        captured = {}
        orig_loss = tr.edm.loss

        def spy(params, key, x, h, nm, em, training=True, t_int=None, **kw):
            captured["t_int"] = t_int
            return orig_loss(params, key, x, h, nm, em,
                             training=training, t_int=t_int, **kw)

        object.__setattr__(tr.edm, "loss", spy)  # EDM is a frozen pytree dataclass
        batch = next(tr.train_ds.iter_batches(16, rng=np.random.default_rng(0)))
        args = tuple(jnp.asarray(batch[k]) for k in ("x", "h", "n_nodes", "weight"))
        loss, _ = tr._loss_impl(tr.state.params, *args, jax.random.PRNGKey(0), True)
        t = np.asarray(captured["t_int"])[:, 0]
        cap = int(tr.edm.T * 0.1)
        assert (t[:8] <= cap).all()          # biased slice capped
        assert t.min() >= 0 and t.max() <= tr.edm.T
        assert np.isfinite(float(loss))

        # eval path must stay uniform (t_int=None)
        tr._loss_impl(tr.state.params, *args, jax.random.PRNGKey(0), False)
        assert captured["t_int"] is None

    def test_dp_sharded_step_matches_single(self, tiny_exp):
        """The mesh-sharded train step must produce the same loss as the
        unsharded one (same data, same RNG)."""
        from gaudi_tpu.parallel.mesh import create_mesh
        from gaudi_tpu.train.trainer_edm import EDMTrainer

        _, cfg = tiny_exp
        tr1 = EDMTrainer(cfg)
        mesh = create_mesh(8)
        tr2 = EDMTrainer(cfg, mesh=mesh)

        batch = next(tr1.train_ds.iter_batches(16, rng=np.random.default_rng(3)))
        key = jax.random.PRNGKey(5)
        args = tuple(
            jnp.asarray(batch[k]) for k in ("x", "h", "n_nodes", "weight")
        )
        s1, m1 = tr1._train_step(tr1.state, *args, key)
        s2, m2 = tr2._train_step(tr2.state, *args, key)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
        # parameters after the step agree too
        p1 = jax.tree.leaves(s1.params)[0]
        p2 = jax.tree.leaves(s2.params)[0]
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)


    def test_dp_sharded_guided_polish_matches_single(self, tiny_exp):
        """The polish path (incl. the physics-prior guided descent) must be
        sharding-transparent like plain sampling."""
        from gaudi_tpu.parallel.mesh import create_mesh
        from gaudi_tpu.sampling import Sampler
        from gaudi_tpu.train.trainer_edm import EDMTrainer

        _, cfg = tiny_exp
        tr = EDMTrainer(cfg)
        counts = np.full(16, 5, np.int64)
        key = jax.random.PRNGKey(11)
        kw = dict(std=0.7, polish=2, polish_t=0.1, polish_noise=0.5,
                  polish_guide="planarity", polish_guide_scale=20.0)
        s1 = Sampler(tr.edm, cfg.max_nodes)
        x1, h1, _, _ = s1.sample(tr.state.params, key, counts, **kw)
        s2 = Sampler(tr.edm, cfg.max_nodes, mesh=create_mesh(8))
        x2, h2, _, _ = s2.sample(tr.state.params, key, counts, **kw)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))

    def test_dp_sharded_sampling_matches_single(self, tiny_exp):
        """Mesh-sharded sampling must equal single-device sampling exactly:
        JAX PRNG semantics are sharding-independent, so batch-sharding the
        reverse scan over 8 virtual devices is bit-transparent."""
        from gaudi_tpu.parallel.mesh import create_mesh
        from gaudi_tpu.sampling import Sampler
        from gaudi_tpu.train.trainer_edm import EDMTrainer

        _, cfg = tiny_exp
        tr = EDMTrainer(cfg)
        counts = np.full(16, 5, np.int64)
        key = jax.random.PRNGKey(9)
        s1 = Sampler(tr.edm, cfg.max_nodes)
        x1, h1, _, _ = s1.sample(tr.state.params, key, counts, std=0.7)
        s2 = Sampler(tr.edm, cfg.max_nodes, mesh=create_mesh(8))
        x2, h2, _, _ = s2.sample(tr.state.params, key, counts, std=0.7)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))


class TestPredictorTrainer:
    def test_loss_decreases_and_sweep(self, tiny_exp):
        from gaudi_tpu.train.trainer_predictor import PredictorTrainer

        root, ecfg = tiny_exp
        cfg = PredictorConfig(
            dataset="cata", csv_file=ecfg.csv_file, xyz_root=ecfg.xyz_root,
            max_nodes=11, target_features="GAP_eV",
            n_layers=1, nf=16, batch_size=16, num_epochs=2,
            save_dir=root + "/psummary", name="tinyp",
        )
        tr = PredictorTrainer(cfg, edm_cfg=EDMConfig(diffusion_steps=20))
        rng = np.random.default_rng(0)
        key = jax.random.PRNGKey(0)
        # Per-epoch training loss is dominated by the random t draws on this
        # tiny fixture (16-mol batches, clash-rescued nonplanar geometries),
        # so the learning assertion uses a DETERMINISTIC probe instead: the
        # t_fix=0 train-set L1 under a fixed eval key, before vs after
        # training. Everything (data seed, init seed, batch rng, per-epoch
        # split keys) is seeded, so the ~0.06 margin is reproducible.
        pre = tr.eval_epoch(tr.train_ds, jax.random.PRNGKey(42), t_fix=0.0)
        for _ in range(10):
            key, k = jax.random.split(key)
            tr.train_epoch(rng, k)
        post = tr.eval_epoch(tr.train_ds, jax.random.PRNGKey(42), t_fix=0.0)
        assert post < pre, (pre, post)
        # fixed-t eval runs and is finite at both ends of the noise range
        v0 = tr.eval_epoch(tr.val_ds, key, t_fix=0.0)
        vT = tr.eval_epoch(tr.val_ds, key, t_fix=float(tr.T))
        assert np.isfinite(v0) and np.isfinite(vT)


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == args[2].shape
        assert jnp.isfinite(out).all()

    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestInitScale:
    def test_initial_outputs_are_order_unity(self):
        """Regression guard for the init-scale bug: with torch-equivalent
        kernel init, the untrained full-depth dynamics net must produce
        order-unity eps predictions (lecun_normal exploded to ~1e2-1e3,
        making the initial loss ~1e5 and training unstable)."""
        from gaudi_tpu.models.egnn import EGNNDynamics
        from gaudi_tpu.core import masked as M

        nm, em = M.build_masks(jnp.array([11, 8, 10, 9]), 11)
        z = M.sample_combined_noise(jax.random.PRNGKey(0), 4, 11, 3, 1, nm)
        model = EGNNDynamics(in_node_nf=1, hidden_nf=192, n_layers=9)
        p = model.init(jax.random.PRNGKey(1), jnp.full((4, 1), 0.5), z, nm, em)
        out = model.apply(p, jnp.full((4, 1), 0.5), z, nm, em)
        rms = float(jnp.sqrt((out**2).sum() / nm.sum() / out.shape[-1]))
        assert rms < 5.0, f"untrained output rms {rms} — init scale regression"

    def test_initial_loss_sane(self):
        from gaudi_tpu.diffusion.edm import EDM
        from gaudi_tpu.diffusion.schedule import NoiseSchedule
        from gaudi_tpu.models.egnn import EGNNDynamics
        from gaudi_tpu.core import masked as M

        nm, em = M.build_masks(jnp.array([11, 8, 10, 9]), 11)
        x = M.sample_center_gravity_zero_gaussian_with_mask(
            jax.random.PRNGKey(0), (4, 11, 3), nm
        ) * 2.0
        h = jnp.ones((4, 11, 1)) * nm
        model = EGNNDynamics(in_node_nf=1, hidden_nf=96, n_layers=6)
        z = jnp.concatenate([x / 3.0, h / 4.0], -1)
        p = model.init(jax.random.PRNGKey(1), jnp.zeros((4, 1)), z, nm, em)
        edm = EDM(apply_fn=model.apply, schedule=NoiseSchedule.create("polynomial_2", 100), in_node_nf=1)
        loss, _ = edm.loss(p, jax.random.PRNGKey(2), x, h, nm, em, training=True)
        assert float(loss.mean()) < 100.0


class TestEMA:
    def test_ema_params_track_slowly(self, tiny_exp):
        import dataclasses

        from gaudi_tpu.train.trainer_edm import EDMTrainer

        _, cfg = tiny_exp
        cfg_ema = dataclasses.replace(cfg, ema_decay=0.9, name="tiny-ema")
        tr = EDMTrainer(cfg_ema)
        p0 = jax.tree.leaves(tr.state.params)[0].copy()
        tr.train_epoch(0, np.random.default_rng(0), jax.random.PRNGKey(0))
        p1 = jax.tree.leaves(tr.state.params)[0]
        e1 = jax.tree.leaves(tr.state.ema_params)[0]
        # ema moved less than live params
        assert float(jnp.abs(e1 - p0).mean()) < float(jnp.abs(p1 - p0).mean())
        # sampling_params returns the EMA tree
        assert tr.sampling_params is tr.state.ema_params

    def test_high_decay_ema_warms_up_from_init(self, tiny_exp):
        """Regression for the runs/r4s anomaly: at ema_decay=0.9999 a plain
        EMA keeps ~d^t of the RANDOM INIT weights (93% after 725 steps), so
        sampling_params stayed near-noise for tens of thousands of steps
        while train_loss fell. The warmup cap d_t = min(d, (t+1)/(t+10))
        must keep early EMA close to the live params, not the init."""
        import dataclasses

        from gaudi_tpu.train.trainer_edm import EDMTrainer

        _, cfg = tiny_exp
        cfg_ema = dataclasses.replace(cfg, ema_decay=0.9999, name="tiny-ema-hi")
        tr = EDMTrainer(cfg_ema)
        p0 = [a.copy() for a in jax.tree.leaves(tr.state.params)]
        rng = np.random.default_rng(0)
        key = jax.random.PRNGKey(0)
        for e in range(2):
            tr.train_epoch(e, rng, key)
        p = jax.tree.leaves(tr.state.params)
        em = jax.tree.leaves(tr.state.ema_params)
        num = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(em, p))
        den = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(p, p0))
        # without warmup this ratio is ~1.0 (EMA pinned at init); with the
        # warmup cap the EMA is a short-horizon average of recent params
        assert num / den < 0.25, (num, den)

    def test_no_ema_by_default(self, tiny_exp):
        from gaudi_tpu.train.trainer_edm import EDMTrainer

        _, cfg = tiny_exp
        tr = EDMTrainer(cfg)
        assert tr.state.ema_params is None
        assert tr.sampling_params is tr.state.params


class TestBCEPredictor:
    def test_bce_mode_trains_and_binarizes_at_midpoint(self, tmp_path):
        """PredictorConfig.loss='bce': logits head, labels recovered from
        normalized targets at the (0.5-mean)/std midpoint."""
        import jax.numpy as jnp

        from gaudi_tpu.data.synthetic import generate_dataset
        from gaudi_tpu.train.trainer_predictor import PredictorTrainer

        csv = generate_dataset(str(tmp_path), "peri", n_molecules=24,
                               max_rings=7, seed=1, labeled=True,
                               roundtrip_trials=1)
        cfg = PredictorConfig(
            dataset="peri", csv_file=csv, xyz_root=str(tmp_path) + "/peri-xyz",
            max_nodes=7, target_features="VALID", n_layers=1, nf=16,
            batch_size=8, num_epochs=2, save_dir=str(tmp_path) + "/ps",
            name="bce", loss="bce",
        )
        tr = PredictorTrainer(cfg)
        want_mid = (0.5 - tr.train_ds.mean) / tr.train_ds.std
        np.testing.assert_allclose(np.asarray(tr._y_mid), want_mid, rtol=1e-6)
        # normalized labels binarize back to the raw 0/1 column
        y = jnp.asarray(tr.train_ds.collate(np.arange(8))["y"])
        raw = (np.asarray(y) * tr.train_ds.std + tr.train_ds.mean).round()
        assert set(np.unique((np.asarray(y) > np.asarray(tr._y_mid)))) <= {True, False}
        np.testing.assert_array_equal(
            (np.asarray(y) > np.asarray(tr._y_mid)).astype(float), raw
        )
        loss = tr.train_epoch(np.random.default_rng(0), jax.random.PRNGKey(0))
        assert np.isfinite(loss)

    def test_bce_midpoint_raw_when_unnormalized(self, tmp_path):
        """normalize=False: y stays in raw 0/1 units, so the decision
        midpoint must be 0.5, not (0.5-mean)/std (regression)."""
        from gaudi_tpu.data.synthetic import generate_dataset
        from gaudi_tpu.train.trainer_predictor import PredictorTrainer

        csv = generate_dataset(str(tmp_path), "peri", n_molecules=24,
                               max_rings=7, seed=1, labeled=True,
                               roundtrip_trials=1)
        cfg = PredictorConfig(
            dataset="peri", csv_file=csv, xyz_root=str(tmp_path) + "/peri-xyz",
            max_nodes=7, target_features="VALID", n_layers=1, nf=16,
            batch_size=8, num_epochs=2, save_dir=str(tmp_path) + "/ps",
            name="bce-raw", loss="bce", normalize=False,
        )
        tr = PredictorTrainer(cfg)
        np.testing.assert_allclose(np.asarray(tr._y_mid), 0.5)
        y = np.asarray(tr.train_ds.collate(np.arange(8))["y"])
        np.testing.assert_array_equal(
            (y > np.asarray(tr._y_mid)).astype(float), y.round()
        )


class TestLearnedGamma:
    """Trainable GammaNetwork schedule (reference en_diffusion.py:233-272;
    the reference trains it only through the VLB objective)."""

    def _cfg(self, tiny_exp, **kw):
        import dataclasses

        _, cfg = tiny_exp
        return dataclasses.replace(
            cfg, diffusion_noise_schedule="learned",
            diffusion_loss_type="vlb", name="tiny-lg", **kw
        )

    def test_l2_loss_is_rejected(self, tiny_exp):
        import dataclasses

        from gaudi_tpu.train.trainer_edm import EDMTrainer

        cfg = dataclasses.replace(
            self._cfg(tiny_exp), diffusion_loss_type="l2"
        )
        with pytest.raises(ValueError, match="vlb"):
            EDMTrainer(cfg)

    def test_gamma_trains_and_schedule_refreshes(self, tiny_exp):
        from gaudi_tpu.train.trainer_edm import EDMTrainer

        tr = EDMTrainer(self._cfg(tiny_exp))
        g0 = jax.tree.map(lambda a: np.asarray(a).copy(),
                          tr.state.params["gamma"])
        table0 = np.asarray(tr.edm.schedule.gamma_table).copy()

        rng = np.random.default_rng(0)
        m = tr.train_epoch(0, rng, jax.random.PRNGKey(0))
        assert np.isfinite(m["loss"])
        g1 = tr.state.params["gamma"]
        moved = [
            float(np.max(np.abs(np.asarray(b) - a)))
            for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1))
        ]
        assert max(moved) > 0, "gamma params got no gradient signal"

        # bake the learned net into the sampling schedule: table changes
        # from the placeholder and stays monotone (VDM construction)
        tr.refresh_learned_schedule()
        table1 = np.asarray(tr.edm.schedule.gamma_table)
        assert not np.allclose(table1, table0)
        assert (np.diff(table1) >= -1e-5).all(), "learned gamma not monotone"

        # samplers consume the learned schedule unchanged
        x, h = tr.edm.sample(
            tr.sampling_params, jax.random.PRNGKey(1),
            jnp.ones((2, tr.cfg.max_nodes, 1)),
            jnp.ones((2, tr.cfg.max_nodes, tr.cfg.max_nodes)),
        )
        assert np.isfinite(np.asarray(x)).all()
