"""Portable .npz artifact round-trip (utils/artifacts.py).

Artifacts are the cross-machine persistence tier: weights exported from a
training run must reload bit-exactly into a freshly initialized trainer
state, both via the direct API and via the checkpoint loader's artifact-dir
convention (args.json + weights.npz)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gaudi_tpu.train.state import TrainState
from gaudi_tpu.utils.artifacts import (
    artifact_meta,
    load_state_npz,
    save_params_npz,
)


def _toy_state(seed: int, ema: bool = True) -> TrainState:
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "dense": {"kernel": jax.random.normal(k1, (4, 3)),
                  "bias": jax.random.normal(k2, (3,))},
        "out": {"kernel": jax.random.normal(k3, (3, 2))},
    }
    return TrainState.create(params, optax.adam(1e-3), ema=ema)


def test_roundtrip_exact(tmp_path):
    src = _toy_state(0)
    # make EMA differ from live params so the test can tell them apart
    src = src.replace(
        ema_params=jax.tree.map(lambda a: a + 1.0, src.params),
        step=jnp.asarray(123, jnp.int32),
    )
    path = save_params_npz(
        str(tmp_path / "w.npz"), src.params, src.ema_params,
        step=123, meta={"note": "t"},
    )
    dst = load_state_npz(path, _toy_state(1))
    for a, b in zip(jax.tree.leaves(src.params), jax.tree.leaves(dst.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(src.ema_params), jax.tree.leaves(dst.ema_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(dst.step) == 123
    assert artifact_meta(path)["note"] == "t"


def test_missing_ema_falls_back_to_params(tmp_path):
    src = _toy_state(0, ema=False)
    path = save_params_npz(str(tmp_path / "w.npz"), src.params)
    dst = load_state_npz(path, _toy_state(1, ema=True))
    for a, b in zip(jax.tree.leaves(dst.params), jax.tree.leaves(dst.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_structure_drift_raises(tmp_path):
    src = _toy_state(0)
    path = save_params_npz(str(tmp_path / "w.npz"), src.params)
    bad = _toy_state(1)
    bad = bad.replace(
        params={**bad.params, "extra": {"kernel": jnp.zeros((2, 2))}}
    )
    with pytest.raises(KeyError):
        load_state_npz(path, bad)


def test_extra_artifact_keys_raise(tmp_path):
    """Structure drift in the other direction — artifact has params the
    model lost — must fail loudly, not silently load a partial net."""
    src = _toy_state(0)
    big = src.replace(
        params={**src.params, "extra": {"kernel": jnp.zeros((2, 2))}}
    )
    path = save_params_npz(str(tmp_path / "w.npz"), big.params)
    with pytest.raises(KeyError, match="unconsumed"):
        load_state_npz(path, _toy_state(1))


def test_step_dtype_mirrors_target(tmp_path):
    src = _toy_state(0)
    path = save_params_npz(str(tmp_path / "w.npz"), src.params, step=9)
    # (int16 rather than int64: tests run without x64 enabled)
    tgt = _toy_state(1).replace(step=jnp.asarray(0, jnp.int16))
    dst = load_state_npz(path, tgt)
    assert dst.step.dtype == jnp.int16 and int(dst.step) == 9


class TestDatasetStats:
    """Self-contained artifacts: recorded train-split statistics must
    round-trip and reconstruct the sampling priors without the CSV."""

    def _stats_pair(self, tmp_path):
        from gaudi_tpu.config import EDMConfig
        from gaudi_tpu.data import (
            NodesDistribution,
            PropertyDistribution,
            create_datasets,
        )
        from gaudi_tpu.data.synthetic import generate_dataset
        from gaudi_tpu.utils.artifacts import collect_dataset_stats

        root = str(tmp_path)
        csv = generate_dataset(root, "cata", n_molecules=50, seed=0)
        cfg = EDMConfig(
            dataset="cata", csv_file=csv, xyz_root=root + "/cata-xyz",
            max_nodes=11, target_features="GAP_eV,HOMO_eV",
        )
        train, _, _ = create_datasets(cfg.data_config())
        nodes = NodesDistribution.from_dataset(train)
        prop = PropertyDistribution(train)
        return train, nodes, prop, collect_dataset_stats(train, nodes, prop)

    def test_roundtrip(self, tmp_path):
        from gaudi_tpu.data import NodesDistribution, PropertyDistribution
        from gaudi_tpu.utils.artifacts import load_artifact_stats

        train, nodes, prop, stats = self._stats_pair(tmp_path)
        path = save_params_npz(
            str(tmp_path / "w.npz"), _toy_state(0).params, stats=stats
        )
        out = load_artifact_stats(path)
        np.testing.assert_allclose(out["mean"], train.mean)
        np.testing.assert_allclose(out["std"], train.std)
        assert out["n_classes"] == train.n_classes
        assert out["meta"]["train_size"] == len(train)
        assert "csv_sha16" in out["meta"]

        nodes2 = NodesDistribution(histogram=out["nodes_hist"])
        np.testing.assert_allclose(nodes2.prob, nodes.prob)
        np.testing.assert_array_equal(nodes2.n_nodes, nodes.n_nodes)

        prop2 = PropertyDistribution.from_state(out["prop_dist"])
        rng = np.random.default_rng(3)
        n = int(nodes.n_nodes[np.argmax(nodes.prob)])
        a = prop.sample(n, np.random.default_rng(3))
        b = prop2.sample(n, rng)
        np.testing.assert_allclose(a, b)

    def test_drift_warning_fires(self, tmp_path):
        """resolve_datasets warns when the CSV's recomputed stats drift
        >0.05σ from the artifact-recorded ones (regenerated data)."""
        import warnings

        from gaudi_tpu.data.dataset import resolve_datasets

        train, nodes, prop, stats = self._stats_pair(tmp_path)
        arrays, meta = stats
        arrays = dict(arrays)
        arrays["mean"] = arrays["mean"] + 1.0 * arrays["std"]  # 1σ shift
        path = save_params_npz(
            str(tmp_path / "w.npz"), _toy_state(0).params,
            stats=(arrays, meta),
        )
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            dsets = resolve_datasets(train.cfg, path)
        assert any("drift" in str(x.message) for x in w)
        # recorded (shifted) stats win over the recomputed ones
        np.testing.assert_allclose(
            dsets[0].mean, np.asarray(arrays["mean"]), rtol=1e-6
        )

    def test_no_stats_returns_none(self, tmp_path):
        from gaudi_tpu.utils.artifacts import load_artifact_stats

        path = save_params_npz(str(tmp_path / "w.npz"), _toy_state(0).params)
        assert load_artifact_stats(path) is None
        assert load_artifact_stats(str(tmp_path / "missing.npz")) is None

    def test_stats_only_dataset_surface(self, tmp_path):
        from gaudi_tpu.data import (
            NodesDistribution,
            PropertyDistribution,
            StatsOnlyDataset,
        )
        from gaudi_tpu.utils.artifacts import load_artifact_stats

        train, nodes, prop, stats = self._stats_pair(tmp_path)
        path = save_params_npz(
            str(tmp_path / "w.npz"), _toy_state(0).params, stats=stats
        )
        out = load_artifact_stats(path)
        dcfg = train.cfg
        ds = StatsOnlyDataset(dcfg, out)
        assert ds.n_classes == train.n_classes
        assert ds.padded_nodes == train.padded_nodes
        np.testing.assert_allclose(ds.mean, train.mean)
        # the prior constructors accept the stand-in directly
        nd = NodesDistribution.from_dataset(ds)
        np.testing.assert_allclose(nd.prob, nodes.prob)
        pd = PropertyDistribution(ds)
        assert pd.properties == list(prop.properties)
        # anything needing real examples raises informatively
        with pytest.raises(RuntimeError, match="stats-only artifact"):
            next(iter(ds.iter_batches(4)))
        with pytest.raises(RuntimeError, match="stats-only artifact"):
            ds.chem_identities()


def test_checkpoint_loader_artifact_dir(tmp_path):
    """load_checkpoint(<dir with weights.npz, no orbax model/>) uses the
    artifact — the committed-artifact convention used by artifacts/."""
    from gaudi_tpu.train.checkpoints import load_checkpoint

    src = _toy_state(0)
    d = tmp_path / "art"
    os.makedirs(d)
    save_params_npz(str(d / "weights.npz"), src.params, src.ema_params, step=7)
    (d / "args.json").write_text(json.dumps({}))
    dst = load_checkpoint(str(d), _toy_state(1))
    for a, b in zip(jax.tree.leaves(src.params), jax.tree.leaves(dst.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(dst.step) == 7
