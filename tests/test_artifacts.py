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
