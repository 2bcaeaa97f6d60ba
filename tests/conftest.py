"""Test config: run JAX on CPU with 8 virtual devices so sharding tests work
without TPU hardware.

Note: this environment's sitecustomize registers an 'axon' remote-TPU backend
and forces jax_platforms='axon,cpu' via jax.config AFTER import — so plain
JAX_PLATFORMS=cpu env vars are ignored. We must override through jax.config
once jax is imported (backends are initialized lazily, so this is safe as
long as no fixture touched a device first)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# This build defaults to reduced matmul precision even on CPU; tests compare
# against torch/numpy float32, so force full precision.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------------------
# Slow-test tiering: tests measured >=1s on the 1-CPU reference box are
# listed in tests/slow_manifest.txt and auto-marked `slow` here, giving a
# <2-min smoke tier via `pytest -m "not slow"` without scattering marks
# through 27 test files. New tests are fast-by-default; re-measure with
# `pytest --durations=0` and append to the manifest when they grow.
# ---------------------------------------------------------------------------

def _load_slow_manifest():
    path = os.path.join(os.path.dirname(__file__), "slow_manifest.txt")
    try:
        with open(path) as f:
            return {ln.strip() for ln in f if ln.strip() and not ln.startswith("#")}
    except OSError:
        return set()


_SLOW = _load_slow_manifest()


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if nodeid in _SLOW:
            item.add_marker(pytest.mark.slow)
