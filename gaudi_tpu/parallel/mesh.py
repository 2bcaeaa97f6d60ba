"""Device mesh + sharding helpers: the framework's whole "comm backend".

The reference's only parallelism is single-process torch DataParallel
(models_edm.py:13-18, §2.5 of SURVEY.md). The TPU-native equivalent is a 1-D
`jax.sharding.Mesh` over all chips with the molecule batch sharded along it:

- training: jit a global-batch loss; XLA inserts the psum for the mean loss
  and gradient all-reduce over ICI automatically;
- sampling: each chip runs the full reverse `lax.scan` on its batch shard —
  embarrassingly parallel, collectives only for eval statistics.

The primary mesh axis is named "data". Models here are small (<10M params) so
params/opt state are replicated and pure data parallelism is the production
configuration (SURVEY.md §2.5). A second, opt-in "model" axis is nonetheless
supported for the activation-dominant regime (large batch x N^2 x hidden edge
tensors): `create_mesh_2d` builds a ("data", "model") mesh and
`PARALLELISM_RULES` maps the models' logical activation axes
(models/egnn.py EDGE_LOGICAL_AXES / NODE_LOGICAL_AXES) onto it:

- "tp": hidden channels sharded over "model" — each device computes an H/mp
  slice of every edge/node MLP from the replicated weights (column
  parallelism without weight sharding; XLA inserts the psum where a matmul
  contracts the sharded axis);
- "sp": receiver-node axis of the [B, N_r, N_s, H] edge tensor sharded over
  "model" — message aggregation (sum over senders) stays device-local, the
  graph analog of sequence parallelism.

Both are pure `with_sharding_constraint` annotations: no model code changes,
XLA chooses the collectives, and any rule set is bit-compatible with the
unsharded program (tests/test_parallel_tp.py).
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first n (default: all) devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Device-put every [B, ...] array in the batch with the batch axis
    sharded. Batch size must divide the mesh size; the dataset's
    repetition-padded batches (iter_batches) guarantee static shapes."""
    sh = batch_sharding(mesh, axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


# ---------------------------------------------------------------------------
# Opt-in model parallelism (see module docstring).

# logical-axis -> mesh-axis rule sets consumed by flax.linen.logical_axis_rules
PARALLELISM_RULES = {
    "dp": (("batch", "data"),),
    "tp": (("batch", "data"), ("embed", "model")),
    "sp": (("batch", "data"), ("nodes_recv", "model")),
}


def create_mesh_2d(
    dp: int,
    mp: Optional[int] = None,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    """2-D ("data", "model") mesh over dp x mp devices (mp defaults to all
    remaining). The batch shards along `data_axis`; activations shard along
    `model_axis` per PARALLELISM_RULES."""
    devices = jax.devices()
    if mp is None:
        mp = len(devices) // dp
    assert dp * mp <= len(devices), (dp, mp, len(devices))
    return Mesh(
        np.asarray(devices[: dp * mp]).reshape(dp, mp),
        (data_axis, model_axis),
    )


@contextlib.contextmanager
def parallelism_rules(mesh: Optional[Mesh], mode: Optional[str]):
    """Trace-time context that activates a PARALLELISM_RULES entry.

    Must be active while jit TRACES a function whose models carry logical
    constraints; it installs the mesh resource env plus the flax logical-axis
    rules. With mode=None (or mesh=None) it is a no-op, and the logical
    constraints in the models resolve to identity.
    """
    if mesh is None or mode is None:
        yield
        return
    import flax.linen as nn

    with mesh, nn.logical_axis_rules(PARALLELISM_RULES[mode]):
        yield


def call_with_rules(fn, mesh: Optional[Mesh], mode: Optional[str]):
    """Wrap a (typically jitted) callable so every invocation runs under
    `parallelism_rules(mesh, mode)`. jit traces on first call, so the rules
    are in force exactly when the logical constraints are resolved; later
    calls hit the compiled executable and the context costs microseconds."""
    if mesh is None or mode is None:
        return fn

    def wrapped(*args, **kwargs):
        with parallelism_rules(mesh, mode):
            return fn(*args, **kwargs)

    return wrapped
