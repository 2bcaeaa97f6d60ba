"""Device mesh + sharding helpers: the framework's whole "comm backend".

The reference's only parallelism is single-process torch DataParallel
(models_edm.py:13-18, §2.5 of SURVEY.md). The TPU-native equivalent is a 1-D
`jax.sharding.Mesh` over all chips with the molecule batch sharded along it:

- training: jit a global-batch loss; XLA inserts the psum for the mean loss
  and gradient all-reduce over ICI automatically;
- sampling: each chip runs the full reverse `lax.scan` on its batch shard —
  embarrassingly parallel, collectives only for eval statistics.

The mesh axis is named "data". Models here are small (<10M params) so
params/opt state are replicated; a second mesh axis for tensor parallelism is
deliberately left out (nothing to gain at these sizes — SURVEY.md §2.5).
"""

from __future__ import annotations

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
