"""Device mesh + sharding helpers.

The reference is single-GPU (main.py:64-66, SURVEY §2.10); here distribution
is a first-class thin layer: a ('data',) — or ('data','k') — mesh, batch
leaves sharded over 'data', params/state replicated, XLA inserting the
gradient all-reduces. Works identically on 1 chip, a v5e slice, or the
8-device virtual CPU mesh used in tests.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_k: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """2-D ('data', 'k') mesh. 'data' shards the batch; 'k' optionally
    shards the IWAE sample axis (the natural second parallel dimension of
    this workload, SURVEY §5)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_k
    devices = devices[: n_data * n_k]
    arr = np.array(devices).reshape(n_data, n_k)
    return Mesh(arr, ("data", "k"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """device_put every leaf with its batch axis sharded over 'data'.

    Ragged tail batches (leading dim not divisible by the 'data' axis size —
    eval loaders keep them, ArrayLoader drop_last=False) are placed
    replicated instead: every device computes the full small batch, which is
    correct and costs one extra compile for the tail shape."""
    n_data = mesh.shape["data"]
    sh = batch_sharding(mesh)
    rep = replicated(mesh)

    def put(a):
        ok = a.ndim > 0 and a.shape[0] % n_data == 0
        return jax.device_put(a, sh if ok else rep)

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
