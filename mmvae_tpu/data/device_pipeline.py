"""Device-resident input pipeline — the BASELINE north star's "fused JAX
preprocessing stage (decode/normalize/index-pair on device)".

The reference's input path is CPU DataLoader workers -> per-batch host->
device copies (utils.py:108-127, dataloaders.py:286-289). Here the full
(deduplicated) base modality arrays live in HBM once — as uint8 when they
came from 8-bit sources — and each training step receives only a batch of
int32 pair indices; the gather through the pairing tables and the
uint8->float normalization happen inside the jitted step, fused by XLA
with the encoder's first layer. Host->device traffic per step: B*4 bytes
per modality instead of B*event_size*4.

For multi-device meshes the index array is sharded over 'data'; the base
arrays are replicated (they are small — MNIST+SVHN ~230MB as uint8).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class DeviceDataPipeline:
    """Holds base modality arrays + pairing index tables on device and
    yields per-step index batches."""

    def __init__(self, base_arrays: Sequence[np.ndarray],
                 pair_indices: Sequence[np.ndarray],
                 batch_size: int, shuffle: bool = True, seed: int = 0,
                 store_uint8: bool = True, mesh=None):
        assert len(base_arrays) == len(pair_indices)
        self.n_mod = len(base_arrays)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self.n_pairs = len(pair_indices[0])
        self.mesh = mesh

        if mesh is not None:
            # multi-device: base arrays + tables replicated, per-step index
            # batches sharded over 'data' (the gather output inherits the
            # row sharding, so the whole step runs data-parallel)
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._rep = NamedSharding(mesh, P())
            self.rows_sharding = NamedSharding(mesh, P(None, "data"))
        else:
            self._rep = None
            self.rows_sharding = None

        self.device_arrays = []
        self.is_uint8 = []
        for arr in base_arrays:
            if store_uint8 and arr.dtype == np.float32 and arr.max() <= 1.0:
                dev = jnp.asarray((arr * 255).round().astype(np.uint8))
                self.is_uint8.append(True)
            elif arr.dtype == np.uint8:
                dev = jnp.asarray(arr)
                self.is_uint8.append(True)
            else:
                dev = jnp.asarray(arr)
                self.is_uint8.append(False)
            if self._rep is not None:
                dev = jax.device_put(dev, self._rep)
            self.device_arrays.append(dev)
        self.pair_indices = [jnp.asarray(i.astype(np.int32)) for i in pair_indices]
        if self._rep is not None:
            self.pair_indices = [jax.device_put(i, self._rep)
                                 for i in self.pair_indices]

    def __len__(self):
        return self.n_pairs // self.batch_size

    @property
    def num_examples(self):
        return self.n_pairs

    def epoch_index_batches(self):
        """Host-side: per-step arrays of pair-row ids (int32)."""
        order = (self._rng.permutation(self.n_pairs) if self.shuffle
                 else np.arange(self.n_pairs)).astype(np.int32)
        stop = self.n_pairs - self.n_pairs % self.batch_size
        for s in range(0, stop, self.batch_size):
            yield order[s: s + self.batch_size]

    @property
    def data_state(self):
        """Device-resident (arrays, tables) to pass as jitted-step ARGUMENTS.
        Closing over them instead would embed them as HLO constants — the
        compile request then carries the full dataset (observed as an HTTP
        413 from the remote-compile tunnel at ~1GB) and every recompile
        re-ships it."""
        return (tuple(self.device_arrays), tuple(self.pair_indices))

    def gather_fn(self):
        """Pure fn(pair_rows, (arrays, tables)) -> [x_m] for use INSIDE a
        jitted train step: index-pair gather + uint8 decode + [0,1]
        normalize, fused by XLA.

        Row extraction uses a one-hot matmul instead of jnp.take: TPU
        gathers from large tables lower to a serial path (measured
        ~290ms/step at 54k rows vs ~0.5ms for the MXU one-hot form). The
        one-hot contraction is EXACT for 8-bit data: bf16 represents
        integers <= 256 exactly and each output row touches one source row.
        """
        flags = tuple(self.is_uint8)
        shapes = tuple(a.shape for a in self.device_arrays)

        def gather(pair_rows, data_state):
            arrays, tables = data_state
            out = []
            for arr, table, u8, shp in zip(arrays, tables, flags, shapes):
                rows = jnp.take(table, pair_rows, axis=0)  # small 1-D table
                n_base = shp[0]
                onehot = (rows[:, None] == jnp.arange(n_base)[None, :])
                flat = arr.reshape(n_base, -1)
                if u8:
                    x = jnp.dot(onehot.astype(jnp.bfloat16),
                                flat.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
                    x = x * (1.0 / 255.0)
                else:
                    x = jnp.dot(onehot.astype(flat.dtype), flat,
                                preferred_element_type=jnp.float32)
                out.append(x.reshape(rows.shape[0], *shp[1:]))
            return out

        return gather


def from_paired_sources(mods: Sequence, idx: Sequence[np.ndarray],
                        batch_size: int, **kw) -> DeviceDataPipeline:
    """Build from (array, labels) tuples + pairing index arrays."""
    return DeviceDataPipeline([m[0] for m in mods], list(idx), batch_size, **kw)


def from_array_loader(loader, shuffle=None, mesh=None) -> DeviceDataPipeline:
    """Wrap an ArrayLoader's dataset as a device-resident pipeline.

    LazyGather modalities (data/loaders.py) ship their deduplicated base
    array + the real pairing table — the pipeline's native form: HBM holds
    each unique image once and the pairing gather happens on-device.
    Materialized modalities fall back to identity tables."""
    from .loaders import LazyGather

    ds = loader.dataset
    n = len(ds)
    arrays, idx = [], []
    for m in ds.modalities:
        if isinstance(m, LazyGather):
            arrays.append(m.base)
            idx.append(m.idx.astype(np.int32))
        else:
            arrays.append(np.asarray(m))
            idx.append(np.arange(n, dtype=np.int32))
    return DeviceDataPipeline(
        arrays, idx, loader.batch_size,
        shuffle=loader.shuffle if shuffle is None else shuffle, mesh=mesh)
