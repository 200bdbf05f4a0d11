"""Data-parallel scale-out over a TPU device mesh.

The reference's only parallelism is DDP over NCCL
(`/root/reference/train_StreamMOS.py:128-174`, SURVEY.md §2.8). The
TPU-native counterpart is a 1-D ``('data',)`` mesh spanning every chip of
every host: batches are sharded on their batch axis, parameters are
replicated, and a single jitted train step makes XLA insert all collectives
(gradient psum over ICI/DCN; global BatchNorm statistics = SyncBN).

Multi-host: call `initialize_distributed()` once per process (the JAX
runtime's `jax.distributed.initialize` discovers peers), then every process
builds the same global mesh and feeds its local shard of each batch through
`host_local_to_global`.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host runtime init (replaces torch.distributed.init_process_group,
    train_StreamMOS.py:130). No-op when single-process."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def data_mesh(devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), ("data",))


def batch_sharding(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, jax.Array],
                axis: int = 0) -> Dict[str, jax.Array]:
    """Place every array in the batch with its batch axis split over 'data'."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate_state(mesh: Mesh, tree):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


def host_local_to_global(mesh: Mesh, local_batch: Dict[str, np.ndarray],
                         axis: int = 0) -> Dict[str, jax.Array]:
    """Assemble a global array from per-host local shards
    (DistributedSampler equivalent: each host loads only its slice)."""
    sh = batch_sharding(mesh, axis)

    def make(x):
        global_shape = list(x.shape)
        global_shape[axis] *= jax.process_count()
        return jax.make_array_from_process_local_data(sh, x, tuple(global_shape))

    return jax.tree_util.tree_map(make, local_batch)


def process_shard_indices(num_samples: int, shuffle_rng: Optional[np.random.Generator],
                          batch_size_global: int) -> np.ndarray:
    """Per-process epoch index shard, mirroring torch's DistributedSampler
    (train_StreamMOS.py:143-150): shuffle globally with a shared seed, pad to
    a multiple of the global batch, then stride-slice by process id."""
    idx = np.arange(num_samples)
    if shuffle_rng is not None:
        shuffle_rng.shuffle(idx)
    per = batch_size_global
    pad = (-len(idx)) % per
    if pad:
        idx = np.concatenate([idx, idx[:pad]])
    return idx[jax.process_index()::jax.process_count()]
