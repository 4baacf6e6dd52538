"""Device mesh + sharding specs: episode data-parallelism over ICI.

The reference scales with single-node NCCL DDP (reference: src/train_ddp.py:
mp.spawn + DistributedSampler + gradient all-reduce). The TPU-native
equivalent is declarative: build one ``jax.sharding.Mesh`` over all chips,
shard the episode batch axis with ``NamedSharding(P("data"))``, replicate
parameters, and let jit insert the (ICI-riding) collectives — gradient means
come out of the same jitted train step that runs single-chip, with no process
groups, no SyncBN (stage-2 BN is frozen), and no per-rank seed bookkeeping
(episode rngs are split from one key and sharded with the batch).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and the
same code spans slices (data axis across DCN is still pure data-parallel).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    mesh_shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Mesh over (a prefix of) the local devices; default: all on one axis."""
    devs = list(devices if devices is not None else jax.devices())
    if mesh_shape is None:
        mesh_shape = [len(devs)]
    n = int(np.prod(mesh_shape))
    assert n <= len(devs), f"mesh {mesh_shape} needs {n} devices, have {len(devs)}"
    arr = np.array(devs[:n]).reshape(mesh_shape)
    return Mesh(arr, tuple(axis_names))


def data_sharding(mesh: Mesh, ndim: int = 1, axis: str = "data") -> NamedSharding:
    """Shard leading axis over the data mesh axis, replicate the rest."""
    spec = [None] * ndim
    spec[0] = axis
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """device_put every leaf with its leading axis sharded over ``axis``."""
    def put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x), axis))

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
