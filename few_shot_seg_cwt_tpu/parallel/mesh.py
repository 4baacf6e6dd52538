"""Device mesh + sharding specs: episode data-parallelism over ICI.

The reference scales with single-node NCCL DDP (reference: src/train_ddp.py:
mp.spawn + DistributedSampler + gradient all-reduce). The TPU-native
equivalent is declarative: build one ``jax.sharding.Mesh`` over all chips,
shard the episode batch axis with ``NamedSharding(P("data"))``, replicate
parameters, and let jit insert the (ICI-riding) collectives — gradient means
come out of the same jitted train step that runs single-chip, with no process
groups, no SyncBN (stage-2 BN is frozen), and no per-rank seed bookkeeping
(episode rngs are split from one key and sharded with the batch).

Multi-host: ``distributed_init(cfg)`` (cfg-gated ``jax.distributed.initialize``)
runs FIRST in every trainer main — before any jax call — and the same code
spans slices (data axis across DCN is still pure data-parallel). Logging is
gated on process 0 at call time (utils.logging.get_logger) — the TPU-native
analog of the reference's rank-0 gating (reference: src/train_ddp.py:40-44);
checkpoint saves are collective (every process calls ``save_ckpt``; orbax
writes from the primary host); globally-sharded outputs come back to every
host via ``to_host`` (process allgather when >1 process).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_distributed_initialized = False


def distributed_init(cfg=None) -> bool:
    """Cfg-gated ``jax.distributed.initialize()`` (idempotent).

    Activates when ``cfg.multi_host`` is set or a JAX coordinator is present in
    the environment (``JAX_COORDINATOR_ADDRESS`` / cloud-TPU metadata picked up
    by jax's auto-detection). Replaces the reference's NCCL process-group setup
    (src/util.py:111-142): no port hunting, no mp.spawn — one call per host
    process and every chip in the slice joins one global device set.

    Returns True when running multi-process after the call.
    """
    global _distributed_initialized
    want = bool(
        (cfg is not None and cfg.get("multi_host"))
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    )
    if want and not _distributed_initialized:
        jax.distributed.initialize()
        _distributed_initialized = True
    return jax.process_count() > 1


def is_main_process() -> bool:
    """True on the host that owns logging/checkpoint writes (process 0)."""
    return jax.process_index() == 0


def to_host(tree: Any) -> Any:
    """Bring (possibly globally-sharded) device outputs to host numpy.

    Single-process: a plain ``np.asarray`` per leaf. Multi-process: leaves
    sharded over hosts are not fully addressable, so allgather them across
    processes first — every host receives the full global value (the episodic
    metric arrays are tiny: (E, num_classes) floats).
    """
    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, tree)
    from jax.experimental import multihost_utils

    return jax.tree.map(
        lambda x: np.asarray(multihost_utils.process_allgather(x, tiled=True)),
        tree,
    )


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
    """device_put every leaf with its leading axis sharded over ``axis``.

    Multi-process: each host passes its *process-local* slice of the global
    batch (loaders build host-local episodes, the DistributedSampler analog)
    and the leaves are assembled into global arrays via
    ``jax.make_array_from_process_local_data``.
    """
    multiproc = jax.process_count() > 1

    def put(x):
        sharding = data_sharding(mesh, np.ndim(x), axis)
        if multiproc:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
