"""Device mesh + sharding helpers: the distributed backbone.

TPU-native replacement for the reference's NCCL/DDP stack (reference:
utils.py:131-137 init_process_group, :256-258 DistributedDataParallel,
:427-435 all_reduce / all_gather_object, :506-512 DistributedSampler).

The reference's only training parallelism is single-node data parallelism
(SURVEY.md §2.3). Here that is a 1-D ``Mesh(("data",))`` over all chips:
the train step is jitted with the batch sharded on "data" and params
replicated, so XLA inserts the gradient psum over ICI automatically —
there is no explicit collective code to maintain. Metric reductions ride
the same compiled graph. Multi-host execution only needs
``jax.distributed.initialize()`` before mesh construction.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def local_device_count() -> int:
    return len(jax.devices())


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "data",
    backend: Optional[str] = None,
) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices.

    ``backend`` selects the platform explicitly (e.g. ``"cpu"`` for the
    virtual host mesh used in tests and the driver's multi-chip dry run)
    WITHOUT initializing the default backend — ``jax.devices("cpu")`` only
    touches the CPU client, so a broken/absent TPU runtime cannot fail a
    CPU-mesh construction.
    """
    devices = jax.devices(backend) if backend is not None else jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} "
                f"available on backend={backend or 'default'}"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Device-put every array in ``batch`` with its batch axis sharded.

    Multi-host: each process holds only its shard of the global batch
    (ShardedSampler shards the index space by process); the global array is
    assembled with ``make_array_from_process_local_data`` — the JAX
    equivalent of torchrun's per-rank DataLoader + DistributedSampler
    (reference utils.py:506-512, README.md:241-255).
    """
    sh = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda a: jax.make_array_from_process_local_data(sh, np.asarray(a)),
            batch,
        )
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), batch)


def maybe_initialize_distributed() -> bool:
    """``jax.distributed.initialize()`` when a multi-host launch is
    configured (reference NCCL init, utils.py:131-137).

    Triggered by SEMABS_DISTRIBUTED=1 or a coordinator address in the
    environment; a no-op single-host so every CLI can call it
    unconditionally. Returns True when initialization ran.
    """
    import os

    want = os.environ.get("SEMABS_DISTRIBUTED") == "1" or any(
        k in os.environ
        for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")
    )
    if not want:
        return False
    jax.distributed.initialize()
    return True


def all_gather_host_objects(obj):
    """Gather an arbitrary picklable host object from every process
    (reference ``dist.all_gather_object`` of detailed-stats DataFrames,
    utils.py:433-435). Returns the per-process list on every process;
    single-process it is just ``[obj]``.

    Objects ride DCN as padded uint8 buffers via
    ``multihost_utils.process_allgather`` (sizes exchanged first).
    """
    import pickle

    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    data = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([len(data)], np.int64)
    ).reshape(-1)
    buf = np.zeros(int(sizes.max()), np.uint8)
    buf[: len(data)] = data
    bufs = multihost_utils.process_allgather(buf)
    return [
        pickle.loads(bytes(bufs[i, : int(sizes[i])]))
        for i in range(len(sizes))
    ]


def mesh_size_from_args(args) -> int:
    """Devices the training mesh will span: --num_devices, or all
    (process-global) devices when unset; 1 disables the mesh."""
    if getattr(args, "num_devices", None) == 1:
        return 1
    return args.num_devices or len(jax.devices())
