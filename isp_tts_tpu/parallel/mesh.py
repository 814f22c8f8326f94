"""Device mesh + sharding utilities (the Accelerate-equivalent, TPU-native).

The reference delegates all distribution to HF Accelerate over
torch.distributed/NCCL (`SURVEY.md §2.9/§5.8`). Here parallelism is explicit
JAX SPMD: a `jax.sharding.Mesh` over all chips with a ``data`` axis (and an
optional ``model`` axis for tensor-parallel layouts), batches sharded over
``data`` riding ICI, parameters replicated (or sharded over ``model``), and
gradient reduction emitted by XLA from the sharding annotations — no explicit
collectives in user code.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh``; each
process feeds its local shard of every batch
(``jax.make_array_from_process_local_data``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Build a ("data", "model") mesh. ``data=-1`` uses all remaining chips."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    return Mesh(devices.reshape(data, model), axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the ``data`` mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch with the leading axis sharded over ``data``.

    Non-array entries (filenames, raw strings) are passed through. In
    multi-process runs each host holds only its shard of the global batch and
    a global array is assembled across processes.
    """
    sharding = batch_sharding(mesh)
    out = {}
    multiprocess = jax.process_count() > 1
    for key, value in batch.items():
        if not isinstance(value, (np.ndarray, jax.Array)):
            out[key] = value
            continue
        if multiprocess:
            out[key] = jax.make_array_from_process_local_data(sharding, np.asarray(value))
        else:
            out[key] = jax.device_put(value, sharding)
    return out


def process_local_mesh_info() -> tuple[int, int]:
    """(num_processes, process_index) for data-loader sharding."""
    return jax.process_count(), jax.process_index()


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bring-up: `jax.distributed.initialize` (TPU pods auto-detect
    all arguments from the environment; GCE metadata supplies the topology).
    Call once before any jax op. Single-host runs skip this entirely."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
