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
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, seq: int = 1, stage: int = 1,
              devices=None) -> Mesh:
    """Build a ("data", "model", "seq", "stage") mesh.

    ``data=-1`` uses all remaining chips. Size-1 axes are free (they shard
    nothing) — every mesh carries all four names so the downstream sharding
    specs (batch over "data", TP rules over "model", ring attention over
    "seq", the GPipe schedule over "stage") are uniform across dp / dp x tp /
    dp x sp / dp x pp topologies.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    per_data = model * seq * stage
    if data == -1:
        if n % per_data != 0:
            raise ValueError(
                f"{n} devices not divisible by model*seq*stage={per_data}")
        data = n // per_data
    if data * per_data != n:
        raise ValueError(f"mesh {data}x{model}x{seq}x{stage} != {n} devices")
    return Mesh(devices.reshape(data, model, seq, stage),
                axis_names=("data", "model", "seq", "stage"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the ``data`` mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, stacked: bool = False) -> dict:
    """Device-put a host batch with the leading axis sharded over ``data``.

    Non-array entries (filenames, raw strings) are passed through. In
    multi-process runs each host holds only its shard of the global batch and
    a global array is assembled across processes.

    ``stacked=True``: the arrays carry a leading K (steps-per-call) axis in
    front of the batch axis — K is replicated, batch shards over ``data``.
    """
    sharding = (NamedSharding(mesh, P(None, "data")) if stacked
                else batch_sharding(mesh))
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


# ---------------------------------------------------------------------------
# tensor-parallel parameter sharding
# ---------------------------------------------------------------------------

#: path-regex -> PartitionSpec rules for the transformer stack: feed-forward
#: inner dim and attention q/out head dim shard over the "model" axis
#: (Megatron-style column/row splits; XLA inserts the psum at fc2/to_out).
DEFAULT_TP_RULES: list[tuple[str, P]] = [
    (r"\.fc1\.kernel$", P(None, "model")),
    (r"\.fc1\.bias$", P("model")),
    (r"\.fc2\.kernel$", P("model", None)),
    (r"\.to_q\.kernel$", P(None, "model")),
    (r"\.to_out\.kernel$", P("model", None)),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def shard_params(state, mesh: Mesh, rules: list[tuple[str, P]] | None = None):
    """Device-put a parameter pytree with TP rules over the "model" axis;
    everything unmatched (and anything indivisible) is replicated.

    MQA k/v projections stay replicated (single head); q/out and the FF inner
    dimension shard. With mesh model=1 this is plain replication.
    """
    import re

    rules = DEFAULT_TP_RULES if rules is None else rules
    model_size = mesh.shape.get("model", 1)
    stage_size = mesh.shape.get("stage", 1)

    multiprocess = jax.process_count() > 1

    def place(path, leaf):
        spec = P()
        name = _path_str(path)
        if name.endswith(".value"):  # Variable leaf attribute
            name = name[: -len(".value")]
        # pipelined transformers store their layer stack with a leading
        # depth axis (`<...>.stack.<...>`, see nn/transformer.py): TP rules
        # shift right by one REGARDLESS of the stage-axis size (the leading
        # dim is the layer index even on a stage=1 mesh), and the leading
        # axis itself shards over "stage" when that axis is real — each
        # device then holds only its own stages' parameters (the PP memory
        # win)
        stacked = ".stack." in name or name.startswith("stack.")
        if model_size > 1:
            for pattern, candidate in rules:
                if re.search(pattern, name):
                    spec = candidate
                    break
            # verify divisibility; fall back to replication
            for axis, p_axis in enumerate(tuple(spec)):
                if p_axis == "model" and leaf.shape[axis + stacked] % model_size != 0:
                    spec = P()
                    break
        if stacked:
            lead = ("stage" if (stage_size > 1 and hasattr(leaf, "ndim")
                                and leaf.ndim >= 1
                                and leaf.shape[0] % stage_size == 0)
                    else None)
            spec = P(*((lead,) + tuple(spec)))
        sharding = NamedSharding(mesh, spec)
        if multiprocess:
            # device_put rejects shardings spanning non-addressable devices;
            # every process holds the full value (deterministic init), so each
            # feeds its own addressable shards from it
            if hasattr(leaf, "dtype") and jnp.issubdtype(
                    leaf.dtype, jax.dtypes.prng_key):
                # typed PRNG keys: globalize the underlying uint32 data
                data = np.asarray(jax.random.key_data(leaf))
                repl = NamedSharding(mesh, P())
                arr = jax.make_array_from_callback(
                    data.shape, repl, lambda idx, a=data: a[idx])
                return jax.random.wrap_key_data(
                    arr, impl=jax.random.key_impl(leaf))
            host = np.asarray(leaf)
            return jax.make_array_from_callback(
                host.shape, sharding, lambda idx, a=host: a[idx])
        return jax.device_put(leaf, sharding)

    return jax.tree_util.tree_map_with_path(place, state)


def process_local_mesh_info() -> tuple[int, int]:
    """(num_processes, process_index) for data-loader sharding."""
    return jax.process_count(), jax.process_index()


def barrier(name: str) -> None:
    """Cross-host barrier (reference `accelerator.wait_for_everyone`,
    trainer.py:116,441,637). No-op in single-process runs."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def gather_to_host(tree):
    """Materialize a (possibly cross-host-sharded) pytree as host numpy.

    Fully-addressable arrays (single host, or replicated) are fetched
    directly; arrays sharded across processes (e.g. TP over multi-host
    meshes) are allgathered first — `np.asarray` alone raises on
    non-fully-addressable arrays.
    """
    def to_host(leaf):
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            from jax.experimental import multihost_utils

            leaf = multihost_utils.process_allgather(leaf, tiled=True)
        return np.asarray(leaf)

    return jax.tree_util.tree_map(to_host, tree)


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
