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


#: cross-host barrier deadline; long enough for a cold jit compile on a
#: slow host (Gloo's own collective deadline is a hardcoded ~30 s and
#: cannot be raised — this barrier deliberately does NOT ride Gloo)
BARRIER_TIMEOUT_MS = 600_000


def barrier(name: str, timeout_ms: int | None = None) -> None:
    """Cross-host barrier (reference `accelerator.wait_for_everyone`,
    trainer.py:116,441,637). No-op in single-process runs.

    Uses the distributed COORDINATION SERVICE (`wait_at_barrier`) rather
    than `multihost_utils.sync_global_devices`: the latter is itself a Gloo
    allgather on the CPU backend, so it inherits Gloo's ~30 s rendezvous
    deadline — exactly the deadline a compile-skewed rank blows through on
    a slow host. The coordination-service barrier has a configurable
    deadline and raises an ACTIONABLE error on expiry instead of an opaque
    collective DEADLINE_EXCEEDED."""
    if jax.process_count() <= 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        # barrier ids must be unique per rendezvous; the trainer calls each
        # named barrier in the same order on every rank, so a per-name
        # counter keeps ids aligned across processes
        n = _barrier_seq[name] = _barrier_seq.get(name, 0) + 1
        timeout = BARRIER_TIMEOUT_MS if timeout_ms is None else timeout_ms
        client.wait_at_barrier(f"isp_tts_tpu/{name}/{n}", timeout)
    else:  # initialized without the coordination service: best effort
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


_barrier_seq: dict[str, int] = {}


_aligned_sigs: set = set()


def _align_for_collective(name: str, sig=None) -> None:
    """Align ranks before entering a Gloo collective on the CPU backend.

    Gloo's rendezvous deadline (~30 s, not configurable) fires when one
    rank reaches a cross-process collective while another is still jit-
    compiling the same program — a real failure mode on slow hosts (one
    rank has the program in the persistent compile cache, the other pays a
    cold compile). A coordination-service barrier immediately before the
    collective makes both ranks start compiling together, so they enter
    the Gloo rendezvous within compile-time-variance of each other rather
    than a whole compile apart. No-op on TPU/GPU backends (their
    collectives don't use Gloo).

    Each (name, sig) aligns ONCE per process: after the first call the
    collective's program is compiled (and persistently cached), so skew is
    bounded by execution time, not a whole compile — and a per-leaf
    checkpoint gather must not pay hundreds of barrier RPCs. All ranks see
    the same (name, sig) sequence (SPMD), so the gating stays symmetric."""
    if jax.process_count() <= 1 or jax.default_backend() != "cpu":
        return
    key = (name, sig)
    if key in _aligned_sigs:
        return
    _aligned_sigs.add(key)
    barrier(f"align/{name}")


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

            # enter the Gloo allgather together (see _align_for_collective —
            # an unaligned cold compile on one rank blows Gloo's fixed
            # rendezvous deadline; observed at checkpoint save). Gated per
            # (shape, dtype): one barrier per distinct allgather program.
            _align_for_collective("gather_to_host",
                                  (tuple(leaf.shape), str(leaf.dtype)))
            leaf = multihost_utils.process_allgather(leaf, tiled=True)
        return np.asarray(leaf)

    return jax.tree_util.tree_map(to_host, tree)


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     initialization_timeout: int = 300,
                     heartbeat_timeout_seconds: int = 100) -> None:
    """Multi-host bring-up: `jax.distributed.initialize` (TPU pods auto-detect
    all arguments from the environment; GCE metadata supplies the topology).
    Call once before any jax op. Single-host runs skip this entirely.

    ``initialization_timeout`` / ``heartbeat_timeout_seconds`` are
    pass-throughs to the coordination service — raise them for slow hosts
    where jit-compile skew between ranks can exceed the defaults."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        initialization_timeout=initialization_timeout,
        heartbeat_timeout_seconds=heartbeat_timeout_seconds,
    )


_gloo_clique_key: tuple | None = None


def check_gloo_clique(mesh: Mesh) -> None:
    """Fail FAST instead of deadlocking on a second Gloo clique topology.

    XLA:CPU's Gloo collectives deterministically deadlock context init when
    one process lifetime creates a SECOND distinct cross-process
    communicator-clique structure (e.g. a dp trainer's 8-device clique
    followed by an sp trainer's pairwise seq cliques — reproduced in the
    multihost integration test; the hang sits in Gloo's connectFull, before
    any deadline fires, so the user sees an infinite stall). The Trainer
    registers its strategy mesh here: a second Trainer with a DIFFERENT
    cross-process topology on the Gloo backend raises an actionable error
    instead. TPU/GPU backends (no Gloo) are exempt, as are single-process
    runs."""
    global _gloo_clique_key
    if jax.process_count() <= 1 or jax.default_backend() != "cpu":
        return
    key = tuple(sorted(mesh.shape.items()))
    if _gloo_clique_key is None:
        _gloo_clique_key = key
    elif key != _gloo_clique_key:
        raise RuntimeError(
            "XLA:CPU's Gloo collectives cannot initialize a second distinct "
            f"cross-process communicator clique in one process: this process "
            f"already trained with mesh topology {dict(_gloo_clique_key)} "
            f"and now requests {dict(mesh.shape)} — Gloo context init would "
            "deadlock (hang, no error). Run each parallelism strategy in a "
            "fresh process group. TPU/GPU multi-host backends do not use "
            "Gloo and are unaffected.")
