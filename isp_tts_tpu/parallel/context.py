"""Active-parallelism context: which mesh axes the model should use.

The reference makes its distribution strategy a CONFIG property (Accelerate
``prepare`` at `tts/experiments/trainer.py:203` — the trainer decides, the
model code never changes). The TPU-native equivalent needs one extra piece
of information flow: sequence- and pipeline-parallel execution happen
INSIDE the model's forward (a ``shard_map`` over the ``seq`` axis around
attention, a GPipe schedule over the ``stage`` axis around the layer
stack), so modules need to know, at trace time, which mesh axes are live.

This module is that channel: the Trainer (or a test, or ``dryrun``) sets a
:class:`ParallelContext` before tracing; ``Attention``/``Transformer`` read
it. It is deliberately NOT part of module config — the same checkpoint
trains on a dp mesh today and a dp x sp mesh tomorrow without touching the
model config, exactly like the reference's Accelerate property.

Thread-local is unnecessary: JAX tracing is single-threaded per process and
the context is read only at trace time.

Ownership: the most recently constructed Trainer owns the global context
for its lifetime (training, mid-train eval, and serving from the same
process all read it). Constructing a second Trainer re-publishes — don't
interleave two live Trainers with different strategies in one process; for
scoped overrides (tests, tools) use the ``parallel_context`` manager.
"""

from __future__ import annotations

from contextlib import contextmanager
from dataclasses import dataclass, replace

from jax.sharding import Mesh


@dataclass(frozen=True)
class ParallelContext:
    #: mesh the model is being traced for (None = single-device semantics)
    mesh: Mesh | None = None
    #: mesh axis the SEQUENCE dim is sharded over (None = no sequence
    #: parallelism); `Attention(flash="ring")` dispatches to ring attention
    #: over this axis
    seq_axis: str | None = None
    #: mesh axis pipeline stages are laid out over (None = no pipeline
    #: parallelism); `Transformer(pipeline=True)` runs its GPipe schedule
    #: over this axis
    stage_axis: str | None = None
    #: microbatches streamed through the pipeline per step
    n_micro: int = 4


_context = ParallelContext()


def get_parallel_context() -> ParallelContext:
    return _context


def set_parallel_context(ctx: ParallelContext) -> None:
    global _context
    _context = ctx


@contextmanager
def parallel_context(**kwargs):
    """Temporarily override the parallel context (tests, dryrun)."""
    global _context
    prev = _context
    _context = replace(ParallelContext(), **kwargs)
    try:
        yield _context
    finally:
        _context = prev
