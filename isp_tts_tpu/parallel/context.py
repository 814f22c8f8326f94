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

Ownership: strategy state is SCOPED, never leaked. The Trainer activates
its context only around the work that traces under it (``train()`` /
``evaluate()``) and restores the previous context on exit — building a PP
trainer and then running a local, stage-free model in the same process
sees the default context again (the reference gets the same hygiene from
strategy state living inside its Accelerate objects,
`tts/experiments/trainer.py:203`). For scoped overrides in tests and
tools use the ``parallel_context`` manager; ``reset_parallel_context``
restores the defaults unconditionally.
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


def reset_parallel_context() -> None:
    """Restore the default (single-device) context unconditionally."""
    global _context
    _context = ParallelContext()


@contextmanager
def activated(ctx: ParallelContext):
    """Make ``ctx`` the live context for the dynamic extent of the block,
    restoring whatever was live before on exit (re-entrant: a mid-train
    ``evaluate()`` re-activates the same trainer's context harmlessly)."""
    global _context
    prev = _context
    _context = ctx
    try:
        yield ctx
    finally:
        _context = prev


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
