"""Pipeline parallelism: GPipe-schedule layer execution over a mesh axis.

Completes the parallelism portfolio (data ``parallel/mesh.py``, tensor
``shard_params`` TP rules, sequence ``ops/ring_attention.py``): when a model
is too deep for one chip, stack the repeated layers' parameters along a
leading axis, shard that axis over a ``stage`` mesh axis, and stream
microbatches through the ring — each device applies its local layers, then
hands its activation to the next stage over ICI via ``ppermute``.

TPU-first formulation (the scaling-book recipe, not a torch-style RPC
pipeline): ONE ``shard_map``-ed program, a ``lax.scan`` over
``n_micro + n_stages - 1`` ticks, static shapes throughout, and a single
collective (the neighbor ``ppermute``) per tick. Autodiff works through the
whole schedule (``ppermute`` transposes to the reverse rotation), so the
same function trains; ``remat=True`` recomputes each tick in the backward.

The reference has no pipeline equivalent (its Accelerate setup is pure DP);
this is scaling machinery for deeper TPU deployments.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..utils.jax_compat import pvary


def pipeline_apply(layer_fn: Callable, stage_params, x: jnp.ndarray,
                   *, axis_name: str, remat: bool = True,
                   with_tick: bool = False) -> jnp.ndarray:
    """Run a stack of layers over pipeline stages; call INSIDE ``shard_map``.

    Args:
      layer_fn: ``layer_fn(params, h) -> h`` applying ONE stage's layer(s) to
        a microbatch activation. ``params`` is this stage's local slice.
        With ``with_tick=True`` the signature is ``layer_fn(params, h, t)``
        — ``t`` is the schedule tick, from which a stage derives its current
        microbatch index as ``t - axis_index`` (for per-microbatch side
        inputs like padding masks, and tick-dependent dropout keys).
      stage_params: pytree whose leaves are this stage's parameters — i.e.
        the global stacked params (leading axis ``n_stages``) sharded over
        ``axis_name`` with the leading axis consumed by shard_map
        (in_spec ``P(axis_name, ...)`` and leading dim 1, squeezed by the
        caller, or any per-stage pytree).
      x: (n_micro, B_micro, ...) microbatched input, replicated across
        stages (every stage sees the same ``x``; only stage 0 reads it).
      axis_name: the ``stage`` mesh axis.
      remat: checkpoint each tick (recompute in the backward).

    Returns:
      (n_micro, B_micro, ...) outputs of the final stage, replicated to all
      stages (so out_specs can be ``P()``; the bubble is the standard
      GPipe ``(S-1)/(S-1+n_micro)`` fraction).
    """
    n_stages = jax.lax.psum(1, axis_name)
    stage = jax.lax.axis_index(axis_name)
    n_micro = x.shape[0]
    ticks = n_micro + n_stages - 1
    is_first = stage == 0
    is_last = stage == n_stages - 1
    # send stage i -> i+1; the wrap edge (S-1 -> 0) carries no live data
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def compute(h_in, t):
        # stage 0 ingests microbatch t while t < n_micro (afterwards it
        # drains the pipe with dummy zeros that are never emitted)
        mb = jax.lax.dynamic_index_in_dim(
            x, jnp.minimum(t, n_micro - 1), axis=0, keepdims=False)
        h = jnp.where(is_first, mb, h_in)
        h = layer_fn(stage_params, h, t) if with_tick else layer_fn(stage_params, h)
        # the last stage emits microbatch (t - (S-1)) at tick t
        return h, jnp.where(is_last, h, jnp.zeros_like(h))

    def tick(carry, t):
        h, out = compute(carry[0], t)
        return (jax.lax.ppermute(h, axis_name, perm),), out

    if remat:
        tick = jax.checkpoint(tick)

    h0 = pvary(jnp.zeros_like(x[0]), axis_name)
    # the last tick's activation goes nowhere — compute it outside the scan
    # so no dead final ppermute is paid (ticks - 1 hops total)
    (h_last,), outs = jax.lax.scan(tick, (h0,), jnp.arange(ticks - 1))
    _, out_last = compute(h_last, ticks - 1)
    outs = jnp.concatenate([outs, out_last[None]], axis=0)

    # outs: (ticks, B_micro, ...) — nonzero only on the last stage at ticks
    # >= S-1. Replicate to every stage (psum: all other stages contributed
    # zeros) and drop the fill ticks.
    outs = jax.lax.psum(outs, axis_name)
    return jax.lax.dynamic_slice_in_dim(outs, n_stages - 1, n_micro, axis=0)


def microbatch(x: jnp.ndarray, n_micro: int) -> jnp.ndarray:
    """(B, ...) -> (n_micro, B / n_micro, ...)."""
    B = x.shape[0]
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by {n_micro} microbatches")
    return x.reshape((n_micro, B // n_micro) + x.shape[1:])
