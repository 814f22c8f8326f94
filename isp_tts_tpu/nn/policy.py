"""Global compute-dtype policy (mixed precision).

Modules read the policy at construction time and pass it as the flax
``dtype`` (computation dtype) while keeping ``param_dtype`` float32 — the
TPU-native equivalent of Accelerate's fp16 autocast: bf16 matmuls on the MXU,
f32 master weights, f32 gradient/optimizer math, no loss scaling.

Usage::

    with compute_dtype(jnp.bfloat16):
        model = AcousticModel(cfg, rngs=rngs)
"""

from __future__ import annotations

import contextlib

import jax.numpy as jnp

_COMPUTE_DTYPE = [None]  # None = infer (full) precision

_NAMES = {
    "bf16": jnp.bfloat16,
    "bfloat16": jnp.bfloat16,
    "fp32": jnp.float32,
    "float32": jnp.float32,
    "fp16": jnp.float16,
    "float16": jnp.float16,
}


def resolve_dtype(name):
    if name is None or not isinstance(name, str):
        return name
    if name in ("fp32", "float32"):
        return None  # default promotion keeps f32
    return _NAMES[name]


def get_compute_dtype():
    return _COMPUTE_DTYPE[0]


@contextlib.contextmanager
def compute_dtype(dtype):
    """Set the computation dtype for modules constructed in this scope."""
    _COMPUTE_DTYPE.append(None)  # guard for exceptions in nested use
    _COMPUTE_DTYPE.pop()
    prev = _COMPUTE_DTYPE[0]
    _COMPUTE_DTYPE[0] = resolve_dtype(dtype) if isinstance(dtype, str) else dtype
    try:
        yield
    finally:
        _COMPUTE_DTYPE[0] = prev
