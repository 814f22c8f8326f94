"""Activation factory (parity: reference `tts/modules/layers.py:21-52`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

ACTIVATIONS = {
    "linear": lambda x: x,
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "leaky_relu": jax.nn.leaky_relu,
    "elu": jax.nn.elu,
    # "gelu" is the tanh approximation: erf is transcendental-heavy on the
    # VPU (~30% of synthesis time measured) and the approximation error
    # (~3e-3) sits below bf16 compute noise (~1e-2). "gelu_exact" (erf,
    # torch nn.GELU semantics) is for strict f32 parity against reference
    # checkpoints.
    "gelu": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_exact": lambda x: jax.nn.gelu(x, approximate=False),
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "softplus": jax.nn.softplus,
}


def choose_activation(name: str):
    if name not in ACTIVATIONS:
        raise KeyError(f"Unknown activation {name!r}; known: {sorted(ACTIVATIONS)}")
    return ACTIVATIONS[name]


def choose_normalization(name: str | None):
    """Masked normalization factory for (B, T, C) sequences
    (parity: reference `tts/modules/layers.py:55`)."""
    if name is None:
        return None
    from .norms import MaskedBatchNorm1d, MaskedInstanceNorm1d

    table = {"batch": MaskedBatchNorm1d, "instance": MaskedInstanceNorm1d}
    if name not in table:
        raise KeyError(f"Unknown normalization {name!r}; known: {sorted(table)}")
    return table[name]
