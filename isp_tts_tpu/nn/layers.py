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
    # exact (erf) GELU matches torch nn.GELU() — required for .pt parity;
    # the faster tanh approximation stays available as gelu_tanh
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
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
