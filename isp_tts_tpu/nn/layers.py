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


# ---------------------------------------------------------------------------
# Dropout with regenerated backward mask
# ---------------------------------------------------------------------------

import functools

from flax import nnx


def _keep_mask(key, rate, shape):
    """Keep mask from 8-bit random draws: 4x fewer generated bits than the
    f32-from-u32 path of jax.random.bernoulli (profiled at ~1.5 ms/step of
    rbg bit generation for the decoder FF masks alone). The keep probability
    quantizes to round((1-rate)*256)/256 — e.g. rate 0.1 keeps with p=0.8984
    instead of 0.9 — an imperceptible shift of a REGULARIZATION knob, not a
    numerics contract (eval/parity paths never run dropout)."""
    from ..ops.flash_attention import dropout_thresh

    thresh = dropout_thresh(rate)
    if thresh >= 256:  # rate < 1/512 rounds to keep-everything, not drop-1/256
        return jnp.ones(shape, bool)
    bits = jax.random.bits(key, shape, jnp.uint8)
    return bits < jnp.uint8(thresh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dropout_regen(x, key, rate):
    keep = _keep_mask(key, rate, x.shape)
    return jnp.where(keep, x * jnp.asarray(1.0 / (1.0 - rate), x.dtype),
                     jnp.zeros((), x.dtype))


def _dropout_regen_fwd(x, key, rate):
    return _dropout_regen(x, key, rate), key


def _dropout_regen_bwd(rate, key, g):
    keep = _keep_mask(key, rate, g.shape)
    dx = jnp.where(keep, g * jnp.asarray(1.0 / (1.0 - rate), g.dtype),
                   jnp.zeros((), g.dtype))
    return dx, None


_dropout_regen.defvjp(_dropout_regen_fwd, _dropout_regen_bwd)


class FastDropout(nnx.Module):
    """Dropout whose backward REGENERATES the keep mask from the saved PRNG
    key instead of materializing it for autodiff.

    Generic autodiff through ``nnx.Dropout`` stores the boolean mask as a
    residual — for the decoder's six FF blocks that is 6 x 37 MB of mask
    traffic (write + read) per train step (profiled as pred[32,768,1536]
    fusions). Regenerating from the key costs a few VPU passes under the
    trainer's rbg PRNG; the same key always regenerates the same mask. The
    draw uses 8-bit bits (see _keep_mask), so the keep probability is
    quantized to 1/256 relative to nnx.Dropout's.

    ``deterministic`` follows nnx conventions (flipped by model.train() /
    .eval() via set_attributes, like nnx.Dropout).
    """

    def __init__(self, rate: float, *, rngs: nnx.Rngs):
        self.rate = float(rate)
        self.rngs = rngs
        self.deterministic = False

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.deterministic or self.rate == 0.0:
            return x
        return _dropout_regen(x, self.rngs.dropout(), self.rate)
