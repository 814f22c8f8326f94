"""Normalization layers.

Parity with reference `tts/modules/transformer/normalization.py` (LayerNorm
with uniform condition interface, AdaptiveLayerNorm for flow-time AdaLN
conditioning) and `tts/modules/normalization.py` (masked instance norm used in
the aligner convolutions, where padded positions must not pollute statistics).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

from .policy import get_compute_dtype


class LayerNorm(nnx.Module):
    """LayerNorm accepting (and ignoring) a ``condition`` argument so that
    adaptive and plain norms are interchangeable inside transformer layers.

    Statistics are computed in f32; under a bf16 compute policy the OUTPUT is
    cast to bf16 inside the same XLA fusion. The consumers (q/k/v and FF
    projections) are bf16 matmuls that would perform the identical cast
    anyway, so numerics are unchanged — but the materialized (B, L, D)
    intermediate written to HBM is half the bytes (profiled: the 13 pre-norm
    LN fusions were ~9% of the train step as f32 stores)."""

    def __init__(self, dim: int, bias: bool = True, eps: float = 1e-5, *, rngs: nnx.Rngs):
        self.norm = nnx.LayerNorm(dim, epsilon=eps, use_bias=bias, rngs=rngs)
        self.out_dtype = get_compute_dtype()

    def __call__(self, x: jnp.ndarray, condition: jnp.ndarray | None = None) -> jnp.ndarray:
        out = self.norm(x)
        if self.out_dtype is not None:
            out = out.astype(self.out_dtype)
        return out


class AdaptiveLayerNorm(nnx.Module):
    """AdaLN: scale/shift are linear projections of a condition vector.

    Zero-init projection kernels with ones/zeros output bias -> behaves as
    identity-scale LayerNorm at init (reference normalization.py:37-61). This
    is the flow-matching time-conditioning mechanism.
    """

    def __init__(self, dim: int, condition_dim: int, bias: bool = True,
                 eps: float = 1e-5, *, rngs: nnx.Rngs):
        self.eps = eps
        self.out_dtype = get_compute_dtype()
        self.weight = nnx.Linear(
            condition_dim, dim, kernel_init=nnx.initializers.zeros_init(),
            bias_init=nnx.initializers.ones_init(), rngs=rngs,
        )
        self.bias = (
            nnx.Linear(
                condition_dim, dim, kernel_init=nnx.initializers.zeros_init(),
                bias_init=nnx.initializers.zeros_init(), rngs=rngs,
            )
            if bias
            else None
        )

    def __call__(self, x: jnp.ndarray, condition: jnp.ndarray | None = None) -> jnp.ndarray:
        xf = x.astype(jnp.float32)  # statistics in f32 even on a bf16 stream
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        normed = (xf - mean) / jnp.sqrt(var + self.eps)
        if condition is not None:
            if condition.ndim == x.ndim - 1:
                condition = condition[:, None, :]  # broadcast over sequence
            weight = self.weight(condition)
            bias = self.bias(condition) if self.bias is not None else 0.0
            normed = weight * normed + bias
        if self.out_dtype is not None:
            normed = normed.astype(self.out_dtype)  # see LayerNorm docstring
        return normed


class MaskedBatchNorm1d(nnx.Module):
    """Batch norm over (batch, time) using only unmasked positions, with
    running statistics updated by masked means.

    Input (B, T, C); mask (B, T) True=valid. Parity: reference
    tts/modules/normalization.py:69-104 (+ _masked_norm :160-208). Running
    stats live in nnx.BatchStat so they are excluded from gradients and
    travel with checkpoints; ``use_running_average`` follows train/eval mode.
    """

    def __init__(self, num_features: int, eps: float = 1e-5, momentum: float = 0.1,
                 affine: bool = True, *, rngs: nnx.Rngs | None = None):
        self.eps = eps
        self.momentum = momentum
        self.affine = affine
        self.mean = nnx.BatchStat(jnp.zeros((num_features,)))
        self.var = nnx.BatchStat(jnp.ones((num_features,)))
        if affine:
            self.scale = nnx.Param(jnp.ones((num_features,)))
            self.bias = nnx.Param(jnp.zeros((num_features,)))
        # flipped automatically by nnx Module.train()/.eval()
        self.use_running_average = False

    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        if self.use_running_average:
            mean, var = self.mean.value, self.var.value
        else:
            if mask is None:
                mean = jnp.mean(x, axis=(0, 1))
                var = jnp.var(x, axis=(0, 1))
            else:
                m = mask[:, :, None].astype(x.dtype)
                count = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(x * m, axis=(0, 1)) / count
                var = jnp.sum((x - mean) ** 2 * m, axis=(0, 1)) / count
            self.mean.value = (1 - self.momentum) * self.mean.value + self.momentum * mean
            self.var.value = (1 - self.momentum) * self.var.value + self.momentum * var
        out = (x - mean) / jnp.sqrt(var + self.eps)
        if self.affine:
            out = out * self.scale.value + self.bias.value
        if mask is not None:
            out = out * mask[:, :, None].astype(x.dtype)
        return out


class MaskedInstanceNorm1d(nnx.Module):
    """Instance norm over the time axis using only unmasked positions.

    Input (B, T, C); mask (B, T) True=valid. Statistics are computed per
    (batch, channel) over valid timesteps only. Affine by DEFAULT: the
    reference overrides torch's InstanceNorm1d(affine=False) default
    (tts/modules/normalization.py:129-137, affine=True), and the aligner's
    trained checkpoints carry those weights — params are named scale/bias so
    torch `.pt` interop maps them (norm.weight -> norm.scale, norm.bias).
    """

    def __init__(self, num_features: int, eps: float = 1e-5, affine: bool = True,
                 *, rngs: nnx.Rngs | None = None):
        self.eps = eps
        self.affine = affine
        if affine:
            self.scale = nnx.Param(jnp.ones((num_features,)))
            self.bias = nnx.Param(jnp.zeros((num_features,)))

    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        if mask is None:
            mean = jnp.mean(x, axis=1, keepdims=True)
            var = jnp.var(x, axis=1, keepdims=True)
        else:
            m = mask[:, :, None].astype(x.dtype)
            count = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
            mean = jnp.sum(x * m, axis=1, keepdims=True) / count
            # biased variance over valid positions (torch instance-norm style)
            var = jnp.sum((x - mean) ** 2 * m, axis=1, keepdims=True) / count
        out = (x - mean) / jnp.sqrt(var + self.eps)
        if self.affine:
            out = out * self.scale.value + self.bias.value
        if mask is not None:
            out = out * mask[:, :, None].astype(x.dtype)
        return out
