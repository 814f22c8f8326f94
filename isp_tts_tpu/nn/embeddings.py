"""Positional embeddings: sinusoids, ALiBi (learned), flow-time embedding.

Capability parity with reference `tts/modules/transformer/embeddings.py`:
- fixed sinusoidal absolute positions (:12-22)
- ALiBi slopes incl. non-power-of-2 head counts (:37-49)
- LearnedALiBi: slopes are exp(trainable log-slopes) (:75-82), symmetric or
  asymmetric (separate lower/upper-triangle slopes, :69-72)
- continuous-position sinusoidal embedding with freq scale (:85-128)
- TimePositionalEmbedding: sinusoid -> MLP(SiLU) for flow-matching time (:131-157)
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import nnx

from .layers import choose_activation


def alibi_slopes(heads: int) -> list[float]:
    """ALiBi head slopes, supporting non-power-of-2 head counts."""

    def pow2_slopes(n: int) -> list[float]:
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start ** (i + 1) for i in range(n)]

    if math.log2(heads).is_integer():
        return pow2_slopes(heads)
    closest = 2 ** math.floor(math.log2(heads))
    return pow2_slopes(closest) + pow2_slopes(2 * closest)[0::2][: heads - closest]


def fixed_positional_embedding(seq_len: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """(seq_len, dim) sinusoidal table: [sin | cos] halves (odd dims trimmed)."""
    inv_freq = 1.0 / (10000.0 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    pos = jnp.arange(seq_len, dtype=jnp.float32)
    angles = pos[:, None] * inv_freq[None, :]
    emb = jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)
    return emb[:, :dim].astype(dtype)


def sinusoidal_embedding(positions: jnp.ndarray, dim: int, theta: float = 10000.0,
                         freq_scale: float = 1.0) -> jnp.ndarray:
    """Continuous-position sinusoid: (...,) -> (..., dim), [sin | cos] halves."""
    half = dim // 2
    inv_freq = theta ** -(jnp.arange(half, dtype=jnp.float32) / half)
    angles = positions.astype(jnp.float32)[..., None] * freq_scale * inv_freq
    return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)


def alibi_distance_bias(n_q: int, n_k: int, offset: int = 0) -> jnp.ndarray:
    """(n_q, n_k) matrix of -|j - (i + offset)| relative distances."""
    i = jnp.arange(offset, n_q + offset)
    j = jnp.arange(n_k)
    return -jnp.abs(j[None, :] - i[:, None]).astype(jnp.float32)


class LearnedALiBiBias(nnx.Module):
    """ALiBi bias with trainable per-head log-slopes.

    ``symmetric=False`` keeps separate slope sets for the lower and upper
    triangles (past vs. future), initialised with the standard slopes and a
    rolled copy.
    """

    def __init__(self, heads: int, total_heads: int, symmetric: bool = True, *,
                 rngs: nnx.Rngs | None = None):
        del rngs  # deterministic init
        self.heads = heads
        self.total_heads = total_heads
        self.symmetric = symmetric
        slopes = jnp.asarray(alibi_slopes(heads), dtype=jnp.float32)[:, None, None]
        if not symmetric:
            slopes = jnp.stack([slopes, jnp.roll(slopes, -1, axis=0)])
        self.log_slopes = nnx.Param(jnp.log(slopes))

    def __call__(self, n_q: int, n_k: int, offset: int = 0) -> jnp.ndarray:
        """Bias of shape (total_heads, n_q, n_k); extra heads get zero bias."""
        dist = alibi_distance_bias(n_q, n_k, offset)  # (n_q, n_k), <= 0
        return self.apply_slopes(dist, offset=offset)

    def apply_slopes(self, dist: jnp.ndarray, offset: int = 0) -> jnp.ndarray:
        """THIS layer's learned slopes applied to a (possibly layer-shared)
        precomputed distance matrix — what the reference shares across the
        stack is the slope-free distances (attention.py:148-152), NOT the
        slope-multiplied bias: every layer's own slopes must multiply, or
        layers 1+ would serve with layer 0's trained slopes."""
        n_q, n_k = dist.shape
        slopes = jnp.exp(self.log_slopes.value)
        if self.symmetric:
            bias = slopes * dist[None]
        else:
            # split at the OFFSET diagonal (k position <= q position), so the
            # einsum path agrees with the flash kernel when n_k != n_q
            i = jnp.arange(n_q)[:, None]
            j = jnp.arange(n_k)[None, :]
            lower = j <= i + offset
            bias = jnp.where(lower[None], slopes[0] * dist[None],
                             slopes[1] * dist[None])
        if self.total_heads > self.heads:
            pad = jnp.zeros((self.total_heads - self.heads, n_q, n_k), bias.dtype)
            bias = jnp.concatenate([bias, pad], axis=0)
        return bias


class TimePositionalEmbedding(nnx.Module):
    """Flow-matching time embedding: sinusoid(t * freq_scale) -> MLP(SiLU).

    ``with_steps`` prepends the raw position to the sinusoid features
    (reference embeddings.py:131-157 with_steps).
    """

    def __init__(self, freq_dim: int = 256, emb_dim: int = 512, theta: float = 1000.0,
                 freq_scale: float = 1000.0, with_steps: bool = True, *, rngs: nnx.Rngs):
        self.freq_dim = freq_dim
        self.theta = theta
        self.freq_scale = freq_scale
        self.with_steps = with_steps
        from .policy import get_compute_dtype

        dtype = get_compute_dtype()
        self.fc1 = nnx.Linear(freq_dim + int(with_steps), emb_dim, dtype=dtype, rngs=rngs)
        self.fc2 = nnx.Linear(emb_dim, emb_dim, dtype=dtype, rngs=rngs)
        self.act = choose_activation("silu")

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        emb = sinusoidal_embedding(t, self.freq_dim, self.theta, self.freq_scale)
        if self.with_steps:
            emb = jnp.concatenate([t.astype(jnp.float32)[..., None], emb], axis=-1)
        return self.fc2(self.act(self.fc1(emb)))
