"""Mask and reduction utilities (pure jittable functions).

Capability parity with reference `tts/utils/functions.py:11-80`, re-designed as
stateless JAX functions with static `max_len` (TPU requires static shapes).
"""

from __future__ import annotations

import jax.numpy as jnp


def get_mask_from_lengths(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """Boolean padding mask from lengths.

    Args:
      lengths: int array (B,).
      max_len: static sequence length.

    Returns:
      bool (B, max_len); True on valid positions.

    Parity: reference ``get_mask_from_lengths`` (tts/utils/functions.py:61-65),
    with the TPU-critical difference that ``max_len`` must be static.
    """
    ids = jnp.arange(max_len, dtype=lengths.dtype)
    return ids[None, :] < lengths[:, None]


def get_float_mask_from_lengths(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """Fractional (float) mask: position i gets clamp(len - i, 0, 1).

    Supports non-integer lengths (used by the soft-duration alignment path).
    Parity: reference ``get_float_mask_from_lengths`` (tts/utils/functions.py:68-73).
    """
    ids = jnp.arange(max_len, dtype=jnp.float32)
    return jnp.clip(lengths.astype(jnp.float32)[:, None] - ids[None, :], 0.0, 1.0)


def get_mask_3d(widths: jnp.ndarray, heights: jnp.ndarray, max_w: int, max_h: int) -> jnp.ndarray:
    """Outer-product 2-D mask per batch element: (B, max_w, max_h).

    Parity: reference ``get_mask_3d`` (tts/utils/functions.py:76-80).
    """
    mask_w = get_mask_from_lengths(widths, max_w)
    mask_h = get_mask_from_lengths(heights, max_h)
    return mask_w[:, :, None] & mask_h[:, None, :]


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Mean of per-sample masked means.

    Parity: reference ``masked_mean`` (tts/utils/functions.py:44-58) sums
    over all non-batch axes PER SAMPLE, divides by the per-sample count, then
    takes an unweighted mean over the batch — NOT a global masked mean; the
    two differ on ragged batches (each sample weighs equally regardless of
    its length).
    """
    mask = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    axes = tuple(range(1, x.ndim)) if x.ndim > 1 else (0,)
    num = jnp.sum(x * mask, axis=axes)
    den = jnp.sum(mask, axis=axes)
    return jnp.mean(num / jnp.maximum(den, eps))


def lengths_from_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """Inverse of get_mask_from_lengths: (B, L) bool -> (B,) int32."""
    return jnp.sum(mask.astype(jnp.int32), axis=-1)
