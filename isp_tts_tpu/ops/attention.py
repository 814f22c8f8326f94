"""Core scaled-dot-product attention op.

Replaces the reference's ``Attend`` (tts/modules/transformer/attend.py:48-144),
which had to *disable* flash SDPA because of the additive ALiBi bias. Here the
einsum formulation lets XLA fuse bias-add + masking + softmax into the matmul
pipeline on TPU; a Pallas flash-attention kernel with in-kernel ALiBi-bias
generation can slot in behind the same signature (``implementation='pallas'``).

Numerically safe for fully-masked (padded) query rows: they produce zeros, not
NaNs (the reference relies on downstream output masking instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float | None = None,
    bias: jnp.ndarray | None = None,
    mask: jnp.ndarray | None = None,
    causal: bool = False,
    dropout_rate: float = 0.0,
    dropout_key: jnp.ndarray | None = None,
    implementation: str = "xla",
) -> jnp.ndarray:
    """Multi-head attention with additive bias and boolean masking.

    Args:
      q: (B, H, N, D) queries.
      k, v: (B, Hkv, M, D) keys/values; ``Hkv`` may be 1 (multi-query
        attention) or H.
      scale: logit scale; defaults to ``D ** -0.5``.
      bias: additive attention bias broadcastable to (B, H, N, M) — e.g. ALiBi.
      mask: boolean, broadcastable to (B, H, N, M); True = attend.
      causal: apply a causal mask (offset so the last query sees all keys).
      dropout_rate/dropout_key: dropout applied to the post-softmax
        PROBABILITIES (reference attend.py drops the attention weights); keep
        probability is 8-bit quantized like nn.layers.FastDropout.

    Returns:
      (B, H, N, D) attention output; fully-masked query rows are zeros.
    """
    del implementation  # 'pallas' flash variant lands behind this flag
    if scale is None:
        scale = q.shape[-1] ** -0.5

    # MQA: keep k/v single-head; einsum broadcasting handles head expansion
    multi_query = k.shape[1] == 1 and q.shape[1] != 1
    kk = k[:, 0] if multi_query else k
    vv = v[:, 0] if multi_query else v

    dtype = q.dtype
    if multi_query:
        logits = jnp.einsum("bhnd,bmd->bhnm", q, kk, preferred_element_type=jnp.float32)
    else:
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, kk, preferred_element_type=jnp.float32)
    logits = logits * scale

    if bias is not None:
        logits = logits + bias.astype(jnp.float32)

    n, m = q.shape[-2], k.shape[-2]
    if causal:
        row = jnp.arange(n)[:, None] + (m - n)  # offset: last query sees all keys
        col = jnp.arange(m)[None, :]
        causal_mask = col <= row
        mask = causal_mask if mask is None else mask & causal_mask

    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)

    # numerically-safe softmax: fully-masked rows -> zero output
    logits_max = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    unnorm = jnp.exp(logits - logits_max)
    if mask is not None:
        unnorm = jnp.where(mask, unnorm, 0.0)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    probs = (unnorm / jnp.maximum(denom, 1e-30)).astype(dtype)

    if dropout_rate > 0.0 and dropout_key is not None:
        # the SAME 8-bit keep quantization as the in-kernel path — imported,
        # not re-derived, so the flash and einsum routes (which nn.attention
        # switches between per layer/config) can never drift apart
        from .flash_attention import dropout_thresh

        thresh = dropout_thresh(dropout_rate)
        if thresh < 256:
            bits = jax.random.bits(dropout_key, probs.shape, jnp.uint8)
            probs = jnp.where(
                bits < jnp.uint8(thresh),
                probs * jnp.asarray(1.0 / (1.0 - dropout_rate), probs.dtype),
                jnp.zeros((), probs.dtype))

    if multi_query:
        out = jnp.einsum("bhnm,bmd->bhnd", probs, vv)
    else:
        out = jnp.einsum("bhnm,bhmd->bhnd", probs, vv)
    return out
