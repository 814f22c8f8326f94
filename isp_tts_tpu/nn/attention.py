"""Multi-head attention module with MQA and learned-ALiBi relative bias.

Parity: reference `tts/modules/transformer/attention.py:17-176`:
- separate q / fused kv projections, bias-free
- ``one_kv_head`` multi-query attention (k/v stay single-head)
- cross-attention via ``context``
- mask assembly: key-side input mask ∪ explicit attention mask
- LearnedALiBi bias computed once per stack and shared across layers
- output projection + query-side output masking

TPU-first: core attention is the einsum op in ``ops.attention`` (XLA fuses
bias + mask + softmax); no KV-cache concat (the model is non-autoregressive).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import nnx

import logging

from ..ops.attention import scaled_dot_product_attention
from .embeddings import LearnedALiBiBias
from .layers import FastDropout
from .policy import get_compute_dtype

logger = logging.getLogger("isp_tts_tpu")


@dataclass
class AttentionConfig:
    dim: int = 256
    heads: int = 4
    head_dim: int | None = 64
    causal: bool = False
    dropout: float = 0.0
    one_kv_head: bool = False
    context_dim: int | None = None
    alibi_pos_bias: bool = False
    alibi_heads: int | None = None
    alibi_symmetric: bool = True
    #: auto | on | off | ring — "on"/"auto" pick the fused Pallas kernel;
    #: "ring" runs sequence-parallel ring attention over the parallel
    #: context's seq mesh axis (ops/ring_attention.py) and falls back to
    #: "auto" dispatch when no seq axis is active (so an sp-trained
    #: checkpoint serves unchanged on a single chip)
    flash: str = "auto"


class Attention(nnx.Module):
    Config = AttentionConfig

    def __init__(self, config: AttentionConfig, *, rngs: nnx.Rngs):
        cfg = config
        self.config = cfg
        self.heads = cfg.heads
        self.head_dim = cfg.head_dim or cfg.dim // cfg.heads
        self.causal = cfg.causal
        self.one_kv_head = cfg.one_kv_head
        self.scale = self.head_dim ** -0.5

        q_dim = self.head_dim * self.heads
        kv_dim = self.head_dim if cfg.one_kv_head else q_dim
        context_dim = cfg.context_dim or cfg.dim

        dtype = get_compute_dtype()
        self.to_q = nnx.Linear(cfg.dim, q_dim, use_bias=False, dtype=dtype, rngs=rngs)
        self.to_kv = nnx.Linear(context_dim, 2 * kv_dim, use_bias=False, dtype=dtype, rngs=rngs)
        self.to_out = nnx.Linear(q_dim, cfg.dim, use_bias=False, dtype=dtype, rngs=rngs)
        self.dropout = FastDropout(cfg.dropout, rngs=rngs)

        alibi_heads = cfg.alibi_heads if cfg.alibi_heads is not None else cfg.heads
        if alibi_heads > cfg.heads:
            raise ValueError("alibi_heads must be <= heads")
        self.rel_pos = (
            LearnedALiBiBias(
                heads=alibi_heads, total_heads=cfg.heads,
                symmetric=cfg.alibi_symmetric, rngs=rngs,
            )
            if cfg.alibi_pos_bias
            else None
        )

    def __call__(
        self,
        x: jnp.ndarray,
        mask: jnp.ndarray | None = None,
        context: jnp.ndarray | None = None,
        context_mask: jnp.ndarray | None = None,
        attention_mask: jnp.ndarray | None = None,
        shared_bias: jnp.ndarray | None = None,
        cache: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    ):
        """Args:
          x: (B, N, dim).
          mask: (B, N) bool padding mask of ``x`` (True = valid).
          context: (B, M, context_dim) for cross-attention.
          context_mask: (B, M) bool padding mask of ``context``.
          attention_mask: bool, (N, M) / (H, N, M) / (B, H, N, M).
          shared_bias: precomputed ALiBi bias shared across layers.
          cache: optional (k, v) from previous steps — self-attention keys/
            values are concatenated (incremental decoding; parity with the
            reference's KV-cache plumbing, attention.py:113-121); for
            cross-attention the cached projections are reused directly.

        Returns:
          (out (B, N, dim), shared_bias, new_cache).
        """
        b, n, _ = x.shape
        kv_input = context if context is not None else x
        m = kv_input.shape[1]

        # q stays in the projection's natural (B, N, H, D) layout; paths that
        # need head-major (einsum SDPA, the per-head-grid kernel) transpose
        # at their branch — the folded-MQA flash path consumes it directly
        q_nhd = self.to_q(x).reshape(b, n, self.heads, self.head_dim)
        if cache is not None and context is not None:
            k, v = cache  # cross-attention: reuse cached projections
        else:
            kv = self.to_kv(kv_input)
            k, v = jnp.split(kv, 2, axis=-1)
            if self.one_kv_head:
                k = k[:, None]  # (B, 1, M, D)
                v = v[:, None]
            else:
                k = k.reshape(b, m, self.heads, self.head_dim).transpose(0, 2, 1, 3)
                v = v.reshape(b, m, self.heads, self.head_dim).transpose(0, 2, 1, 3)
            if cache is not None:  # self-attention: append to the cache
                k = jnp.concatenate([cache[0], k], axis=2)
                v = jnp.concatenate([cache[1], v], axis=2)
        new_cache = (k, v)
        m = k.shape[2]

        # key-side padding mask ∪ explicit attention mask
        key_mask = context_mask if context is not None else mask
        attn_mask = None
        if key_mask is not None:
            attn_mask = key_mask[:, None, None, :]  # (B, 1, 1, M)
        if attention_mask is not None:
            if attention_mask.ndim == 2:
                attention_mask = attention_mask[None, None]
            elif attention_mask.ndim == 3:
                attention_mask = attention_mask[None]
            attn_mask = attention_mask if attn_mask is None else attn_mask & attention_mask

        # attention dropout acts on the post-softmax PROBABILITIES (reference
        # attend.py) — in-kernel (mask regenerated in the backward from a
        # seed) on the folded-MQA flash path, materialized on the einsum path
        drop_rate = float(self.config.dropout)
        drop_active = drop_rate > 0.0 and not self.dropout.deterministic

        use_flash = self.config.flash
        if use_flash == "ring":
            out = self._maybe_ring(q_nhd, k, v, mask, context, attention_mask,
                                   cache, key_mask, drop_rate, drop_active)
            if out is not None:
                out = out.reshape(b, n, self.heads * self.head_dim)
                out = self.to_out(out)
                if mask is not None:
                    out = out * mask[..., None].astype(out.dtype)
                return out, shared_bias, new_cache
            use_flash = "auto"  # no seq axis / unsupported call: local dispatch
        if use_flash == "auto":
            use_flash = (
                "on"
                if (jax.default_backend() not in ("cpu",)
                    and attention_mask is None and context is None)
                else "off"
            )
        if use_flash == "on" and attention_mask is not None:
            # the fused kernels support key-length + query-length + causal
            # masking, which covers every mask this model assembles itself; an
            # arbitrary explicit attention_mask cannot be streamed — forcing
            # the kernel would silently drop it
            raise ValueError(
                "flash='on' is incompatible with an explicit attention_mask "
                "(the fused kernel supports key-length/query-length/causal "
                "masking only); use flash='auto' or 'off'")
        if use_flash == "on":
            # fused Pallas path: ALiBi recomputed from slopes in-kernel
            slopes2 = self._slopes2()
            key_lens = (jnp.sum(key_mask.astype(jnp.int32), axis=-1)
                        if key_mask is not None
                        else jnp.full((b,), m, jnp.int32))
            # query-side validity: rows past it emit exactly 0 from the
            # kernel (matching the einsum path's output masking)
            q_lens = (jnp.sum(mask.astype(jnp.int32), axis=-1)
                      if mask is not None else None)
            if k.shape[1] == 1:
                # MQA: folded-row kernel, zero transposes (see ops/flash_attention)
                from ..ops.flash_attention import flash_attention_mqa

                from ..ops.flash_attention import DEF_BLOCK_K_MQA, DEF_BLOCK_R

                sym = self.rel_pos.symmetric if self.rel_pos is not None else True
                seed = (jax.random.randint(self.dropout.rngs.dropout(), (),
                                           0, 2**31 - 1, jnp.int32)
                        if drop_active else None)
                out = flash_attention_mqa(q_nhd, k[:, 0], v[:, 0], slopes2,
                                          key_lens, self.scale, m - n,
                                          DEF_BLOCK_R, DEF_BLOCK_K_MQA, sym,
                                          q_lens=q_lens, causal=self.causal,
                                          dropout_rate=(drop_rate if drop_active
                                                        else 0.0),
                                          dropout_seed=seed)
            else:
                from ..ops.flash_attention import flash_attention

                seed = (jax.random.randint(self.dropout.rngs.dropout(), (),
                                           0, 2**31 - 1, jnp.int32)
                        if drop_active else None)
                out = flash_attention(
                    q_nhd.transpose(0, 2, 1, 3), k, v, slopes2, key_lens,
                    self.scale, offset=m - n, q_lens=q_lens,
                    causal=self.causal,
                    dropout_rate=(drop_rate if drop_active else 0.0),
                    dropout_seed=seed).transpose(0, 2, 1, 3)
        else:
            bias = None
            if self.rel_pos is not None:
                # what is SHARED across the stack is the slope-free distance
                # matrix (reference attention.py:148-152 caches get_bias's
                # output); each layer applies ITS OWN learned slopes — after
                # training the per-layer slopes differ, and reusing layer
                # 0's slope-multiplied bias would serve layers 1+ with the
                # wrong slopes (the flash/ring paths already use per-layer
                # slopes; this keeps the einsum path consistent with them)
                from .embeddings import alibi_distance_bias

                dist = (shared_bias if shared_bias is not None
                        else alibi_distance_bias(n, m, m - n))
                shared_bias = dist
                bias = self.rel_pos.apply_slopes(dist, offset=m - n)
            out = scaled_dot_product_attention(
                q_nhd.transpose(0, 2, 1, 3), k, v, scale=self.scale,
                bias=bias, mask=attn_mask, causal=self.causal,
                dropout_rate=(drop_rate if drop_active else 0.0),
                dropout_key=(self.dropout.rngs.dropout()
                             if drop_active else None),
            ).transpose(0, 2, 1, 3)
        out = out.reshape(b, n, self.heads * self.head_dim)
        out = self.to_out(out)

        if mask is not None:
            out = out * mask[..., None].astype(out.dtype)
        return out, shared_bias, new_cache

    def _slopes2(self) -> jnp.ndarray:
        """(2, heads) [lower, upper] ALiBi slopes for the in-kernel paths
        (flash + ring); zeros when no relative bias is configured."""
        if self.rel_pos is None:
            return jnp.zeros((2, self.heads), jnp.float32)
        slopes = jnp.exp(self.rel_pos.log_slopes.value)
        if self.rel_pos.symmetric:
            s = slopes[:, 0, 0]
            s = jnp.pad(s, (0, self.heads - s.shape[0]))
            return jnp.stack([s, s])
        lo = jnp.pad(slopes[0, :, 0, 0], (0, self.heads - slopes.shape[1]))
        hi = jnp.pad(slopes[1, :, 0, 0], (0, self.heads - slopes.shape[1]))
        return jnp.stack([lo, hi])

    def _maybe_ring(self, q_nhd, k, v, mask, context, attention_mask, cache,
                    key_mask, drop_rate, drop_active):
        """Sequence-parallel dispatch for ``flash="ring"``.

        Returns the (B, N, H, D) attention output when the active
        :class:`~isp_tts_tpu.parallel.context.ParallelContext` has a live
        ``seq`` mesh axis and the call shape supports ring execution
        (self-attention, no explicit mask/cache, sequence divisible by the
        axis); ``None`` means "fall back to local dispatch" — which is how
        the same config serves on a single chip with zero changes.
        """
        from ..parallel.context import get_parallel_context

        ctx = get_parallel_context()
        if ctx.mesh is None or ctx.seq_axis is None \
                or ctx.seq_axis not in ctx.mesh.shape:
            return None
        b, n = q_nhd.shape[0], q_nhd.shape[1]
        m = k.shape[2]
        seq_size = ctx.mesh.shape[ctx.seq_axis]
        if (context is not None or attention_mask is not None
                or cache is not None or n != m
                or n % seq_size != 0):
            logger.warning(
                "flash='ring': call not ring-compatible (cross-attention, "
                "explicit mask, KV cache, or seq %d %% %d != 0) — falling "
                "back to local attention for this layer", n, seq_size)
            return None

        from ..ops.ring_attention import ring_attention_sharded

        key_lens = (jnp.sum(key_mask.astype(jnp.int32), axis=-1)
                    if key_mask is not None
                    else jnp.full((b,), m, jnp.int32))
        q_lens = (jnp.sum(mask.astype(jnp.int32), axis=-1)
                  if mask is not None else None)
        seed = (jax.random.randint(self.dropout.rngs.dropout(), (),
                                   0, 2**31 - 1, jnp.int32)
                if drop_active else None)
        out = ring_attention_sharded(
            q_nhd.transpose(0, 2, 1, 3), k, v, self._slopes2(), key_lens,
            self.scale, mesh=ctx.mesh, axis_name=ctx.seq_axis,
            offset=m - n, q_lens=q_lens, causal=self.causal,
            dropout_rate=(drop_rate if drop_active else 0.0),
            dropout_seed=seed)
        return out.transpose(0, 2, 1, 3)
