"""Transformer layer / stack with optional adaptive (AdaLN) conditioning.

Parity: reference `tts/modules/transformer/transformer.py:27-211`:
- pre-/post-norm residual blocks (attention + feed-forward), masks applied
  around the FF block
- one shared layer config replicated ``depth`` times
- absolute sinusoidal positions only when no relative (ALiBi) bias is present
- optional input projection when ``emb_dim != dim``
- final LayerNorm when pre-norm
- ALiBi bias computed once and shared across all layers
- ``adaptive_norm`` + ``condition_dim`` plumbed to every layer (AdaLN)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax.numpy as jnp
from flax import nnx

from ..config.registry import build_config
from .attention import Attention, AttentionConfig
from .embeddings import fixed_positional_embedding
from .feedforward import FeedForward, FeedForwardConfig
from .norms import AdaptiveLayerNorm, LayerNorm


@dataclass
class TransformerLayerConfig:
    dim: int = 384
    attention: AttentionConfig = field(default_factory=AttentionConfig)
    feed_forward: FeedForwardConfig = field(default_factory=FeedForwardConfig)
    pre_norm: bool = True
    adaptive_norm: bool = False
    condition_dim: int | None = None


class TransformerLayer(nnx.Module):
    Config = TransformerLayerConfig

    def __init__(self, config: TransformerLayerConfig, *, rngs: nnx.Rngs):
        cfg = config
        self.config = cfg
        self.pre_norm = cfg.pre_norm
        self.adaptive_norm = cfg.adaptive_norm
        if cfg.adaptive_norm and cfg.condition_dim is None:
            raise ValueError("adaptive_norm requires condition_dim")

        def make_norm():
            if cfg.adaptive_norm:
                return AdaptiveLayerNorm(cfg.dim, cfg.condition_dim, rngs=rngs)
            return LayerNorm(cfg.dim, rngs=rngs)

        attn_cfg = build_config(AttentionConfig, _as_dict(cfg.attention), dim=cfg.dim)
        ff_cfg = build_config(FeedForwardConfig, _as_dict(cfg.feed_forward), dim=cfg.dim)
        self.attention_norm = make_norm()
        self.attention = Attention(attn_cfg, rngs=rngs)
        self.feed_forward_norm = make_norm()
        self.feed_forward = FeedForward(ff_cfg, rngs=rngs)

    def __call__(self, x, mask=None, context=None, context_mask=None,
                 attention_mask=None, adaptive_condition=None, shared_bias=None,
                 cache=None):
        if self.adaptive_norm and adaptive_condition is None:
            raise ValueError("adaptive_condition must be provided for AdaptiveLayerNorm")

        residual = x
        out = self.attention_norm(x, adaptive_condition) if self.pre_norm else x
        out, shared_bias, new_cache = self.attention(
            out, mask=mask, context=context, context_mask=context_mask,
            attention_mask=attention_mask, shared_bias=shared_bias, cache=cache,
        )
        out = out + residual
        if not self.pre_norm:
            out = self.attention_norm(out, adaptive_condition)

        residual = out
        if self.pre_norm:
            out = self.feed_forward_norm(out, adaptive_condition)
        if mask is not None:
            out = out * mask[..., None].astype(out.dtype)
        out = self.feed_forward(out)
        out = out + residual
        if not self.pre_norm:
            out = self.feed_forward_norm(out, adaptive_condition)
        if mask is not None:
            out = out * mask[..., None].astype(out.dtype)
        return out, shared_bias, new_cache


class TransformerOutput(NamedTuple):
    out: jnp.ndarray
    cache: list | None = None


@dataclass
class TransformerConfig:
    dim: int = 384
    depth: int = 6
    transformer_layer: TransformerLayerConfig = field(default_factory=TransformerLayerConfig)
    emb_dim: int | None = None
    use_abs_pos_emb: bool = True
    adaptive_norm: bool = False
    condition_dim: int | None = None


class Transformer(nnx.Module):
    Config = TransformerConfig

    def __init__(self, config: TransformerConfig, *, rngs: nnx.Rngs):
        cfg = config
        self.config = cfg
        self.dim = cfg.dim
        self.emb_dim = cfg.emb_dim or cfg.dim

        layer_cfg = build_config(
            TransformerLayerConfig, _as_dict(cfg.transformer_layer),
            dim=cfg.dim, adaptive_norm=cfg.adaptive_norm, condition_dim=cfg.condition_dim,
        )
        self.layers = nnx.List(
            [TransformerLayer(layer_cfg, rngs=rngs) for _ in range(cfg.depth)]
        )

        pre_norm = layer_cfg.pre_norm
        has_rel_pos = self.layers[0].attention.rel_pos is not None
        self.use_abs_pos_emb = cfg.use_abs_pos_emb and not has_rel_pos
        from .policy import get_compute_dtype

        self.project_emb = (
            nnx.Linear(self.emb_dim, cfg.dim, dtype=get_compute_dtype(), rngs=rngs)
            if self.emb_dim != cfg.dim else None
        )
        self.norm = nnx.LayerNorm(cfg.dim, rngs=rngs) if pre_norm else None
        # the residual stream runs in the compute dtype (reference parity:
        # torch fp16 autocast keeps the stream half-precision too); LN stats
        # stay f32 inside nnx.LayerNorm. Profiled: the f32 residual adds were
        # bandwidth-roof fusions (~1.2 ms/step at B=32, mel 768)
        self.stream_dtype = get_compute_dtype()

    def __call__(self, x, mask=None, context=None, context_mask=None,
                 attention_mask=None, adaptive_condition=None,
                 cache: list | None = None,
                 return_cache: bool = False) -> TransformerOutput:
        if self.use_abs_pos_emb:
            x = x + fixed_positional_embedding(x.shape[1], self.emb_dim, dtype=x.dtype)
        if self.project_emb is not None:
            x = self.project_emb(x)
        if self.stream_dtype is not None:
            x = x.astype(self.stream_dtype)

        shared_bias = None
        new_caches = []
        for i, layer in enumerate(self.layers):
            x, shared_bias, layer_cache = layer(
                x, mask=mask, context=context, context_mask=context_mask,
                attention_mask=attention_mask, adaptive_condition=adaptive_condition,
                shared_bias=shared_bias,
                cache=cache[i] if cache is not None else None,
            )
            if return_cache:
                new_caches.append(layer_cache)
        if self.norm is not None:
            x = self.norm(x)
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        return TransformerOutput(out=x, cache=new_caches if return_cache else None)


def _as_dict(cfg) -> dict:
    if isinstance(cfg, dict):
        return cfg
    import dataclasses

    if dataclasses.is_dataclass(cfg):
        return {f.name: getattr(cfg, f.name) for f in dataclasses.fields(cfg)}
    raise TypeError(f"Cannot convert {type(cfg)} to config dict")
