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
    #: pipeline-parallel layer stack: parameters are stored STACKED with a
    #: leading ``depth`` axis (state path ``stack.*``) so the trainer can
    #: shard them over a "stage" mesh axis (each device holds only its own
    #: stages — the PP memory win) and stream microbatches through a GPipe
    #: schedule (parallel/pipeline.py). With no live stage axis the same
    #: stacked model runs layer-by-layer on one device with identical
    #: numerics, so pp-trained checkpoints serve anywhere; checkpoints
    #: interconvert with per-layer layouts via models/base.py's
    #: stack translation.
    pipeline: bool = False


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
        if cfg.pipeline:
            # stacked storage: one TransformerLayer whose parameters carry a
            # leading (depth,) axis, built by vmapping the constructor —
            # shardable over a "stage" mesh axis by parallel/mesh.shard_params
            @nnx.split_rngs(splits=cfg.depth)
            @nnx.vmap(in_axes=0, out_axes=0)
            def make_stack(rngs):
                return TransformerLayer(layer_cfg, rngs=rngs)

            self.stack = make_stack(rngs)
            self.layers = None
            self.rngs = rngs  # per-step base key for pipelined dropout
            first_layer = self.stack
        else:
            self.layers = nnx.List(
                [TransformerLayer(layer_cfg, rngs=rngs) for _ in range(cfg.depth)]
            )
            first_layer = self.layers[0]

        pre_norm = layer_cfg.pre_norm
        has_rel_pos = first_layer.attention.rel_pos is not None
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
        if self.layers is None:  # stacked / pipelined storage
            if (context is not None or attention_mask is not None
                    or adaptive_condition is not None or cache is not None
                    or return_cache):
                raise ValueError(
                    "pipeline=True transformers support self-attention with "
                    "a padding mask only (no cross-attention / explicit "
                    "attention masks / AdaLN / KV caches)")
            x = self._stacked_forward(x, mask)
        else:
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

    # -- pipelined layer stack -------------------------------------------------

    def _stacked_forward(self, x: jnp.ndarray, mask) -> jnp.ndarray:
        """Run the stacked layer stack: a GPipe schedule over the parallel
        context's stage axis when one is live, else the same computation
        layer-by-layer on the local device.

        Dropout keys are ``fold_in(base, layer * n_micro + microbatch)`` of a
        per-step base drawn from the module's own stream — a scheme that is
        invariant to the stage-axis size, so an S-stage run drops exactly
        what the single-device run drops (asserted by dryrun_multichip's
        dp x pp phase).
        """
        import jax

        from ..parallel.context import get_parallel_context
        from ..parallel.pipeline import microbatch, pipeline_apply

        ctx = get_parallel_context()
        S = self.config.depth
        B = x.shape[0]
        live_stage = (ctx.stage_axis is not None and ctx.mesh is not None
                      and ctx.stage_axis in ctx.mesh.shape
                      and ctx.mesh.shape[ctx.stage_axis] > 1)
        if ctx.n_micro > 0 and B % ctx.n_micro == 0:
            n_micro = ctx.n_micro
        elif live_stage:
            # silently degrading to one microbatch would serialize the whole
            # GPipe schedule ((S-1)/S bubble) — that's a config error, not a
            # fallback (local single-device execution tolerates it below)
            raise ValueError(
                f"pipeline batch {B} not divisible by pipeline_microbatches="
                f"{ctx.n_micro}")
        else:
            n_micro = 1

        graphdef, rng_state, params = nnx.split(self.stack, nnx.RngState, ...)
        pure = (nnx.to_pure_dict(params) if hasattr(nnx, "to_pure_dict")
                else params.to_pure_dict())
        base = self.rngs.dropout()

        def apply_layer(pure_slice, rngs_tree, key, h, mask_mb):
            def fix(leaf):
                if hasattr(leaf, "dtype") and jnp.issubdtype(
                        leaf.dtype, jax.dtypes.prng_key):
                    return key
                return jnp.zeros_like(leaf)  # stream counts restart at 0
            layer = nnx.merge(graphdef, jax.tree.map(fix, rngs_tree), pure_slice)
            out, _, _ = layer(h, mask=mask_mb)
            return out

        xm = microbatch(x, n_micro)
        maskm = microbatch(mask, n_micro) if mask is not None else None

        stage_axis = ctx.stage_axis
        use_pipeline = (stage_axis is not None and ctx.mesh is not None
                        and stage_axis in ctx.mesh.shape)
        if use_pipeline:
            n_stages = ctx.mesh.shape[stage_axis]
            if S % n_stages:
                raise ValueError(
                    f"depth {S} not divisible by stage axis {n_stages}")
            L_per = S // n_stages
            from jax.sharding import PartitionSpec as P

            # every traced value the schedule touches rides in through
            # in_specs (shard_map does not capture traced closures): the
            # stacked params shard stage-wise, everything else replicates
            # over the stage axis (batch stays auto-sharded over "data")
            def mapped(local_params, xm, maskm, base, rngs_tree):
                def stage_fn(lp, h, t):
                    stage = jax.lax.axis_index(stage_axis)
                    mb = jnp.clip(t - stage, 0, n_micro - 1)
                    mask_mb = (jax.lax.dynamic_index_in_dim(
                        maskm, mb, 0, keepdims=False)
                        if maskm is not None else None)
                    for jj in range(L_per):
                        g = stage * L_per + jj  # global layer index
                        key = jax.random.fold_in(base, g * n_micro + mb)
                        h = apply_layer(
                            jax.tree.map(lambda a: a[jj], lp),
                            rngs_tree, key, h, mask_mb)
                    return h
                return pipeline_apply(stage_fn, local_params, xm,
                                      axis_name=stage_axis, with_tick=True)

            out = jax.shard_map(
                mapped, mesh=ctx.mesh, axis_names={stage_axis},
                in_specs=(P(stage_axis), P(), P(), P(), P()),
                out_specs=P())(pure, xm, maskm, base, rng_state)
        else:
            # local execution of the same schedule (e.g. serving a
            # pp-trained checkpoint on one chip): identical (layer, mb)
            # dropout folds, identical math, no collectives
            outs = []
            for mb in range(n_micro):
                h = xm[mb]
                mask_mb = maskm[mb] if maskm is not None else None
                for g in range(S):
                    key = jax.random.fold_in(base, g * n_micro + mb)
                    h = apply_layer(jax.tree.map(lambda a, g=g: a[g], pure),
                                    rng_state, key, h, mask_mb)
                outs.append(h)
            out = jnp.stack(outs)
        return out.reshape((B,) + x.shape[1:])


def _as_dict(cfg) -> dict:
    if isinstance(cfg, dict):
        return cfg
    import dataclasses

    if dataclasses.is_dataclass(cfg):
        return {f.name: getattr(cfg, f.name) for f in dataclasses.fields(cfg)}
    raise TypeError(f"Cannot convert {type(cfg)} to config dict")
