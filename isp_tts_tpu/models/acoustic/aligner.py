"""Text-to-mel aligner: ConvAttention + diagonal prior + MAS binarization.

Capability parity with reference `tts/models/acoustic/modules/alignment.py`:
- key path: 2 conv blocks over encoder text states (text_dim -> 2*text_dim ->
  attn_dim, masked instance norm) (:118-133)
- query path: 3 conv blocks over mel frames (:135-154)
- scaled dot-product attention map (B, mel, text) (:189-192)
- diagonal Gaussian prior exp(-(t/T - m/M)^2 / 2 gamma^2), gamma=0.1,
  row-normalized + thresholded, applied as log_softmax(attn) + log(prior+1e-6)
  (:18-37, :194-196)
- binarization via MAS — here fully on-device (ops.mas), no host round-trip
- hard durations = column sums; duration/mel-length self-healing (:272-282)

TPU-first: channel-last (B, T, C) layout, static max lengths, `nnx.Conv`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from ...nn.layers import FastDropout, choose_activation
from ...ops.mas import monotonic_alignment_search
from ...utils.masks import get_mask_from_lengths

NEG_INF = -1e9


def batch_diagonal_prior(text_lens: jnp.ndarray, mel_lens: jnp.ndarray,
                         max_text_len: int, max_mel_len: int,
                         gamma: float = 0.1, threshold: float = 1e-4) -> jnp.ndarray:
    """Diagonal Gaussian alignment prior, (B, M, T), rows normalized over T."""
    grid_text = jnp.arange(max_text_len, dtype=jnp.float32)[None, :] / text_lens[:, None]
    grid_mel = jnp.arange(max_mel_len, dtype=jnp.float32)[None, :] / mel_lens[:, None]
    grid = grid_text[:, None, :] - grid_mel[:, :, None]  # (B, M, T)
    prior = jnp.exp(-(grid ** 2) / (2.0 * gamma ** 2))
    text_mask = get_mask_from_lengths(text_lens, max_text_len)  # (B, T)
    mel_mask = get_mask_from_lengths(mel_lens, max_mel_len)  # (B, M)
    prior = prior * text_mask[:, None, :] * mel_mask[:, :, None]
    prior = prior / (jnp.sum(prior, axis=-1, keepdims=True) + 1e-5)
    return jnp.where(prior < threshold, 0.0, prior)


class ConvBlock1D(nnx.Module):
    """Conv1d -> activation -> masked instance norm -> dropout, with padded
    positions zeroed before the convolution so padding never leaks in."""

    def __init__(self, in_channels: int, out_channels: int, kernel_size: int = 1,
                 bias: bool = True, activation: str = "relu",
                 normalization: str | None = "instance", dropout: float = 0.0,
                 *, rngs: nnx.Rngs):
        from ...nn.policy import get_compute_dtype

        self.conv = nnx.Conv(
            in_channels, out_channels, kernel_size=(kernel_size,),
            padding="SAME", use_bias=bias and normalization is None,
            dtype=get_compute_dtype(), rngs=rngs,
        )
        from ...nn.layers import choose_normalization

        self.act = choose_activation(activation)
        norm_cls = choose_normalization(normalization)
        self.norm = norm_cls(out_channels) if norm_cls is not None else None
        self.dropout = FastDropout(dropout, rngs=rngs)

    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        """x: (B, T, C_in); mask: (B, T) True=valid."""
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        x = self.act(self.conv(x))
        if self.norm is not None:
            x = self.norm(x, mask)
        return self.dropout(x)


@dataclass
class AlignerConfig:
    mel_dim: int = 80
    text_dim: int = 512
    attention_dim: int = 80
    key_kernel_size: int = 3
    query_kernel_size: int | Sequence[int] = (3, 3)
    dropout: float = 0.0
    normalization: str | None = "instance"
    activation: str = "relu"
    attention_prior: bool = True
    mas_impl: str = "auto"  # auto | scan | pallas


class AlignerOutput(NamedTuple):
    attn_soft: jnp.ndarray  # (B, M, T)
    attn_logits: jnp.ndarray  # (B, M, T)
    attn_hard: jnp.ndarray  # (B, M, T)
    attn_hard_duration: jnp.ndarray  # (B, T)


class Aligner(nnx.Module):
    Config = AlignerConfig

    def __init__(self, config: AlignerConfig, *, rngs: nnx.Rngs):
        cfg = config
        self.config = cfg
        self.scale = cfg.attention_dim ** -0.5
        self.attention_prior = cfg.attention_prior

        def block(cin, cout, k, act, norm):
            return ConvBlock1D(
                cin, cout, kernel_size=k, bias=False, activation=act,
                normalization=norm, dropout=cfg.dropout, rngs=rngs,
            )

        qk = cfg.query_kernel_size
        if isinstance(qk, int):
            qk = (qk, qk)
        self.key_proj = nnx.List([
            block(cfg.text_dim, cfg.text_dim * 2, cfg.key_kernel_size, cfg.activation,
                  cfg.normalization),
            block(cfg.text_dim * 2, cfg.attention_dim, 1, "linear", None),
        ])
        self.query_proj = nnx.List([
            block(cfg.mel_dim, cfg.mel_dim * 2, qk[0], cfg.activation, cfg.normalization),
            block(cfg.mel_dim * 2, cfg.mel_dim, qk[1], cfg.activation, cfg.normalization),
            block(cfg.mel_dim, cfg.attention_dim, 1, "linear", None),
        ])

    def attention(self, mel: jnp.ndarray, enc_text: jnp.ndarray,
                  mel_len: jnp.ndarray, text_len: jnp.ndarray):
        """Soft attention map.

        Args:
          mel: (B, M, mel_dim) mel frames (queries).
          enc_text: (B, T, text_dim) encoder text states (keys).
        Returns:
          (attn_soft, attn_logits), both (B, M, T).

        On a live SP/PP mesh the computation dispatches to
        :meth:`_attention_manual`: the aligner is a pure per-sample map, so
        the batch is split across EVERY live mesh axis and each device runs
        the math locally. This both uses all chips (the auto-sharded version
        replicates the aligner's work across seq/stage replicas) and is
        correct by construction — GSPMD's auto partitioner miscompiles the
        conv-kernel and norm-bias GRADIENTS when the convs' spatial dim
        arrives sharded over "seq" while an idle size>1 "stage" axis exists
        (forward values were never affected; pinned by dryrun_multichip's
        composed dp x sp x pp phase and a minimal conv_general_dilated
        repro; input sharding constraints fix the conv but not the norm's
        output-cotangent reduction, so manual mode it is)."""
        from ...parallel.context import get_parallel_context

        ctx = get_parallel_context()
        mesh = ctx.mesh
        if mesh is not None and (ctx.seq_axis or ctx.stage_axis):
            live = [ax for ax in ("data", "seq", "stage")
                    if ax in mesh.shape]
            n_shards = 1
            for ax in live:
                n_shards *= mesh.shape[ax]
            drop_active = any(
                blk.dropout.rate > 0 and not blk.dropout.deterministic
                for blk in list(self.key_proj) + list(self.query_proj))
            if (mel.shape[0] % n_shards == 0
                    and mesh.shape.get("model", 1) == 1 and not drop_active):
                return self._attention_manual(mel, enc_text, mel_len,
                                              text_len, mesh, tuple(live))
        return self._attention_local(mel, enc_text, mel_len, text_len)

    def _attention_manual(self, mel, enc_text, mel_len, text_len, mesh, axes):
        """Fully-manual shard_map over ``axes``: batch split across the
        flattened axes, params replicated (their cotangents are psummed over
        the manual axes by shard_map's transpose — each shard contributes
        its disjoint batch slice, so the sum is the exact global gradient)."""
        from flax import nnx as _nnx
        from jax.sharding import PartitionSpec as P

        graphdef, state = _nnx.split(self)
        batch_spec = P(axes)

        def local(state, mel, enc_text, mel_len, text_len):
            m = _nnx.merge(graphdef, state)
            return m._attention_local(mel, enc_text, mel_len, text_len)

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), batch_spec, batch_spec, batch_spec, batch_spec),
            out_specs=(batch_spec, batch_spec),
        )(state, mel, enc_text, mel_len, text_len)

    def _attention_local(self, mel: jnp.ndarray, enc_text: jnp.ndarray,
                         mel_len: jnp.ndarray, text_len: jnp.ndarray):
        B, M, _ = mel.shape
        T = enc_text.shape[1]
        key_mask = get_mask_from_lengths(text_len, T)
        query_mask = get_mask_from_lengths(mel_len, M)

        keys = enc_text
        for conv in self.key_proj:
            keys = conv(keys, key_mask)  # (B, T, attn_dim)
        queries = mel
        for conv in self.query_proj:
            queries = conv(queries, query_mask)  # (B, M, attn_dim)

        attn = jnp.einsum("bma,bta->bmt", queries, keys,
                          preferred_element_type=jnp.float32) * self.scale

        if self.attention_prior:
            prior = batch_diagonal_prior(text_len, mel_len, T, M)
            # log_softmax over ALL text columns (unmasked), exactly like the
            # reference (alignment.py:196-198): attn_logits is cloned BEFORE
            # the key-mask fill, so padded columns keep finite values — the
            # CTC alignment loss depends on this (the normalization shift
            # cancels in attn_soft but NOT against the constant blank column)
            attn = jax.nn.log_softmax(attn, axis=2) + jnp.log(prior + 1e-6)

        attn_logits = attn

        attn = jnp.where(key_mask[:, None, :], attn, NEG_INF)
        attn_soft = jax.nn.softmax(attn, axis=2)
        attn_soft = attn_soft * key_mask[:, None, :] * query_mask[:, :, None]
        return attn_soft, attn_logits

    def _mas(self, attn_logits, text_len, mel_len):
        """Dispatch MAS (reference alignment.py:291-331 dispatched numba-CUDA
        vs numba-CPU with host round-trips; both paths here stay on-device).

        Default is the batched two-phase Pallas kernel (ops/mas_pallas.py):
        streamed wavefront DP + reversed-grid backtrack, every vector op over
        the full (B, T) tile. Measured on v5e at B=32, M=768, T=192: 0.23 ms
        vs 2.2 ms for the lax.scan DP (and 0.49 vs 1.54 ms at B=1); the scan
        stays available via mas_impl='scan' (and is the CPU-backend path)."""
        impl = self.config.mas_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "scan"
        if impl == "pallas":
            from ...ops.mas_pallas import monotonic_alignment_search_pallas

            return monotonic_alignment_search_pallas(attn_logits, text_len, mel_len)
        return monotonic_alignment_search(attn_logits, text_len, mel_len)

    def __call__(self, mel: jnp.ndarray, enc_text: jnp.ndarray,
                 mel_len: jnp.ndarray, text_len: jnp.ndarray) -> AlignerOutput:
        attn_soft, attn_logits = self.attention(mel, enc_text, mel_len, text_len)

        # cut gradients at the INPUT: MAS is non-differentiable and the
        # Pallas kernel defines no JVP rule
        attn_hard = self._mas(jax.lax.stop_gradient(attn_logits), text_len, mel_len)
        attn_hard_duration = jnp.sum(attn_hard, axis=1)  # (B, T)
        # self-healing: assign any deficit to the first token (reference
        # alignment.py:278-282); a no-op when durations already sum to mel_len
        deficit = mel_len.astype(attn_hard_duration.dtype) - jnp.sum(attn_hard_duration, axis=1)
        attn_hard_duration = attn_hard_duration.at[:, 0].add(deficit)

        return AlignerOutput(
            attn_soft=attn_soft,
            attn_logits=attn_logits,
            attn_hard=attn_hard,
            attn_hard_duration=attn_hard_duration,
        )
