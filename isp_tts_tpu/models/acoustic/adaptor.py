"""Flow-matching temporal adaptor: joint duration/pitch/energy modeling.

Capability parity with reference
`tts/models/acoustic/modules/temporal_adaptor.py`:
- OT-CFM training (sigma=1e-5): x_t = (1-(1-s)t) x0 + t x1, flow target
  x1 - (1-s) x0, transformer over concat([x_t, cond]) with AdaLN time
  conditioning, masked MSE flow loss (:104-138)
- Euler ODE inference with geometric (logspace, step_factor 0.75) time grid
  (:140-170) — here a `lax.scan` with a static step count
- token targets: log1p(duration); pitch/energy averaged mel->token by
  TemporalAverager (soft-alignment or hard-duration path) (:256-269, :439-465)
- teacher-forced pitch/energy embedding added to encoder states (:296-297)
- LengthRegulator: hard integer repeats via cumsum-bucket matmul, or soft
  fractional-alignment matmul (:411-436)
- inference control knobs: duration_target (-1 sentinel = predict),
  duration_factor, pitch/energy targets * factor + delta (:330-408)

TPU-first: static ``max_dec_len`` everywhere (bucketed decode length),
explicit PRNG, `lax.scan` ODE loop, all matmul-formulated expansions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import nnx

from ...config.registry import build_config
from ...nn.embeddings import TimePositionalEmbedding
from ...nn.transformer import Transformer, TransformerConfig, _as_dict
from ...utils.masks import get_float_mask_from_lengths, get_mask_3d, masked_mean


# ---------------------------------------------------------------------------
# length regulation / temporal averaging (pure functions)
# ---------------------------------------------------------------------------

def length_regulate_hard(x: jnp.ndarray, durations: jnp.ndarray, max_len: int):
    """Expand token states to frames by integer repeats (matmul-formulated).

    Args:
      x: (B, T, C); durations: (B, T) float; max_len: static output length.
    Returns:
      (out (B, max_len, C), dec_lens (B,)).
    """
    reps = jnp.floor(durations.astype(jnp.float32) + 0.5)
    dec_lens = jnp.sum(reps, axis=1).astype(jnp.int32)
    csum = jnp.cumsum(jnp.pad(reps, ((0, 0), (1, 0))), axis=1)  # (B, T+1)
    r = jnp.arange(max_len, dtype=jnp.float32)[None, :, None]  # (1, L, 1)
    mult = ((csum[:, None, :-1] <= r) & (csum[:, None, 1:] > r)).astype(x.dtype)
    out = jnp.einsum("blt,btc->blc", mult, x)
    return out, jnp.minimum(dec_lens, max_len)


def length_regulate_soft(x: jnp.ndarray, durations: jnp.ndarray,
                         alignment: jnp.ndarray, max_len: int | None = None):
    """Soft expansion with a fractional alignment (B, M, T): out = A @ x."""
    dec_lens = jnp.floor(jnp.sum(durations, axis=1) + 0.5).astype(jnp.int32)
    out = jnp.einsum("bmt,btc->bmc", alignment.astype(x.dtype), x)
    if max_len is not None:
        out = out[:, :max_len]
        dec_lens = jnp.minimum(dec_lens, max_len)
    return out, dec_lens


def average_by_alignment(x: jnp.ndarray, alignment: jnp.ndarray) -> jnp.ndarray:
    """Mel-frame -> token averaging with a soft alignment.

    x: (B, M); alignment: (B, M, T). Returns (B, T).
    """
    colsum = jnp.sum(alignment, axis=1)  # (B, T)
    avg = jnp.einsum("bm,bmt->bt", x, alignment) / (colsum + 1e-5)
    return avg


def average_by_duration(x: jnp.ndarray, durations: jnp.ndarray) -> jnp.ndarray:
    """Segment means over hard durations, counting only nonzero frames.

    x: (B, M); durations: (B, T). Returns (B, T).
    """
    ends = jnp.cumsum(durations, axis=1).astype(jnp.int32)  # (B, T)
    starts = jnp.pad(ends[:, :-1], ((0, 0), (1, 0)))
    x_csum = jnp.pad(jnp.cumsum(x, axis=1), ((0, 0), (1, 0)))
    nz_csum = jnp.pad(jnp.cumsum((x != 0.0).astype(jnp.float32), axis=1), ((0, 0), (1, 0)))
    M = x.shape[1]
    ends = jnp.clip(ends, 0, M)
    starts = jnp.clip(starts, 0, M)
    sums = jnp.take_along_axis(x_csum, ends, axis=1) - jnp.take_along_axis(x_csum, starts, axis=1)
    counts = jnp.take_along_axis(nz_csum, ends, axis=1) - jnp.take_along_axis(nz_csum, starts, axis=1)
    return jnp.where(counts == 0.0, 0.0, sums / jnp.maximum(counts, 1.0))


def generate_soft_path(durations: jnp.ndarray, mask3d: jnp.ndarray) -> jnp.ndarray:
    """Fractional (soft) alignment path from float durations.

    durations: (B, T); mask3d: (B, T, M). Returns (B, T, M) rows summing to
    each token's duration, fractions split at segment boundaries
    (reference temporal_adaptor.py:468-478).
    """
    B, T, M = mask3d.shape
    cum = jnp.cumsum(durations, axis=1).reshape(B * T)
    path = get_float_mask_from_lengths(cum, M).reshape(B, T, M)
    path = path - jnp.pad(path, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    return path * mask3d


# ---------------------------------------------------------------------------
# temporal modules
# ---------------------------------------------------------------------------

@dataclass
class TemporalModuleConfig:
    input_dim: int = 256
    output_dim: int = 256
    transformer: TransformerConfig = field(
        default_factory=lambda: TransformerConfig(dim=128, depth=2)
    )
    detach_inputs: bool = False


class TransformerTemporalModule(nnx.Module):
    """Plain transformer + linear head (the pitch/energy embedding network)."""

    Config = TemporalModuleConfig

    def __init__(self, config: TemporalModuleConfig, *, rngs: nnx.Rngs):
        cfg = config
        self.config = cfg
        from ...nn.policy import get_compute_dtype

        t_cfg = build_config(TransformerConfig, _as_dict(cfg.transformer),
                             emb_dim=cfg.input_dim)
        self.transformer = Transformer(t_cfg, rngs=rngs)
        self.linear = nnx.Linear(t_cfg.dim, cfg.output_dim,
                                 dtype=get_compute_dtype(), rngs=rngs)
        self.detach_inputs = cfg.detach_inputs

    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        if self.detach_inputs:
            x = jax.lax.stop_gradient(x)
        out = self.transformer(x, mask=mask).out
        out = self.linear(out)
        if mask is not None:
            out = out * mask[..., None].astype(out.dtype)
        return out


@dataclass
class FlowTemporalModuleConfig:
    input_dim: int = 256
    output_dim: int = 256
    transformer: TransformerConfig = field(
        default_factory=lambda: TransformerConfig(dim=128, depth=2)
    )
    time_embedding_dim: int | None = None
    sigma: float = 1e-5
    detach_inputs: bool = False


class FlowTransformerTemporalModule(nnx.Module):
    """Conditional flow matching (OT-CFM) over token-level feature vectors."""

    Config = FlowTemporalModuleConfig

    def __init__(self, config: FlowTemporalModuleConfig, *, rngs: nnx.Rngs):
        cfg = config
        self.config = cfg
        time_dim = cfg.time_embedding_dim or cfg.input_dim
        self.time_embedding = TimePositionalEmbedding(freq_dim=64, emb_dim=time_dim, rngs=rngs)
        t_cfg = build_config(
            TransformerConfig, _as_dict(cfg.transformer),
            emb_dim=cfg.output_dim + cfg.input_dim,
            adaptive_norm=True, condition_dim=time_dim,
        )
        from ...nn.policy import get_compute_dtype

        self.transformer = Transformer(t_cfg, rngs=rngs)
        self.linear = nnx.Linear(t_cfg.dim, cfg.output_dim,
                                 dtype=get_compute_dtype(), rngs=rngs)
        self.output_dim = cfg.output_dim
        self.sigma = cfg.sigma
        self.detach_inputs = cfg.detach_inputs
        self.rngs = rngs

    def _velocity(self, x_t, cond, t_emb, mask):
        h = jnp.concatenate([x_t, cond], axis=-1)
        out = self.transformer(h, mask=mask, adaptive_condition=t_emb).out
        return self.linear(out)

    def __call__(self, x: jnp.ndarray, targets: jnp.ndarray,
                 mask: jnp.ndarray | None = None,
                 key: jax.Array | None = None):
        """Training: sample t ~ U(0,1), predict the OT-CFM flow, masked MSE.

        ``key`` overrides the module RNG streams (deterministic training /
        functional benchmarking). Returns (x_pred, {"flow_loss": loss}).
        """
        cond = jax.lax.stop_gradient(x) if self.detach_inputs else x
        B, T, _ = x.shape
        if mask is None:
            mask = jnp.ones((B, T), dtype=bool)

        x1 = jax.lax.stop_gradient(targets)
        if key is not None:
            noise_key, time_key = jax.random.split(key)
        else:
            noise_key = self.rngs.noise()
            time_key = self.rngs.time()
        x0 = jax.random.normal(noise_key, x1.shape, dtype=x1.dtype)
        t = jax.random.uniform(time_key, (B,), dtype=x1.dtype)
        t_emb = self.time_embedding(t)

        tb = t[:, None, None]
        x_t = (1.0 - (1.0 - self.sigma) * tb) * x0 + tb * x1
        flow = x1 - (1.0 - self.sigma) * x0

        pred_flow = self._velocity(x_t, cond, t_emb, mask)
        fmask = mask[..., None].astype(pred_flow.dtype)
        pred_flow = pred_flow * fmask

        loss = masked_mean((pred_flow - flow) ** 2, jnp.broadcast_to(fmask, pred_flow.shape))
        x_pred = jax.lax.stop_gradient((x0 + pred_flow) * fmask)
        return x_pred, {"flow_loss": loss}

    def infer(self, x: jnp.ndarray, mask: jnp.ndarray | None = None,
              steps: int = 4, step_factor: float = 0.75,
              key: jax.Array | None = None) -> jnp.ndarray:
        """Euler ODE sampling over a geometric time grid (static step count)."""
        B, T, _ = x.shape
        if mask is None:
            mask = jnp.ones((B, T), dtype=bool)
        if key is None:
            key = self.rngs.noise()
        x_t = jax.random.normal(key, (B, T, self.output_dim), dtype=x.dtype)

        if step_factor == 1.0:
            grid = jnp.linspace(0.0, 1.0, steps + 1)
        else:
            # geometric grid: larger steps early, refined near t=1
            pts = step_factor ** jnp.arange(steps + 1, dtype=jnp.float32)
            deltas = -jnp.diff(pts)
            deltas = jnp.concatenate([jnp.zeros((1,)), deltas])
            grid = jnp.cumsum(deltas / jnp.sum(deltas))

        t_start = grid[:-1]
        dt = jnp.diff(grid)

        def euler_step(x_t, inputs):
            t, dt = inputs
            t_emb = self.time_embedding(jnp.full((B,), t, dtype=x.dtype))
            v = self._velocity(x_t, x, t_emb, mask)
            # keep the carry dtype stable: v's dtype follows the weight/
            # compute policy (e.g. bf16 serving weights), and a promoted
            # x_t + v*dt would flip the scan carry type mid-loop
            return x_t + (v * dt).astype(x_t.dtype), None

        x_t, _ = jax.lax.scan(euler_step, x_t, (t_start, dt))
        return x_t * mask[..., None].astype(x_t.dtype)


# ---------------------------------------------------------------------------
# the adaptor
# ---------------------------------------------------------------------------

class TemporalAdaptorOutput(NamedTuple):
    enc_out: jnp.ndarray  # (B, max_dec_len, C)
    log_duration: jnp.ndarray | None
    duration: jnp.ndarray  # (B, T)
    dec_lengths: jnp.ndarray  # (B,)
    pitch: jnp.ndarray | None
    energy: jnp.ndarray | None
    pitch_target: jnp.ndarray | None
    energy_target: jnp.ndarray | None
    losses: dict | None = None


@dataclass
class FlowTemporalAdaptorConfig:
    encoder_dim: int = 384
    predictor: FlowTemporalModuleConfig = field(default_factory=FlowTemporalModuleConfig)
    embedding: TemporalModuleConfig = field(default_factory=TemporalModuleConfig)
    pitch: bool = True
    energy: bool = True
    soft_duration: bool = False


class FlowTemporalAdaptor(nnx.Module):
    Config = FlowTemporalAdaptorConfig

    def __init__(self, config: FlowTemporalAdaptorConfig, *, rngs: nnx.Rngs):
        cfg = config
        self.config = cfg
        self.encoder_dim = cfg.encoder_dim
        self.use_pitch = cfg.pitch
        self.use_energy = cfg.energy
        self.feature_dim = 1 + int(cfg.pitch) + int(cfg.energy)
        self.pitch_idx = 1
        self.energy_idx = self.pitch_idx + (1 if cfg.pitch else 0)
        self.soft_duration = cfg.soft_duration

        self.predictor = FlowTransformerTemporalModule(
            build_config(FlowTemporalModuleConfig, _as_dict(cfg.predictor),
                         input_dim=cfg.encoder_dim, output_dim=self.feature_dim),
            rngs=rngs,
        )
        self.embedding = TransformerTemporalModule(
            build_config(TemporalModuleConfig, _as_dict(cfg.embedding),
                         input_dim=self.feature_dim - 1, output_dim=cfg.encoder_dim),
            rngs=rngs,
        )

    def _average_target(self, dense, duration_target, alignment, enc_mask):
        if dense is None:
            return None
        if alignment is not None:
            tok = average_by_alignment(dense, alignment)
        else:
            tok = average_by_duration(dense, duration_target)
        return tok * enc_mask.astype(tok.dtype)

    def __call__(self, enc_out: jnp.ndarray, enc_mask: jnp.ndarray,
                 max_dec_len: int, duration_target: jnp.ndarray,
                 alignment: jnp.ndarray | None = None,
                 pitch_target_dense: jnp.ndarray | None = None,
                 energy_target_dense: jnp.ndarray | None = None,
                 key: jax.Array | None = None) -> TemporalAdaptorOutput:
        """Training forward.

        Args:
          enc_out: (B, T, C); enc_mask: (B, T) bool.
          max_dec_len: static decoder length (mel bucket length).
          duration_target: (B, T) hard durations from the aligner.
          alignment: (B, M, T) soft alignment (used when soft_duration).
          pitch/energy_target_dense: (B, M) frame-level targets.
        """
        if self.soft_duration and alignment is None:
            raise ValueError("soft_duration requires the soft alignment")
        alignment = alignment if self.soft_duration else None

        feats = [jnp.log1p(duration_target)[..., None]]
        pitch_target = energy_target = None
        if self.use_pitch:
            pitch_target = self._average_target(
                pitch_target_dense, duration_target, alignment, enc_mask)
            feats.append(pitch_target[..., None])
        if self.use_energy:
            energy_target = self._average_target(
                energy_target_dense, duration_target, alignment, enc_mask)
            feats.append(energy_target[..., None])
        target_features = jnp.concatenate(feats, axis=-1)

        pred, losses = self.predictor(enc_out, target_features, enc_mask, key=key)

        log_duration_pred = pred[..., 0]
        duration_pred = jnp.clip(jnp.exp(log_duration_pred) - 1.0, 0.0, None)

        # teacher-forced features feed the embedding network
        emb_feats = []
        pitch_pred = energy_pred = None
        if self.use_pitch:
            pitch_pred = pred[..., self.pitch_idx]
            emb_feats.append(jax.lax.stop_gradient(pitch_target)[..., None])
        if self.use_energy:
            energy_pred = pred[..., self.energy_idx]
            emb_feats.append(jax.lax.stop_gradient(energy_target)[..., None])
        if emb_feats:
            features = jnp.concatenate(emb_feats, axis=-1)
            enc_out = enc_out + self.embedding(features, mask=enc_mask)

        if alignment is not None:
            reg_out, dec_lens = length_regulate_soft(
                enc_out, duration_target, alignment, max_len=max_dec_len)
        else:
            reg_out, dec_lens = length_regulate_hard(enc_out, duration_target, max_dec_len)

        return TemporalAdaptorOutput(
            enc_out=reg_out,
            log_duration=log_duration_pred,
            duration=duration_pred,
            dec_lengths=dec_lens,
            pitch=pitch_pred,
            energy=energy_pred,
            pitch_target=pitch_target,
            energy_target=energy_target,
            losses=losses,
        )

    def infer(self, enc_out: jnp.ndarray, enc_mask: jnp.ndarray | None = None,
              max_dec_len: int = 2048,
              duration_target: jnp.ndarray | None = None,
              duration_factor: float = 1.0,
              pitch_target: jnp.ndarray | None = None,
              pitch_factor: float = 1.0, pitch_delta: float = 0.0,
              energy_target: jnp.ndarray | None = None,
              energy_factor: float = 1.0, energy_delta: float = 0.0,
              steps: int = 4, key: jax.Array | None = None) -> TemporalAdaptorOutput:
        """Inference: ODE-sample features, apply control knobs, expand.

        ``duration_target`` entries of -1 mean "use the prediction".
        ``max_dec_len`` is the static frame budget (bucketed).
        """
        B, T, _ = enc_out.shape
        pred = self.predictor.infer(enc_out, mask=enc_mask, steps=steps, key=key)

        log_duration_pred = pred[..., 0]
        duration_pred = duration_factor * (jnp.exp(log_duration_pred) - 1.0)
        if not self.soft_duration:
            duration_pred = jnp.round(duration_pred)
        duration_pred = jnp.clip(duration_pred, 0.0, None)
        if duration_target is not None:
            dt = duration_target.astype(duration_pred.dtype)
            duration_pred = jnp.where(dt < 0, duration_pred, dt)
        if enc_mask is not None:
            duration_pred = duration_pred * enc_mask.astype(duration_pred.dtype)

        feats = []
        pitch = energy = None
        if self.use_pitch:
            pitch = (pred[..., self.pitch_idx] if pitch_target is None else pitch_target)
            pitch = pitch * pitch_factor + pitch_delta
            feats.append(pitch[..., None])
        if self.use_energy:
            energy = (pred[..., self.energy_idx] if energy_target is None else energy_target)
            energy = energy * energy_factor + energy_delta
            feats.append(energy[..., None])
        if feats:
            features = jnp.concatenate(feats, axis=-1)
            enc_out = enc_out + self.embedding(features, mask=enc_mask)

        if self.soft_duration:
            enc_lens = (jnp.sum(enc_mask, axis=1) if enc_mask is not None
                        else jnp.full((B,), T, jnp.int32))
            dec_lens = jnp.floor(jnp.sum(duration_pred, axis=1) + 0.5).astype(jnp.int32)
            dec_lens = jnp.minimum(dec_lens, max_dec_len)
            mask3d = get_mask_3d(enc_lens, dec_lens, T, max_dec_len).astype(jnp.float32)
            path = generate_soft_path(duration_pred, mask3d)  # (B, T, M)
            alignment = jnp.swapaxes(path, 1, 2)  # (B, M, T)
            reg_out, dec_lens = length_regulate_soft(
                enc_out, duration_pred, alignment, max_len=max_dec_len)
        else:
            reg_out, dec_lens = length_regulate_hard(enc_out, duration_pred, max_dec_len)

        return TemporalAdaptorOutput(
            enc_out=reg_out,
            log_duration=None,
            duration=duration_pred,
            dec_lengths=dec_lens,
            pitch=pitch,
            energy=energy,
            pitch_target=pitch_target,
            energy_target=energy_target,
        )
