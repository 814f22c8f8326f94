"""GAN discriminators for vocoder training: multi-period + multi-resolution.

The reference repo ships no vocoder trainer (its Vocos checkpoint is an
external TorchScript artifact, inference.ipynb cell 7); this implements the
standard ensemble that family of vocoders is trained with:

- **MultiPeriodDiscriminator** (HiFi-GAN): for each period p the waveform is
  folded to a (S/p, p) grid and judged by a stack of (5,1)-kernel strided 2-D
  convs — each period exposes a different periodic structure.
- **MultiResolutionDiscriminator** (UnivNet/Vocos): log-magnitude STFTs at
  three resolutions judged by 2-D conv stacks. Spectrograms come from the
  real-matmul STFT (:func:`ops.vocoder._stft_matmul`) so the whole
  discriminator pass is TPU-compilable (no complex dtypes).

All convs are weight-normalized (``WNConv`` below): w = g * v / ||v||, the
reparameterization GAN discriminators rely on for stable scales. Layout is
NHWC channel-last throughout (TPU-preferred).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...ops.vocoder import _stft_matmul


@dataclass
class VocoderDiscriminatorConfig:
    periods: tuple = (2, 3, 5, 7, 11)
    #: (n_fft, hop_length) per spectrogram resolution; win = n_fft
    resolutions: tuple = ((1024, 256), (2048, 512), (512, 128))
    mpd_channels: tuple = (32, 128, 512, 1024)
    mrd_channels: int = 32
    leaky_slope: float = 0.1


class WNConv(nnx.Module):
    """Weight-normalized 2-D convolution (torch ``weight_norm(Conv2d)``
    semantics): kernel = g * v / ||v||, norm over all axes but the output
    channel. NHWC in, NHWC out.

    Follows the compute-dtype policy (f32 master params, norm computed in
    f32, conv operands/activations in e.g. bf16 — MXU accumulation stays
    f32): under the default bf16 training policy the discriminator ensemble
    is the dominant cost of the GAN step, and f32 convs ran it at ~2x the
    device time (docs/PERF_R3.md vocoder section)."""

    def __init__(self, in_features: int, out_features: int, kernel_size: tuple,
                 strides: tuple = (1, 1), *, rngs: nnx.Rngs):
        from ...nn.policy import get_compute_dtype

        shape = (*kernel_size, in_features, out_features)
        v = nnx.initializers.he_normal(in_axis=(0, 1, 2), out_axis=3)(
            rngs.params(), shape, jnp.float32)
        self.v = nnx.Param(v)
        self.g = nnx.Param(jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2))))
        self.bias = nnx.Param(jnp.zeros((out_features,), jnp.float32))
        self.strides = tuple(strides)
        self.padding = tuple((k // 2, k // 2) for k in kernel_size)
        self._dtype = get_compute_dtype()

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        v = self.v.value
        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2), keepdims=True) + 1e-12)
        kernel = v / norm * self.g.value  # f32 (kh, kw, in, out)
        dtype = self._dtype or x.dtype
        out = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            window_strides=self.strides, padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + self.bias.value.astype(out.dtype)


class PeriodDiscriminator(nnx.Module):
    def __init__(self, period: int, channels: tuple, slope: float, *,
                 rngs: nnx.Rngs):
        self.period = int(period)
        self.slope = float(slope)
        convs = []
        c_in = 1
        for c_out in channels:
            convs.append(WNConv(c_in, c_out, (5, 1), (3, 1), rngs=rngs))
            c_in = c_out
        convs.append(WNConv(c_in, c_in, (5, 1), (1, 1), rngs=rngs))
        self.convs = nnx.List(convs)
        self.conv_post = WNConv(c_in, 1, (3, 1), (1, 1), rngs=rngs)

    def __call__(self, audio: jnp.ndarray):
        """(B, S) -> (logits (B, n), features list)."""
        B, S = audio.shape
        p = self.period
        pad = (-S) % p
        x = jnp.pad(audio, ((0, 0), (0, pad)), mode="reflect" if pad < S else "constant")
        x = x.reshape(B, (S + pad) // p, p, 1)  # NHWC
        features = []
        for conv in self.convs:
            x = jax.nn.leaky_relu(conv(x), self.slope)
            features.append(x)
        x = self.conv_post(x)
        features.append(x)
        return x.reshape(B, -1), features


class ResolutionDiscriminator(nnx.Module):
    def __init__(self, n_fft: int, hop: int, channels: int, slope: float, *,
                 rngs: nnx.Rngs):
        self.n_fft = int(n_fft)
        self.hop = int(hop)
        self.slope = float(slope)
        c = channels
        self.convs = nnx.List([
            WNConv(1, c, (3, 9), (1, 1), rngs=rngs),
            WNConv(c, c, (3, 9), (1, 2), rngs=rngs),
            WNConv(c, c, (3, 9), (1, 2), rngs=rngs),
            WNConv(c, c, (3, 9), (1, 2), rngs=rngs),
            WNConv(c, c, (3, 3), (1, 1), rngs=rngs),
        ])
        self.conv_post = WNConv(c, 1, (3, 3), (1, 1), rngs=rngs)

    def __call__(self, audio: jnp.ndarray):
        """(B, S) -> (logits (B, n), features list)."""
        pad = (self.n_fft - self.hop) // 2
        re, im = _stft_matmul(audio, self.n_fft, self.hop, self.n_fft, pad)
        mag = jnp.sqrt(re * re + im * im + 1e-9)  # (B, F, T)
        x = jnp.log1p(mag)[..., None]  # log-compress; NHWC with H=freq, W=time
        features = []
        for conv in self.convs:
            x = jax.nn.leaky_relu(conv(x), self.slope)
            features.append(x)
        x = self.conv_post(x)
        features.append(x)
        return x.reshape(audio.shape[0], -1), features


class VocoderDiscriminator(nnx.Module):
    """The full ensemble; returns per-sub-discriminator logits and feature
    pyramids (for the feature-matching loss)."""

    Config = VocoderDiscriminatorConfig

    def __init__(self, config: VocoderDiscriminatorConfig, *, rngs: nnx.Rngs):
        cfg = config
        self.config = cfg
        self.period_discs = nnx.List([
            PeriodDiscriminator(p, tuple(cfg.mpd_channels), cfg.leaky_slope,
                                rngs=rngs)
            for p in cfg.periods
        ])
        self.resolution_discs = nnx.List([
            ResolutionDiscriminator(n_fft, hop, cfg.mrd_channels,
                                    cfg.leaky_slope, rngs=rngs)
            for n_fft, hop in cfg.resolutions
        ])

    def __call__(self, audio: jnp.ndarray):
        logits, features = [], []
        for disc in self.period_discs:
            lg, ft = disc(audio)
            logits.append(lg)
            features.append(ft)
        for disc in self.resolution_discs:
            lg, ft = disc(audio)
            logits.append(lg)
            features.append(ft)
        return logits, features
