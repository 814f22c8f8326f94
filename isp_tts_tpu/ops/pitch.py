"""YIN fundamental-frequency estimation as a jittable JAX op.

Implements the YIN algorithm (de Cheveigné & Kawahara 2002, eqs. 6-8) with the
same numerics/conventions as the reference's vendored torch-yin
(`tts/data/pitch.py:17-100`, `tts/data/providers.py:299-313`):

- cumulative-mean-normalized difference function via FFT autocorrelation
- absolute-threshold search for the first local CMNDF minimum below threshold
- non-periodic frames -> 0 Hz

Re-designed for TPU: operates on fixed-length (bucketed) signals, batched via
``jnp.vectorize``, everything on-device.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from .audio import frame_signal


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@functools.partial(jnp.vectorize, signature="(n)->(t)", excluded=(1, 2, 3, 4, 5))
def _yin_1d(signal, sample_rate, tau_min, tau_max, hop_length, threshold):
    frame_length = 2 * tau_max
    frames = frame_signal(signal, frame_length, hop_length)  # (T, W)

    # FFT autocorrelation (YIN eq. 1); fft size covers circular lag tau_max
    fft_size = 2 * _next_pow2(frame_length)
    spec = jnp.fft.rfft(frames, n=fft_size, axis=-1)
    acorr = jnp.fft.irfft(spec * jnp.conj(spec), n=fft_size, axis=-1)[..., :tau_max]

    # difference function d(tau) (YIN eq. 6) from energy cumsums
    energy_csum = jnp.pad(jnp.cumsum(frames * frames, axis=-1), ((0, 0), (1, 0)))
    total_energy = energy_csum[..., -1:]
    tail_energy = energy_csum[..., ::-1][..., :tau_max] - energy_csum[..., :tau_max]
    d = total_energy + tail_energy - 2.0 * acorr  # (T, tau_max)

    # cumulative mean normalized difference d'(tau) (YIN eq. 8)
    d1 = d[..., 1:]
    taus = jnp.arange(1, tau_max, dtype=d.dtype)
    cmndf = d1 * taus / jnp.maximum(jnp.cumsum(d1, axis=-1), 1e-5)
    cmndf = cmndf[..., tau_min:]  # restrict to [tau_min, tau_max)
    n_lags = cmndf.shape[-1]

    # absolute threshold (YIN step 4): first lag below threshold, then walk to
    # the local minimum (first non-decreasing slope).
    # Inherited quirk (torch-yin parity, kept deliberately): argmax returns 0
    # both for "lag index 0 is below threshold" and "no lag below", so a
    # frame whose CMNDF dips under threshold exactly at the FIRST searched
    # lag (F0 right at pitch_max) reads as unvoiced 0 Hz — same output as
    # the vendored torch-yin the reference uses.
    below = cmndf < threshold
    first_below = jnp.argmax(below, axis=-1, keepdims=True)
    first_below = jnp.where(first_below > 0, first_below, tau_max)
    beyond = jnp.arange(n_lags) >= first_below
    rising = jnp.pad(jnp.diff(cmndf, axis=-1) >= 0.0, ((0, 0), (0, 1)), constant_values=True)
    tau = jnp.argmax(beyond & rising, axis=-1)

    freq = sample_rate / (tau + tau_min + 1).astype(signal.dtype)
    return jnp.where(tau > 0, freq, jnp.zeros_like(freq))


def yin_pitch(signal: jnp.ndarray, sample_rate: int, pitch_min: float,
              pitch_max: float, hop_length: int, threshold: float = 0.15) -> jnp.ndarray:
    """Estimate per-frame F0.

    Args:
      signal: (..., n_samples) audio (pre-padded by the caller if desired; the
        reference pads by ``(win_length - hop_length)/2`` zeros each side).
      sample_rate: Hz.
      pitch_min / pitch_max: expected F0 bounds in Hz.
      hop_length: frame stride in samples.
      threshold: harmonic threshold (reference default 0.15).

    Returns:
      (..., n_frames) F0 in Hz; 0 for non-periodic frames, with
      n_frames = (n_samples - 2*int(sr/pitch_min)) // hop + 1.
    """
    tau_min = int(sample_rate / pitch_max)
    tau_max = int(sample_rate / pitch_min)
    return _yin_1d(signal, float(sample_rate), tau_min, tau_max, hop_length, float(threshold))
