"""Audio feature extraction as batched, jittable JAX ops.

Capability parity with the reference's torchaudio-based providers
(`tts/data/providers.py:24-188`): magnitude STFT (center=False, explicit
``(n_fft - hop)/2`` zero pad), slaney-norm/slaney-scale mel filterbank,
``log(clamp(x, 1e-5))`` dynamic-range compression, and per-frame ``log1p`` L2
energy — re-designed TPU-first: static shapes (audio padded to a bucket
length), whole batches processed on-device under ``jit``.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def num_frames(n_samples: int, n_fft: int = 1024, hop_length: int = 256,
               pad: int | None = None) -> int:
    """Frame count produced by :func:`stft_magnitude` for ``n_samples`` samples."""
    if pad is None:
        pad = (n_fft - hop_length) // 2
    return (n_samples + 2 * pad - n_fft) // hop_length + 1


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (torch.hann_window(periodic=True) semantics)."""
    n = jnp.arange(win_length, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / win_length)


def frame_signal(x: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """Window a signal into overlapping frames.

    Args:
      x: (..., n_samples).
    Returns:
      (..., n_frames, frame_length) with n_frames = (n - frame_length)//hop + 1.
    """
    n = x.shape[-1]
    n_frames = max((n - frame_length) // hop_length + 1, 0)
    idx = (jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(frame_length)[None, :])
    return x[..., idx]


@functools.partial(jnp.vectorize, signature="(n)->(t,f)", excluded=(1, 2, 3, 4))
def _stft_mag_1d(audio, n_fft, hop_length, win_length, pad):
    x = jnp.pad(audio, (pad, pad))
    frames = frame_signal(x, n_fft, hop_length)
    win = hann_window(win_length, dtype=frames.dtype)
    if win_length < n_fft:  # center the window inside the fft frame
        lpad = (n_fft - win_length) // 2
        win = jnp.pad(win, (lpad, n_fft - win_length - lpad))
    spec = jnp.fft.rfft(frames * win, n=n_fft, axis=-1)
    return jnp.abs(spec)  # power=1.0 (magnitude), matching the reference recipes


def stft_magnitude(audio: jnp.ndarray, n_fft: int = 1024, hop_length: int = 256,
                   win_length: int = 1024, pad: int | None = None) -> jnp.ndarray:
    """Magnitude spectrogram, (..., n_samples) -> (..., n_freqs, n_frames).

    Matches torchaudio ``T.Spectrogram(power=1, center=False,
    pad=(n_fft-hop)/2)`` as configured in reference
    `tts/data/providers.py:35-54`.
    """
    if pad is None:
        pad = (n_fft - hop_length) // 2
    out = _stft_mag_1d(audio, n_fft, hop_length, win_length, pad)
    return jnp.swapaxes(out, -1, -2)


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, f / f_sp)


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f_sp * m)


@functools.lru_cache(maxsize=8)
def mel_filterbank(sample_rate: int, n_fft: int = 1024, n_mels: int = 80,
                   f_min: float = 0.0, f_max: float | None = 8000.0,
                   norm: str | None = "slaney") -> np.ndarray:
    """Slaney-scale triangular mel filterbank, shape (n_mels, n_fft//2 + 1).

    Matches torchaudio ``T.MelScale(norm='slaney', mel_scale='slaney')`` as
    configured in reference `tts/data/providers.py:81-102`.
    """
    if f_max is None:
        f_max = sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel_slaney(f_min), _hz_to_mel_slaney(f_max), n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)  # (n_mels + 2,)
    f_diff = np.diff(hz_pts)  # (n_mels + 1,)
    slopes = hz_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))  # (n_freqs, n_mels)
    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
        fb = fb * enorm[None, :]
    return fb.T.astype(np.float32)


def dynamic_range_compression(x: jnp.ndarray, C: float = 1.0,
                              clip_val: float = 1e-5) -> jnp.ndarray:
    """log(clamp(x, clip_val) * C). Parity: reference `tts/data/functions.py:19-20`."""
    return jnp.log(jnp.clip(x, clip_val, None) * C)


def log_mel_spectrogram(audio: jnp.ndarray, sample_rate: int, n_fft: int = 1024,
                        hop_length: int = 256, win_length: int = 1024,
                        n_mels: int = 80, f_min: float = 0.0,
                        f_max: float | None = 8000.0) -> jnp.ndarray:
    """(..., n_samples) -> (..., n_mels, n_frames) log-compressed slaney mel."""
    spec = stft_magnitude(audio, n_fft, hop_length, win_length)
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, f_min, f_max))
    mel = jnp.einsum("mf,...ft->...mt", fb, spec)
    return dynamic_range_compression(mel)


def frame_energy(spec: jnp.ndarray) -> jnp.ndarray:
    """Per-frame log1p L2 norm of the linear magnitude spectrogram.

    Args:
      spec: (..., n_freqs, n_frames).
    Returns:
      (..., n_frames). Parity: reference `tts/data/providers.py:178-188`.
    """
    return jnp.log1p(jnp.linalg.norm(spec, axis=-2))
