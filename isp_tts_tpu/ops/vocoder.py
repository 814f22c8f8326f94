"""Mel -> waveform synthesis ops.

The reference delegates vocoding to an external TorchScript Vocos checkpoint
(`notebooks/inference.ipynb` cell 7) that is not part of the repo. For a
self-contained synthesis path this module provides a fully jittable
Griffin-Lim vocoder:

  log-mel -> (exp) -> mel -> (filterbank pseudo-inverse, NNLS-ish clamp)
  -> magnitude STFT -> iterative phase recovery -> ISTFT

plus :func:`istft` (overlap-add with window-square normalization) usable by
any neural vocoder head added later.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .audio import mel_filterbank


@functools.lru_cache(maxsize=4)
def _mel_pinv(sample_rate: int, n_fft: int, n_mels: int, f_min: float,
              f_max: float | None) -> np.ndarray:
    fb = mel_filterbank(sample_rate, n_fft, n_mels, f_min, f_max)  # (mels, freqs)
    return np.linalg.pinv(fb).astype(np.float32)  # (freqs, mels)


def mel_to_linear(log_mel: jnp.ndarray, sample_rate: int, n_fft: int = 1024,
                  f_min: float = 0.0, f_max: float | None = 8000.0) -> jnp.ndarray:
    """(..., frames, n_mels) log-mel -> (..., n_freqs, frames) magnitude."""
    n_mels = log_mel.shape[-1]
    pinv = jnp.asarray(_mel_pinv(sample_rate, n_fft, n_mels, f_min, f_max))
    mel = jnp.exp(log_mel)  # invert dynamic-range compression
    mag = jnp.einsum("fm,...tm->...ft", pinv, mel)
    return jnp.maximum(mag, 0.0)


@functools.lru_cache(maxsize=8)
def _synth_window(win_length: int, n_fft: int) -> np.ndarray:
    """Periodic Hann of ``win_length`` centered inside the ``n_fft`` frame —
    the synthesis-side mirror of the analysis centering in
    ``ops/audio._stft_mag_1d`` (same ``(n_fft - win)//2`` left pad), so
    win_length < n_fft round-trips instead of crashing on a shape mismatch."""
    n = np.arange(win_length, dtype=np.float64)
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        win = np.pad(win, (lpad, n_fft - win_length - lpad))
    elif win_length > n_fft:
        raise ValueError(f"win_length {win_length} > n_fft {n_fft}")
    return win.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _ola_norm(T: int, n_fft: int, hop_length: int, win_length: int) -> np.ndarray:
    """Window-square overlap-add normalizer — a CONSTANT per (T, n_fft, hop,
    win), precomputed on the host so Griffin-Lim's `lax.scan` body doesn't
    rebuild a T*n_fft scatter/OLA every phase-recovery iteration (XLA does
    not hoist loop-invariant code out of scan bodies)."""
    win = _synth_window(win_length, n_fft)
    out_len = n_fft + hop_length * (T - 1)
    norm = np.zeros((out_len,), np.float64)
    idx = np.arange(T)[:, None] * hop_length + np.arange(n_fft)[None, :]
    np.add.at(norm, idx.reshape(-1),
              np.tile((win * win).astype(np.float64), T))
    return norm.astype(np.float32)


def istft(spec: jnp.ndarray, n_fft: int = 1024, hop_length: int = 256,
          win_length: int = 1024) -> jnp.ndarray:
    """Inverse STFT with overlap-add, (..., n_freqs, frames) complex -> (..., n)."""
    win = jnp.asarray(_synth_window(win_length, n_fft))
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)  # (..., T, n_fft)
    frames = frames * win

    T = frames.shape[-2]
    out_len = n_fft + hop_length * (T - 1)
    idx = jnp.arange(T)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    norm = jnp.asarray(_ola_norm(T, n_fft, hop_length, win_length))

    def ola(fr):
        sig = jnp.zeros((out_len,), fr.dtype).at[idx.reshape(-1)].add(fr.reshape(-1))
        return sig / jnp.maximum(norm, 1e-8)

    flat = frames.reshape((-1,) + frames.shape[-2:])
    out = jax.vmap(ola)(flat)
    return out.reshape(frames.shape[:-2] + (out_len,))


def griffin_lim(magnitude: jnp.ndarray, n_iter: int = 32, n_fft: int = 1024,
                hop_length: int = 256, win_length: int = 1024,
                key: jax.Array | None = None) -> jnp.ndarray:
    """Phase recovery from (..., n_freqs, frames) magnitudes via `lax.scan`."""
    if key is None:
        key = jax.random.PRNGKey(0)
    pad = (n_fft - hop_length) // 2
    angles = jax.random.uniform(key, magnitude.shape, minval=-np.pi, maxval=np.pi)
    phase = jnp.exp(1j * angles.astype(jnp.float32))

    def body(phase, _):
        audio = istft(magnitude * phase, n_fft, hop_length, win_length)
        # re-analyze: crop the synthesis padding so frame alignment matches
        audio_c = audio[..., pad:audio.shape[-1] - pad] if pad else audio
        spec = _stft_complex(audio_c, n_fft, hop_length, win_length, pad)
        spec = spec[..., : magnitude.shape[-1]]
        new_phase = spec / jnp.maximum(jnp.abs(spec), 1e-8)
        return new_phase, None

    phase, _ = jax.lax.scan(body, phase, None, length=n_iter)
    audio = istft(magnitude * phase, n_fft, hop_length, win_length)
    return audio[..., pad:audio.shape[-1] - pad] if pad else audio


def _stft_complex(audio, n_fft, hop_length, win_length, pad):
    from .audio import frame_signal

    x = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)])
    frames = frame_signal(x, n_fft, hop_length)
    win = jnp.asarray(_synth_window(win_length, n_fft))
    return jnp.swapaxes(jnp.fft.rfft(frames * win, n=n_fft, axis=-1), -1, -2)


def mel_to_audio(log_mel: jnp.ndarray, sample_rate: int = 22050,
                 n_fft: int = 1024, hop_length: int = 256, win_length: int = 1024,
                 f_min: float = 0.0, f_max: float | None = 8000.0,
                 n_iter: int = 32, power: float = 1.2,
                 key: jax.Array | None = None) -> jnp.ndarray:
    """Full Griffin-Lim vocoder: (..., frames, n_mels) log-mel -> waveform.

    ``power`` > 1 sharpens magnitudes before phase recovery (a standard
    Griffin-Lim quality tweak).
    """
    mag = mel_to_linear(log_mel, sample_rate, n_fft, f_min, f_max) ** power
    return griffin_lim(mag, n_iter, n_fft, hop_length, win_length, key=key)


# ---------------------------------------------------------------------------
# TPU-native Griffin-Lim: real-valued matmul DFT + scatter-free overlap-add
#
# This environment's TPU runtime rejects complex dtypes, so the FFT-based
# griffin_lim above only runs on CPU. The variant below reformulates the
# whole phase-recovery loop in dense real ops that map straight onto the MXU:
#   * rDFT / irDFT as (frames x n_fft) @ (n_fft x n_freqs) real matmuls
#     against precomputed cos/sin bases (one 1024x513 matmul per direction —
#     MXU-shaped, ~2 MFLOP per frame);
#   * overlap-add as a sum of n_fft/hop shifted strided views (no scatter —
#     TPU scatters serialize; the shifted-view sum is pure reshape+pad math);
#   * phase kept as (cos, sin) pairs normalized per bin.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=2)
def _dft_bases(n_fft: int) -> tuple[np.ndarray, ...]:
    """(fwd_re, fwd_im, inv_re, inv_im): x @ fwd -> (re, im) of rfft(x);
    re @ inv_re + im @ inv_im -> irfft."""
    eye = np.eye(n_fft, dtype=np.float64)
    spec = np.fft.rfft(eye, axis=-1)  # (n_fft, n_freqs)
    fwd_re = spec.real.astype(np.float32)
    fwd_im = spec.imag.astype(np.float32)
    n_freqs = spec.shape[-1]
    eye_f = np.eye(n_freqs, dtype=np.float64)
    inv_re = np.fft.irfft(eye_f, n=n_fft, axis=-1).astype(np.float32)
    inv_im = np.fft.irfft(1j * eye_f, n=n_fft, axis=-1).astype(np.float32)
    return fwd_re, fwd_im, inv_re, inv_im


def _ola_dense(frames: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """Overlap-add (..., T, n_fft) -> (..., n_fft + hop*(T-1)) without scatter:
    the k-th hop-slice of every frame lands k*hop samples in, so the result is
    the sum of n_fft/hop shifted flattened strided views."""
    *lead, T, n_fft = frames.shape
    assert n_fft % hop_length == 0
    chunks = n_fft // hop_length
    out_len = n_fft + hop_length * (T - 1)
    out = jnp.zeros((*lead, out_len), frames.dtype)
    for j in range(chunks):
        piece = frames[..., :, j * hop_length:(j + 1) * hop_length]
        piece = piece.reshape(*lead, T * hop_length)
        out = out.at[..., j * hop_length: j * hop_length + T * hop_length].add(piece)
    return out


def istft_matmul(spec_re: jnp.ndarray, spec_im: jnp.ndarray, n_fft: int = 1024,
                 hop_length: int = 256,
                 win_length: int = 1024) -> tuple[jnp.ndarray, int]:
    """Real-pair inverse STFT: (..., n_freqs, T) x2 -> ((..., samples), n)."""
    _, _, inv_re, inv_im = _dft_bases(n_fft)
    win = jnp.asarray(_synth_window(win_length, n_fft))
    re = jnp.swapaxes(spec_re, -1, -2)  # (..., T, n_freqs)
    im = jnp.swapaxes(spec_im, -1, -2)
    frames = re @ jnp.asarray(inv_re) + im @ jnp.asarray(inv_im)
    frames = frames * win

    T = frames.shape[-2]
    out_len = n_fft + hop_length * (T - 1)
    sig = _ola_dense(frames, hop_length)
    norm = jnp.asarray(_ola_norm(T, n_fft, hop_length, win_length))
    return sig / jnp.maximum(norm, 1e-8), out_len


def _stft_matmul(audio: jnp.ndarray, n_fft: int, hop_length: int,
                 win_length: int, pad: int):
    from .audio import frame_signal

    fwd_re, fwd_im, _, _ = _dft_bases(n_fft)
    x = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)])
    frames = (frame_signal(x, n_fft, hop_length)
              * jnp.asarray(_synth_window(win_length, n_fft)))
    re = jnp.swapaxes(frames @ jnp.asarray(fwd_re), -1, -2)  # (..., F, T)
    im = jnp.swapaxes(frames @ jnp.asarray(fwd_im), -1, -2)
    return re, im


def griffin_lim_matmul(magnitude: jnp.ndarray, n_iter: int = 32,
                       n_fft: int = 1024, hop_length: int = 256,
                       win_length: int = 1024,
                       key: jax.Array | None = None) -> jnp.ndarray:
    """Griffin-Lim phase recovery with NO complex dtypes or FFT ops — runs on
    TPU. Same algorithm as :func:`griffin_lim`, phases carried as
    (cos, sin)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    pad = (n_fft - hop_length) // 2
    angles = jax.random.uniform(key, magnitude.shape, minval=-np.pi,
                                maxval=np.pi).astype(jnp.float32)
    ph = (jnp.cos(angles), jnp.sin(angles))

    def body(ph, _):
        ph_re, ph_im = ph
        audio, _ = istft_matmul(magnitude * ph_re, magnitude * ph_im,
                                n_fft, hop_length, win_length)
        audio_c = audio[..., pad:audio.shape[-1] - pad] if pad else audio
        re, im = _stft_matmul(audio_c, n_fft, hop_length, win_length, pad)
        re = re[..., : magnitude.shape[-1]]
        im = im[..., : magnitude.shape[-1]]
        mag = jnp.sqrt(re * re + im * im)
        mag = jnp.maximum(mag, 1e-8)
        return (re / mag, im / mag), None

    (ph_re, ph_im), _ = jax.lax.scan(body, ph, None, length=n_iter)
    audio, _ = istft_matmul(magnitude * ph_re, magnitude * ph_im,
                            n_fft, hop_length, win_length)
    return audio[..., pad:audio.shape[-1] - pad] if pad else audio


def log_mel_matmul(audio: jnp.ndarray, sample_rate: int = 22050,
                   n_fft: int = 1024, hop_length: int = 256,
                   win_length: int = 1024, n_mels: int = 80,
                   f_min: float = 0.0, f_max: float | None = 8000.0,
                   eps: float = 1e-12) -> jnp.ndarray:
    """(..., samples) -> (..., frames, n_mels) log-mel with NO complex/FFT ops
    — the TPU-trainable twin of :func:`ops.audio.log_mel_spectrogram`.

    Used by the neural-vocoder GAN loss and feature path, which must compute
    mel INSIDE the jitted train step on the TPU (this runtime rejects complex
    dtypes, so the rfft-based op only runs on CPU). Same STFT contract as the
    data providers (center pad ``(n_fft - hop)/2``, periodic Hann, slaney mel,
    ``log(clamp(x, 1e-5))``); ``eps`` inside the magnitude sqrt keeps the
    gradient finite at silent bins (the providers never differentiate, this
    op does).
    """
    if win_length != n_fft:
        raise ValueError("log_mel_matmul requires win_length == n_fft")
    from .audio import dynamic_range_compression, mel_filterbank

    pad = (n_fft - hop_length) // 2
    re, im = _stft_matmul(audio, n_fft, hop_length, win_length, pad)  # (..., F, T)
    mag = jnp.sqrt(re * re + im * im + eps)
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, f_min, f_max))
    mel = jnp.einsum("mf,...ft->...tm", fb, mag)
    return dynamic_range_compression(mel)


def mel_to_audio_tpu(log_mel: jnp.ndarray, sample_rate: int = 22050,
                     n_fft: int = 1024, hop_length: int = 256,
                     win_length: int = 1024, f_min: float = 0.0,
                     f_max: float | None = 8000.0, n_iter: int = 32,
                     power: float = 1.2,
                     key: jax.Array | None = None) -> jnp.ndarray:
    """TPU-native mel -> waveform (matmul-DFT Griffin-Lim); numerically
    equivalent to :func:`mel_to_audio` (tested to fp tolerance on CPU)."""
    mag = mel_to_linear(log_mel, sample_rate, n_fft, f_min, f_max) ** power
    return griffin_lim_matmul(mag, n_iter, n_fft, hop_length, win_length,
                              key=key)
