"""Vocoder eval metrics: multi-resolution STFT distance + spectrogram images.

Copy-synthesis quality proxies (no neural MOS predictors in this
environment): the UnivNet/Parallel-WaveGAN multi-resolution STFT loss
(spectral convergence + log-magnitude L1 over three resolutions) and mel-L1,
all computed with the TPU-safe matmul STFT. ``on_eval_epoch_end`` renders a
real-vs-generated mel figure (the same dashboard hook the acoustic evaluator
uses, trainer.py evaluate()).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.vocoder import _stft_matmul, log_mel_matmul
from ...utils.plotting import plot_spectrogram

_RESOLUTIONS = ((1024, 256), (2048, 512), (512, 128))


@jax.jit
def multires_stft_distance(fake: jnp.ndarray, real: jnp.ndarray):
    """(spectral_convergence, log_mag_l1) averaged over three resolutions."""
    sc_total = jnp.float32(0.0)
    mag_total = jnp.float32(0.0)
    for n_fft, hop in _RESOLUTIONS:
        pad = (n_fft - hop) // 2
        fr, fi = _stft_matmul(fake, n_fft, hop, n_fft, pad)
        rr, ri = _stft_matmul(real, n_fft, hop, n_fft, pad)
        mag_f = jnp.sqrt(fr * fr + fi * fi + 1e-9)
        mag_r = jnp.sqrt(rr * rr + ri * ri + 1e-9)
        # per-utterance Frobenius ratio, then batch mean (the standard
        # UnivNet/PWG definition) — a global norm would let one loud sample
        # drown out regressions on the quiet ones
        axes = tuple(range(1, mag_r.ndim))
        num = jnp.sqrt(jnp.sum((mag_r - mag_f) ** 2, axis=axes))
        den = jnp.sqrt(jnp.sum(mag_r ** 2, axis=axes))
        sc_total += jnp.mean(num / jnp.maximum(den, 1e-6))
        mag_total += jnp.mean(jnp.abs(jnp.log(mag_f) - jnp.log(mag_r)))
    n = float(len(_RESOLUTIONS))
    return sc_total / n, mag_total / n


class VocoderEvaluator:
    def __init__(self, model=None):
        self.model = model

    def __call__(self, inputs: dict, outputs) -> dict:
        sc, mag = multires_stft_distance(outputs.audio_fake, inputs["audio"])
        return {
            "metrics/spectral_convergence": sc,
            "metrics/log_stft_l1": mag,
        }

    def on_eval_epoch_end(self, inputs: dict, outputs) -> dict:
        idx = 0
        f = self.model.features_config if self.model is not None else None
        if f is None:
            return {}
        real = np.asarray(inputs["audio"][idx])[None]
        fake = np.asarray(outputs.audio_fake[idx])[None]
        mel_r = np.asarray(log_mel_matmul(
            jnp.asarray(real), f.sample_rate, f.n_fft, f.hop_length,
            f.win_length, f.n_mels, f.f_min, f.f_max))[0].T
        mel_f = np.asarray(log_mel_matmul(
            jnp.asarray(fake), f.sample_rate, f.n_fft, f.hop_length,
            f.win_length, f.n_mels, f.f_min, f.f_max))[0].T
        return {
            "images/eval/vocoder_mel": plot_spectrogram(
                {"real": mel_r, "generated": mel_f}),
        }
