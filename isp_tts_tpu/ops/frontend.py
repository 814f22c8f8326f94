"""Batched on-device audio front-end: raw audio -> (mel, pitch, energy).

The reference extracts features per-utterance on the host inside DataLoader
workers (`tts/data/dataset.py:132-172`). Here the whole padded batch is one
jittable function — run it on-TPU to overlap preprocessing with training, or
under `jax.default_device(cpu)` for host-side loading. Shapes are static
(audio padded to a bucket length); validity is carried as frame counts.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .audio import frame_energy, mel_filterbank, stft_magnitude
from .pitch import yin_pitch


class FrontendFeatures(NamedTuple):
    mel: jnp.ndarray  # (B, frames, n_mels) log-mel, channel-last
    pitch: jnp.ndarray  # (B, frames) standardized F0
    energy: jnp.ndarray  # (B, frames) log1p L2
    mel_lens: jnp.ndarray  # (B,) valid frame counts


@dataclass(frozen=True)
class FrontendConfig:
    sample_rate: int = 22050
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mels: int = 80
    f_min: float = 0.0
    f_max: float | None = 8000.0
    pitch_f_max: float = 800.0
    pitch_threshold: float = 0.15


@functools.partial(jax.jit, static_argnames=("config",))
def extract_features(audio: jnp.ndarray, audio_lens: jnp.ndarray,
                     config: FrontendConfig = FrontendConfig(),
                     pitch_mean: float | jnp.ndarray = 0.0,
                     pitch_std: float | jnp.ndarray = 1.0) -> FrontendFeatures:
    """One fused pipeline over a padded batch.

    Args:
      audio: (B, n_samples) float32, zero-padded to a bucket length.
      audio_lens: (B,) valid sample counts.
      pitch_mean/std: dataset statistics for standardization.

    Returns:
      FrontendFeatures with masked (zeroed) padding frames.
    """
    c = config
    B, n_samples = audio.shape

    spec = stft_magnitude(audio, c.n_fft, c.hop_length, c.win_length)  # (B,F,T)
    fb = jnp.asarray(mel_filterbank(c.sample_rate, c.n_fft, c.n_mels,
                                    c.f_min, c.f_max))
    mel = jnp.einsum("mf,bft->btm", fb, spec)
    mel = jnp.log(jnp.clip(mel, 1e-5, None))

    energy = frame_energy(spec)  # (B, T)

    # YIN with the frame-count-matching f_min convention (providers.py:299)
    yin_fmin = 2 * int(c.sample_rate / c.win_length)
    pad = (c.win_length - c.hop_length) // 2
    padded = jnp.pad(audio, ((0, 0), (pad, pad)))
    pitch = yin_pitch(padded, c.sample_rate, yin_fmin, c.pitch_f_max,
                      c.hop_length, c.pitch_threshold)
    n_frames_mel = mel.shape[1]
    if pitch.shape[1] < n_frames_mel:
        # zero-pad the missing final YIN frame(s): the YIN frame (2*tau_max)
        # outruns win_length, so the last mel frame can lack a pitch estimate
        # and reads as unvoiced (0 Hz -> -mean/std after standardization).
        # REFERENCE PARITY, kept deliberately: the torch dataset pads the
        # same way (reference tts/data/dataset.py:152, F.pad with zeros), as
        # does our per-sample path (data/dataset.py), and the frontend is
        # tested == providers.
        pitch = jnp.pad(pitch, ((0, 0), (0, n_frames_mel - pitch.shape[1])))
    pitch = (pitch[:, :n_frames_mel] - pitch_mean) / pitch_std

    pad_total = 2 * ((c.n_fft - c.hop_length) // 2)
    mel_lens = ((audio_lens + pad_total - c.n_fft) // c.hop_length + 1).astype(jnp.int32)
    mel_lens = jnp.clip(mel_lens, 0, n_frames_mel)

    frame_ids = jnp.arange(n_frames_mel)
    mask = frame_ids[None, :] < mel_lens[:, None]
    return FrontendFeatures(
        mel=mel * mask[..., None],
        pitch=pitch * mask,
        energy=energy * mask,
        mel_lens=mel_lens,
    )


def bucket_audio(batch_audio: list, multiple: int = 16384):
    """Host helper: pad a list of 1-D arrays to a shared bucket length."""
    import numpy as np

    lens = np.asarray([len(a) for a in batch_audio], np.int32)
    bucket = -(-int(lens.max()) // multiple) * multiple
    out = np.zeros((len(batch_audio), bucket), np.float32)
    for i, a in enumerate(batch_audio):
        out[i, : len(a)] = a
    return out, lens
