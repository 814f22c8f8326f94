"""Feature providers: host-side wrappers over the jittable audio/pitch ops.

Capability parity with reference `tts/data/providers.py`: Audio, Spectrogram
(magnitude, center=False), MelScale (slaney+slaney, log-compressed), Energy
(log1p L2), Pitch (YIN with the mel-frame-matching f_min convention,
standardized), and Text (charset table + processor + phoneme masking + EOS).

Each provider also exposes the parameters needed by the on-device batched
pipeline; precomputed `.npy` features are accepted everywhere the reference
accepts them.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from pathlib import Path
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops.audio import (
    frame_energy,
    log_mel_spectrogram,
    mel_filterbank,
    num_frames,
    stft_magnitude,
)
from ..ops.pitch import yin_pitch
from .audio import load_audio
from .text.processor import TextProcessor
from .text.table import CodingTable


def _maybe_load(source):
    """Precomputed-feature loading (.npy, or torch .tensor when torch is
    available) — parity: reference `tts/data/functions.py:8-16`."""
    if isinstance(source, (str, Path)):
        if str(source).endswith(".npy"):
            return np.load(str(source))
        if str(source).endswith(".tensor"):
            import torch

            return torch.load(str(source), map_location="cpu",
                              weights_only=True).numpy()
    return None


def _cpu():
    """Host-side providers compute on the CPU backend: per-utterance feature
    extraction must not round-trip the accelerator (the batched on-device
    path is the jittable ops themselves)."""
    import jax

    return jax.default_device(jax.local_devices(backend="cpu")[0])


@dataclass
class AudioProviderConfig:
    sample_rate: int = 22050


class AudioProvider:
    Config = AudioProviderConfig

    def __init__(self, config: AudioProviderConfig | None = None, **kw):
        self.config = config or AudioProviderConfig(**kw)

    def __call__(self, path: str | Path) -> np.ndarray:
        return load_audio(path, self.config.sample_rate)

    def load_batch(self, paths) -> list[np.ndarray]:
        """Batch decode on the native C++ thread pool (falls back to the
        per-file Python reader); used by the batched dataset front-end."""
        from .audio import load_audio_batch

        return load_audio_batch(paths, self.config.sample_rate)


@dataclass
class SpectrogramProviderConfig:
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    pad: int | None = None
    power: float = 1.0
    center: bool = False


class SpectrogramProvider:
    Config = SpectrogramProviderConfig

    def __init__(self, config: SpectrogramProviderConfig | None = None, **kw):
        self.config = config or SpectrogramProviderConfig(**kw)

    def num_frames(self, n_samples: int) -> int:
        c = self.config
        return num_frames(n_samples, c.n_fft, c.hop_length, c.pad)

    def __call__(self, source) -> np.ndarray:
        pre = _maybe_load(source)
        if pre is not None:
            return pre
        c = self.config
        with _cpu():
            spec = stft_magnitude(jnp.asarray(source), c.n_fft, c.hop_length,
                                  c.win_length, c.pad)
            return np.asarray(spec)  # (n_freqs, frames)


@dataclass
class MelScaleProviderConfig:
    sample_rate: int = 22050
    n_fft: int = 1024
    n_mels: int = 80
    f_min: float = 0.0
    f_max: float | None = 8000.0
    norm: str | None = "slaney"
    mel_scale: str = "slaney"


class MelScaleProvider:
    Config = MelScaleProviderConfig

    def __init__(self, config: MelScaleProviderConfig | None = None, **kw):
        self.config = config or MelScaleProviderConfig(**kw)

    @property
    def filterbank(self) -> np.ndarray:
        c = self.config
        return mel_filterbank(c.sample_rate, c.n_fft, c.n_mels, c.f_min, c.f_max, c.norm)

    def __call__(self, source) -> np.ndarray:
        pre = _maybe_load(source)
        if pre is not None:
            return pre
        spec = np.asarray(source)  # (n_freqs, frames)
        mel = self.filterbank @ spec
        return np.log(np.clip(mel, 1e-5, None))  # dynamic range compression


@dataclass
class MelSpecProviderConfig(MelScaleProviderConfig):
    hop_length: int = 256
    win_length: int = 1024


class MelSpecProvider:
    """One-shot audio -> log-mel (kept for API parity; providers.py:114-175)."""

    Config = MelSpecProviderConfig

    def __init__(self, config: MelSpecProviderConfig | None = None, **kw):
        self.config = config or MelSpecProviderConfig(**kw)

    def __call__(self, audio) -> np.ndarray:
        c = self.config
        with _cpu():
            mel = log_mel_spectrogram(jnp.asarray(audio), c.sample_rate, c.n_fft,
                                      c.hop_length, c.win_length, c.n_mels,
                                      c.f_min, c.f_max)
            return np.asarray(mel)


class EnergyProvider:
    """Per-frame log1p L2 norm of the linear spectrogram."""

    def __call__(self, source) -> np.ndarray:
        pre = _maybe_load(source)
        if pre is not None:
            return pre
        with _cpu():
            return np.asarray(frame_energy(jnp.asarray(source)))


@dataclass
class PitchProviderConfig:
    sample_rate: int = 22050
    hop_length: int = 256
    win_length: int = 1024
    f_min: int = 40
    f_max: int = 800
    method: str = "yin"
    pad: int | None = None
    threshold: float = 0.15
    norm: str = "standard"
    #: frame alignment for the penn method (reference providers.py:337:
    #: center='zero' when True else 'half-window')
    center: bool = False


class PitchProvider:
    Config = PitchProviderConfig

    def __init__(self, config: PitchProviderConfig | None = None, **kw):
        self.config = c = config or PitchProviderConfig(**kw)
        if c.method in ("yin", "torch-yin"):
            # force f_min so YIN frame count tracks the mel frame count
            # (reference providers.py:299-300)
            self.f_min = 2 * int(c.sample_rate / c.win_length)
        else:
            self.f_min = c.f_min
        self.pad = c.pad if c.pad is not None else (c.win_length - c.hop_length) // 2

    def __call__(self, source, mean: float = 0.0, std: float = 1.0) -> np.ndarray:
        pre = _maybe_load(source)
        c = self.config
        if pre is not None:
            pitch = pre
        elif c.method in ("yin", "torch-yin"):
            audio = np.pad(np.asarray(source), (self.pad, self.pad))
            with _cpu():
                pitch = np.asarray(yin_pitch(
                    jnp.asarray(audio), c.sample_rate, self.f_min, c.f_max,
                    c.hop_length, c.threshold,
                ))
        elif c.method == "penn":
            try:
                import penn  # optional neural pitch estimator
            except ImportError as e:
                raise ImportError(
                    "pitch method 'penn' requires the `penn` package; "
                    "use method 'yin' in minimal environments") from e
            import torch

            p, periodicity = penn.from_audio(
                torch.from_numpy(np.asarray(source))[None], c.sample_rate,
                hopsize=c.hop_length / c.sample_rate,
                fmin=self.f_min, fmax=c.f_max, batch_size=128,
                center="zero" if c.center else "half-window")
            pitch = p[0].float().numpy()
            pitch[periodicity[0].float().numpy() < c.threshold] = 0.0
        else:
            raise ValueError(f"unknown pitch method {c.method!r}")
        if self.config.norm == "log":
            return np.log1p(np.maximum(pitch, 0.0))
        return (pitch - mean) / std


class TextData(NamedTuple):
    string: str
    vector: np.ndarray
    vector_len: int


@dataclass
class TextProviderConfig:
    charset: list = None  # type: ignore
    phonemizer: bool = False
    language: str = "en-us"
    mask_phonemes: float | bool = False
    word_level_prob: bool = True


class TextProvider:
    Config = TextProviderConfig

    def __init__(self, config: TextProviderConfig | None = None, **kw):
        self.config = c = config or TextProviderConfig(**kw)
        if c.charset is None:
            raise ValueError("TextProvider requires a charset")
        self.coding_table = CodingTable.from_charset(c.charset)
        self.text_processor = TextProcessor(language=c.language, phonemizer=c.phonemizer)
        self.mask_phonemes = c.mask_phonemes
        self.word_level_prob = c.word_level_prob

    def __call__(self, text: str, rng: random.Random | None = None) -> TextData:
        mask = self.mask_phonemes
        if mask and not self.word_level_prob:
            # utterance-level sampling instead of per-word probability
            r = rng.random() if rng is not None else random.random()
            mask = r < float(mask)
        processed = self.text_processor(text, mask_phonemes=mask)
        processed = self.coding_table.check_eos(processed)
        vector = np.asarray(self.coding_table.text_to_vector(processed), np.int32)
        return TextData(string=text, vector=vector, vector_len=len(vector))
