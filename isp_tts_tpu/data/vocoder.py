"""Vocoder dataset/collator: fixed-length waveform segments.

GAN vocoder training consumes raw audio crops (mel features are computed
ON-DEVICE inside the jitted step — see models/vocoder/model.py), so the host
data path is minimal: load the wav (cached), cut a segment, stack. Segments
are a fixed ``segment_samples`` long (static XLA shapes; one executable for
the whole run), a multiple of ``hop_length`` so frames align exactly.

Reuses the acoustic data layer's metadata + audio provider
(reference `tts/data/dataset.py:59-221` lineage); crop randomness follows
the trainer's per-epoch reseeding (utils.misc.set_random_seed) for
reproducible epochs.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Sequence

import numpy as np

from . import providers as dp
from .metadata import TTSMeta


@dataclass
class VocoderSample:
    filename: str
    audio: np.ndarray  # (segment_samples,) float32
    n_samples: int  # true (un-padded) sample count within the segment
    #: optional PAIRED mel (segment_samples // hop_length, n_mels) — the
    #: acoustic model's predicted mel for this clip, hop-aligned with the
    #: audio crop (joint fine-tune, tools/joint_finetune.py)
    mel: np.ndarray | None = None


@dataclass
class VocoderDatasetConfig:
    root: str = None  # type: ignore
    meta_name: str = "meta.csv"
    meta_column_names: tuple = ("audio_path", "text")
    audio: dict = None  # type: ignore
    segment_samples: int = 16384
    #: random crop for training; the _eval_ split override sets False for a
    #: deterministic center crop
    random_crop: bool = True
    audio_length_limits: tuple | None = None
    #: raw waveforms are small; cache them decoded
    cache_audio: bool = True
    #: directory of per-clip predicted-mel ``<wav stem>.npy`` files
    #: ((T, n_mels), hop-aligned with the audio); when set, samples carry a
    #: paired ``mel`` crop and the GAN step feeds it to the generator
    mel_dir: str | None = None
    #: samples per mel frame (required with ``mel_dir`` for crop alignment)
    hop_length: int = 256


class VocoderDataset:
    Config = VocoderDatasetConfig

    def __init__(self, config: VocoderDatasetConfig):
        cfg = config
        self.config = cfg
        if cfg.root is None:
            raise ValueError("dataset root is required")
        self.data_root = cfg.root

        meta = TTSMeta.load(str(Path(cfg.root, cfg.meta_name)),
                            tuple(cfg.meta_column_names))
        if cfg.audio_length_limits is not None:
            meta = meta.filter_audio_length(cfg.root, *list(cfg.audio_length_limits))
        self.meta = meta

        from ..config.registry import build_config

        self.audio_provider = dp.AudioProvider(
            build_config(dp.AudioProviderConfig, cfg.audio or {}))
        self._cache: dict[int, np.ndarray] = {} if cfg.cache_audio else None

    def __len__(self) -> int:
        return len(self.meta)

    def _audio(self, idx: int) -> np.ndarray:
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        record = self.meta[idx]
        audio = np.asarray(
            self.audio_provider(Path(self.data_root, record.audio_path)),
            np.float32)
        if self._cache is not None:
            self._cache[idx] = audio
        return audio

    def _mel(self, idx: int) -> np.ndarray:
        stem = Path(self.meta[idx].audio_path).stem
        return np.load(Path(self.config.mel_dir) / f"{stem}.npy")

    def __getitem__(self, idx: int) -> VocoderSample:
        cfg = self.config
        audio = self._audio(idx)
        seg = cfg.segment_samples
        hop = cfg.hop_length
        paired = cfg.mel_dir is not None
        mel = None
        if paired:
            # predicted mels exist for T frames; bound the usable audio to
            # T*hop and snap crop starts to hop so frames align exactly
            full_mel = self._mel(idx)
            audio = audio[: full_mel.shape[0] * hop]
        n = audio.shape[-1]
        if n >= seg:
            if cfg.random_crop:
                start = int(np.random.randint(0, n - seg + 1))
            else:
                start = (n - seg) // 2
            if paired:
                start = (start // hop) * hop
            crop = audio[start:start + seg]
            n_valid = seg
        else:
            start = 0
            crop = np.pad(audio, (0, seg - n))
            n_valid = n
        if paired:
            frames = seg // hop
            mel = full_mel[start // hop: start // hop + frames]
            if mel.shape[0] < frames:
                # short clip: the padded AUDIO is silence, whose log-mel is
                # the compression floor log(1e-5) — zero-padding here would
                # feed the generator full-amplitude frames paired with a
                # silent target (ops/vocoder.log_mel_matmul clamp)
                mel = np.pad(mel, ((0, frames - mel.shape[0]), (0, 0)),
                             constant_values=float(np.log(1e-5)))
            mel = np.ascontiguousarray(mel, np.float32)
        return VocoderSample(
            filename=self.meta[idx].audio_path,
            audio=np.ascontiguousarray(crop, np.float32),
            n_samples=n_valid,
            mel=mel,
        )


@dataclass
class VocoderCollatorConfig:
    pass


class VocoderCollator:
    Config = VocoderCollatorConfig

    def __init__(self, config: VocoderCollatorConfig | None = None, **kw):
        self.config = config or VocoderCollatorConfig(**kw)

    def __call__(self, batch: Sequence[VocoderSample]) -> dict:
        out = {
            "filename": [s.filename for s in batch],
            "audio": np.stack([s.audio for s in batch]),
            "n_samples": np.asarray([s.n_samples for s in batch], np.int32),
        }
        if batch[0].mel is not None:
            out["mel"] = np.stack([s.mel for s in batch])
        return out
