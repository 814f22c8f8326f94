"""Acoustic dataset: meta + providers -> per-utterance features.

Capability parity with reference `tts/data/dataset.py:59-221`: provider
composition, meta load + text/audio length filters, stats from
dict/json/path, per-sample text/mel/pitch/energy/speaker extraction, and
``compute_stats`` (IQR outlier removal + running scaler -> stats.json).

Dataset layout (reference training.ipynb): a root dir with ``wavs/`` and a
``|``-separated meta file (audio_path|text[|speaker]).
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from . import providers as dp
from .metadata import TTSMeta
from .stats import DatasetStats, FeatureStats, RunningScaler, remove_outliers

logger = logging.getLogger("isp_tts_tpu")


@dataclass
class AcousticSample:
    filename: str
    text: str
    text_vector: np.ndarray
    text_vector_len: int
    mel: np.ndarray  # (frames, n_mels) channel-last
    mel_len: int
    pitch: np.ndarray | None = None
    energy: np.ndarray | None = None
    speaker: int | None = None


@dataclass
class AcousticDatasetConfig:
    root: str = None  # type: ignore
    meta_name: str = "meta.csv"
    meta_column_names: tuple = ("audio_path", "text")
    text: dict = None  # type: ignore
    audio: dict = None  # type: ignore
    spec: dict = None  # type: ignore
    mel_scale: dict = None  # type: ignore
    pitch: dict | None = None
    energy: dict | None = None
    speaker: str | dict | None = None
    text_length_limits: tuple | None = None
    audio_length_limits: tuple | None = None
    pitch_from_disk: bool = False
    stats: dict | str | None = None
    cache_features: bool = True


class AcousticDataset:
    Config = AcousticDatasetConfig

    def __init__(self, config: AcousticDatasetConfig):
        cfg = config
        self.config = cfg
        if cfg.root is None:
            raise ValueError("dataset root is required")
        self.data_root = cfg.root

        meta = TTSMeta.load(os.path.join(cfg.root, cfg.meta_name),
                            tuple(cfg.meta_column_names))
        if cfg.text_length_limits is not None:
            meta = meta.filter_length(*list(cfg.text_length_limits))
        if cfg.audio_length_limits is not None:
            meta = meta.filter_audio_length(cfg.root, *list(cfg.audio_length_limits))
        self.meta = meta

        from ..config.registry import build_config

        self.text_provider = dp.TextProvider(build_config(dp.TextProviderConfig, cfg.text or {}))
        self.audio_provider = dp.AudioProvider(build_config(dp.AudioProviderConfig, cfg.audio or {}))
        self.spec_provider = dp.SpectrogramProvider(
            build_config(dp.SpectrogramProviderConfig, cfg.spec or {}))
        self.mel_scale_provider = dp.MelScaleProvider(
            build_config(dp.MelScaleProviderConfig, cfg.mel_scale or {}))
        self.pitch_provider = (
            dp.PitchProvider(build_config(dp.PitchProviderConfig, cfg.pitch))
            if cfg.pitch is not None else None
        )
        self.energy_provider = dp.EnergyProvider() if cfg.energy is not None else None
        self.pitch_from_disk = cfg.pitch_from_disk

        speaker = cfg.speaker
        if isinstance(speaker, str):
            with open(speaker, encoding="utf-8") as f:
                speaker = json.load(f)
        self.speaker_map = dict(speaker) if speaker is not None else None

        stats = cfg.stats
        if stats is None:
            self.stats = DatasetStats()
        elif isinstance(stats, DatasetStats):
            self.stats = stats
        elif isinstance(stats, dict):
            self.stats = DatasetStats.from_dict(stats)
        else:
            self.stats = DatasetStats.load(stats)

        self._cache: dict[int, AcousticSample] | None = {} if cfg.cache_features else None

    def __len__(self) -> int:
        return len(self.meta)

    def __getitem__(self, idx: int) -> AcousticSample:
        if self._cache is not None and idx in self._cache:
            cached = self._cache[idx]
            # re-run only the (random) text pipeline on cache hits so phoneme
            # masking stays stochastic while audio features are reused
            text_data = self.text_provider(cached.text)
            return AcousticSample(**{**cached.__dict__,
                                     "text_vector": text_data.vector,
                                     "text_vector_len": text_data.vector_len})

        record = self.meta[idx]
        text_data = self.text_provider(record.text)
        audio = self.audio_provider(Path(self.data_root, record.audio_path))
        spec = self.spec_provider(audio)
        mel = self.mel_scale_provider(spec).T  # channel-last (frames, n_mels)
        mel_len = mel.shape[0]

        pitch = None
        if self.pitch_provider is not None:
            source = (Path(self.data_root, record.pitch)
                      if self.pitch_from_disk else audio)
            pitch = self.pitch_provider(source, self.stats.pitch.mean, self.stats.pitch.std)
            pitch = np.pad(pitch, (0, max(mel_len - len(pitch), 0)))[:mel_len]

        energy = None
        if self.energy_provider is not None:
            energy = self.energy_provider(spec)[:mel_len]

        speaker = None
        if self.speaker_map is not None:
            speaker = int(self.speaker_map[record.speaker])

        sample = AcousticSample(
            filename=record.audio_path,
            text=record.text,
            text_vector=text_data.vector,
            text_vector_len=text_data.vector_len,
            mel=mel.astype(np.float32),
            mel_len=mel_len,
            pitch=pitch.astype(np.float32) if pitch is not None else None,
            energy=energy.astype(np.float32) if energy is not None else None,
            speaker=speaker,
        )
        if self._cache is not None:
            self._cache[idx] = sample
        return sample

    def compute_stats(self, save_stats: bool = True,
                      save_path: str | None = None) -> DatasetStats:
        """Pitch/energy statistics with IQR outlier removal; unnormalized
        pitch is used (stats are computed before standardization)."""
        prev_stats = self.stats
        self.stats = DatasetStats()  # identity normalization during the scan

        p_scaler, e_scaler = RunningScaler(), RunningScaler()
        p_min = e_min = np.finfo(np.float64).max
        p_max = e_max = np.finfo(np.float64).min
        for i in range(len(self)):
            sample = self[i] if self._cache is None else self._uncached(i)
            if sample.pitch is not None:
                pitch = remove_outliers(sample.pitch)
                pitch = pitch[pitch > 0.0]
                if len(pitch):
                    p_scaler.update(pitch.reshape(-1, 1))
                    p_min, p_max = min(p_min, pitch.min()), max(p_max, pitch.max())
            if sample.energy is not None:
                energy = remove_outliers(sample.energy)
                if len(energy):
                    e_scaler.update(energy.reshape(-1, 1))
                    e_min, e_max = min(e_min, energy.min()), max(e_max, energy.max())

        self.stats = DatasetStats(
            pitch=FeatureStats(min=float(p_min), max=float(p_max),
                               mean=float(p_scaler.mean[0]) if p_scaler.mean is not None else 0.0,
                               std=float(p_scaler.std[0]) if p_scaler.std is not None else 1.0),
            energy=FeatureStats(min=float(e_min), max=float(e_max),
                                mean=float(e_scaler.mean[0]) if e_scaler.mean is not None else 0.0,
                                std=float(e_scaler.std[0]) if e_scaler.std is not None else 1.0),
        )
        del prev_stats
        if self._cache is not None:
            self._cache.clear()  # cached samples used identity pitch norm
        if save_stats:
            path = save_path or os.path.join(self.data_root, "stats.json")
            self.stats.save(path)
            logger.info("saved dataset stats to %s", path)
        return self.stats

    def _uncached(self, idx: int) -> AcousticSample:
        cache, self._cache = self._cache, None
        try:
            return self[idx]
        finally:
            self._cache = cache
