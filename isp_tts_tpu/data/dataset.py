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
    # feature-cache bounds (the reference keeps NO cache and re-extracts
    # every epoch; an unbounded cache holds every mel in RAM)
    cache_max_items: int | None = None
    cache_max_bytes: float | None = 2 * 1024 ** 3
    # batched front-end: extract mel/pitch/energy for a whole batch in ONE
    # jitted ops.frontend.extract_features call instead of per-utterance
    # host providers (first-epoch throughput; the hot path on epoch >= 2 is
    # the cache either way). "cpu" runs it on the host backend so the TPU
    # stays on the train step; "default" runs it on the default device.
    batched_frontend: bool = False
    frontend_device: str = "cpu"
    frontend_bucket_multiple: int = 16384


class FeatureCache:
    """Insertion-ordered feature cache with item/byte caps (LRU eviction)."""

    def __init__(self, max_items: int | None = None,
                 max_bytes: float | None = None):
        from collections import OrderedDict

        self.max_items = max_items
        self.max_bytes = max_bytes
        self._data: dict[int, AcousticSample] = OrderedDict()
        self._bytes = 0

    @staticmethod
    def _nbytes(sample: AcousticSample) -> int:
        total = 0
        for arr in (sample.mel, sample.pitch, sample.energy, sample.text_vector):
            if arr is not None and hasattr(arr, "nbytes"):
                total += arr.nbytes
        return total

    def __contains__(self, idx: int) -> bool:
        return idx in self._data

    def __len__(self) -> int:
        return len(self._data)

    @property
    def nbytes(self) -> int:
        return self._bytes

    def get(self, idx: int) -> AcousticSample:
        self._data.move_to_end(idx)
        return self._data[idx]

    def put(self, idx: int, sample: AcousticSample) -> None:
        if idx in self._data:
            self._bytes -= self._nbytes(self._data.pop(idx))
        self._data[idx] = sample
        self._bytes += self._nbytes(sample)
        while self._data and (
                (self.max_items is not None and len(self._data) > self.max_items)
                or (self.max_bytes is not None and self._bytes > self.max_bytes)):
            _, evicted = self._data.popitem(last=False)
            self._bytes -= self._nbytes(evicted)

    def clear(self) -> None:
        self._data.clear()
        self._bytes = 0


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

        self._cache: FeatureCache | None = (
            FeatureCache(cfg.cache_max_items, cfg.cache_max_bytes)
            if cfg.cache_features else None
        )

        self._frontend_cfg = None
        if cfg.batched_frontend:
            self._frontend_cfg = self._make_frontend_config()

    def _make_frontend_config(self):
        """Map provider configs onto ops.frontend.FrontendConfig; falls back
        to the per-utterance path (returns None) for configurations the fused
        pipeline doesn't replicate."""
        from ..ops.frontend import FrontendConfig

        cfg = self.config
        if cfg.pitch_from_disk:
            logger.warning("batched_frontend ignores pitch_from_disk; "
                           "using per-utterance providers")
            return None
        if self.pitch_provider is not None and (
                self.pitch_provider.config.method not in ("yin", "torch-yin")
                or self.pitch_provider.config.norm != "standard"):
            logger.warning("batched_frontend supports yin pitch with standard "
                           "norm only; using per-utterance providers")
            return None
        pitch_cfg = self.pitch_provider.config if self.pitch_provider else None
        return FrontendConfig(
            sample_rate=self.audio_provider.config.sample_rate,
            n_fft=self.spec_provider.config.n_fft,
            hop_length=self.spec_provider.config.hop_length,
            win_length=self.spec_provider.config.win_length,
            n_mels=self.mel_scale_provider.config.n_mels,
            f_min=self.mel_scale_provider.config.f_min,
            f_max=self.mel_scale_provider.config.f_max,
            pitch_f_max=float(pitch_cfg.f_max) if pitch_cfg else 800.0,
            pitch_threshold=pitch_cfg.threshold if pitch_cfg else 0.15,
        )

    def __len__(self) -> int:
        return len(self.meta)

    def _with_fresh_text(self, cached: AcousticSample) -> AcousticSample:
        # re-run only the (random) text pipeline on cache hits so phoneme
        # masking stays stochastic while audio features are reused
        text_data = self.text_provider(cached.text)
        return AcousticSample(**{**cached.__dict__,
                                 "text_vector": text_data.vector,
                                 "text_vector_len": text_data.vector_len})

    def __getitem__(self, idx: int) -> AcousticSample:
        if self._cache is not None and idx in self._cache:
            return self._with_fresh_text(self._cache.get(idx))

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
            self._cache.put(idx, sample)
        return sample

    # -- batched front-end -----------------------------------------------

    def get_batch(self, indices: list[int]) -> list[AcousticSample]:
        """Samples for a batch of indices; with ``batched_frontend`` all
        cache-missing audio is featurized in ONE fused jitted call
        (ops.frontend.extract_features) instead of per-utterance providers
        — the reference runs every stage per utterance in DataLoader
        workers (tts/data/dataset.py:132-172)."""
        if self._frontend_cfg is None:
            return [self[i] for i in indices]
        missing = [i for i in indices
                   if self._cache is None or i not in self._cache]
        fresh = self._extract_batch(missing) if missing else {}
        out = []
        for i in indices:
            if i in fresh:
                out.append(fresh[i])  # text pipeline already ran in-extract
            elif self._cache is not None and i in self._cache:
                out.append(self._with_fresh_text(self._cache.get(i)))
            else:
                out.append(self[i])
        return out

    def _extract_batch(self, indices: list[int]) -> dict[int, AcousticSample]:
        import jax

        from ..ops.frontend import bucket_audio, extract_features

        cfg = self.config
        records = [self.meta[i] for i in indices]
        paths = [Path(self.data_root, r.audio_path) for r in records]
        audios = (self.audio_provider.load_batch(paths)
                  if hasattr(self.audio_provider, "load_batch")
                  else [self.audio_provider(p) for p in paths])
        padded, lens = bucket_audio(audios, cfg.frontend_bucket_multiple)

        devices = (jax.local_devices(backend="cpu")
                   if cfg.frontend_device == "cpu" else jax.local_devices())
        with jax.default_device(devices[0]):
            feats = extract_features(
                padded, lens, self._frontend_cfg,
                pitch_mean=self.stats.pitch.mean, pitch_std=self.stats.pitch.std)
            mel = np.asarray(feats.mel)
            pitch = np.asarray(feats.pitch)
            energy = np.asarray(feats.energy)
            mel_lens = np.asarray(feats.mel_lens)

        out: dict[int, AcousticSample] = {}
        for j, (idx, record) in enumerate(zip(indices, records)):
            n = int(mel_lens[j])
            text_data = self.text_provider(record.text)
            speaker = (int(self.speaker_map[record.speaker])
                       if self.speaker_map is not None else None)
            sample = AcousticSample(
                filename=record.audio_path,
                text=record.text,
                text_vector=text_data.vector,
                text_vector_len=text_data.vector_len,
                mel=mel[j, :n].astype(np.float32),
                mel_len=n,
                pitch=(pitch[j, :n].astype(np.float32)
                       if self.pitch_provider is not None else None),
                energy=(energy[j, :n].astype(np.float32)
                        if self.energy_provider is not None else None),
                speaker=speaker,
            )
            out[idx] = sample
            if self._cache is not None:
                self._cache.put(idx, sample)
        return out

    def compute_stats(self, save_stats: bool = True,
                      save_path: str | None = None,
                      batch_size: int = 64) -> DatasetStats:
        """Pitch/energy statistics with IQR outlier removal; unnormalized
        pitch is used (stats are computed before standardization).

        With ``batched_frontend`` the scan runs through the fused jitted
        front-end in ``batch_size`` chunks — at LJSpeech scale the
        per-utterance provider chain is ~4.5 s/clip of eager host YIN
        (a 10k-clip scan would take half a day); the batched path does the
        same scan in minutes (measured in docs/SCALE_R4.md)."""
        prev_stats = self.stats
        self.stats = DatasetStats()  # identity normalization during the scan
        # bypass the feature cache for the whole scan: identity-normalized
        # samples must not land in it, and at stats time nothing can be
        # reused anyway (eviction churn would just burn memory bandwidth).
        # try/finally: a corrupt clip mid-scan must not leave the dataset
        # cache-less with identity stats.
        cache, self._cache = self._cache, None
        try:
            return self._compute_stats_scan(cache, batch_size, save_stats,
                                            save_path)
        finally:
            self._cache = cache
            del prev_stats

    def _compute_stats_scan(self, cache, batch_size, save_stats, save_path):
        def scan_samples():
            if self._frontend_cfg is not None:
                n = len(self)
                for s0 in range(0, n, batch_size):
                    idxs = list(range(s0, min(s0 + batch_size, n)))
                    batch = self._extract_batch(idxs)
                    yield from (batch[i] for i in idxs)
            else:
                yield from (self[i] for i in range(len(self)))

        p_scaler, e_scaler = RunningScaler(), RunningScaler()
        p_min = e_min = np.finfo(np.float64).max
        p_max = e_max = np.finfo(np.float64).min
        for sample in scan_samples():
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
        if cache is not None:
            # anything cached BEFORE this call holds pitch normalized with
            # the superseded stats — clear so later hits use the new ones
            cache.clear()
        if save_stats:
            path = save_path or os.path.join(self.data_root, "stats.json")
            self.stats.save(path)
            logger.info("saved dataset stats to %s", path)
        return self.stats
