"""Data layer registries (parity: reference `tts/data/__init__.py:4-5`)."""

from ..config.registry import Registry

DATASETS = Registry("datasets")
COLLATORS = Registry("collators")

from .dataset import AcousticDataset, AcousticSample  # noqa: E402
from .collator import AcousticCollator  # noqa: E402
from .vocoder import (VocoderDataset, VocoderSample,  # noqa: E402
                      VocoderCollator)
from .loader import DataLoader  # noqa: E402
from .metadata import TTSMeta, MetaRecord  # noqa: E402
from .stats import DatasetStats, FeatureStats  # noqa: E402

DATASETS.add("AcousticDataset", AcousticDataset)
COLLATORS.add("AcousticCollator", AcousticCollator)
DATASETS.add("VocoderDataset", VocoderDataset)
COLLATORS.add("VocoderCollator", VocoderCollator)

__all__ = [
    "DATASETS",
    "COLLATORS",
    "AcousticDataset",
    "AcousticSample",
    "AcousticCollator",
    "VocoderDataset",
    "VocoderSample",
    "VocoderCollator",
    "DataLoader",
    "TTSMeta",
    "MetaRecord",
    "DatasetStats",
    "FeatureStats",
]
