"""Data layer registries (parity: reference `tts/data/__init__.py:4-5`)."""

from ..config.registry import Registry

DATASETS = Registry("datasets")
COLLATORS = Registry("collators")

from .dataset import AcousticDataset, AcousticSample  # noqa: E402
from .collator import AcousticCollator  # noqa: E402
from .loader import DataLoader  # noqa: E402
from .metadata import TTSMeta, MetaRecord  # noqa: E402
from .stats import DatasetStats, FeatureStats  # noqa: E402

DATASETS.add("AcousticDataset", AcousticDataset)
COLLATORS.add("AcousticCollator", AcousticCollator)

__all__ = [
    "DATASETS",
    "COLLATORS",
    "AcousticDataset",
    "AcousticSample",
    "AcousticCollator",
    "DataLoader",
    "TTSMeta",
    "MetaRecord",
    "DatasetStats",
    "FeatureStats",
]
