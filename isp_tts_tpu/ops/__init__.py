from .audio import (
    hann_window,
    frame_signal,
    stft_magnitude,
    mel_filterbank,
    dynamic_range_compression,
    log_mel_spectrogram,
    frame_energy,
    num_frames,
)
from .pitch import yin_pitch
from .mas import monotonic_alignment_search, mas_numpy
from .frontend import FrontendConfig, FrontendFeatures, extract_features, bucket_audio

__all__ = [
    "hann_window",
    "frame_signal",
    "stft_magnitude",
    "mel_filterbank",
    "dynamic_range_compression",
    "log_mel_spectrogram",
    "frame_energy",
    "num_frames",
    "yin_pitch",
    "monotonic_alignment_search",
    "mas_numpy",
    "FrontendConfig",
    "FrontendFeatures",
    "extract_features",
    "bucket_audio",
]
