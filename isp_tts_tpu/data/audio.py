"""WAV I/O with the stdlib (no soundfile/torchaudio in the base env).

Covers the reference `AudioProvider` capabilities
(`tts/data/providers.py:191-212`): load, resample to target rate, downmix to
mono. PCM 16/24/32-bit and float32 WAVs supported; other formats raise. If
``soundfile`` is installed it is used for broader codec coverage.
"""

from __future__ import annotations

import logging
import wave
from pathlib import Path

import numpy as np

logger = logging.getLogger("isp_tts_tpu")


def read_wav(path: str | Path) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (float32 samples in [-1, 1] of shape (C, N), rate)."""
    try:
        import soundfile as sf  # optional

        data, sr = sf.read(str(path), dtype="float32", always_2d=True)
        return data.T.astype(np.float32), int(sr)
    except ImportError:
        pass

    with wave.open(str(path), "rb") as w:
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        sr = w.getframerate()
        raw = w.readframes(w.getnframes())

    if sampwidth == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sampwidth == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif sampwidth == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        x = ((b[:, 0].astype(np.int32))
             | (b[:, 1].astype(np.int32) << 8)
             | (b[:, 2].astype(np.int32) << 16))
        x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float32) / float(1 << 23)
    elif sampwidth == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"Unsupported WAV sample width: {sampwidth}")
    return x.reshape(-1, n_channels).T, sr


def write_wav(path: str | Path, audio: np.ndarray, sample_rate: int) -> None:
    """Write mono/stereo float32 [-1, 1] audio as PCM16 WAV."""
    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim == 1:
        audio = audio[None]
    pcm = np.clip(audio.T * 32767.0, -32768, 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(audio.shape[0])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())


def wav_duration(path: str | Path) -> float:
    """Duration in seconds from the WAV header (no sample decode)."""
    with wave.open(str(path), "rb") as w:
        return w.getnframes() / float(w.getframerate())


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling (scipy)."""
    if orig_sr == target_sr:
        return audio
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(orig_sr, target_sr)
    return resample_poly(audio, target_sr // g, orig_sr // g, axis=-1).astype(np.float32)


def load_audio(path: str | Path, sample_rate: int | None = None) -> np.ndarray:
    """Load -> mono float32 (N,), resampled to ``sample_rate`` if given.

    Decode runs in the native C++ library (``isp_tts_tpu.native``) when it
    is available — identical conversion semantics, tested equal — and falls
    back to the stdlib reader otherwise.
    """
    from ..native import decode_wav_mono

    try:
        native = decode_wav_mono(path)
    except ValueError:
        # unsupported container/codec for the native parser — the Python
        # reader may still cover it (soundfile handles flac/ogg/ieee-float)
        native = None
    if native is not None:
        mono, sr = native
    else:
        x, sr = read_wav(path)
        mono = x.mean(axis=0) if x.shape[0] > 1 else x[0]
    if sample_rate is not None and sr != sample_rate:
        mono = resample(mono, sr, sample_rate)
    return np.ascontiguousarray(mono, dtype=np.float32)


def load_audio_batch(paths, sample_rate: int | None = None) -> list[np.ndarray]:
    """Batch variant of :func:`load_audio`: WAV decode for the whole batch
    runs on the native C++ thread pool (GIL-free), resampling (rare — only
    on rate mismatch) stays per-item on scipy. Python-reader fallback keeps
    the result identical when the native library is unavailable."""
    from ..native import decode_wav_batch

    try:
        decoded = decode_wav_batch(paths)
    except ValueError as e:
        # some file the native parser can't handle — surface WHICH before
        # the per-file fallback (whose own error, if any, names only the
        # Python reader's complaint)
        logger.warning("native batch decode failed (%s); retrying per-file", e)
        decoded = None
    if decoded is None:
        return [load_audio(p, sample_rate) for p in paths]
    out = []
    for mono, sr in decoded:
        if sample_rate is not None and sr != sample_rate:
            mono = resample(mono, sr, sample_rate)
        out.append(np.ascontiguousarray(mono, dtype=np.float32))
    return out
