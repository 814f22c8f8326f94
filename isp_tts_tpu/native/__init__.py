"""Native (C++) host runtime components, loaded via ctypes.

The reference's host-side data path rides torch's native DataLoader workers
(`tts/experiments/trainer.py:211-239`); the TPU build's on-device front-end
(`ops/frontend.py`) removed most host work, and this package makes the part
that remains — WAV decode for a whole batch — native and GIL-free
(`src/wavio.cc`: RIFF parser + mono-f32 conversion + std::thread pool).

Build model: compiled on demand with ``g++ -O3 -shared -fPIC`` into
``_build/wavio-<source-hash>.so`` next to this file (hash keys the cache, so
editing the .cc rebuilds automatically). Everything degrades gracefully: if
the toolchain, build, or load fails, :func:`lib` returns ``None`` and the
pure-Python readers in ``data/audio.py`` take over. Set
``ISP_TTS_TPU_NATIVE=0`` to force the Python path.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "src" / "wavio.cc"
_BUILD_DIR = Path(__file__).parent / "_build"
_ABI_VERSION = 1

_lib_cache: object = False  # False = not attempted; None = unavailable

_ERRORS = {
    -1: "file missing or unreadable",
    -2: "not a RIFF/WAVE file or missing fmt/data chunk",
    -3: "unsupported codec (PCM 8/16/24/32 and float32 only)",
    -4: "out of memory",
}


def _compile() -> Path | None:
    """Compile wavio.cc into a content-addressed .so; reuse if present."""
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src + str(_ABI_VERSION).encode()).hexdigest()[:16]
    so_path = _BUILD_DIR / f"wavio-{tag}.so"
    if so_path.exists():
        return so_path
    _BUILD_DIR.mkdir(exist_ok=True)
    # build into a temp name then rename: atomic under concurrent importers
    # (two processes racing produce the same bytes; rename wins idempotently)
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_BUILD_DIR)
    os.close(fd)
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           str(_SRC), "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)
        return so_path
    except (OSError, subprocess.SubprocessError) as e:
        detail = getattr(e, "stderr", b"") or b""
        logger.warning("native wavio build failed (%s) %s — using the "
                       "Python WAV reader", e, detail.decode(errors="replace")[:500])
        Path(tmp).unlink(missing_ok=True)
        return None


def lib():
    """The loaded ctypes library, or None if native IO is unavailable."""
    global _lib_cache
    if _lib_cache is not False:
        return _lib_cache
    _lib_cache = None
    if os.environ.get("ISP_TTS_TPU_NATIVE", "1") == "0":
        return None
    so_path = _compile()
    if so_path is None:
        return None
    try:
        cdll = ctypes.CDLL(str(so_path))
    except OSError as e:
        logger.warning("native wavio load failed: %s", e)
        return None
    cdll.wav_decode_mono.restype = ctypes.c_int64
    cdll.wav_decode_mono.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int32)]
    cdll.wav_free.restype = None
    cdll.wav_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    cdll.wav_decode_batch.restype = ctypes.c_int32
    cdll.wav_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32)]
    cdll.wavio_abi_version.restype = ctypes.c_int32
    cdll.wavio_abi_version.argtypes = []
    if cdll.wavio_abi_version() != _ABI_VERSION:
        logger.warning("native wavio ABI mismatch — using the Python reader")
        return None
    _lib_cache = cdll
    return cdll


def available() -> bool:
    return lib() is not None


def _take(cdll, ptr, n: int) -> np.ndarray:
    """Copy a malloc'd float buffer into numpy and free the C side."""
    if n == 0:
        cdll.wav_free(ptr)
        return np.zeros(0, dtype=np.float32)
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    cdll.wav_free(ptr)
    return arr


def decode_wav_mono(path) -> tuple[np.ndarray, int] | None:
    """Decode one WAV to (mono float32 in [-1, 1], rate).

    Returns None when the native library is unavailable; raises on decode
    errors (same failure surface as the Python reader).
    """
    cdll = lib()
    if cdll is None:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    rate = ctypes.c_int32(0)
    n = cdll.wav_decode_mono(str(path).encode(), ctypes.byref(out),
                             ctypes.byref(rate))
    if n < 0:
        raise ValueError(f"{path}: {_ERRORS.get(n, f'decode error {n}')}")
    return _take(cdll, out, int(n)), int(rate.value)


def decode_wav_batch(paths, n_threads: int = 0) -> list[tuple[np.ndarray, int]] | None:
    """Decode many WAVs on a C++ thread pool (0 threads = hardware count).

    Returns None when native IO is unavailable. Raises ValueError naming
    every failed file if any decode fails (successes are freed first, so
    nothing leaks).
    """
    cdll = lib()
    if cdll is None:
        return None
    n = len(paths)
    if n == 0:
        return []
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    outs = (ctypes.POINTER(ctypes.c_float) * n)()
    lens = (ctypes.c_int64 * n)()
    rates = (ctypes.c_int32 * n)()
    errs = (ctypes.c_int32 * n)()
    failures = cdll.wav_decode_batch(c_paths, n, int(n_threads), outs, lens,
                                     rates, errs)
    results: list[tuple[np.ndarray, int]] = []
    bad: list[str] = []
    for i in range(n):
        if errs[i] != 0:
            bad.append(f"{paths[i]}: {_ERRORS.get(errs[i], errs[i])}")
        else:
            results.append((_take(cdll, outs[i], int(lens[i])),
                            int(rates[i])))
    if failures:
        raise ValueError("native WAV batch decode failed — " + "; ".join(bad))
    return results
