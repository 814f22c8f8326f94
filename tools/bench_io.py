"""Micro-benchmark: native C++ batch WAV decode vs the pure-Python reader.

Generates a synthetic shard of PCM16 WAVs (LJSpeech-like durations at
22.05 kHz), then times (a) the stdlib per-file reader, (b) the native
single-file decoder, (c) the native thread-pool batch decoder — i.e. the
exact call the batched dataset front-end makes per training batch.

Usage: python tools/bench_io.py [--files 64] [--seconds 6.5] [--iters 5]
"""

import argparse
import os
import statistics
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=6.5)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from isp_tts_tpu import native
    from isp_tts_tpu.data.audio import read_wav, write_wav

    assert native.available(), "native library failed to build"

    rng = np.random.default_rng(0)
    tmp = Path(tempfile.mkdtemp(prefix="wavbench"))
    paths = []
    for i in range(args.files):
        n = int(22050 * args.seconds * (0.7 + 0.6 * rng.random()))
        x = (rng.standard_normal(n) * 0.2).astype(np.float32)
        p = tmp / f"{i:04d}.wav"
        write_wav(p, x[None], 22050)
        paths.append(p)
    total_mb = sum(p.stat().st_size for p in paths) / 1e6

    def timeit(fn):
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts), statistics.median(ts)

    py_min, py_med = timeit(
        lambda: [read_wav(p)[0].mean(axis=0) for p in paths])
    nat1_min, nat1_med = timeit(
        lambda: [native.decode_wav_mono(p) for p in paths])
    natb_min, natb_med = timeit(lambda: native.decode_wav_batch(paths))

    print(f"shard: {args.files} files, {total_mb:.1f} MB PCM16 @22.05kHz")
    print(f"python per-file reader : {py_med*1e3:8.1f} ms  "
          f"({total_mb/py_min:6.0f} MB/s)")
    print(f"native per-file decode : {nat1_med*1e3:8.1f} ms  "
          f"({total_mb/nat1_min:6.0f} MB/s)  {py_med/nat1_med:4.1f}x")
    print(f"native batch (threads) : {natb_med*1e3:8.1f} ms  "
          f"({total_mb/natb_min:6.0f} MB/s)  {py_med/natb_med:4.1f}x")


if __name__ == "__main__":
    main()
