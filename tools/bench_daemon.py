"""End-to-end serving-daemon benchmark over real HTTP on the TPU.

Measures what a deployment actually sees — HTTP parse + batcher coalescing
+ device call + wav encode — unlike bench.py's device-level lanes:

- warm single-request latency (sequential POSTs, p50/p95),
- sustained throughput under concurrent load (requests/s, coalescing
  stats, aggregate seconds-of-audio per wall second).

Usage:
    python tools/bench_daemon.py \
        --checkpoint docs/assets/train_r3/checkpoint_synth_r3.f16.ckpt \
        --vocoder docs/assets/vocoder_r3/vocoder_synth_r3.f16.ckpt
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
import time
import urllib.request
import wave
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def post(port: int, payload: dict, timeout: float = 600.0):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/synthesize",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.read()


def wav_seconds(body: bytes) -> float:
    with wave.open(io.BytesIO(body)) as w:
        return w.getnframes() / w.getframerate()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--vocoder", default=None)
    ap.add_argument("--latency-requests", type=int, default=30)
    ap.add_argument("--load-requests", type=int, default=128)
    ap.add_argument("--concurrency", type=int, default=16)
    ap.add_argument("--window-ms", type=float, default=10.0)
    ap.add_argument("--speaker", type=int, default=1)
    ap.add_argument("--text", default="pame tizo kuve lasi.")
    args = ap.parse_args()

    from isp_tts_tpu.serving import Synthesizer
    from isp_tts_tpu.serving_server import ServerConfig, TTSServer
    from isp_tts_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    synth = Synthesizer.from_pretrained(args.checkpoint,
                                        vocoder_path=args.vocoder)
    server = TTSServer(synth, port=0, config=ServerConfig(
        max_batch=32, max_wait_ms=args.window_ms))
    port = server.start()
    base = {"text": args.text, "format": "wav"}
    if args.speaker is not None:
        base["speaker"] = args.speaker

    t0 = time.perf_counter()
    body = post(port, base)
    print(f"cold first request: {time.perf_counter() - t0:.1f}s "
          f"({wav_seconds(body):.2f}s of audio)", flush=True)

    # -- warm latency lane ----------------------------------------------------
    lat = []
    for _ in range(args.latency_requests):
        t0 = time.perf_counter()
        body = post(port, base)
        lat.append((time.perf_counter() - t0) * 1e3)
    lat.sort()
    p50 = lat[len(lat) // 2]
    p95 = lat[int(len(lat) * 0.95)]
    audio_s = wav_seconds(body)
    print(f"warm latency over {len(lat)} sequential wav requests: "
          f"p50 {p50:.1f} ms, p95 {p95:.1f} ms "
          f"({audio_s:.2f}s audio -> {audio_s * 1e3 / p50:.0f}x realtime "
          "single-stream end-to-end)", flush=True)

    # -- sustained load lane ---------------------------------------------------
    # warm EVERY batch bucket the coalescer can hit: under load the window
    # closes with 2..max_batch requests, and each distinct batch bucket is
    # its own compiled executable — an unwarmed one stalls the whole lane
    # on a cold XLA compile and poisons the measurement
    for c in (2, 4, 8, 16, args.concurrency):
        if c > args.concurrency:
            break
        t0 = time.perf_counter()
        threads = [threading.Thread(target=post, args=(port, base))
                   for _ in range(c)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        print(f"  bucket warm c={c}: {time.perf_counter() - t0:.1f}s",
              flush=True)

    with server._stats_lock:
        before = dict(server.stats)
    done = []
    lock = threading.Lock()
    secs = []

    def worker(n: int) -> None:
        for _ in range(n):
            body = post(port, base)
            with lock:
                done.append(1)
                secs.append(wav_seconds(body))

    per = args.load_requests // args.concurrency
    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker, args=(per,))
               for _ in range(args.concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    with server._stats_lock:
        after = dict(server.stats)
    n = len(done)
    batches = after["batches"] - before["batches"]
    total_audio = sum(secs)
    print(f"sustained load: {n} wav requests via {args.concurrency} "
          f"clients in {wall:.2f}s = {n / wall:.1f} req/s, "
          f"{batches} device calls (avg coalesce {n / max(batches, 1):.1f}, "
          f"max {after['max_coalesced']}), "
          f"{total_audio:.1f}s audio -> {total_audio / wall:.0f}x realtime "
          "aggregate end-to-end", flush=True)

    print(json.dumps({
        "metric": "daemon_rps",
        "value": round(n / wall, 1),
        "unit": "wav_requests_per_s",
        "warm_p50_ms": round(p50, 1),
        "warm_p95_ms": round(p95, 1),
        "aggregate_xrt": round(total_audio / wall, 1),
        "avg_coalesce": round(n / max(batches, 1), 1),
    }))
    server.stop()


if __name__ == "__main__":
    main()
