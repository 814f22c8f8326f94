#!/usr/bin/env python
"""Measure AOT-artifact cold-start time (VERDICT r3 #6: the round-3
artifact paid ~354 s of XLA compile on EVERY fresh-process load).

Builds a full-size serving artifact (23M acoustic model + trained vocoder
when the committed checkpoint exists) with --precompile, then measures, in
FRESH subprocesses (in-process caches can't help):

  1. embedded-executable load  — first load on a matching host
  2. StableHLO load, cold cache — the old behavior (populates the cache)
  3. StableHLO load, warm cache — every later fresh-process load

Usage: python tools/bench_artifact_cold.py [--out /tmp/artifact_cold]
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
import tempfile
import time
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

LOAD_SNIPPET = """
import sys, time, numpy as np
sys.path.insert(0, {repo!r})
t0 = time.perf_counter()
from isp_tts_tpu.export import ExportedSynthesizer
ex = ExportedSynthesizer({path!r})
t_load = time.perf_counter() - t0
t1 = time.perf_counter()
out = ex("printing, in the only sense with which we are at present "
         "concerned, differs from most other arts.")[0]
t_first = time.perf_counter() - t1
t2 = time.perf_counter()
out = ex("a second call measures the warm path.")[0]
t_warm = time.perf_counter() - t2
print("RESULT", t_load, t_first, t_warm, ex._loaded is not None)
"""


def run_load(path: Path, cache_dir: Path, label: str) -> dict:
    import os

    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    # redirect the persistent compile cache so 'cold' is really cold
    env["ISP_TTS_TPU_XLA_CACHE"] = str(cache_dir)
    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, "-c", LOAD_SNIPPET.format(repo=str(REPO),
                                                   path=str(path))],
        capture_output=True, text=True, env=env, timeout=3600)
    wall = time.perf_counter() - t0
    line = next((ln for ln in out.stdout.splitlines()
                 if ln.startswith("RESULT")), None)
    if line is None:
        print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"{label}: no RESULT line")
    _, t_load, t_first, t_warm, used_exec = line.split()
    r = {"label": label, "proc_wall_s": round(wall, 1),
         "load_s": round(float(t_load), 1),
         "first_call_s": round(float(t_first), 1),
         "warm_call_ms": round(float(t_warm) * 1000, 1),
         "embedded_exec": used_exec == "True"}
    print(json.dumps(r))
    return r


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--text-bucket", type=int, default=128)
    p.add_argument("--frame-budget", type=int, default=1024)
    args = p.parse_args()

    workdir = Path(args.out) if args.out else Path(tempfile.mkdtemp(
        prefix="artifact_cold_"))
    workdir.mkdir(parents=True, exist_ok=True)
    artifact = workdir / "serving.pre.zip"
    plain = workdir / "serving.plain.zip"

    sys.path.insert(0, str(REPO))
    from isp_tts_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import bench as bench_mod  # the full-size core model builder

    from isp_tts_tpu.data.text.table import CodingTable
    from isp_tts_tpu.export import export_serving
    from isp_tts_tpu.serving import Synthesizer, SynthesizerConfig

    model = bench_mod.build_model()
    synth = Synthesizer(model, SynthesizerConfig(
        steps=4, text_buckets=(args.text_bucket,),
        frame_budgets=(args.frame_budget,)))
    synth.text_provider.coding_table = CodingTable.from_charset(
        ["<pad>", "</s>", "#punct", "#en"])
    voc = REPO / "docs/assets/vocoder_r3/vocoder_synth_r3.f16.ckpt"
    if voc.exists():
        try:
            from isp_tts_tpu.models import VocoderModel

            synth.attach_vocoder(VocoderModel.from_pretrained(voc))
        except Exception as e:  # noqa: BLE001
            print(f"vocoder not attached: {e}", file=sys.stderr)

    t0 = time.perf_counter()
    meta = export_serving(synth, artifact, text_bucket=args.text_bucket,
                          frame_budget=args.frame_budget, batch=1,
                          precompile=True)
    print(f"export+precompile: {time.perf_counter() - t0:.1f} s, "
          f"{artifact.stat().st_size/1e6:.1f} MB, "
          f"precompiled={meta.get('precompiled')}", file=sys.stderr)

    # strip the executable for the StableHLO-only measurements
    with zipfile.ZipFile(artifact) as src, \
            zipfile.ZipFile(plain, "w") as dst:
        for name in src.namelist():
            if name != "exec.xla":
                dst.writestr(name, src.read(name))

    cold_cache = workdir / "cache_cold"
    shutil.rmtree(cold_cache, ignore_errors=True)
    results = [
        run_load(artifact, workdir / "cache_exec", "embedded_exec_first_load"),
        run_load(plain, cold_cache, "stablehlo_cold_cache"),
        run_load(plain, cold_cache, "stablehlo_warm_cache"),
    ]
    (workdir / "results.json").write_text(json.dumps(results, indent=1))
    print(f"results -> {workdir}/results.json", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
