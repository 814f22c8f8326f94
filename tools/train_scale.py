#!/usr/bin/env python
"""LJSpeech-scale data-pipeline proof run (VERDICT r3 #2).

The reference's core recipe assumes ~13k clips / hours of audio
(`/root/reference/recipes/acoustic/core.yaml:33-34`, LJSpeech); round 3's
largest committed run used 300 clips. This tool runs the REAL CLI
(``python -m isp_tts_tpu.train``) over a ~10k-clip formant dataset for
several epochs on the chip and records what the input pipeline actually
sustains:

- stats-pass wall time (``--compute-stats``, the IQR scan over every clip)
- per-epoch wall time + optimizer steps/s + samples/s
- input-pipeline utilization: mean stats/time/data vs stats/time/model
  per logged step (does the 1-core loader keep a ~33 ms/step chip fed?)
- feature-cache ceiling: peak RSS of the training process, sampled from
  the parent, against the 2 GiB cache_max_bytes default
- the eval-loss trajectory

Usage:
  python tools/make_synth_dataset.py --root /tmp/synth_10k --n 10000
  python tools/train_scale.py --root /tmp/synth_10k --epochs 5 \
      --out docs/assets/scale_r4
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.train_synth import SYNTH_COLLATOR, SYNTH_STATS  # noqa: E402


def cli_args(root: Path, run_root: Path, epochs: int, batch: int,
             extra: list[str]) -> list[str]:
    over = {
        "dataset.root": str(root),
        "dataset.meta_column_names": '["audio_path","speaker","text"]',
        "dataset.speaker": '{"spk0": 0, "spk1": 1, "spk2": 2}',
        "dataset._train_.meta_name": "meta_train.csv",
        "dataset._eval_.meta_name": "meta_valid.csv",
        "dataset.stats": json.dumps(SYNTH_STATS),
        **{f"collator.{k}": str(v) for k, v in SYNTH_COLLATOR.items()},
        "model.num_speakers": "3",
        "trainer.output_dir": str(run_root),
        "trainer.experiment_name": "scale_r4",
        "trainer.label": "run",
        "trainer.epochs": str(epochs),
        "trainer.batch_size": str(batch),
        "trainer.eval_batch_size": "32",
        "trainer.eval_strategy": "epoch",
        "trainer.eval_batches": "8",
        "trainer.save_strategy": "epoch",
        "trainer.save_rewrite_checkpoint": "true",
        "trainer.save_optimizer": "false",
        "trainer.logging_steps": "25",
        "trainer.progress": "false",
    }
    args = [sys.executable, "-m", "isp_tts_tpu.train",
            "--config-root", str(REPO / "recipes"),
            "--config-name", "acoustic/core"]
    for k, v in over.items():
        args += ["--set", f"{k}={v}"]
    return args + extra


def run_with_rss(cmd: list[str], log_path: Path) -> dict:
    """Run ``cmd``, streaming output to ``log_path``, sampling the child's
    peak RSS once a second."""
    peak = {"rss_gb": 0.0}
    with open(log_path, "w") as log:
        proc = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                                cwd=str(REPO))

        def sample():
            status = Path(f"/proc/{proc.pid}/status")
            while proc.poll() is None:
                try:
                    for line in status.read_text().splitlines():
                        if line.startswith("VmRSS:"):
                            peak["rss_gb"] = max(
                                peak["rss_gb"],
                                int(line.split()[1]) / 1024 ** 2)
                except OSError:
                    break
                time.sleep(1.0)

        t = threading.Thread(target=sample, daemon=True)
        t.start()
        start = time.perf_counter()
        rc = proc.wait()
        wall = time.perf_counter() - start
        t.join(timeout=5)
    if rc != 0:
        print(log_path.read_text()[-4000:], file=sys.stderr)
        raise RuntimeError(f"{cmd[2]} exited {rc}")
    return {"wall_s": round(wall, 1), "peak_rss_gb": round(peak["rss_gb"], 2)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=Path, required=True)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--out", type=Path, default=Path("/tmp/scale_r4"))
    ap.add_argument("--run-dir", type=Path, default=Path("/tmp/scale_runs"))
    ap.add_argument("--set", dest="extra", action="append", default=[],
                    metavar="KEY=VALUE")
    args = ap.parse_args()
    args.out.mkdir(parents=True, exist_ok=True)

    # --- split ---
    if not (args.root / "meta_train.csv").exists():
        from isp_tts_tpu.data.metadata import TTSMeta

        meta = TTSMeta.load(args.root / "meta.csv",
                            ["audio_path", "speaker", "text"])
        train, valid = meta.split(ratio=0.03, seed=42)
        train.save(args.root / "meta_train.csv")
        valid.save(args.root / "meta_valid.csv")
        print(f"split: {len(train)} train / {len(valid)} valid")

    extra = [a for pair in args.extra for a in ("--set", pair)]

    # --- stats pass (the reference's IQR scan over every clip) ---
    t0 = time.perf_counter()
    stats_res = run_with_rss(
        cli_args(args.root, args.run_dir, args.epochs, args.batch, extra)
        + ["--compute-stats"],
        args.out / "stats_pass.log")
    print(f"stats pass: {stats_res}")

    # --- the training run ---
    train_res = run_with_rss(
        cli_args(args.root, args.run_dir, args.epochs, args.batch, extra),
        args.out / "train.log")
    print(f"train: {train_res}")

    summary = harvest(args.root, args.run_dir, args.epochs, args.batch,
                      stats_res, train_res)
    (args.out / "summary.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary, indent=1))
    return 0


def harvest(root: Path, run_root: Path, epochs: int, batch: int,
            stats_res: dict | None, train_res: dict | None) -> dict:
    """Summarize the run from its own trainer_state.json. Epoch 0 pays the
    one-time featurize-everything cost; the steady-state lines are what the
    pipeline sustains once the feature cache holds the set."""
    run_dir = run_root / "scale_r4" / "run"
    state = json.loads((run_dir / "trainer_state.json").read_text())
    hist = state["log_history"]
    steps = [h for h in hist if "train_step/loss" in h]
    evals = [h for h in hist if "eval/loss" in h]
    steps_per_epoch = max(state["global_step"] // max(epochs, 1), 1)

    per_epoch = {}
    for h in steps:
        ep = (h["step"] - 1) // steps_per_epoch
        per_epoch.setdefault(ep, []).append(
            (h["train_step/stats/time/data"],
             h["train_step/stats/time/model"]))
    epoch_rows = {}
    for ep, rows in sorted(per_epoch.items()):
        d = sum(r[0] for r in rows) / len(rows)
        m = sum(r[1] for r in rows) / len(rows)
        epoch_rows[ep] = {"data_ms": round(d * 1e3, 1),
                          "model_ms": round(m * 1e3, 1),
                          "samples_per_s": round(batch / (d + m), 1)}
    steady = [r for ep, r in epoch_rows.items() if ep > 0]
    steady_sps = (sum(r["samples_per_s"] for r in steady) / len(steady)
                  if steady else None)

    return {
        "n_train_clips": sum(1 for _ in open(root / "meta_train.csv")),
        "epochs": epochs,
        "batch_size": batch,
        "global_steps": state["global_step"],
        "stats_pass": stats_res,
        "train": train_res,
        "per_epoch": epoch_rows,
        "steady_state_samples_per_s": (round(steady_sps, 1)
                                       if steady_sps else None),
        "eval_loss": [round(h["eval/loss"], 3) for h in evals],
        "eval_mcd13": [round(h["eval/metrics/mcd_13"], 2) for h in evals
                       if "eval/metrics/mcd_13" in h],
        "eval_align_strength": [
            round(h["eval/metrics/alignment_strength"], 3) for h in evals
            if "eval/metrics/alignment_strength" in h],
        "train_loss_first_last": [round(steps[0]["train_step/loss"], 3),
                                  round(steps[-1]["train_step/loss"], 3)],
    }


if __name__ == "__main__":
    raise SystemExit(main())
