"""Convergence run on the procedural formant dataset (VERDICT r2 item 3).

Trains the CORE recipe from scratch on real hardware over the synthetic
3-speaker formant dataset (`tools/make_synth_dataset.py`), capturing the
evidence the reference ships as an executed notebook log
(`/root/reference/notebooks/training.ipynb` cell 16):

- eval trajectory: loss, MCD-13, alignment length/strength,
- BEFORE/AFTER soft+hard alignment and mel images,
- the final checkpoint + a synthesized waveform from it.

Usage:
  python tools/train_synth.py --root /tmp/synth_ds --steps 2000 \
      --out-assets docs/assets/train_r3 --run-dir /tmp/synth_runs
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


# normalization + bucketing shared with tools/finetune_synth.py — a warm
# start is only valid against the stats the base run trained with
SYNTH_STATS = {"pitch": {"mean": 170.0, "std": 55.0},
               "energy": {"mean": 0.0, "std": 1.0}}
SYNTH_COLLATOR = {"text_pad_multiple": 16, "mel_pad_multiple": 64,
                  "max_text_len": 48, "max_mel_len": 320}


def build_overrides(root: Path, run_root: Path, steps: int):
    return {
        "dataset": {
            "root": str(root),
            "meta_column_names": ["audio_path", "speaker", "text"],
            "speaker": {"spk0": 0, "spk1": 1, "spk2": 2},
            "_train_": {"meta_name": "meta_train.csv"},
            "_eval_": {"meta_name": "meta_valid.csv"},
            # synthetic speakers span ~90-280 Hz by construction
            "stats": dict(SYNTH_STATS),
        },
        "collator": dict(SYNTH_COLLATOR),
        "model": {"num_speakers": 3},
        "trainer": {
            "output_dir": str(run_root),
            "experiment_name": "synth_r3",
            "label": "run",
            "max_steps": steps,
            "epochs": 100000,  # max_steps decides
            "batch_size": 32,
            # the 10% valid split (30 utts) must survive drop_last
            "eval_batch_size": 16,
            "eval_strategy": "steps",
            "eval_steps": max(steps // 10, 1),
            "eval_batches": 1,
            "eval_first_step": False,  # the driver evaluates explicitly
            "save_strategy": "steps",
            "save_steps": max(steps // 2, 1),
            "save_rewrite_checkpoint": True,
            "save_optimizer": False,
            "logging_steps": 20,
            "progress": False,
            "log_with": [],
            "callbacks": {},
        },
    }


def save_eval_images(trainer, tag: str, assets: Path):
    """Run one eval pass and save the evaluator's figure dashboard."""
    import matplotlib.pyplot as plt

    logs = trainer.evaluate()
    for key, fig in list(logs.items()):
        if not key.startswith("images/"):
            continue
        name = key.split("/")[-1]
        fig.savefig(assets / f"{tag}_{name}.png", dpi=110,
                    bbox_inches="tight")
        plt.close(fig)
    scalars = {k: float(v) for k, v in logs.items()
               if isinstance(v, (int, float, np.floating))}
    return scalars


def plot_curves(log_history, assets: Path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = [
        ("train_step/loss", "train loss"),
        ("eval/loss", "eval loss"),
        ("eval/metrics/mcd_13", "eval MCD-13"),
        ("eval/metrics/alignment_strength", "alignment strength"),
        ("eval/metrics/alignment_length", "alignment length"),
        ("train_step/aligner/attention_loss", "CTC alignment loss"),
    ]
    fig, axes = plt.subplots(2, 3, figsize=(15, 7))
    for ax, (key, title) in zip(axes.ravel(), panels):
        xs = [h["step"] for h in log_history if key in h]
        ys = [h[key] for h in log_history if key in h]
        if xs:
            ax.plot(xs, ys, lw=1.2)
        ax.set_title(title)
        ax.set_xlabel("step")
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(assets / "curves.png", dpi=110)
    return {key: ([h[key] for h in log_history if key in h] or [None])[-1]
            for key, _ in panels}


class HistoryDumper:
    """Persist the log history every eval so a killed run keeps its curves."""

    def __init__(self, path: Path):
        self.path = path

    def _dump(self, state):
        self.path.write_text(json.dumps(state.log_history))

    def on_evaluate(self, config, state, control, **kw):
        self._dump(state)

    def on_train_end(self, config, state, control, **kw):
        self._dump(state)

    def __getattr__(self, name):
        if name.startswith("on_"):
            return lambda *a, **kw: None
        raise AttributeError(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=Path, default=Path("/tmp/synth_ds"))
    ap.add_argument("--n-utts", type=int, default=300)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--run-dir", type=Path, default=Path("/tmp/synth_runs"))
    ap.add_argument("--out-assets", type=Path,
                    default=Path("docs/assets/train_r3"))
    ap.add_argument("--model-scale", choices=["core", "large"],
                    default="core",
                    help="'large' trains bench_train's 118.8M-param preset "
                         "(128-wide heads) — ties the scale benchmark to "
                         "actual learning, not just step timing")
    args = ap.parse_args()

    from isp_tts_tpu.data.metadata import TTSMeta
    from isp_tts_tpu.training.experiment import ExperimentModules
    from tools.make_synth_dataset import generate

    if not (args.root / "meta.csv").exists():
        generate(args.root, args.n_utts)
    if not (args.root / "meta_train.csv").exists():
        meta = TTSMeta.load(args.root / "meta.csv",
                            ("audio_path", "speaker", "text"))
        train, valid = meta.split(ratio=0.1, seed=42)
        train.save(args.root / "meta_train.csv")
        valid.save(args.root / "meta_valid.csv")
        print(f"split: {len(train)} train / {len(valid)} valid")

    assets = args.out_assets
    assets.mkdir(parents=True, exist_ok=True)

    repo = Path(__file__).parent.parent
    overrides = build_overrides(args.root, args.run_dir, args.steps)
    if args.model_scale == "large":
        from tools.bench_train import LARGE_OVERRIDES
        from isp_tts_tpu.config.loader import merge_dicts

        overrides["model"] = merge_dicts(overrides.get("model", {}),
                                         LARGE_OVERRIDES)
        overrides["trainer"]["experiment_name"] = "synth_r3_large"
    modules = ExperimentModules(
        "acoustic/core", str(repo / "recipes"),
        overrides=overrides)
    modules.init_modules()
    trainer = modules.build_trainer()
    trainer.callbacks.callbacks.append(
        HistoryDumper(assets / "log_history.json"))

    import time

    t0 = time.time()
    before = save_eval_images(trainer, "before", assets)
    print("before:", json.dumps(before))
    trainer.train()
    after = save_eval_images(trainer, "after", assets)
    print("after:", json.dumps(after))
    wall = time.time() - t0

    finals = plot_curves(trainer.state.log_history, assets)
    summary = {
        "steps": trainer.state.global_step,
        "wall_seconds": round(wall, 1),
        "before": before,
        "after": after,
        "final_logged": finals,
        "run_dir": str(trainer.run_dir),
    }
    (assets / "summary.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
