"""New-voice fine-tune run: the reference's headline workflow, executed.

The reference's main deliverable is the colab fine-tune
(`/root/reference/notebooks/training.ipynb`: warm-start a pretrained
acoustic checkpoint on a new voice, ~600 steps, eval loss 4.786->2.996;
recipes/colab/train_en_ipa.yaml semantics = warm_start + all layers
trainable + exponential LR decay + encoder dropout 0.3). This tool executes
the same workflow end to end on the TPU with the synthetic formant corpus:

- fine-tunes the committed round-3 base checkpoint
  (docs/assets/train_r3/checkpoint_synth_r3.f16.ckpt, trained on spk0-2)
  onto a HELD-OUT voice `spk_new` whose F0/formants lie OUTSIDE the
  training speakers' range;
- mirrors recipes/finetune/en_ipa.yaml's trainer block (warm_start,
  finetune_layers [], lr 1e-4 exponential 0.995, dropout 0.3) over the
  synthetic charset;
- optionally trains the same budget FROM SCRATCH for comparison
  (--with-scratch), quantifying what the warm start buys.

Usage:
  python tools/finetune_synth.py --steps 600 --with-scratch
  python tools/finetune_synth.py --steps 20 --no-wav \
      --out-assets /tmp/fa --run-dir /tmp/fr         # smoke
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from tools.train_synth import (SYNTH_COLLATOR, SYNTH_STATS,  # noqa: E402
                               HistoryDumper, plot_curves, save_eval_images)

REPO = Path(__file__).parent.parent


def build_overrides(root: Path, run_root: Path, steps: int, base_ckpt: str,
                    warm_start: bool, label: str):
    trainer = {
        "output_dir": str(run_root),
        "experiment_name": "finetune_r3",
        "label": label,
        "max_steps": steps,
        "epochs": 100000,
        "batch_size": 24,
        "eval_batch_size": 12,
        "eval_strategy": "steps",
        "eval_steps": max(steps // 12, 1),
        "eval_batches": 1,
        "eval_first_step": False,
        "save_strategy": "steps",
        "save_steps": steps,
        "save_rewrite_checkpoint": True,
        "save_optimizer": False,
        "logging_steps": 10,
        "progress": False,
        "log_with": [],
        "callbacks": {},
        # recipes/finetune/en_ipa.yaml optimization block
        "optimization": {
            "learning_rate": 1.0e-4,
            "lr_scheduler": {"_target_": "exponential", "gamma": 0.995},
        },
    }
    if warm_start:
        trainer.update({
            "resume_from_checkpoint": base_ckpt,
            "warm_start": True,
            "finetune_layers": [],  # [] = all layers trainable (en_ipa ft)
        })
    return {
        "dataset": {
            "root": str(root),
            "meta_column_names": ["audio_path", "speaker", "text"],
            # the new voice reuses speaker slot 0; its embedding re-adapts
            "speaker": {"spk_new": 0},
            "_train_": {"meta_name": "meta_train.csv"},
            "_eval_": {"meta_name": "meta_valid.csv"},
            # MUST match the base run's normalization — the warm-started
            # adaptor was trained against these stats
            "stats": dict(SYNTH_STATS),
        },
        "collator": dict(SYNTH_COLLATOR),
        "model": {
            "num_speakers": 3,  # matches the warm-start checkpoint shapes
            "encoder": {"transformer_layer": {
                "attention": {"dropout": 0.3},
                "feed_forward": {"dropout": 0.3},
            }},
        },
        "trainer": trainer,
    }


def run_once(root: Path, run_root: Path, steps: int, base_ckpt: str,
             warm_start: bool, assets: Path, tag: str):
    from isp_tts_tpu.training.experiment import ExperimentModules

    modules = ExperimentModules(
        "acoustic/core", str(REPO / "recipes"),
        overrides=build_overrides(root, run_root, steps, base_ckpt,
                                  warm_start, tag))
    modules.init_modules()
    trainer = modules.build_trainer()
    trainer.callbacks.callbacks.append(
        HistoryDumper(assets / f"log_history_{tag}.json"))

    t0 = time.time()
    before = save_eval_images(trainer, f"{tag}_before", assets)
    trainer.train()
    after = save_eval_images(trainer, f"{tag}_after", assets)
    wall = time.time() - t0
    finals = plot_curves(trainer.state.log_history, assets)
    (assets / "curves.png").rename(assets / f"curves_{tag}.png")
    return trainer, {"before": before, "after": after,
                     "final_logged": finals, "wall_seconds": round(wall, 1),
                     "steps": trainer.state.global_step}


def synthesize_sample(trainer, assets: Path, tag: str):
    """New-voice sample through the committed neural vocoder."""
    import numpy as np
    import jax.numpy as jnp

    from isp_tts_tpu.data.audio import write_wav
    from isp_tts_tpu.data.providers import TextProvider, TextProviderConfig
    from isp_tts_tpu.models import VocoderModel

    text = "pame tizo kuve lasi."
    provider = TextProvider(TextProviderConfig(
        charset=["<pad>", "</s>", "#punct", "#en"]))
    data = provider(text)
    model = trainer.model
    model.eval()
    mel, adaptor = model.infer(
        jnp.asarray(data.vector)[None], max_dec_len=512, steps=4,
        speaker=jnp.asarray([0], jnp.int32))
    # degenerate models can predict 0 frames (synthesize.py clamps the same
    # way); keep one frame so the vocoder has something to invert
    mel = mel[:, : max(int(adaptor.dec_lengths[0]), 1)]

    voc_path = REPO / "docs/assets/vocoder_r3/vocoder_synth_r3.f16.ckpt"
    if voc_path.exists():
        voc = VocoderModel.from_pretrained(voc_path)
        voc.eval()
        wav = np.clip(np.asarray(voc.infer(mel))[0], -1, 1)
        write_wav(assets / f"sample_{tag}.wav", wav.astype(np.float32), 22050)
        return {"sample_text": text, "sample_seconds": len(wav) / 22050}
    return {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=Path, default=Path("/tmp/synth_ft"))
    ap.add_argument("--n-utts", type=int, default=120)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--run-dir", type=Path, default=Path("/tmp/finetune_runs"))
    ap.add_argument("--out-assets", type=Path,
                    default=REPO / "docs/assets/finetune_r3")
    ap.add_argument("--base-ckpt", type=str, default=str(
        REPO / "docs/assets/train_r3/checkpoint_synth_r3.f16.ckpt"))
    ap.add_argument("--with-scratch", action="store_true",
                    help="also train the same budget from scratch for "
                         "comparison")
    ap.add_argument("--no-wav", action="store_true")
    args = ap.parse_args()

    from isp_tts_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from isp_tts_tpu.data.metadata import TTSMeta
    from tools.make_synth_dataset import generate

    if not (args.root / "meta.csv").exists():
        generate(args.root, args.n_utts, seed=100, speakers=["spk_new"])
    if not (args.root / "meta_train.csv").exists():
        meta = TTSMeta.load(args.root / "meta.csv",
                            ("audio_path", "speaker", "text"))
        train, valid = meta.split(ratio=0.1, seed=42)
        train.save(args.root / "meta_train.csv")
        valid.save(args.root / "meta_valid.csv")
        print(f"split: {len(train)} train / {len(valid)} valid")

    assets = args.out_assets
    assets.mkdir(parents=True, exist_ok=True)

    trainer, ft = run_once(args.root, args.run_dir, args.steps,
                           args.base_ckpt, True, assets, "finetune")
    summary = {"dataset": {"n_utts": args.n_utts, "speaker": "spk_new",
                           "root": str(args.root)},
               "base_checkpoint": args.base_ckpt,
               "finetune": ft}
    if not args.no_wav:
        summary["finetune"].update(
            synthesize_sample(trainer, assets, "finetune"))

    if args.with_scratch:
        _, sc = run_once(args.root, args.run_dir, args.steps,
                         args.base_ckpt, False, assets, "scratch")
        summary["scratch_same_budget"] = sc

    (assets / "summary.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
