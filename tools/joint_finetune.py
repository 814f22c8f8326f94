#!/usr/bin/env python
"""Acoustic -> vocoder JOINT fine-tune on predicted mels (VERDICT r3 #5).

The vocoder trains on real-audio mels but serves on the ACOUSTIC MODEL'S
predicted mels — a train/serve mismatch the reference can never close (its
vocoder is a frozen TorchScript artifact, inference.ipynb cell 23). Here
both models are in-repo and trainable, so:

  phase A  run the trained acoustic model over its own training set with
           ground-truth durations (aligner attn_hard_duration) but
           PREDICTED pitch/energy/flow — serve-realistic mels that stay
           frame-aligned with the real audio; save one .npy per clip
  phase B  GAN fine-tune the vocoder generator on (predicted mel -> real
           audio) pairs via the paired-mel dataset path
           (data/vocoder.py mel_dir), warm-started from the committed
           vocoder checkpoint; mel-L1 still targets the REAL audio's mel
  phase C  evidence: held-out-clip synthesis through base vs fine-tuned
           vocoder from predicted mels; mel-L1 + spectral convergence vs
           the real audio; committed wavs + summary.json

Usage:
  python tools/joint_finetune.py --root /tmp/synth_ds \
      --acoustic docs/assets/train_r3/checkpoint_synth_r3.f16.ckpt \
      --vocoder docs/assets/vocoder_r3/vocoder_synth_r3.f16.ckpt \
      --steps 1500 --out docs/assets/joint_r4
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.train_synth import SYNTH_COLLATOR, SYNTH_STATS, build_overrides  # noqa: E402

HOP = 256
SR = 22050


def predict_mels(root: Path, acoustic_ckpt: Path, mel_dir: Path,
                 batch: int = 16) -> int:
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from isp_tts_tpu.models import AcousticModel
    from isp_tts_tpu.training.experiment import ExperimentModules

    overrides = build_overrides(root, Path("/tmp/joint_pred"), steps=1)
    overrides["trainer"]["batch_size"] = batch
    # predict for EVERY clip (the vocoder fine-tune consumes the full
    # meta.csv; a train-split-only mel dir would starve its loader)
    overrides["dataset"]["_train_"]["meta_name"] = "meta.csv"
    modules = ExperimentModules("acoustic/core", str(REPO / "recipes"),
                                overrides=overrides)
    dataset = modules.build_dataset("train")
    collator = modules.build_collator()

    model = AcousticModel.from_pretrained(acoustic_ckpt)
    model.eval()
    graphdef, state = nnx.split(model)
    max_dec = SYNTH_COLLATOR["max_mel_len"]

    @jax.jit
    def predict(state, inputs, key):
        m = nnx.merge(graphdef, state)
        fwd = m(**inputs)
        durations = fwd.aligner_output.attn_hard_duration  # (B, T) gt timing
        mel, _ad = m.infer(
            inputs["text"], text_lengths=inputs["text_len"],
            max_dec_len=max_dec, duration_target=durations,
            speaker=inputs.get("speaker"), key=key)
        return mel

    from isp_tts_tpu.data.loader import DataLoader

    loader = DataLoader(dataset, collator, batch_size=batch, shuffle=False,
                        drop_last=False)
    mel_dir.mkdir(parents=True, exist_ok=True)
    n = 0
    for bi, host_batch in enumerate(loader):
        arrays = {k: v for k, v in host_batch.items()
                  if isinstance(v, np.ndarray)}
        inputs = model.prepare_inputs(arrays)
        mel = np.asarray(predict(state, inputs, jax.random.PRNGKey(bi)))
        for row, (fname, mlen) in enumerate(zip(host_batch["filename"],
                                                arrays["mel_len"])):
            stem = Path(fname).stem
            np.save(mel_dir / f"{stem}.npy",
                    mel[row, : int(mlen)].astype(np.float32))
            n += 1
    print(f"predicted mels for {n} clips -> {mel_dir}")
    return n


def finetune(root: Path, mel_dir: Path, vocoder_ckpt: Path, run_root: Path,
             steps: int, lr: float) -> Path:
    from isp_tts_tpu.training.experiment import ExperimentModules

    overrides = {
        "dataset": {
            "root": str(root),
            "meta_column_names": ["audio_path", "speaker", "text"],
            "mel_dir": str(mel_dir),
            "hop_length": HOP,
        },
        "trainer": {
            "output_dir": str(run_root),
            "experiment_name": "joint_r4",
            "label": "run",
            "max_steps": steps,
            "epochs": 100000,
            "batch_size": 16,
            "eval_strategy": "no",
            "save_strategy": "steps",
            "save_steps": steps,
            "save_rewrite_checkpoint": True,
            "save_optimizer": False,
            "logging_steps": 50,
            "progress": False,
            "log_with": [],
            "callbacks": {},
            "resume_from_checkpoint": str(vocoder_ckpt),
            "warm_start": True,
            "optimization": {"learning_rate": lr},
        },
    }
    modules = ExperimentModules("vocoder/vocos", str(REPO / "recipes"),
                                overrides=overrides)
    modules.init_modules()
    trainer = modules.build_trainer()
    t0 = time.perf_counter()
    trainer.train()
    print(f"fine-tune: {trainer.state.global_step} steps in "
          f"{time.perf_counter() - t0:.0f} s")
    losses = [h for h in trainer.state.log_history if "train_step/loss" in h]
    print("mel-L1 trajectory:",
          [round(h["train_step/losses/mel"], 3) for h in losses])
    return trainer.run_dir / "checkpoint_last.ckpt"


def evaluate(root: Path, mel_dir: Path, base_ckpt: Path, tuned_ckpt: Path,
             out: Path, n_clips: int = 6) -> dict:
    """Synthesize held-out clips from PREDICTED mels through both vocoders;
    score generated audio against the REAL audio's mel."""
    import jax.numpy as jnp
    from flax import nnx  # noqa: F401

    from isp_tts_tpu.data.audio import load_audio, write_wav
    from isp_tts_tpu.models import VocoderModel
    from isp_tts_tpu.ops.vocoder import log_mel_matmul

    meta = [ln.split("|") for ln in
            (root / "meta.csv").read_text().strip().split("\n")]
    picks = meta[-n_clips:]  # tail clips (loader order; not cherry-picked)

    out.mkdir(parents=True, exist_ok=True)
    scores = {}
    for tag, ckpt in (("base", base_ckpt), ("tuned", tuned_ckpt)):
        voc = VocoderModel.from_pretrained(ckpt)
        voc.eval()
        mel_l1s, scs = [], []
        for rel, _spk, _text in picks:
            stem = Path(rel).stem
            mel = np.load(mel_dir / f"{stem}.npy")[None]
            wav = np.asarray(voc.infer(jnp.asarray(mel)))[0]
            real = np.asarray(load_audio(root / rel, SR))[: len(wav)]
            wav = wav[: len(real)]
            m_fake = np.asarray(log_mel_matmul(jnp.asarray(wav)[None], SR))
            m_real = np.asarray(log_mel_matmul(jnp.asarray(real)[None], SR))
            mel_l1s.append(float(np.mean(np.abs(m_fake - m_real))))
            scs.append(float(np.linalg.norm(m_fake - m_real)
                             / (np.linalg.norm(m_real) + 1e-9)))
            write_wav(out / f"{stem}.{tag}.wav",
                      np.clip(wav, -1, 1).astype(np.float32), SR)
        scores[tag] = {"mel_l1": round(float(np.mean(mel_l1s)), 4),
                       "spectral_convergence": round(float(np.mean(scs)), 4)}
        print(tag, scores[tag])
    return scores


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=Path, required=True)
    ap.add_argument("--acoustic", type=Path,
                    default=REPO / "docs/assets/train_r3/checkpoint_synth_r3.f16.ckpt")
    ap.add_argument("--vocoder", type=Path,
                    default=REPO / "docs/assets/vocoder_r3/vocoder_synth_r3.f16.ckpt")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--out", type=Path, default=Path("/tmp/joint_r4"))
    ap.add_argument("--run-dir", type=Path, default=Path("/tmp/joint_runs"))
    ap.add_argument("--mel-dir", type=Path, default=None)
    ap.add_argument("--skip-predict", action="store_true")
    args = ap.parse_args()

    mel_dir = args.mel_dir or (args.run_dir / "pred_mels")
    if not args.skip_predict:
        predict_mels(args.root, args.acoustic, mel_dir)
    tuned = finetune(args.root, mel_dir, args.vocoder, args.run_dir,
                     args.steps, args.lr)
    scores = evaluate(args.root, mel_dir, args.vocoder, tuned, args.out)
    summary = {"steps": args.steps, "lr": args.lr, "scores": scores,
               "tuned_checkpoint": str(tuned)}
    (args.out / "summary.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
