"""Train the Vocos-style neural vocoder from scratch on the synthetic
formant dataset (real TPU) and commit the evidence.

Counterpart of tools/train_synth.py for the vocoder family: the reference
ships its vocoder as a pre-trained external artifact
(notebooks/inference.ipynb cell 7) with no training evidence at all; this
run shows the in-repo GAN recipe converging (mel-L1 + multi-res spectral
distances falling, discriminator staying balanced) and produces audible
artifacts: a copy-synthesis wav and — with --acoustic-ckpt — a full
text -> acoustic -> vocoder -> waveform sample.

Usage:
  python tools/train_vocoder_synth.py --steps 3000            # full run
  python tools/train_vocoder_synth.py --steps 30 \
      --out-assets /tmp/va --run-dir /tmp/vr                   # smoke
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from tools.train_synth import HistoryDumper  # noqa: E402


def build_overrides(root: Path, run_root: Path, steps: int, batch_size: int):
    return {
        "dataset": {
            "root": str(root),
            "meta_column_names": ["audio_path", "speaker", "text"],
            "_train_": {"meta_name": "meta_train.csv"},
            "_eval_": {"meta_name": "meta_valid.csv"},
        },
        "trainer": {
            "output_dir": str(run_root),
            "experiment_name": "vocoder_r3",
            "label": "run",
            "max_steps": steps,
            "epochs": 100000,  # max_steps decides
            "batch_size": batch_size,
            "eval_batch_size": 8,
            "eval_strategy": "steps",
            "eval_steps": max(steps // 10, 1),
            "eval_batches": 2,
            "eval_first_step": False,
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


def plot_curves(log_history, assets: Path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = [
        ("train_step/losses/mel", "mel L1 (train)"),
        ("train_step/losses/disc", "discriminator loss"),
        ("train_step/losses/gen_adv", "generator adversarial"),
        ("train_step/losses/feature_matching", "feature matching"),
        ("eval/metrics/spectral_convergence", "eval spectral convergence"),
        ("eval/metrics/log_stft_l1", "eval log-STFT L1"),
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
    plt.close(fig)
    return {key: ([h[key] for h in log_history if key in h] or [None])[-1]
            for key, _ in panels}


def save_copy_synthesis(trainer, root: Path, assets: Path, sr: int):
    """Vocode a held-out utterance's own mel; save real + generated wavs and
    a spectrogram comparison figure."""
    import jax.numpy as jnp
    import matplotlib.pyplot as plt

    from isp_tts_tpu.data.audio import write_wav

    meta = [ln.split("|") for ln in
            (root / "meta_valid.csv").read_text().strip().split("\n")]
    wav_path = root / meta[0][0]
    import wave

    with wave.open(str(wav_path), "rb") as f:
        n = f.getnframes()
        audio = np.frombuffer(f.readframes(n), np.int16).astype(np.float32) / 32768.0

    model = trainer.model
    seg = (len(audio) // 256) * 256
    audio_t = jnp.asarray(audio[:seg])[None]
    mel = model.features(audio_t)
    fake = np.asarray(model.infer(mel))[0]
    write_wav(assets / "copy_synthesis_real.wav", audio[:seg], sr)
    write_wav(assets / "copy_synthesis_generated.wav",
              np.clip(fake, -1, 1).astype(np.float32), sr)

    mel_fake = np.asarray(model.features(jnp.asarray(fake)[None]))[0]
    fig, axes = plt.subplots(2, 1, figsize=(10, 6), sharex=True)
    for ax, (m, title) in zip(axes, [(np.asarray(mel)[0], "real"),
                                     (mel_fake, "generated")]):
        ax.imshow(m.T, origin="lower", aspect="auto", cmap="magma")
        ax.set_title(f"{title} log-mel ({wav_path.name})")
    fig.tight_layout()
    fig.savefig(assets / "copy_synthesis_mel.png", dpi=110)
    plt.close(fig)

    mel_l1 = float(np.mean(np.abs(mel_fake - np.asarray(mel)[0])))
    return {"copy_synthesis_mel_l1": mel_l1,
            "copy_synthesis_file": wav_path.name}


def save_tts_sample(trainer, acoustic_ckpt: str, assets: Path, sr: int):
    """Full pipeline: text -> acoustic checkpoint -> trained vocoder -> wav."""
    from isp_tts_tpu.serving import Synthesizer, SynthesizerConfig

    text = "pame tizo kuve lasi."  # in-domain for the synthetic charset
    synth = Synthesizer.from_pretrained(
        acoustic_ckpt,
        SynthesizerConfig(text_buckets=(64,), frame_budgets=(512,)),
        vocoder_path=None)
    synth.attach_vocoder(trainer.model)
    wavs = synth.synthesize_audio(text, speaker=1)
    from isp_tts_tpu.data.audio import write_wav

    write_wav(assets / "tts_sample.wav",
              np.clip(wavs[0], -1, 1).astype(np.float32), sr)
    return {"tts_sample_text": text,
            "tts_sample_seconds": len(wavs[0]) / sr}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=Path, default=Path("/tmp/synth_ds"))
    ap.add_argument("--n-utts", type=int, default=300)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--run-dir", type=Path, default=Path("/tmp/vocoder_runs"))
    ap.add_argument("--out-assets", type=Path,
                    default=Path(__file__).parent.parent / "docs/assets/vocoder_r3")
    ap.add_argument("--acoustic-ckpt", type=str, default=str(
        Path(__file__).parent.parent
        / "docs/assets/train_r3/checkpoint_synth_r3.f16.ckpt"))
    ap.add_argument("--no-tts-sample", action="store_true")
    args = ap.parse_args()

    from isp_tts_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from tools.make_synth_dataset import generate
    from isp_tts_tpu.data.metadata import TTSMeta

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

    from isp_tts_tpu.training.experiment import ExperimentModules

    modules = ExperimentModules(
        "vocoder/vocos", str(Path(__file__).parent.parent / "recipes"),
        overrides=build_overrides(args.root, args.run_dir, args.steps,
                                  args.batch_size))
    modules.init_modules()
    trainer = modules.build_trainer()
    trainer.callbacks.callbacks.append(HistoryDumper(assets / "log_history.json"))

    t0 = time.perf_counter()
    trainer.train()
    wall = time.perf_counter() - t0

    summary = {
        "steps": trainer.state.global_step,
        "wall_seconds": wall,
        "steps_per_second": trainer.state.global_step / wall,
        "dataset": {"n_utts": args.n_utts, "root": str(args.root)},
    }
    summary.update(plot_curves(trainer.state.log_history, assets))
    sr = trainer.model.features_config.sample_rate
    summary.update(save_copy_synthesis(trainer, args.root, assets, sr))
    if not args.no_tts_sample and Path(args.acoustic_ckpt).exists():
        summary.update(save_tts_sample(trainer, args.acoustic_ckpt, assets, sr))

    # committed artifact: generator-only f16 checkpoint (serving needs no
    # discriminators/optimizer)
    from tools.shrink_checkpoint import shrink

    last = trainer.run_dir / "checkpoint_last.ckpt"
    if last.exists():
        shrink(last, assets / "vocoder_synth_r3.f16.ckpt",
               drop_prefixes=("discriminator.",))

    (assets / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
