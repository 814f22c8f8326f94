"""Neural vocoder (Vocos-architecture GAN): ops, model, data, GANTrainer e2e.

The reference treats the vocoder as an external TorchScript artifact
(inference.ipynb cell 7); these tests cover the in-repo trainable rebuild:
the TPU-safe matmul mel front-end, generator/discriminator contracts, the
fixed-segment data path, and a full recipe -> GANTrainer -> checkpoint ->
from_pretrained -> infer cycle on the virtual CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import nnx

from isp_tts_tpu.data.audio import write_wav

SR = 22050

TINY_FEATURES = {"sample_rate": SR, "n_fft": 256, "hop_length": 64,
                 "win_length": 256, "n_mels": 16, "f_min": 0.0, "f_max": 8000.0}
TINY_MODEL = {
    "features": TINY_FEATURES,
    "generator": {"dim": 32, "intermediate_dim": 64, "num_layers": 2},
    "discriminator": {"periods": [2, 3], "resolutions": [[256, 64]],
                      "mpd_channels": [4, 8], "mrd_channels": 4},
}


def _tiny_model(seed=0):
    from isp_tts_tpu.config.registry import build_config
    from isp_tts_tpu.models.vocoder import VocoderModel, VocoderModelConfig

    cfg = build_config(VocoderModelConfig, dict(TINY_MODEL))
    return VocoderModel(cfg, rngs=nnx.Rngs(seed))


def test_log_mel_matmul_matches_fft_front_end():
    from isp_tts_tpu.ops.audio import log_mel_spectrogram
    from isp_tts_tpu.ops.vocoder import log_mel_matmul

    audio = jnp.asarray(np.random.RandomState(0).randn(2, 4096).astype(np.float32) * 0.3)
    ref = jnp.swapaxes(log_mel_spectrogram(audio, SR), -1, -2)  # (B, T, n_mels)
    got = log_mel_matmul(audio, SR)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_generator_shape_contract():
    model = _tiny_model()
    mel = jnp.asarray(np.random.RandomState(1).randn(2, 24, 16).astype(np.float32))
    wav = model.infer(mel)
    assert wav.shape == (2, 24 * 64)  # one frame -> hop samples
    assert np.isfinite(np.asarray(wav)).all()


def test_model_forward_and_mel_alignment():
    model = _tiny_model()
    audio = jnp.asarray(np.random.RandomState(2).randn(2, 2048).astype(np.float32) * 0.1)
    out = model(audio=audio)
    assert out.mel.shape == (2, 2048 // 64, 16)
    assert out.audio_fake.shape == audio.shape


def test_discriminator_structure_and_grads():
    from isp_tts_tpu.models.vocoder import VocoderGANLoss

    model = _tiny_model()
    crit = VocoderGANLoss(**{k: v for k, v in TINY_FEATURES.items()})
    audio = jnp.asarray(np.random.RandomState(3).randn(2, 1024).astype(np.float32) * 0.1)
    logits, features = model.discriminator(audio)
    assert len(logits) == 2 + 1  # periods + resolutions
    assert len(features) == len(logits)

    fake = jax.lax.stop_gradient(model(audio=audio).audio_fake)

    def d_loss(d):
        return crit.disc_loss(d, audio, fake)[0]

    grads = nnx.grad(d_loss)(model.discriminator)
    norms = [float(jnp.linalg.norm(g)) for g in jax.tree_util.tree_leaves(grads)]
    assert any(n > 0 for n in norms) and all(np.isfinite(n) for n in norms)

    # generator grads flow through the adversarial + fm + mel terms
    mel = model.features(audio)

    def g_loss(g):
        return crit.gen_loss(model.discriminator, audio, g(mel), mel)[0]

    g_grads = nnx.grad(g_loss)(model.generator)
    g_norms = [float(jnp.linalg.norm(g)) for g in jax.tree_util.tree_leaves(g_grads)]
    assert any(n > 0 for n in g_norms) and all(np.isfinite(n) for n in g_norms)


def test_weight_norm_conv_magnitude_invariance():
    """WNConv output must depend on v only through its direction."""
    from isp_tts_tpu.models.vocoder.discriminator import WNConv

    conv = WNConv(1, 4, (3, 3), rngs=nnx.Rngs(0))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 1).astype(np.float32))
    y1 = conv(x)
    conv.v.value = conv.v.value * 7.3  # rescale the direction parameter
    y2 = conv(x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


@pytest.fixture(scope="module")
def wav_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vocoder_ds")
    (root / "wavs").mkdir()
    rng = np.random.RandomState(0)
    lines = []
    for i in range(8):
        n = SR // 8 + 321 * i  # ragged lengths
        t = np.arange(n) / SR
        wav = 0.4 * np.sin(2 * np.pi * (150 + 30 * i) * t) + 0.01 * rng.randn(n)
        write_wav(root / "wavs" / f"u{i}.wav", wav.astype(np.float32), SR)
        lines.append(f"wavs/u{i}.wav|text {i}")
    (root / "meta.csv").write_text("\n".join(lines) + "\n")
    return root


def test_dataset_and_collator(wav_root):
    from isp_tts_tpu.data.vocoder import (VocoderCollator, VocoderDataset,
                                          VocoderDatasetConfig)

    seg = 2048
    ds = VocoderDataset(VocoderDatasetConfig(
        root=str(wav_root), segment_samples=seg, random_crop=True))
    assert len(ds) == 8
    s = ds[0]
    assert s.audio.shape == (seg,) and s.audio.dtype == np.float32

    batch = VocoderCollator()([ds[i] for i in range(4)])
    assert batch["audio"].shape == (4, seg)
    assert batch["n_samples"].shape == (4,)

    # deterministic center crop for eval
    ds_eval = VocoderDataset(VocoderDatasetConfig(
        root=str(wav_root), segment_samples=seg, random_crop=False))
    np.testing.assert_array_equal(ds_eval[3].audio, ds_eval[3].audio)

    # short audio zero-padded, true length reported
    ds_long = VocoderDataset(VocoderDatasetConfig(
        root=str(wav_root), segment_samples=SR, random_crop=False))
    s0 = ds_long[0]
    assert s0.audio.shape == (SR,)
    assert s0.n_samples == SR // 8
    assert np.all(s0.audio[s0.n_samples:] == 0.0)


def _overrides(root, outdir, **trainer_over):
    return {
        "dataset": {"root": str(root), "segment_samples": 1024},
        "model": TINY_MODEL,
        "trainer": dict({
            "output_dir": str(outdir),
            "experiment_name": "vocoder_e2e",
            "label": "run",
            "epochs": 2,
            "batch_size": 8,
            "eval_batch_size": 8,
            "eval_strategy": "epoch",
            "eval_batches": 1,
            "save_strategy": "epoch",
            "logging_steps": 1,
            "progress": False,
            "log_with": [],
            "precision": "fp32",
            "callbacks": {},
        }, **trainer_over),
    }


def test_gan_train_e2e(wav_root, tmp_path):
    from isp_tts_tpu.models.vocoder import VocoderModel
    from isp_tts_tpu.training.experiment import ExperimentModules
    from isp_tts_tpu.training.gan_trainer import GANTrainer

    modules = ExperimentModules("vocoder/vocos", "recipes",
                                overrides=_overrides(wav_root, tmp_path))
    modules.init_modules()
    trainer = modules.build_trainer()
    assert isinstance(trainer, GANTrainer)
    trainer.train()

    assert trainer.state.global_step == 2
    steps = [h for h in trainer.state.log_history if "train_step/loss" in h]
    assert steps
    last = steps[-1]
    for key in ("train_step/loss", "train_step/losses/disc",
                "train_step/losses/gen_adv", "train_step/losses/mel",
                "train_step/stats/grad_norm", "train_step/stats/grad_norm_disc"):
        assert np.isfinite(last[key]), key
    evals = [h for h in trainer.state.log_history if "eval/loss" in h]
    assert evals and "eval/metrics/spectral_convergence" in evals[-1]

    run_dir = trainer.run_dir
    assert (run_dir / "checkpoint_last.ckpt").exists()

    # --- resume restores BOTH optimizer states and the step count ---
    modules2 = ExperimentModules(
        "vocoder/vocos", "recipes",
        overrides=_overrides(
            wav_root, tmp_path, epochs=3, save_strategy="no",
            eval_strategy="no",
            resume_from_checkpoint=str(run_dir / "checkpoint_last.ckpt")))
    modules2.init_modules()
    trainer2 = modules2.build_trainer()
    assert trainer2.state.global_step == 2
    assert set(trainer2.opt_state.keys()) == {"gen", "disc"}
    trainer2.train()
    assert trainer2.state.global_step == 3

    # --- the saved checkpoint serves inference (the reference's
    # vocoder.infer contract) ---
    model = VocoderModel.from_pretrained(run_dir / "checkpoint_last.ckpt")
    mel = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16).astype(np.float32))
    wav = model.infer(mel)
    assert wav.shape == (1, 16 * 64)
    assert np.isfinite(np.asarray(wav)).all()


def test_gan_step_learns_on_one_sample(wav_root, tmp_path):
    """A few GAN steps on a single repeated segment must reduce the mel
    reconstruction term (sanity that BOTH optimizers apply updates)."""
    from isp_tts_tpu.training.experiment import ExperimentModules

    modules = ExperimentModules(
        "vocoder/vocos", "recipes",
        overrides=_overrides(
            wav_root, tmp_path, epochs=8, eval_strategy="no",
            save_strategy="no",
            optimization={"learning_rate": 1e-3, "betas": [0.8, 0.99],
                          "lr_scheduler": {"_target_": "none"}}))
    modules.init_modules()
    trainer = modules.build_trainer()
    trainer.train()
    mels = [h["train_step/losses/mel"] for h in trainer.state.log_history
            if "train_step/losses/mel" in h]
    assert len(mels) >= 8
    assert mels[-1] < mels[0], (mels[0], mels[-1])


def test_gan_finetune_freeze_eval_mode_and_best_metric(wav_root, tmp_path):
    """GAN-lane trainer parity (VERDICT r3 #4): warm-start with
    finetune_layers freezes everything but the listed prefixes (the
    reference's frozen-backbone fine-tune workflow, colab train_ru_en.yaml,
    on the vocoder); eval_mode runs one eval pass without optimizing; and
    best-metric checkpointing writes checkpoint_best.ckpt."""
    from isp_tts_tpu.training.experiment import ExperimentModules

    def build(outdir, **over):
        modules = ExperimentModules(
            "vocoder/vocos", "recipes",
            overrides=_overrides(wav_root, outdir, **over))
        modules.init_modules()
        return modules.build_trainer()

    # --- base run: 2 steps, epoch save + eval, best-metric checkpoint ---
    t1 = build(tmp_path / "base", metric_for_best_model="loss")
    t1.train()
    ckpt = t1.run_dir / "checkpoint_last.ckpt"
    assert ckpt.exists()
    assert (t1.run_dir / "checkpoint_best.ckpt").exists(), \
        "best-metric checkpointing must work for the GAN lane"

    # --- warm-start + finetune_layers: only generator.head trains ---
    t2 = build(tmp_path / "ft", epochs=1, save_strategy="no",
               eval_strategy="no", resume_from_checkpoint=str(ckpt),
               warm_start=True, finetune_layers=["generator.head"])
    assert t2.model.frozen_prefixes  # freeze applied
    before = {k: np.asarray(v).copy()
              for k, v in t2.model.state_dict().items()}
    t2.train()
    after = t2.model.state_dict()

    changed = [k for k in before
               if not np.array_equal(before[k], np.asarray(after[k]))]
    assert changed, "nothing trained"
    assert all(k.startswith("generator.head") for k in changed), \
        f"frozen params moved: {[k for k in changed if not k.startswith('generator.head')][:4]}"
    assert any(k.startswith("generator.head") for k in changed)
    # the discriminator must be completely frozen
    assert not any(k.startswith("discriminator") for k in changed)

    # --- eval_mode: one eval pass, no optimization, no best checkpoint ---
    t3 = build(tmp_path / "ev", eval_mode=True, save_strategy="no",
               resume_from_checkpoint=str(ckpt))
    metrics = t3.train()
    assert metrics and any("loss" in k for k in metrics)
    assert t3.state.global_step == 2  # restored, not advanced


def test_paired_predicted_mel_finetune_path(wav_root, tmp_path):
    """Joint-fine-tune plumbing (VERDICT r3 #5): a mel_dir dataset yields
    hop-aligned (audio, mel) crops; the GAN step feeds the PAIRED mel to
    the generator while the mel-L1 target stays the real audio's mel."""
    import jax
    from isp_tts_tpu.data.vocoder import VocoderDataset, VocoderDatasetConfig

    hop = 64
    # fabricate per-clip "predicted" mels: frame f filled with f (so crop
    # alignment is directly checkable), 16 mel bins like TINY_FEATURES
    mel_dir = tmp_path / "mels"
    mel_dir.mkdir()
    import wave as _wave

    for wav_path in sorted((wav_root).glob("wavs/*.wav")):
        with _wave.open(str(wav_path)) as w:
            n = w.getnframes()
        frames = n // hop
        mel = np.tile(np.arange(frames, dtype=np.float32)[:, None], (1, 16))
        np.save(mel_dir / f"{wav_path.stem}.npy", mel)

    ds = VocoderDataset(VocoderDatasetConfig(
        root=str(wav_root), segment_samples=512, random_crop=True,
        mel_dir=str(mel_dir), hop_length=hop,
        meta_column_names=("audio_path", "text")))
    s = ds[0]
    assert s.mel is not None and s.mel.shape == (512 // hop, 16)
    # crop alignment: the mel frame indices must be consecutive and match
    # the audio crop's hop offset
    first = int(s.mel[0, 0])
    np.testing.assert_array_equal(s.mel[:, 0], np.arange(first, first + 8))

    from isp_tts_tpu.data.vocoder import VocoderCollator

    batch = VocoderCollator()([ds[0], ds[1]])
    assert batch["mel"].shape == (2, 8, 16)

    # the GAN trainer's step consumes batch mel: generator output must
    # depend on the paired mel, not the audio-derived one
    model = _tiny_model()
    model.eval()
    out_paired = model(jnp.asarray(batch["audio"]),
                       mel=jnp.asarray(batch["mel"]))
    out_plain = model(jnp.asarray(batch["audio"]))
    assert not np.allclose(np.asarray(out_paired.audio_fake),
                           np.asarray(out_plain.audio_fake))
    # the reconstruction target is identical (real audio's mel) either way
    np.testing.assert_array_equal(np.asarray(out_paired.mel),
                                  np.asarray(out_plain.mel))
