import jax
import numpy as np
import jax.numpy as jnp
import pytest
from flax import nnx

from isp_tts_tpu.config import build_config
from isp_tts_tpu.models import AcousticModel, AcousticModelLoss
from isp_tts_tpu.models.acoustic.evaluator import AcousticModelEvaluator
from isp_tts_tpu.models.acoustic.model import AcousticModelConfig

TINY = {
    "encoding_map": {c: i for i, c in enumerate("_~abcdefg")},  # 9 tokens
    "mel_dim": 16,
    "text_dim": 24,
    "encoder": {"dim": 24, "depth": 1, "transformer_layer": {
        "attention": {"heads": 2, "head_dim": 12, "one_kv_head": True,
                      "alibi_pos_bias": True},
        "feed_forward": {"inner_dim": 48, "activation": "gelu"}}},
    "decoder": {"dim": 24, "depth": 1, "transformer_layer": {
        "attention": {"heads": 2, "head_dim": 12, "one_kv_head": True,
                      "alibi_pos_bias": True},
        "feed_forward": {"inner_dim": 48, "activation": "gelu"}}},
    "temporal_adaptor": {
        "predictor": {"transformer": {"dim": 16, "depth": 1, "transformer_layer": {
            "attention": {"heads": 2, "head_dim": 8},
            "feed_forward": {"inner_dim": 32}}},
            "time_embedding_dim": 8},
        "embedding": {"transformer": {"dim": 16, "depth": 1, "transformer_layer": {
            "attention": {"heads": 2, "head_dim": 8},
            "feed_forward": {"inner_dim": 32}}}},
        "pitch": True, "energy": True, "soft_duration": True},
    "aligner": {"attention_dim": 8, "key_kernel_size": 3, "query_kernel_size": 3},
    "num_speakers": 2,
}


def _build(soft_duration=True):
    cfg_dict = dict(TINY)
    cfg_dict["temporal_adaptor"] = dict(TINY["temporal_adaptor"], soft_duration=soft_duration)
    cfg = build_config(AcousticModelConfig, cfg_dict)
    return AcousticModel(cfg, rngs=nnx.Rngs(0))


def _batch(B=2, T=6, M=20, seed=0):
    rng = np.random.RandomState(seed)
    text = rng.randint(1, 9, size=(B, T)).astype(np.int32)
    text_len = np.array([T, T - 2], np.int32)
    text[1, -2:] = 0
    mel = rng.randn(B, M, 16).astype(np.float32)
    mel_len = np.array([M, M - 6], np.int32)
    pitch = rng.randn(B, M).astype(np.float32)
    energy = np.abs(rng.randn(B, M)).astype(np.float32)
    speaker = np.array([0, 1], np.int32)
    return dict(text=jnp.asarray(text), text_len=jnp.asarray(text_len),
                mel=jnp.asarray(mel), mel_len=jnp.asarray(mel_len),
                pitch=jnp.asarray(pitch), energy=jnp.asarray(energy),
                speaker=jnp.asarray(speaker))


@pytest.mark.parametrize("soft", [True, False])
def test_training_forward_and_loss(soft):
    model = _build(soft_duration=soft)
    model.train()
    batch = _batch()
    out = model(**batch)
    assert out.mel.shape == (2, 20, 16)
    assert np.isfinite(np.asarray(out.mel)).all()
    # durations sum to mel lengths (after self-healing)
    np.testing.assert_allclose(
        np.asarray(out.adaptor_output.dec_lengths), np.asarray(batch["mel_len"]))

    criterion = AcousticModelLoss()
    inputs = {"mel": batch["mel"], "mel_len": batch["mel_len"],
              "text_len": batch["text_len"]}
    loss, losses = criterion(inputs, out, step=100)
    assert np.isfinite(float(loss))
    for k in ("model/mel_loss", "adaptor/flow_loss",
              "aligner/attention_loss", "aligner/kl_loss"):
        assert k in losses and np.isfinite(float(losses[k])), k


def test_loss_skip_steps_gate():
    model = _build()
    model.train()
    batch = _batch()
    out = model(**batch)
    from isp_tts_tpu.models.acoustic.loss import AcousticLossConfig
    cfg = build_config(AcousticLossConfig, {
        "attention_kl_loss": {"weight": 1.0, "skip_steps": 1000}})
    criterion = AcousticModelLoss(cfg)
    inputs = {"mel": batch["mel"], "mel_len": batch["mel_len"],
              "text_len": batch["text_len"]}
    _, losses = criterion(inputs, out, step=10)
    assert float(losses["aligner/kl_loss"]) == 0.0
    _, losses = criterion(inputs, out, step=2000)
    assert float(losses["aligner/kl_loss"]) != 0.0


@pytest.mark.parametrize("soft", [True, False])
def test_infer_shapes_and_controls(soft):
    model = _build(soft_duration=soft)
    model.eval()
    text = jnp.asarray(np.random.RandomState(0).randint(1, 9, size=(1, 8)), jnp.int32)
    mel1, ad1 = model.infer(text, max_dec_len=64, steps=2,
                            speaker=jnp.asarray([0], jnp.int32))
    assert mel1.shape == (1, 64, 16)
    assert np.isfinite(np.asarray(mel1)).all()
    assert int(ad1.dec_lengths[0]) <= 64

    # duration_factor=2 roughly doubles output frames (clamped to bucket)
    _, ad2 = model.infer(text, max_dec_len=64, steps=2, duration_factor=2.0,
                         speaker=jnp.asarray([0], jnp.int32))
    assert int(ad2.dec_lengths[0]) >= int(ad1.dec_lengths[0])

    # -1 sentinel: predict; explicit durations: obeyed
    fixed = jnp.full((1, 8), 3.0)
    _, ad3 = model.infer(text, max_dec_len=64, steps=2, duration_target=fixed,
                         speaker=jnp.asarray([0], jnp.int32))
    assert int(ad3.dec_lengths[0]) == 24


def test_evaluator_metrics_and_images():
    model = _build()
    model.train()
    batch = _batch()
    out = model(**batch)
    ev = AcousticModelEvaluator(model)
    inputs = {"mel": batch["mel"], "mel_len": batch["mel_len"],
              "text_len": batch["text_len"]}
    metrics = ev(inputs, out)
    assert set(metrics) == {"metrics/mcd_13", "metrics/alignment_length",
                            "metrics/alignment_strength"}
    assert all(np.isfinite(float(v)) for v in metrics.values())

    inputs["text_vector_len"] = batch["text_len"]
    images = ev.on_eval_epoch_end(inputs, out)
    assert "images/eval/alignment" in images
    assert "images/eval/mel_spectrogram" in images


def test_save_load_roundtrip(tmp_path):
    model = _build()
    model.eval()
    text = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    key = __import__("jax").random.PRNGKey(7)
    mel1, _ = model.infer(text, max_dec_len=32, steps=2, key=key)

    path = tmp_path / "ckpt.ckpt"
    model.save_pretrained(path)
    model2 = AcousticModel.from_pretrained(path)
    model2.eval()
    mel2, _ = model2.infer(text, max_dec_len=32, steps=2, key=key)
    np.testing.assert_allclose(np.asarray(mel1), np.asarray(mel2), atol=1e-6)


def test_load_params_ignore_and_mismatch(tmp_path):
    model = _build()
    sd = model.state_dict()
    # corrupt one tensor's shape; loader must skip it with a warning
    some_key = next(k for k in sd if "to_mel" in k and k.endswith("kernel"))
    sd[some_key] = np.zeros((3, 3), np.float32)
    model.load_params(sd, ignore_layers=["encoder"])
    # still finite / usable
    out, _ = model.infer(jnp.asarray([[1, 2, 3]], jnp.int32), max_dec_len=16, steps=1)
    assert np.isfinite(np.asarray(out)).all()


def test_ordered_ctc_matches_optax_with_grads():
    """The banded ordered-label CTC (loss.py:_ordered_ctc_neg_logp) must
    equal the generic optax.ctc_loss formulation — values and gradients —
    on ragged text/mel lengths (incl. text_len == 1)."""
    import optax

    from isp_tts_tpu.models.acoustic.loss import attention_ctc_loss_fn
    from isp_tts_tpu.utils.masks import get_mask_from_lengths

    rng = np.random.RandomState(0)
    B, M, T = 4, 61, 17
    logits = jnp.asarray(rng.randn(B, M, T).astype(np.float32))
    text_lens = jnp.asarray([17, 9, 1, 13], jnp.int32)
    mel_lens = jnp.asarray([61, 40, 5, 33], jnp.int32)

    def optax_version(attn_logits):
        padded = jnp.pad(attn_logits, ((0, 0), (0, 0), (1, 0)),
                         constant_values=-1.0)
        logprobs = jax.nn.log_softmax(padded, axis=2)
        labels = jnp.arange(1, T + 1, dtype=jnp.int32)[None].repeat(B, 0)
        label_pad = (~get_mask_from_lengths(text_lens, T)).astype(jnp.float32)
        labels = labels * (1 - label_pad.astype(jnp.int32))
        logit_pad = (~get_mask_from_lengths(mel_lens, M)).astype(jnp.float32)
        per = optax.ctc_loss(logprobs, logit_pad, labels, label_pad)
        per = per / jnp.maximum(text_lens.astype(per.dtype), 1.0)
        return jnp.mean(jnp.where(jnp.isfinite(per), per, 0.0))

    a = attention_ctc_loss_fn(logits, text_lens, mel_lens)
    b = optax_version(logits)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
    ga = jax.grad(lambda x: attention_ctc_loss_fn(x, text_lens, mel_lens))(logits)
    gb = jax.grad(optax_version)(logits)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-5)


def test_ordered_ctc_zeroes_infeasible_samples():
    """zero_infinity semantics with the banded CTC: an infeasible alignment
    (mel_len < text_len) yields a huge-but-finite sentinel value, which must
    be zeroed per-sample instead of exploding the batch mean (advisor fix)."""
    from isp_tts_tpu.models.acoustic.loss import attention_ctc_loss_fn

    rng = np.random.RandomState(1)
    B, M, T = 2, 40, 17
    logits = jnp.asarray(rng.randn(B, M, T).astype(np.float32))
    # sample 0 feasible, sample 1 infeasible (mel 5 < text 9)
    text_lens = jnp.asarray([17, 9], jnp.int32)
    mel_lens = jnp.asarray([40, 5], jnp.int32)

    loss = attention_ctc_loss_fn(logits, text_lens, mel_lens)
    only_feasible = attention_ctc_loss_fn(
        logits[:1], text_lens[:1], mel_lens[:1])
    # batch mean over 2 samples, the infeasible one contributing exactly 0
    np.testing.assert_allclose(np.asarray(loss),
                               np.asarray(only_feasible) / 2.0, rtol=1e-6)
    g = jax.grad(lambda x: attention_ctc_loss_fn(x, text_lens, mel_lens))(logits)
    assert np.isfinite(np.asarray(g)).all()
