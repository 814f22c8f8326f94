import numpy as np
import pytest
from flax import nnx

from isp_tts_tpu.config import build_config
from isp_tts_tpu.models.acoustic.model import AcousticModel, AcousticModelConfig
from isp_tts_tpu.serving import Synthesizer, SynthesizerConfig

TINY = {
    "encoding_map": None,  # filled from charset below
    "mel_dim": 16,
    "text_dim": 16,
    "encoder": {"dim": 16, "depth": 1, "transformer_layer": {
        "attention": {"heads": 2, "head_dim": 8, "one_kv_head": True,
                      "alibi_pos_bias": True},
        "feed_forward": {"inner_dim": 32}}},
    "decoder": {"dim": 16, "depth": 1, "transformer_layer": {
        "attention": {"heads": 2, "head_dim": 8, "one_kv_head": True,
                      "alibi_pos_bias": True},
        "feed_forward": {"inner_dim": 32}}},
    "temporal_adaptor": {
        "predictor": {"time_embedding_dim": 8, "transformer": {
            "dim": 16, "depth": 1, "transformer_layer": {
                "attention": {"heads": 2, "head_dim": 8, "one_kv_head": True,
                              "alibi_pos_bias": True},
                "feed_forward": {"inner_dim": 32}}}},
        "embedding": {"transformer": {
            "dim": 16, "depth": 1, "transformer_layer": {
                "attention": {"heads": 2, "head_dim": 8, "one_kv_head": True,
                              "alibi_pos_bias": True},
                "feed_forward": {"inner_dim": 32}}}},
        "soft_duration": False},
    "aligner": {"attention_dim": 8},
}


@pytest.fixture(scope="module")
def synthesizer():
    from isp_tts_tpu.data.text.table import CodingTable

    charset = ["<pad>", "</s>", "#punct", "#en"]
    ct = CodingTable.from_charset(charset)
    cfg_dict = dict(TINY, encoding_map=dict(ct.encoding_map))
    model = AcousticModel(build_config(AcousticModelConfig, cfg_dict),
                          rngs=nnx.Rngs(0))
    return Synthesizer(model, SynthesizerConfig(
        text_buckets=(16, 32), frame_budgets=(64, 128),
        frames_per_token=4.0, steps=2, charset=tuple(charset)))


def test_synthesizer_single(synthesizer):
    mels = synthesizer("hello world.")
    assert len(mels) == 1
    assert mels[0].ndim == 2 and mels[0].shape[1] == 16
    assert np.isfinite(mels[0]).all()


def test_synthesizer_bucket_reuse_and_batch(synthesizer):
    synthesizer("short one.")
    n_before = len(synthesizer._compiled)
    synthesizer("also tiny.")  # same bucket -> no new compile
    assert len(synthesizer._compiled) == n_before

    mels = synthesizer(["first text here.", "second, slightly longer text."])
    assert len(mels) == 2 and all(m.shape[1] == 16 for m in mels)


def test_synthesizer_deterministic_by_seed(synthesizer):
    a = synthesizer("same words.", seed=7)[0]
    b = synthesizer("same words.", seed=7)[0]
    np.testing.assert_array_equal(a, b)


def test_synthesizer_too_long_raises(synthesizer):
    with pytest.raises(ValueError):
        synthesizer("x" * 200)


def test_synthesizer_uses_checkpoint_encoding_map():
    """charset=None: the checkpoint's own table drives tokenization; a
    mismatched explicit charset is rejected."""
    from isp_tts_tpu.data.text.table import CodingTable

    ct = CodingTable.from_charset(["<pad>", "</s>", "#punct", "#marks", "#en"])
    cfg_dict = dict(TINY, encoding_map=dict(ct.encoding_map))
    model = AcousticModel(build_config(AcousticModelConfig, cfg_dict),
                          rngs=nnx.Rngs(0))
    synth = Synthesizer(model, SynthesizerConfig(
        text_buckets=(16,), frame_budgets=(64,), frames_per_token=3.0, steps=1,
        charset=None))
    assert dict(synth.text_provider.coding_table.encoding_map) == dict(ct.encoding_map)
    mels = synth("a+b.")  # '+' only exists in the #marks charset
    assert np.isfinite(mels[0]).all()

    with pytest.raises(ValueError):
        Synthesizer(model, SynthesizerConfig(
            text_buckets=(16,), frame_budgets=(64,),
            charset=("<pad>", "</s>", "#punct", "#en")))
