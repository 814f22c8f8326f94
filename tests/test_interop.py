"""Torch `.pt` interop: name/layout conversion rules.

Builds the JAX model, inverse-maps its state into the reference's torch
naming + tensor layouts (Linear (out,in), Conv1d (out,in,k), AdaLN Linears
named weight/bias, fused to_kv, aligner.attention.* nesting), then converts
back with ``convert_torch_state`` and requires an exact roundtrip. Also
exercises a real torch.save/torch.load checkpoint file end-to-end.
"""

import re

import numpy as np
import pytest
from flax import nnx

from isp_tts_tpu.config import build_config
from isp_tts_tpu.models import AcousticModel
from isp_tts_tpu.models.acoustic.interop import convert_torch_state
from isp_tts_tpu.models.acoustic.model import AcousticModelConfig

TINY = {
    "encoding_map": {f"c{i}": i for i in range(12)},
    "mel_dim": 16,
    "text_dim": 24,
    "encoder": {"dim": 24, "depth": 2, "transformer_layer": {
        "attention": {"heads": 2, "head_dim": 12, "one_kv_head": True,
                      "alibi_pos_bias": True},
        "feed_forward": {"inner_dim": 48, "activation": "gelu"}}},
    "decoder": {"dim": 24, "depth": 1, "transformer_layer": {
        "attention": {"heads": 2, "head_dim": 12, "one_kv_head": True,
                      "alibi_pos_bias": True},
        "feed_forward": {"inner_dim": 48}}},
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
        "soft_duration": True},
    "aligner": {"attention_dim": 8},
    "num_speakers": 3,
}


def _to_torch_names(flat: dict) -> dict:
    """Inverse of convert_torch_state: our names/layouts -> reference torch."""
    out = {}
    for name, value in flat.items():
        v = np.asarray(value)
        n = name
        n = re.sub(r"^aligner\.", "aligner.attention.", n)
        n = n.replace(".feed_forward.fc1.", ".feed_forward.net.0.")
        n = n.replace(".feed_forward.fc2.", ".feed_forward.net.3.")
        n = n.replace(".rel_pos.log_slopes", ".rel_pos.learned_logslopes")
        n = n.replace(".linear.", ".linear_layer.")
        n = n.replace(".time_embedding.fc1.", ".time_embedding.mlp.0.")
        n = n.replace(".time_embedding.fc2.", ".time_embedding.mlp.2.")
        if re.search(r"_norm\.(weight|bias)\.(kernel|bias)$", n):  # AdaLN Linear
            base, leaf = n.rsplit(".", 1)
            n = base + (".weight" if leaf == "kernel" else ".bias")
            if leaf == "kernel":
                v = v.T
        elif re.search(r"_norm\.norm\.(scale|bias)$", n):  # wrapper LayerNorm
            n = re.sub(r"\.norm\.scale$", ".weight", n)
            n = re.sub(r"\.norm\.bias$", ".bias", n)
        elif n.endswith(".scale"):
            n = n[: -len(".scale")] + ".weight"
        elif n.endswith(".embedding"):
            n = n[: -len(".embedding")] + ".weight"
        elif n.endswith(".kernel"):
            n = n[: -len(".kernel")] + ".weight"
            v = v.transpose(2, 1, 0) if v.ndim == 3 else v.T
        out[n] = v
    return out


def _strip_buffers(flat: dict) -> dict:
    return {k: v for k, v in flat.items() if k not in ("pitch_mean", "pitch_std")}


def test_torch_name_layout_roundtrip():
    cfg = build_config(AcousticModelConfig, TINY)
    model = AcousticModel(cfg, rngs=nnx.Rngs(0))
    ours = _strip_buffers(model.state_dict())
    torch_style = _to_torch_names(ours)
    # no name collisions and everything covered
    assert len(torch_style) == len(ours)
    back = convert_torch_state(torch_style)
    assert set(back) == set(ours), (
        sorted(set(ours) - set(back))[:5], sorted(set(back) - set(ours))[:5])
    for k in ours:
        np.testing.assert_array_equal(back[k], ours[k], err_msg=k)


def test_torch_pt_checkpoint_load(tmp_path):
    torch = pytest.importorskip("torch")

    cfg = build_config(AcousticModelConfig, TINY)
    model = AcousticModel(cfg, rngs=nnx.Rngs(0))
    torch_state = {k: torch.from_numpy(np.ascontiguousarray(v * 0 + i))
                   for i, (k, v) in enumerate(_to_torch_names(
                       _strip_buffers(model.state_dict())).items())}
    ckpt = {"model": {"config": dict(TINY), "state_dict": torch_state}}
    path = tmp_path / "ref.pt"
    torch.save(ckpt, path)

    from isp_tts_tpu.training.checkpoint import load_checkpoint

    loaded = load_checkpoint(path)
    assert loaded["format"] == "torch"
    converted = convert_torch_state(loaded["model"]["state"])
    model.load_params(converted)
    sd = model.state_dict()
    # each tensor now equals its enumeration constant
    some = [k for k in converted][:5]
    for k in some:
        assert np.all(sd[k] == converted[k])


def test_from_pretrained_on_torch_pt(tmp_path):
    """The README-advertised one-call import: AcousticModel.from_pretrained
    on a reference-format .pt must CONVERT the torch names/layouts (not warn
    them away and return a fresh init) and build with the exact-erf GELU the
    reference's nn.GELU means (base.py:38-56 + interop activation mapping)."""
    torch = pytest.importorskip("torch")

    cfg = build_config(AcousticModelConfig, TINY)
    model = AcousticModel(cfg, rngs=nnx.Rngs(0))
    flat = _strip_buffers(model.state_dict())
    torch_state = {k: torch.from_numpy(np.ascontiguousarray(v))
                   for k, v in _to_torch_names(flat).items()}
    path = tmp_path / "ref.pt"
    torch.save({"model": {"config": dict(TINY), "state_dict": torch_state}}, path)

    loaded = AcousticModel.from_pretrained(path)
    sd = loaded.state_dict()
    for k, v in flat.items():
        np.testing.assert_array_equal(np.asarray(sd[k]), np.asarray(v), err_msg=k)
    # "gelu" in a torch checkpoint means exact erf
    ff = loaded.config.encoder.transformer_layer.feed_forward
    assert ff.activation == "gelu_exact"


def test_from_pretrained_torch_pt_unknown_model(tmp_path):
    """A model class without a torch converter refuses a .pt instead of
    silently fresh-initialising."""
    torch = pytest.importorskip("torch")

    from isp_tts_tpu.models.base import Model

    class Opaque(Model):
        Config = AcousticModelConfig

    path = tmp_path / "x.pt"
    torch.save({"model": {"config": dict(TINY), "state_dict": {}}}, path)
    with pytest.raises(NotImplementedError):
        Opaque.from_pretrained(path)
