"""Reverse interop: export our checkpoints as reference-format torch `.pt`.

Direction coverage:
- torch -> ours is proven by test_reference_parity (forward/infer/loss
  numerical parity through the import converter);
- ours -> torch (this file): `save_torch_checkpoint` writes a container the
  ACTUAL in-tree reference loads via `AcousticModel.from_pretrained`
  (reference base.py:38-56, strict state load), every exported tensor lands
  bit-exact, and re-importing through our own loader reproduces the original
  state bit-for-bit — so with the forward-parity tests, output equivalence
  follows by composition.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_shims import import_reference  # noqa: E402

import_reference()

from flax import nnx  # noqa: E402

from isp_tts_tpu.config import build_config  # noqa: E402
from isp_tts_tpu.models import AcousticModel  # noqa: E402
from isp_tts_tpu.models.acoustic.interop import (  # noqa: E402
    convert_torch_state,
    export_torch_config,
    export_torch_state,
)
from isp_tts_tpu.models.acoustic.model import AcousticModelConfig  # noqa: E402
from isp_tts_tpu.training.checkpoint import (  # noqa: E402
    load_torch_checkpoint,
    save_torch_checkpoint,
)
from test_reference_parity import _cfg  # noqa: E402


@pytest.fixture(scope="module")
def our_model():
    cfg = build_config(AcousticModelConfig, _cfg("gelu_exact"))
    return AcousticModel(cfg, rngs=nnx.Rngs(3))


def test_export_names_cover_reference_model(our_model, tmp_path):
    """Exported keys must be exactly the reference model's parameter set;
    anything we don't ship must be a buffer its from_pretrained auto-fills."""
    from omegaconf import OmegaConf
    from tts.models.acoustic.model import AcousticModel as RefAcousticModel

    torch.manual_seed(0)
    ref = RefAcousticModel.init(OmegaConf.create(_cfg("gelu")))
    ref_keys = set(ref.state_dict().keys())

    exported = export_torch_state(our_model.state_dict())
    unexpected = set(exported) - ref_keys
    assert not unexpected, f"exported keys unknown to the reference: {unexpected}"
    missing = ref_keys - set(exported)
    param_names = {n for n, _ in ref.named_parameters()}
    assert not (missing & param_names), \
        f"reference PARAMETERS not exported: {missing & param_names}"
    # shapes line up torch-side
    ref_shapes = {k: tuple(v.shape) for k, v in ref.state_dict().items()}
    for k, v in exported.items():
        assert tuple(np.shape(v)) == ref_shapes[k], \
            f"{k}: exported {np.shape(v)} vs torch {ref_shapes[k]}"


def test_reference_loads_exported_checkpoint_bit_exact(our_model, tmp_path):
    from tts.models.acoustic.model import AcousticModel as RefAcousticModel

    path = tmp_path / "exported.pt"
    save_torch_checkpoint(our_model, path)
    ref = RefAcousticModel.from_pretrained(str(path))  # strict load

    exported = export_torch_state(our_model.state_dict())
    loaded = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    for k, v in exported.items():
        np.testing.assert_array_equal(
            loaded[k], np.asarray(v), err_msg=f"tensor {k} changed in load")


def test_roundtrip_through_our_loader_is_identity(our_model, tmp_path):
    path = tmp_path / "roundtrip.pt"
    save_torch_checkpoint(our_model, path)

    ckpt = load_torch_checkpoint(path)
    back = convert_torch_state(ckpt["model"]["state"])
    original = our_model.state_dict()
    assert set(back) == set(original), (
        set(back) ^ set(original))
    for k, v in original.items():
        np.testing.assert_array_equal(back[k], np.asarray(v),
                                      err_msg=f"leaf {k} not identical")

    # and a fresh model loaded from the exported file equals the original
    cfg = build_config(AcousticModelConfig, ckpt["model"]["config"])
    fresh = AcousticModel(cfg, rngs=nnx.Rngs(99))
    fresh.load_params(back)
    for k, v in original.items():
        np.testing.assert_array_equal(fresh.state_dict()[k], np.asarray(v))


def test_export_config_activation_mapping():
    cfg = export_torch_config(_cfg("gelu_exact"))
    layer = cfg["encoder"]["transformer_layer"]["feed_forward"]
    assert layer["activation"] == "gelu"
    assert _cfg("gelu_exact")["encoder"]["transformer_layer"][
        "feed_forward"]["activation"] == "gelu_exact"  # input not mutated


def test_export_layout_rules_unit():
    state = {
        "aligner.key_proj.0.conv.kernel": np.zeros((3, 24, 48)),
        "encoder.layers.0.feed_forward.fc1.kernel": np.zeros((24, 48)),
        "encoder.layers.0.attention_norm.norm.scale": np.zeros(24),
        "encoder.norm.scale": np.zeros(24),
        "x.attention_norm.weight.kernel": np.zeros((8, 16)),
        "x.attention_norm.weight.bias": np.zeros(16),
        "text_embedding.embedding": np.zeros((12, 24)),
        "x.attention.rel_pos.log_slopes": np.zeros((2, 1, 1)),
        "pitch_mean": np.float32(170.0),
    }
    out = export_torch_state(state, freq_scale=None)
    assert out["aligner.attention.key_proj.0.conv.weight"].shape == (48, 24, 3)
    assert out["encoder.layers.0.feed_forward.net.0.weight"].shape == (48, 24)
    assert "encoder.layers.0.attention_norm.weight" in out
    assert "encoder.norm.weight" in out  # final norm NOT un-nested
    assert out["x.attention_norm.weight.weight"].shape == (16, 8)
    assert "x.attention_norm.weight.bias" in out
    assert "text_embedding.weight" in out
    assert "x.attention.rel_pos.learned_logslopes" in out
    assert out["pitch_mean"] == np.float32(170.0)
