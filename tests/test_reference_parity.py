"""Full-model numerical parity against the ACTUAL reference implementation.

The reference PyTorch source (`/root/reference/tts`) is imported in-process
via `reference_shims` (torchaudio/omegaconf/numba/... stand-ins), a tiny
model is randomly initialised in torch, exported with `torch.save` in the
reference checkpoint format (reference base.py:38-56), loaded through
`interop.convert_torch_state`, and `forward` / `infer` outputs are compared
end-to-end (encoder + aligner/MAS + flow adaptor + decoder) to fp32
tolerance. Shared randomness is injected by monkeypatching torch.randn/rand
and jax.random.normal/uniform with shape-keyed fixed draws.

Reference equivalence targets: model.py:116-238, temporal_adaptor.py:104-170.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_shims import import_reference  # noqa: E402

import_reference()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import nnx  # noqa: E402

from isp_tts_tpu.config import build_config  # noqa: E402
from isp_tts_tpu.models import AcousticModel  # noqa: E402
from isp_tts_tpu.models.acoustic.interop import convert_torch_state  # noqa: E402
from isp_tts_tpu.models.acoustic.model import AcousticModelConfig  # noqa: E402

# one config dict drives both sides; the only asymmetric knob is the GELU
# flavor (torch nn.GELU is exact erf -> our "gelu_exact")
B, T, M, MEL, DIM = 2, 7, 20, 16, 24


def _cfg(activation: str) -> dict:
    layer = lambda heads, hd, inner: {  # noqa: E731
        "attention": {"heads": heads, "head_dim": hd, "one_kv_head": True,
                      "alibi_pos_bias": True, "dropout": 0.0},
        "feed_forward": {"inner_dim": inner, "activation": activation}}
    return {
        "encoding_map": {f"c{i}": i for i in range(12)},
        "mel_dim": MEL,
        "text_dim": DIM,
        "encoder": {"dim": DIM, "depth": 2, "transformer_layer": layer(2, 12, 48)},
        "decoder": {"dim": DIM, "depth": 2, "transformer_layer": layer(2, 12, 48)},
        "temporal_adaptor": {
            "predictor": {"time_embedding_dim": 8, "transformer": {
                "dim": 16, "depth": 1, "transformer_layer": layer(2, 8, 32)}},
            "embedding": {"transformer": {
                "dim": 16, "depth": 1, "transformer_layer": layer(2, 8, 32)}},
            "soft_duration": True},
        # aligner dropout must be > 0: the reference ConvBlock1D passes
        # dropout_p=None otherwise and nn.Dropout(None) crashes (latent
        # reference bug; every recipe sets 0.1). Inactive in eval mode.
        "aligner": {"attention_dim": 8, "dropout": 0.1,
                    "key_kernel_size": 3, "query_kernel_size": [3, 3]},
        "num_speakers": 3,
        "pitch_mean": 170.0,
        "pitch_std": 40.0,
    }


class FixedDraws:
    """Shape-keyed fixed random draws shared by both frameworks."""

    def __init__(self, seed=7):
        self.rs = np.random.RandomState(seed)
        self.normals: dict[tuple, np.ndarray] = {}
        self.uniforms: dict[tuple, np.ndarray] = {}

    def normal(self, shape) -> np.ndarray:
        shape = tuple(int(s) for s in shape)
        if shape not in self.normals:
            self.normals[shape] = self.rs.randn(*shape).astype(np.float32)
        return self.normals[shape]

    def uniform(self, shape) -> np.ndarray:
        shape = tuple(int(s) for s in shape)
        if shape not in self.uniforms:
            self.uniforms[shape] = self.rs.rand(*shape).astype(np.float32)
        return self.uniforms[shape]

    def patch_torch(self, monkeypatch):
        monkeypatch.setattr(
            torch, "randn_like",
            lambda x: torch.from_numpy(self.normal(x.shape)).to(x.dtype))
        monkeypatch.setattr(
            torch, "randn",
            lambda *size, **kw: torch.from_numpy(self.normal(size)))
        monkeypatch.setattr(
            torch, "rand",
            lambda *size, **kw: torch.from_numpy(
                self.uniform(size[0] if len(size) == 1 and
                             isinstance(size[0], (tuple, list, torch.Size))
                             else size)))

    def patch_jax(self, monkeypatch):
        monkeypatch.setattr(
            jax.random, "normal",
            lambda key, shape=(), dtype=jnp.float32: jnp.asarray(
                self.normal(shape), dtype))
        monkeypatch.setattr(
            jax.random, "uniform",
            lambda key, shape=(), dtype=jnp.float32, **kw: jnp.asarray(
                self.uniform(shape), dtype))


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    """(reference torch model, our model loaded from its torch.save file)."""
    from omegaconf import OmegaConf
    from tts.models.acoustic.model import AcousticModel as RefAcousticModel

    # the reference CPU MAS mutates attn_logits IN PLACE (mas_width1 writes
    # into log_p, and .detach().cpu().numpy() shares storage on CPU —
    # alignment.py:303-312), corrupting the logits the CTC loss then reads.
    # The CUDA path clones first (alignment.py:322), so the GPU-trained
    # semantics are uncorrupted logits; give the CPU path the same clone.
    import tts.modules.aligner as ref_aligner_pkg

    orig_b_mas = ref_aligner_pkg.b_mas
    ref_aligner_pkg.b_mas = lambda a, in_lens, out_lens: orig_b_mas(
        a.copy(), in_lens, out_lens)

    torch.manual_seed(0)
    ref = RefAcousticModel.init(OmegaConf.create(_cfg("gelu")))
    ref.eval()
    # reference forward calls the nonexistent `speaker_encoder` and forgets
    # the (B, 1, D) broadcast (model.py:146, known bug — SURVEY §7); alias
    # the documented intent (the infer path, model.py:206-207)
    ref.speaker_encoder = lambda s: ref.speaker_embedding(s).unsqueeze(1)

    path = tmp_path_factory.mktemp("ref_ckpt") / "reference.pt"
    torch.save({"model": {"config": _cfg("gelu"), "state_dict": ref.state_dict()}}, path)

    from isp_tts_tpu.training.checkpoint import load_checkpoint

    loaded = load_checkpoint(path)
    assert loaded["format"] == "torch"
    ours = AcousticModel(build_config(AcousticModelConfig, _cfg("gelu_exact")),
                         rngs=nnx.Rngs(0))
    missing = ours.load_params(convert_torch_state(loaded["model"]["state"]))
    assert not missing, missing
    ours.eval()
    return ref, ours


def _forward_inputs():
    rs = np.random.RandomState(3)
    return {
        "text": rs.randint(1, 12, (B, T)).astype(np.int64),
        "text_len": np.array([T, T - 2], np.int64),
        "mel": rs.randn(B, MEL, M).astype(np.float32),  # torch layout (B, C, M)
        "mel_len": np.array([M, M - 5], np.int64),
        "pitch": rs.randn(B, M).astype(np.float32),
        "energy": rs.rand(B, M).astype(np.float32),
        "speaker": np.array([0, 2], np.int64),
    }


def test_forward_parity(models, monkeypatch):
    ref, ours = models
    inp = _forward_inputs()
    draws = FixedDraws()
    draws.patch_torch(monkeypatch)
    draws.patch_jax(monkeypatch)

    with torch.no_grad():
        ref_out = ref(
            text=torch.from_numpy(inp["text"]),
            text_len=torch.from_numpy(inp["text_len"]),
            mel=torch.from_numpy(inp["mel"]),
            mel_len=torch.from_numpy(inp["mel_len"]),
            pitch=torch.from_numpy(inp["pitch"]),
            energy=torch.from_numpy(inp["energy"]),
            speaker=torch.from_numpy(inp["speaker"]),
        )

    our_out = ours(
        text=jnp.asarray(inp["text"], jnp.int32),
        text_len=jnp.asarray(inp["text_len"], jnp.int32),
        mel=jnp.asarray(inp["mel"].transpose(0, 2, 1)),  # ours channel-last
        mel_len=jnp.asarray(inp["mel_len"], jnp.int32),
        pitch=jnp.asarray(inp["pitch"]),
        energy=jnp.asarray(inp["energy"]),
        speaker=jnp.asarray(inp["speaker"], jnp.int32),
        key=jax.random.PRNGKey(0),  # unused: draws are patched
    )

    # aligner: soft attention, MAS binarization, durations
    np.testing.assert_allclose(
        np.asarray(our_out.aligner_output.attn_soft),
        ref_out.aligner_output.attn_soft.squeeze(1).numpy(), atol=1e-5,
        err_msg="attn_soft")
    np.testing.assert_array_equal(
        np.asarray(our_out.aligner_output.attn_hard),
        ref_out.aligner_output.attn_hard.squeeze(1).numpy(), err_msg="attn_hard (MAS)")
    np.testing.assert_array_equal(
        np.asarray(our_out.aligner_output.attn_hard_duration),
        ref_out.aligner_output.attn_hard_duration.numpy(), err_msg="durations")

    # flow loss with shared x0/t draws
    np.testing.assert_allclose(
        float(our_out.adaptor_output.losses["flow_loss"]),
        float(ref_out.adaptor_output.losses["flow_loss"]), atol=1e-4,
        err_msg="flow_loss")

    # end-to-end mel (decoder output), masked identically
    np.testing.assert_allclose(
        np.asarray(our_out.mel),
        ref_out.mel.transpose(1, 2).numpy(), atol=1e-4, err_msg="mel")


def test_infer_parity(models, monkeypatch):
    ref, ours = models
    rs = np.random.RandomState(11)
    text = rs.randint(1, 12, (1, T)).astype(np.int64)
    draws = FixedDraws(seed=13)
    draws.patch_torch(monkeypatch)
    draws.patch_jax(monkeypatch)

    with torch.no_grad():
        ref_mel, ref_adaptor = ref.infer(
            torch.from_numpy(text), steps=4, speaker=torch.tensor([1]),
            pitch_factor=1.1, pitch_delta=0.2, duration_factor=1.25)

    max_dec_len = 64
    our_mel, our_adaptor = ours.infer(
        jnp.asarray(text, jnp.int32), max_dec_len=max_dec_len, steps=4,
        speaker=jnp.asarray([1], jnp.int32),
        pitch_factor=1.1, pitch_delta=0.2, duration_factor=1.25,
        key=jax.random.PRNGKey(0))

    np.testing.assert_allclose(
        np.asarray(our_adaptor.duration), ref_adaptor.duration.numpy(),
        atol=1e-4, err_msg="predicted durations")
    L = int(ref_mel.shape[2])
    assert int(our_adaptor.dec_lengths[0]) == L
    assert L <= max_dec_len
    np.testing.assert_allclose(
        np.asarray(our_adaptor.pitch), ref_adaptor.pitch.numpy(), atol=1e-4,
        err_msg="pitch")
    np.testing.assert_allclose(
        np.asarray(our_mel[:, :L]), ref_mel.transpose(1, 2).numpy(),
        atol=1e-4, err_msg="infer mel")


def test_loss_parity(models, monkeypatch):
    """The 4-term criterion against the reference AcousticModelLoss (incl.
    nn.CTCLoss semantics) on identical forward outputs."""
    from tts.models.acoustic.loss import AcousticModelLoss as RefLoss

    from isp_tts_tpu.models.acoustic.loss import AcousticLossConfig, AcousticModelLoss

    ref, ours = models
    inp = _forward_inputs()
    draws = FixedDraws()
    draws.patch_torch(monkeypatch)
    draws.patch_jax(monkeypatch)

    with torch.no_grad():
        ref_out = ref(
            text=torch.from_numpy(inp["text"]),
            text_len=torch.from_numpy(inp["text_len"]),
            mel=torch.from_numpy(inp["mel"]),
            mel_len=torch.from_numpy(inp["mel_len"]),
            pitch=torch.from_numpy(inp["pitch"]),
            energy=torch.from_numpy(inp["energy"]),
            speaker=torch.from_numpy(inp["speaker"]),
        )
        ref_criterion = RefLoss.init()
        ref_inputs = {
            "text": torch.from_numpy(inp["text"]),
            "text_len": torch.from_numpy(inp["text_len"]),
            "mel": torch.from_numpy(inp["mel"]),
            "mel_len": torch.from_numpy(inp["mel_len"]),
        }
        ref_loss, ref_losses = ref_criterion(ref_inputs, ref_out, step=1000)

    our_out = ours(
        text=jnp.asarray(inp["text"], jnp.int32),
        text_len=jnp.asarray(inp["text_len"], jnp.int32),
        mel=jnp.asarray(inp["mel"].transpose(0, 2, 1)),
        mel_len=jnp.asarray(inp["mel_len"], jnp.int32),
        pitch=jnp.asarray(inp["pitch"]),
        energy=jnp.asarray(inp["energy"]),
        speaker=jnp.asarray(inp["speaker"], jnp.int32),
        key=jax.random.PRNGKey(0),
    )
    our_criterion = AcousticModelLoss(build_config(AcousticLossConfig, {}))
    our_inputs = {
        "text": jnp.asarray(inp["text"], jnp.int32),
        "text_len": jnp.asarray(inp["text_len"], jnp.int32),
        "mel": jnp.asarray(inp["mel"].transpose(0, 2, 1)),
        "mel_len": jnp.asarray(inp["mel_len"], jnp.int32),
    }
    our_loss, our_losses = our_criterion(our_inputs, our_out, step=1000)

    ref_map = {"model/mel_loss": None, "adaptor/flow_loss": None,
               "aligner/attention_loss": None, "aligner/kl_loss": None}
    for key in ref_map:
        assert key in ref_losses and key in our_losses, (key, ref_losses, our_losses)
        np.testing.assert_allclose(
            float(our_losses[key]), float(ref_losses[key]), atol=2e-4,
            err_msg=key)
    np.testing.assert_allclose(float(our_loss), float(ref_loss), atol=5e-4)


@pytest.mark.slow
def test_parity_harness_self_test():
    """tools/parity_vs_pretrained.py --self-test: the one-command harness for
    real pretrained checkpoints stays runnable (it patches torch/jax RNG
    module-globally, so it runs as a subprocess)."""
    import subprocess
    import sys
    from pathlib import Path

    tool = Path(__file__).resolve().parent.parent / "tools" / "parity_vs_pretrained.py"
    proc = subprocess.run([sys.executable, str(tool), "--self-test"],
                          capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PARITY: PASS" in proc.stdout
