"""Parity test for the torch-Vocos vocoder interop.

Builds an independent torch implementation of the official Vocos mel
generator (ConvNeXt backbone + ISTFT head with "same" padding — the
architecture of the reference's external ``vocos_ms_fp16.pts`` artifact,
/root/reference/notebooks/inference.ipynb cells 6-7), randomly initializes
it, saves the checkpoint under the official parameter names, loads it
through :func:`isp_tts_tpu.models.vocoder.interop.load_torch_vocoder`, and
asserts the waveforms agree.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from isp_tts_tpu.models.vocoder.interop import (  # noqa: E402
    convert_vocos_state, export_vocos_state, infer_generator_config,
    load_torch_vocoder, save_torch_vocoder)

N_MELS, DIM, INTER, LAYERS, N_FFT, HOP = 6, 12, 20, 2, 16, 4


class TorchConvNeXtBlock(nn.Module):
    def __init__(self, dim, intermediate_dim, layer_scale):
        super().__init__()
        self.dwconv = nn.Conv1d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, intermediate_dim)
        self.act = nn.GELU()  # exact erf
        self.pwconv2 = nn.Linear(intermediate_dim, dim)
        self.gamma = nn.Parameter(layer_scale * torch.ones(dim))

    def forward(self, x):  # (B, C, T)
        residual = x
        x = self.dwconv(x)
        x = x.transpose(1, 2)
        x = self.norm(x)
        x = self.pwconv1(x)
        x = self.act(x)
        x = self.pwconv2(x)
        x = self.gamma * x
        return residual + x.transpose(1, 2)


class TorchBackbone(nn.Module):
    def __init__(self):
        super().__init__()
        self.embed = nn.Conv1d(N_MELS, DIM, 7, padding=3)
        self.norm = nn.LayerNorm(DIM, eps=1e-6)
        self.convnext = nn.ModuleList(
            [TorchConvNeXtBlock(DIM, INTER, 1.0 / LAYERS) for _ in range(LAYERS)])
        self.final_layer_norm = nn.LayerNorm(DIM, eps=1e-6)

    def forward(self, x):  # (B, n_mels, T) -> (B, T, C)
        x = self.embed(x)
        x = self.norm(x.transpose(1, 2)).transpose(1, 2)
        for block in self.convnext:
            x = block(x)
        return self.final_layer_norm(x.transpose(1, 2))


def istft_same(spec, n_fft, hop):
    """Official-Vocos "same"-padding ISTFT: irfft -> window -> overlap-add
    -> window-square envelope normalization -> crop (win - hop)/2."""
    win = torch.hann_window(n_fft)
    frames = torch.fft.irfft(spec, n_fft, dim=1) * win[None, :, None]
    B, _, T = frames.shape
    out_len = (T - 1) * hop + n_fft
    y = torch.zeros(B, out_len)
    env = torch.zeros(out_len)
    for t in range(T):
        y[:, t * hop:t * hop + n_fft] += frames[:, :, t]
        env[t * hop:t * hop + n_fft] += win * win
    pad = (n_fft - hop) // 2
    return (y / env.clamp_min(1e-11))[:, pad:out_len - pad]


class TorchISTFTHead(nn.Module):
    def __init__(self):
        super().__init__()
        self.out = nn.Linear(DIM, N_FFT + 2)

    def forward(self, x):  # (B, T, C) -> (B, T * hop)
        h = self.out(x).transpose(1, 2)
        mag, p = h.chunk(2, dim=1)
        mag = torch.exp(mag).clip(max=1e2)
        spec = mag * (torch.cos(p) + 1j * torch.sin(p))
        return istft_same(spec, N_FFT, HOP)


class TorchVocos(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TorchBackbone()
        self.head = TorchISTFTHead()

    def forward(self, mel):
        return self.head(self.backbone(mel))


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(7)
    model = TorchVocos().eval()
    # non-trivial magnitudes: default-init head output is near 0 everywhere,
    # which would under-test the exp/clip path
    with torch.no_grad():
        model.head.out.bias += torch.linspace(-1.5, 1.5, N_FFT + 2)
    return model


@pytest.fixture(scope="module")
def mel():
    rng = np.random.default_rng(3)
    return rng.normal(size=(2, N_MELS, 9)).astype(np.float32)


def test_config_inference(torch_model):
    flat = convert_vocos_state(torch_model.state_dict())
    cfg = infer_generator_config(flat, hop_length=HOP)
    assert cfg["n_mels"] == N_MELS and cfg["dim"] == DIM
    assert cfg["intermediate_dim"] == INTER and cfg["num_layers"] == LAYERS
    assert cfg["n_fft"] == N_FFT and cfg["gelu"] == "exact"
    assert cfg["min_log_mag"] is None


def test_state_dict_parity(torch_model, mel, tmp_path):
    """torch.save'd state dict -> load_torch_vocoder -> identical waveform."""
    path = tmp_path / "vocos_tiny.bin"
    torch.save(torch_model.state_dict(), path)
    model = load_torch_vocoder(path, hop_length=HOP)
    model.eval()

    with torch.inference_mode():
        want = torch_model(torch.from_numpy(mel)).numpy()
    got = np.asarray(model.infer(np.transpose(mel, (0, 2, 1))))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)


def test_torchscript_parity(torch_model, mel, tmp_path):
    """The reference's format: torch.jit traced/saved module (.pts)."""
    path = tmp_path / "vocos_tiny.pts"
    with torch.inference_mode():
        scripted = torch.jit.trace(torch_model, torch.from_numpy(mel))
        torch.jit.save(scripted, str(path))
        want = torch_model(torch.from_numpy(mel)).numpy()

    model = load_torch_vocoder(path, hop_length=HOP)
    model.eval()
    got = np.asarray(model.infer(np.transpose(mel, (0, 2, 1))))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)


def test_fp16_weights(torch_model, mel, tmp_path):
    """The reference artifact is fp16 (vocos_ms_fp16.pts): half-precision
    weights load and produce close-to-f32 output."""
    path = tmp_path / "vocos_half.bin"
    torch.save({k: v.half() for k, v in torch_model.state_dict().items()}, path)
    model = load_torch_vocoder(path, hop_length=HOP)
    model.eval()
    with torch.inference_mode():
        want = torch_model(torch.from_numpy(mel)).numpy()
    got = np.asarray(model.infer(np.transpose(mel, (0, 2, 1))))
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=0)


@pytest.fixture(scope="module")
def our_model():
    """A VocoderModel built with the official torch semantics (exact GELU,
    upper-only magnitude clip) at the tiny test dims."""
    from flax import nnx

    from isp_tts_tpu.config.registry import build_config
    from isp_tts_tpu.models.vocoder.model import VocoderModel, VocoderModelConfig

    config = build_config(VocoderModelConfig, {
        "generator": {
            "n_mels": N_MELS, "dim": DIM, "intermediate_dim": INTER,
            "num_layers": LAYERS, "n_fft": N_FFT, "hop_length": HOP,
            "gelu": "exact", "max_log_mag": float(np.log(100.0)),
            "min_log_mag": None,
        },
        "features": {
            "sample_rate": 160, "n_fft": N_FFT, "hop_length": HOP,
            "win_length": N_FFT, "n_mels": N_MELS, "f_min": 0.0, "f_max": 80.0,
        },
    })
    return VocoderModel(config, rngs=nnx.Rngs(11))


def test_export_roundtrip_identity(our_model):
    """export -> convert is an identity on every generator tensor."""
    state = our_model.state_dict()
    gen = {k: v for k, v in state.items() if k.startswith("generator.")}
    back = convert_vocos_state(export_vocos_state(state))
    assert set(back) == set(gen)
    for key, want in gen.items():
        np.testing.assert_array_equal(back[key], np.asarray(want), err_msg=key)


def test_export_loads_into_torch_vocos(our_model, mel, tmp_path):
    """save_torch_vocoder -> strict torch load -> identical waveform: a
    generator trained here serves from the reference's torch stack."""
    path = tmp_path / "exported_vocos.bin"
    save_torch_vocoder(our_model, path)

    torch_model = TorchVocos()
    missing, unexpected = torch_model.load_state_dict(
        torch.load(path, weights_only=True), strict=True)
    assert not missing and not unexpected
    torch_model.eval()

    our_model.eval()
    got = np.asarray(our_model.infer(np.transpose(mel, (0, 2, 1))))
    with torch.inference_mode():
        want = torch_model(torch.from_numpy(mel)).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)


def test_export_fp16_reimports(our_model, tmp_path):
    """fp16 export (the reference artifact's precision) reloads through
    load_torch_vocoder with half-precision tolerance."""
    path = tmp_path / "exported_fp16.bin"
    save_torch_vocoder(our_model, path, fp16=True)
    blob = torch.load(path, weights_only=True)
    assert all(v.dtype == torch.float16 for v in blob.values())
    model = load_torch_vocoder(path, hop_length=HOP)
    ours = {k: np.asarray(v) for k, v in our_model.state_dict().items()
            if k.startswith("generator.")}
    theirs = model.state_dict()
    for key, want in ours.items():
        np.testing.assert_allclose(
            np.asarray(theirs[key]), want, atol=1e-3, rtol=1e-3, err_msg=key)


def test_unrecognized_checkpoint_raises(tmp_path):
    path = tmp_path / "other.bin"
    torch.save({"encoder.w": torch.zeros(3, 3)}, path)
    with pytest.raises(ValueError, match="no Vocos backbone"):
        load_torch_vocoder(path)


def test_pickled_module_rejected_without_code_execution(tmp_path):
    """A non-TorchScript file that needs full unpickling (e.g. a pickled
    nn.Module — or a malicious payload) must be REJECTED, not loaded with
    weights_only=False: that would execute arbitrary code from a
    user-supplied --vocoder path."""
    path = tmp_path / "module.pt"
    torch.save(torch.nn.Linear(2, 2), path)  # stand-in for untrusted pickle
    with pytest.raises(ValueError, match="state_dict"):
        load_torch_vocoder(path)
