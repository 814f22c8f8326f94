"""Vocos-architecture neural vocoder: log-mel -> waveform.

Capability target: the reference's external ``vocos_ms_fp16.pts`` TorchScript
vocoder (`/root/reference/notebooks/inference.ipynb` cells 6-7, 23-25 —
13.45M params, ``vocoder.infer(mel.half())`` -> 22.05 kHz waveform), rebuilt
as an in-repo, trainable, TPU-first model:

- **ConvNeXt-1D backbone** (Vocos / ConvNeXt): depthwise conv k=7 ->
  LayerNorm -> pointwise 4x expansion -> GELU -> pointwise projection ->
  layer-scale residual. Channel-last (B, T, C); the pointwise layers are
  (T x C) @ (C x 4C) matmuls that tile straight onto the MXU, which is where
  ~95% of the FLOPs live.
- **ISTFT head**: Linear(dim -> n_fft + 2) predicting log-magnitude and
  phase angle per frame; waveform synthesis via the real-matmul iSTFT
  (:func:`ops.vocoder.istft_matmul`) — no complex dtypes, TPU-native.
- One frame of mel -> ``hop_length`` samples; all shapes static.

Default hyperparameters (dim 512, intermediate 1536, 8 blocks) land at
~13.4M generator params — the reference vocoder's scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...config.registry import build_config
from ...ops.vocoder import istft_matmul, log_mel_matmul
from ..base import Model
from .discriminator import VocoderDiscriminator, VocoderDiscriminatorConfig


class VocoderOutput(NamedTuple):
    audio_fake: jnp.ndarray  # (B, S) generated waveform
    mel: jnp.ndarray  # (B, T, n_mels) log-mel of the real audio (model input)


@dataclass
class MelFeatureConfig:
    """STFT/mel contract — MUST match the acoustic model's data providers so
    a trained vocoder consumes the acoustic model's mel output directly."""
    sample_rate: int = 22050
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mels: int = 80
    f_min: float = 0.0
    f_max: float | None = 8000.0


@dataclass
class VocosGeneratorConfig:
    n_mels: int = 80
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    n_fft: int = 1024
    hop_length: int = 256
    #: layer-scale init (ConvNeXt); 1/num_layers keeps deep stacks stable
    layer_scale_init: float | None = None
    #: log-magnitude clip before exp (Vocos clips at 1e2 after exp)
    max_log_mag: float = 4.6  # exp(4.6) ~ 99.5
    #: lower log-magnitude clip; None = no lower clip (official Vocos clips
    #: only the upper side — interop-loaded checkpoints set this to None)
    min_log_mag: float | None = -4.6
    #: "tanh" (default, cheaper on TPU) or "exact" (erf — torch nn.GELU();
    #: required for numerical parity with torch-trained Vocos weights)
    gelu: str = "tanh"


class ConvNeXtBlock(nnx.Module):
    def __init__(self, dim: int, intermediate_dim: int, layer_scale: float,
                 *, gelu_approximate: bool = True, rngs: nnx.Rngs):
        from ...nn.policy import get_compute_dtype

        dtype = get_compute_dtype()
        self.dwconv = nnx.Conv(dim, dim, (7,), padding="SAME",
                               feature_group_count=dim, dtype=dtype, rngs=rngs)
        self.norm = nnx.LayerNorm(dim, epsilon=1e-6, dtype=dtype, rngs=rngs)
        self.pwconv1 = nnx.Linear(dim, intermediate_dim, dtype=dtype, rngs=rngs)
        self.pwconv2 = nnx.Linear(intermediate_dim, dim, dtype=dtype, rngs=rngs)
        self.gamma = nnx.Param(jnp.full((dim,), layer_scale, jnp.float32))
        self._gelu_approximate = gelu_approximate

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        x = self.dwconv(x)
        x = self.norm(x)
        x = self.pwconv1(x)
        x = jax.nn.gelu(x, approximate=self._gelu_approximate)
        x = self.pwconv2(x)
        return residual + self.gamma.value.astype(x.dtype) * x


class VocosGenerator(nnx.Module):
    def __init__(self, config: VocosGeneratorConfig, *, rngs: nnx.Rngs):
        from ...nn.policy import get_compute_dtype

        cfg = config
        self.config = cfg
        dtype = get_compute_dtype()
        scale = cfg.layer_scale_init
        if scale is None:
            scale = 1.0 / cfg.num_layers

        self.embed = nnx.Conv(cfg.n_mels, cfg.dim, (7,), padding="SAME",
                              dtype=dtype, rngs=rngs)
        self.norm_pre = nnx.LayerNorm(cfg.dim, epsilon=1e-6, dtype=dtype, rngs=rngs)
        self.blocks = nnx.List([
            ConvNeXtBlock(cfg.dim, cfg.intermediate_dim, scale,
                          gelu_approximate=(cfg.gelu != "exact"), rngs=rngs)
            for _ in range(cfg.num_layers)
        ])
        self.norm_post = nnx.LayerNorm(cfg.dim, epsilon=1e-6, dtype=dtype, rngs=rngs)
        # head stays f32: exp() of a bf16 log-magnitude costs audible noise
        self.head = nnx.Linear(cfg.dim, cfg.n_fft + 2, rngs=rngs)

    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """(B, T, n_mels) log-mel -> (B, T * hop_length) waveform."""
        cfg = self.config
        x = self.embed(mel)
        x = self.norm_pre(x)
        for block in self.blocks:
            x = block(x)
        x = self.norm_post(x)
        h = self.head(x.astype(jnp.float32))  # (B, T, n_fft + 2)

        n_freqs = cfg.n_fft // 2 + 1
        log_mag = jnp.minimum(h[..., :n_freqs], cfg.max_log_mag)
        if cfg.min_log_mag is not None:
            log_mag = jnp.maximum(log_mag, cfg.min_log_mag)
        phase = h[..., n_freqs:]
        mag = jnp.exp(log_mag)
        spec_re = jnp.swapaxes(mag * jnp.cos(phase), -1, -2)  # (B, F, T)
        spec_im = jnp.swapaxes(mag * jnp.sin(phase), -1, -2)

        audio, _ = istft_matmul(spec_re, spec_im, cfg.n_fft, cfg.hop_length,
                                cfg.n_fft)
        # crop the analysis centering pad: T frames <-> T * hop samples
        pad = (cfg.n_fft - cfg.hop_length) // 2
        return audio[..., pad:audio.shape[-1] - pad]


@dataclass
class VocoderModelConfig:
    generator: VocosGeneratorConfig = field(default_factory=VocosGeneratorConfig)
    discriminator: VocoderDiscriminatorConfig = field(
        default_factory=VocoderDiscriminatorConfig)
    features: MelFeatureConfig = field(default_factory=MelFeatureConfig)


class VocoderModel(Model):
    """Generator + discriminators under one ``Model`` (one checkpoint file
    carries both; ``infer``/serving touch only the generator).

    Trained by :class:`training.gan_trainer.GANTrainer` (selected via the
    ``TRAINER`` class attribute) — the criterion is :class:`VocoderGANLoss`.
    """

    Config = VocoderModelConfig
    TRAINER = "gan"

    def __init__(self, config: VocoderModelConfig, *, rngs: nnx.Rngs):
        super().__init__()
        cfg = config
        self.config = cfg
        gen_cfg = build_config(VocosGeneratorConfig, _cfg_dict(cfg.generator),
                               n_mels=_get(cfg.features, "n_mels"),
                               n_fft=_get(cfg.features, "n_fft"),
                               hop_length=_get(cfg.features, "hop_length"))
        self.generator = VocosGenerator(gen_cfg, rngs=rngs)
        self.discriminator = VocoderDiscriminator(
            build_config(VocoderDiscriminatorConfig, _cfg_dict(cfg.discriminator)),
            rngs=rngs)
        self.features_config = build_config(MelFeatureConfig, _cfg_dict(cfg.features))

    # -- feature extraction (on-device, jit-safe) -----------------------------

    def features(self, audio: jnp.ndarray) -> jnp.ndarray:
        """(B, S) waveform -> (B, S / hop, n_mels) log-mel, computed with the
        matmul DFT so it runs inside the TPU train step."""
        f = self.features_config
        return log_mel_matmul(audio, f.sample_rate, f.n_fft, f.hop_length,
                              f.win_length, f.n_mels, f.f_min, f.f_max)

    # -- training forward ------------------------------------------------------

    def __call__(self, audio: jnp.ndarray,
                 mel: jnp.ndarray | None = None) -> VocoderOutput:
        """``mel`` overrides the generator's input (acoustic-model-predicted
        mels for the joint fine-tune, tools/joint_finetune.py); the returned
        ``mel`` is always the REAL audio's — the reconstruction target."""
        target = jax.lax.stop_gradient(self.features(audio))
        fake = self.generator(target if mel is None else mel)
        return VocoderOutput(audio_fake=fake, mel=target)

    # -- inference -------------------------------------------------------------

    def infer(self, mel: jnp.ndarray) -> jnp.ndarray:
        """(B, T, n_mels) log-mel -> (B, T * hop) waveform (the reference's
        ``vocoder.infer(mel)`` contract, inference.ipynb cell 23)."""
        return self.generator(mel)

    # -- plumbing ----------------------------------------------------------------

    @classmethod
    def from_pretrained(cls, path, **kwargs):
        """Load an isp_tts_tpu ``.ckpt``, or a torch Vocos checkpoint
        (TorchScript ``.pts``/``.pt`` or a state-dict ``.bin``/``.pth`` — the
        reference's external vocoder artifact) via
        :mod:`~isp_tts_tpu.models.vocoder.interop`."""
        from pathlib import Path as _P

        if _P(path).suffix in (".pt", ".pts", ".pth", ".bin"):
            from .interop import load_torch_vocoder

            return load_torch_vocoder(path, **kwargs)
        return super().from_pretrained(path, **kwargs)

    @classmethod
    def convert_torch_checkpoint(cls, config: dict, state: dict):
        """Torch Vocos state dict -> our (config, flat state); the hook the
        Trainer's warm-start path dispatches to for torch ``.pt`` files
        (mirrors ``from_pretrained``'s ``load_torch_vocoder`` route)."""
        from .interop import convert_vocos_state, infer_generator_config

        flat = convert_vocos_state(state)
        if "generator.embed.kernel" not in flat:
            raise ValueError(
                "torch checkpoint has no Vocos backbone; cannot convert "
                f"(keys: {sorted(state)[:5]}...)")
        feats = dict((config or {}).get("features") or {})
        hop = int(feats.get("hop_length", 256))
        gen_cfg = infer_generator_config(flat, hop)
        feats = {
            "sample_rate": int(feats.get("sample_rate", 22050)),
            "n_fft": gen_cfg["n_fft"],
            "hop_length": hop,
            "win_length": gen_cfg["n_fft"],
            "n_mels": gen_cfg["n_mels"],
            "f_min": float(feats.get("f_min", 0.0)),
            "f_max": feats.get("f_max", 8000.0),
        }
        return {"generator": gen_cfg, "features": feats}, flat

    def prepare_inputs(self, batch: dict) -> dict:
        out = {"audio": batch["audio"]}
        if "mel" in batch:  # paired predicted-mel fine-tune
            out["mel"] = batch["mel"]
        return out

    @staticmethod
    def inject_data_config(config: dict, dataset) -> dict:
        feats = dict(config.get("features") or {})
        sr = getattr(getattr(dataset, "audio_provider", None), "config", None)
        if sr is not None and "sample_rate" not in feats:
            feats["sample_rate"] = sr.sample_rate
        config["features"] = feats
        return config


def _cfg_dict(cfg) -> dict:
    if cfg is None:
        return {}
    if isinstance(cfg, dict):
        return {k: v for k, v in cfg.items() if not k.startswith("_")}
    import dataclasses as dc

    return {f.name: getattr(cfg, f.name) for f in dc.fields(cfg)}


def _get(cfg, name):
    if isinstance(cfg, dict):
        return cfg.get(name, getattr(MelFeatureConfig, name))
    return getattr(cfg, name)
