"""The acoustic model: text -> (align, adapt) -> mel.

Capability parity with reference `tts/models/acoustic/model.py:44-273`:
- text embedding (pad id 0 zero-initialised), ALiBi-MQA transformer encoder
- aligner on detached encoder output (training only)
- optional speaker embedding (xavier init); the reference's training-path
  ``self.speaker_encoder`` attribute bug (:146) is fixed here by intent:
  both paths use ``speaker_embedding`` (the infer path shows the intent, :206)
- flow temporal adaptor (duration/pitch/energy), length regulation
- ALiBi-MQA transformer mel decoder + linear ``to_mel`` head
- registered pitch_mean/pitch_std buffers for inference-time normalization
- ``infer`` control surface: duration_target/factor, pitch target/factor/
  delta/normalize, energy_target, ODE ``steps``, speaker

TPU-first divergences: mel is channel-LAST (B, frames, mel_dim); all shapes
static (text/mel bucket lengths); masks always applied (the reference skips
masks for batch==1); randomness via explicit nnx.Rngs streams.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import nnx

from ...config.registry import build_config
from ...nn.transformer import Transformer, TransformerConfig, _as_dict
from ...utils.masks import get_mask_from_lengths
from ..base import Model
from .adaptor import FlowTemporalAdaptor, FlowTemporalAdaptorConfig, TemporalAdaptorOutput
from .aligner import Aligner, AlignerConfig, AlignerOutput


class AcousticModelOutput(NamedTuple):
    mel: jnp.ndarray  # (B, M, mel_dim)
    adaptor_output: TemporalAdaptorOutput
    aligner_output: AlignerOutput | None


@dataclass
class AcousticModelConfig:
    encoding_map: dict = None  # type: ignore  # injected from the dataset
    mel_dim: int = 80
    text_dim: int = 384
    encoder: TransformerConfig = field(default_factory=TransformerConfig)
    decoder: TransformerConfig = field(default_factory=TransformerConfig)
    temporal_adaptor: FlowTemporalAdaptorConfig = field(default_factory=FlowTemporalAdaptorConfig)
    aligner: AlignerConfig = field(default_factory=AlignerConfig)
    num_speakers: int | None = 0
    pitch_mean: float | None = None
    pitch_std: float | None = None
    #: mel/audio geometry injected from the dataset (sample_rate, n_fft,
    #: hop_length, win_length, f_min, f_max) — makes checkpoints
    #: self-describing for serving-time waveform inversion
    audio_config: dict | None = None


class AcousticModel(Model):
    Config = AcousticModelConfig

    def __init__(self, config: AcousticModelConfig, *, rngs: nnx.Rngs):
        super().__init__()
        if config.encoding_map is None:
            raise ValueError("encoding_map is required (injected from the dataset)")
        cfg = config
        self.config = cfg
        self.encoding_map = dict(cfg.encoding_map)
        self.mel_dim = cfg.mel_dim

        self.text_embedding = nnx.Embed(len(cfg.encoding_map), cfg.text_dim, rngs=rngs)
        # zero the pad row (torch padding_idx=0 semantics)
        self.text_embedding.embedding.value = (
            self.text_embedding.embedding.value.at[0].set(0.0)
        )

        enc_cfg = build_config(TransformerConfig, _as_dict(cfg.encoder), emb_dim=cfg.text_dim)
        self.encoder = Transformer(enc_cfg, rngs=rngs)
        enc_dim = enc_cfg.dim

        self.aligner = Aligner(
            build_config(AlignerConfig, _as_dict(cfg.aligner),
                         mel_dim=cfg.mel_dim, text_dim=enc_dim),
            rngs=rngs,
        )

        num_speakers = cfg.num_speakers or 0
        self.speaker_embedding = (
            nnx.Embed(num_speakers, enc_dim,
                      embedding_init=nnx.initializers.xavier_uniform(), rngs=rngs)
            if num_speakers > 0
            else None
        )

        self.temporal_adaptor = FlowTemporalAdaptor(
            build_config(FlowTemporalAdaptorConfig, _as_dict(cfg.temporal_adaptor),
                         encoder_dim=enc_dim),
            rngs=rngs,
        )

        from ...nn.policy import get_compute_dtype

        dec_cfg = build_config(TransformerConfig, _as_dict(cfg.decoder), emb_dim=enc_dim)
        self.decoder = Transformer(dec_cfg, rngs=rngs)
        self.to_mel = nnx.Linear(dec_cfg.dim, cfg.mel_dim,
                                 dtype=get_compute_dtype(), rngs=rngs)

        # dataset statistics buffers (travel with the checkpoint)
        self.pitch_mean = nnx.Variable(jnp.asarray(cfg.pitch_mean or 0.0, jnp.float32))
        self.pitch_std = nnx.Variable(jnp.asarray(cfg.pitch_std or 1.0, jnp.float32))

    # -- training ------------------------------------------------------------

    def __call__(self, text: jnp.ndarray, text_len: jnp.ndarray, mel: jnp.ndarray,
                 mel_len: jnp.ndarray, pitch: jnp.ndarray | None = None,
                 energy: jnp.ndarray | None = None,
                 speaker: jnp.ndarray | None = None,
                 key: jax.Array | None = None) -> AcousticModelOutput:
        """Training forward.

        Args:
          text: (B, T) int token ids; text_len: (B,).
          mel: (B, M, mel_dim) target mel (channel-last); mel_len: (B,).
          pitch / energy: (B, M) frame-level targets.
          speaker: (B,) speaker ids.
        """
        B, T = text.shape
        M = mel.shape[1]

        token_emb = self.text_embedding(text)
        enc_mask = get_mask_from_lengths(text_len, T)
        enc_out = self.encoder(token_emb, mask=enc_mask).out

        aligner_output = self.aligner(
            mel=mel, enc_text=jax.lax.stop_gradient(enc_out),
            mel_len=mel_len, text_len=text_len,
        )
        duration_target = aligner_output.attn_hard_duration

        if self.speaker_embedding is not None and speaker is not None:
            enc_out = enc_out + self.speaker_embedding(speaker)[:, None, :]

        adaptor_output = self.temporal_adaptor(
            enc_out=enc_out,
            enc_mask=enc_mask,
            max_dec_len=M,
            duration_target=duration_target,
            alignment=aligner_output.attn_soft,
            pitch_target_dense=pitch,
            energy_target_dense=energy,
            key=key,
        )

        dec_mask = get_mask_from_lengths(adaptor_output.dec_lengths, M)
        dec_out = self.decoder(adaptor_output.enc_out, mask=dec_mask).out
        mel_out = self.to_mel(dec_out)
        mel_out = mel_out * dec_mask[..., None].astype(mel_out.dtype)

        return AcousticModelOutput(
            mel=mel_out,
            adaptor_output=adaptor_output,
            aligner_output=aligner_output,
        )

    # -- inference -----------------------------------------------------------

    def infer(self, input_sequence: jnp.ndarray,
              text_lengths: jnp.ndarray | None = None,
              max_dec_len: int = 2048,
              duration_target: jnp.ndarray | None = None,
              duration_factor: float = 1.0,
              pitch_target: jnp.ndarray | None = None,
              pitch_factor: float = 1.0,
              pitch_delta: float = 0.0,
              pitch_normalize: bool = False,
              energy_target: jnp.ndarray | None = None,
              energy_factor: float = 1.0,
              energy_delta: float = 0.0,
              steps: int = 4,
              speaker: jnp.ndarray | None = None,
              key: jax.Array | None = None):
        """Synthesis. Static shapes: (B, T) tokens -> (B, max_dec_len, mel_dim).

        Returns (mel_out, adaptor_output); frame validity is
        ``adaptor_output.dec_lengths``.
        """
        B, T = input_sequence.shape
        if text_lengths is None:
            text_lengths = jnp.full((B,), T, jnp.int32)
        enc_mask = get_mask_from_lengths(text_lengths, T)

        token_emb = self.text_embedding(input_sequence)
        enc_out = self.encoder(token_emb, mask=enc_mask).out

        if self.speaker_embedding is not None and speaker is not None:
            enc_out = enc_out + self.speaker_embedding(speaker)[:, None, :]

        if pitch_normalize:
            if pitch_target is not None:
                pitch_target = (pitch_target - self.pitch_mean.value) / self.pitch_std.value
            pitch_delta = pitch_delta / self.pitch_std.value

        adaptor_output = self.temporal_adaptor.infer(
            enc_out=enc_out,
            enc_mask=enc_mask,
            max_dec_len=max_dec_len,
            duration_target=duration_target,
            duration_factor=duration_factor,
            pitch_target=pitch_target,
            pitch_factor=pitch_factor,
            pitch_delta=pitch_delta,
            energy_target=energy_target,
            energy_factor=energy_factor,
            energy_delta=energy_delta,
            steps=steps,
            key=key,
        )

        dec_mask = get_mask_from_lengths(adaptor_output.dec_lengths, max_dec_len)
        dec_out = self.decoder(adaptor_output.enc_out, mask=dec_mask).out
        mel_out = self.to_mel(dec_out)
        mel_out = mel_out * dec_mask[..., None].astype(mel_out.dtype)
        return mel_out, adaptor_output

    # -- plumbing ------------------------------------------------------------

    @classmethod
    def convert_torch_checkpoint(cls, config: dict, state: dict) -> tuple[dict, dict]:
        """Reference ``.pt`` -> our schema: torch parameter names/layouts via
        the interop converter, and ``activation: gelu`` to our exact-erf
        flavor (the reference's nn.GELU). Makes
        ``AcousticModel.from_pretrained("acoustic_en_ipa.pt")`` a faithful
        one-call import (reference base.py:38-56 contract)."""
        from .interop import convert_torch_state, import_torch_config

        return import_torch_config(config), convert_torch_state(state)

    @staticmethod
    def get_criterion(criterion_cfg: dict):
        from .loss import AcousticModelLoss, AcousticLossConfig

        return AcousticModelLoss(build_config(AcousticLossConfig, criterion_cfg))

    def prepare_inputs(self, batch: dict) -> dict:
        """Map a collated batch dict to forward kwargs
        (parity: reference model.py:245-259)."""
        return {
            "text": batch["text_vector"],
            "text_len": batch["text_vector_len"],
            "mel": batch["mel"],
            "mel_len": batch["mel_len"],
            "pitch": batch.get("pitch"),
            "energy": batch.get("energy"),
            "speaker": batch.get("speaker"),
        }

    @staticmethod
    def inject_data_config(config: dict, dataset) -> dict:
        """Copy vocab + pitch stats from the dataset into the model config
        (parity: reference model.py:261-273)."""
        config["encoding_map"] = dict(dataset.text_provider.coding_table.encoding_map)
        if getattr(dataset, "stats", None) is not None:
            config["pitch_mean"] = float(dataset.stats.pitch.mean)
            config["pitch_std"] = float(dataset.stats.pitch.std)
        spec = getattr(dataset, "spec_provider", None)
        mel = getattr(dataset, "mel_scale_provider", None)
        audio = getattr(dataset, "audio_provider", None)
        if spec is not None and mel is not None and audio is not None:
            config["audio_config"] = {
                "sample_rate": int(audio.config.sample_rate),
                "n_fft": int(spec.config.n_fft),
                "hop_length": int(spec.config.hop_length),
                "win_length": int(spec.config.win_length),
                "f_min": float(mel.config.f_min),
                "f_max": None if mel.config.f_max is None
                else float(mel.config.f_max),
            }
        return config
