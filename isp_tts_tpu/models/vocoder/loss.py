"""Vocoder GAN losses: adversarial + feature-matching + mel reconstruction.

The standard HiFi-GAN/Vocos training objective (the reference repo trains no
vocoder — see models/vocoder/__init__.py):

- generator:  L_adv(G) + fm_weight * L_fm + mel_weight * L_mel
- discriminator: L_adv(D)

``adversarial`` selects LSGAN (least-squares, HiFi-GAN) or hinge (Vocos).
The mel loss is L1 on log-mel computed with the TPU matmul front-end
(:func:`ops.vocoder.log_mel_matmul`) so the full objective differentiates
inside one jitted step on device.

The class also implements the plain ``criterion(inputs, outputs, step)``
trainer contract for EVAL batches (generator-only reconstruction metrics),
so the base Trainer's eval loop works unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ...ops.vocoder import log_mel_matmul


@dataclass
class VocoderGANLossConfig:
    mel_weight: float = 45.0
    fm_weight: float = 2.0
    adversarial: str = "lsgan"  # or "hinge"
    #: mel contract for the reconstruction loss; injected from the model's
    #: features config by the GANTrainer when left None
    sample_rate: int = 22050
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mels: int = 80
    f_min: float = 0.0
    f_max: float | None = 8000.0


class VocoderGANLoss:
    Config = VocoderGANLossConfig

    def __init__(self, config: VocoderGANLossConfig | None = None, **kw):
        self.config = config or VocoderGANLossConfig(**kw)

    # -- shared ---------------------------------------------------------------

    def _mel(self, audio: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        return log_mel_matmul(audio, c.sample_rate, c.n_fft, c.hop_length,
                              c.win_length, c.n_mels, c.f_min, c.f_max)

    def mel_loss(self, fake: jnp.ndarray, mel_real: jnp.ndarray) -> jnp.ndarray:
        return jnp.mean(jnp.abs(self._mel(fake) - mel_real))

    # -- discriminator side -----------------------------------------------------

    def disc_loss(self, discriminator, real: jnp.ndarray, fake: jnp.ndarray):
        """Fake must already be stop-gradiented by the caller."""
        logits_r, _ = discriminator(real)
        logits_f, _ = discriminator(fake)
        kind = self.config.adversarial
        loss = jnp.float32(0.0)
        for lr, lf in zip(logits_r, logits_f):
            lr, lf = lr.astype(jnp.float32), lf.astype(jnp.float32)
            if kind == "lsgan":
                loss += jnp.mean((1.0 - lr) ** 2) + jnp.mean(lf ** 2)
            elif kind == "hinge":
                loss += jnp.mean(jax.nn.relu(1.0 - lr)) + jnp.mean(jax.nn.relu(1.0 + lf))
            else:
                raise KeyError(f"Unknown adversarial loss {kind!r}")
        metrics = {"losses/disc": loss}
        return loss, metrics

    # -- generator side ----------------------------------------------------------

    def gen_loss(self, discriminator, real: jnp.ndarray, fake: jnp.ndarray,
                 mel_real: jnp.ndarray):
        """Adversarial + feature matching + mel; ``discriminator`` is a
        constant w.r.t. the diffed generator (its params receive no grads —
        the GANTrainer diffs only the generator argument)."""
        cfg = self.config
        logits_f, feats_f = discriminator(fake)
        _, feats_r = discriminator(jax.lax.stop_gradient(real))

        adv = jnp.float32(0.0)
        for lf in logits_f:
            lf = lf.astype(jnp.float32)
            if cfg.adversarial == "lsgan":
                adv += jnp.mean((1.0 - lf) ** 2)
            elif cfg.adversarial == "hinge":
                adv += -jnp.mean(lf)
            else:
                raise KeyError(f"Unknown adversarial loss {cfg.adversarial!r}")

        fm = jnp.float32(0.0)
        for fr_list, ff_list in zip(feats_r, feats_f):
            for fr, ff in zip(fr_list, ff_list):
                fm += jnp.mean(jnp.abs(ff.astype(jnp.float32)
                                       - jax.lax.stop_gradient(fr).astype(jnp.float32)))

        mel = self.mel_loss(fake, mel_real)
        total = adv + cfg.fm_weight * fm + cfg.mel_weight * mel
        metrics = {
            "losses/gen_adv": adv,
            "losses/feature_matching": fm,
            "losses/mel": mel,
        }
        return total, metrics

    # -- eval (base-Trainer criterion contract) -----------------------------------

    def __call__(self, inputs: dict, outputs, step=None):
        """Generator-only eval: mel reconstruction + waveform L1."""
        mel = self.mel_loss(outputs.audio_fake, outputs.mel)
        wave_l1 = jnp.mean(jnp.abs(outputs.audio_fake - inputs["audio"]))
        loss = self.config.mel_weight * mel
        return loss, {"losses/mel": mel, "losses/wave_l1": wave_l1}
