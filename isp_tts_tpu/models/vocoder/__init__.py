"""Neural vocoder model family (mel -> waveform).

The reference delegates vocoding to an EXTERNAL 13.45M-param Vocos
TorchScript checkpoint that is not part of its repo
(`/root/reference/notebooks/inference.ipynb` cell 7:
``torch.jit.load("vocos_ms_fp16.pts")`` -> ``vocoder.infer(mel.half())``).
This package closes that external-model boundary with an in-repo,
TPU-native, TRAINABLE equivalent: a Vocos-architecture generator
(ConvNeXt backbone + ISTFT head, all MXU-shaped matmuls/convs, no complex
dtypes) trained adversarially against multi-period + multi-resolution
discriminators (HiFi-GAN/UnivNet style) by :class:`training.gan_trainer.GANTrainer`.
"""

from .model import VocoderModel, VocoderModelConfig, VocosGenerator
from .discriminator import VocoderDiscriminator
from .loss import VocoderGANLoss, VocoderGANLossConfig
from .evaluator import VocoderEvaluator

__all__ = [
    "VocoderModel",
    "VocoderModelConfig",
    "VocosGenerator",
    "VocoderDiscriminator",
    "VocoderGANLoss",
    "VocoderGANLossConfig",
    "VocoderEvaluator",
]
