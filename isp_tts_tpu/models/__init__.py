"""Model registries (parity: reference `tts/models/__init__.py:4-5`)."""

from ..config.registry import Registry

MODELS = Registry("models")
EVALUATORS = Registry("evaluators")
CRITERIA = Registry("criteria")

from .base import Model  # noqa: E402
from .acoustic.model import AcousticModel, AcousticModelOutput  # noqa: E402
from .acoustic.loss import AcousticModelLoss  # noqa: E402
from .acoustic.evaluator import AcousticModelEvaluator  # noqa: E402
from .vocoder.model import VocoderModel, VocoderOutput  # noqa: E402
from .vocoder.loss import VocoderGANLoss  # noqa: E402
from .vocoder.evaluator import VocoderEvaluator  # noqa: E402

MODELS.add("AcousticModel", AcousticModel)
CRITERIA.add("AcousticModelLoss", AcousticModelLoss)
EVALUATORS.add("AcousticModelEvaluator", AcousticModelEvaluator)
MODELS.add("VocoderModel", VocoderModel)
CRITERIA.add("VocoderGANLoss", VocoderGANLoss)
EVALUATORS.add("VocoderEvaluator", VocoderEvaluator)

__all__ = [
    "MODELS",
    "EVALUATORS",
    "CRITERIA",
    "Model",
    "AcousticModel",
    "AcousticModelOutput",
    "AcousticModelLoss",
    "AcousticModelEvaluator",
    "VocoderModel",
    "VocoderOutput",
    "VocoderGANLoss",
    "VocoderEvaluator",
]
