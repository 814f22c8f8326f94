from .model import AcousticModel, AcousticModelConfig, AcousticModelOutput
from .aligner import Aligner, AlignerConfig, AlignerOutput
from .adaptor import FlowTemporalAdaptor, FlowTemporalAdaptorConfig, TemporalAdaptorOutput
from .loss import AcousticModelLoss, AcousticLossConfig
from .evaluator import AcousticModelEvaluator

__all__ = [
    "AcousticModel",
    "AcousticModelConfig",
    "AcousticModelOutput",
    "Aligner",
    "AlignerConfig",
    "AlignerOutput",
    "FlowTemporalAdaptor",
    "FlowTemporalAdaptorConfig",
    "TemporalAdaptorOutput",
    "AcousticModelLoss",
    "AcousticLossConfig",
    "AcousticModelEvaluator",
]
