from .embeddings import (
    alibi_slopes,
    fixed_positional_embedding,
    sinusoidal_embedding,
    LearnedALiBiBias,
    TimePositionalEmbedding,
)
from .norms import LayerNorm, AdaptiveLayerNorm, MaskedInstanceNorm1d
from .feedforward import FeedForward, FeedForwardConfig
from .attention import Attention, AttentionConfig
from .transformer import (
    Transformer,
    TransformerConfig,
    TransformerLayer,
    TransformerLayerConfig,
)
from .layers import choose_activation

__all__ = [
    "alibi_slopes",
    "fixed_positional_embedding",
    "sinusoidal_embedding",
    "LearnedALiBiBias",
    "TimePositionalEmbedding",
    "LayerNorm",
    "AdaptiveLayerNorm",
    "MaskedInstanceNorm1d",
    "FeedForward",
    "FeedForwardConfig",
    "Attention",
    "AttentionConfig",
    "Transformer",
    "TransformerConfig",
    "TransformerLayer",
    "TransformerLayerConfig",
    "choose_activation",
]
