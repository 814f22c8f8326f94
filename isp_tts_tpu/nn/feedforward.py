"""Position-wise feed-forward block.

Parity: reference `tts/modules/transformer/feedforward.py:10-51`
(Linear -> activation (or GLU) -> dropout -> Linear, bias-free by default).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from flax import nnx

from .layers import FastDropout, choose_activation
from .policy import get_compute_dtype


@dataclass
class FeedForwardConfig:
    dim: int = 384
    inner_dim: int = 1536
    dropout: float = 0.0
    activation: str = "relu"
    bias: bool = False
    glu: bool = False


class FeedForward(nnx.Module):
    Config = FeedForwardConfig

    def __init__(self, config: FeedForwardConfig, *, rngs: nnx.Rngs):
        cfg = config
        self.config = cfg
        self.act = choose_activation(cfg.activation)
        self.glu = cfg.glu
        dtype = get_compute_dtype()
        self.fc1 = nnx.Linear(
            cfg.dim, cfg.inner_dim * (2 if cfg.glu else 1), use_bias=cfg.bias,
            dtype=dtype, rngs=rngs,
        )
        self.fc2 = nnx.Linear(cfg.inner_dim, cfg.dim, use_bias=cfg.bias,
                              dtype=dtype, rngs=rngs)
        self.dropout = FastDropout(cfg.dropout, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self.fc1(x)
        if self.glu:
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * self.act(gate)
        else:
            h = self.act(h)
        h = self.dropout(h)
        return self.fc2(h)
