"""Optimizers and LR schedulers (optax).

Capability parity with reference `tts/experiments/optimizers.py`:
- registries: adamw, sgd (:51-74)
- weight-decay param grouping: params with ndim < 2 are excluded from decay
  (:15-44) — here an optax mask
- schedulers: none, exponential (per-EPOCH gamma), exponential-step,
  warmup (Noam scale/sqrt(step) with optional anneal milestones) (:129-165)
- gradient clipping with NaN/Inf grad-norm detection (:230-244)
- gradient accumulation (optax.MultiSteps when accum > 1)
- freeze masking (trainer-side finetune_layers -> zero updates)
- ``restore_lr`` semantics via runtime-injected hyperparams

The learning rate is injected via ``optax.inject_hyperparams`` so both
per-step schedules and host-controlled per-epoch annealing mutate one scalar
in the optimizer state — jit-friendly, checkpointable, and overridable on
resume (restore_lr=False).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclass
class LRSchedulerConfig:
    _target_: str = "none"
    gamma: float = 1.0  # exponential decay rate
    step_size: int = 1  # steps per decay (exponential-step)
    warmup_steps: int = 1000  # warmup
    scale: float = 1.0  # warmup peak scale
    anneal_steps: tuple = ()  # warmup anneal milestones
    anneal_rate: float = 0.3


@dataclass
class OptimizationConfig:
    _target_: str = "adamw"
    learning_rate: float = 2e-4
    weight_decay: float = 1e-2
    betas: tuple = (0.9, 0.999)
    eps: float = 1e-8
    momentum: float = 0.0  # sgd
    grad_clip_norm: float | None = 1.0
    grad_accum_steps: int = 1
    lr_scheduler: LRSchedulerConfig = field(default_factory=LRSchedulerConfig)


class Schedule:
    """Host-side LR schedule: lr(step, epoch) -> float.

    ``by_epoch`` schedules are advanced at epoch end (reference exponential);
    step schedules every optimizer step.
    """

    def __init__(self, cfg: LRSchedulerConfig, base_lr: float):
        self.cfg = cfg
        self.base_lr = base_lr
        self.kind = cfg._target_ or "none"

    def __call__(self, step: int, epoch: int) -> float:
        c = self.cfg
        if self.kind in ("none", None):
            return self.base_lr
        if self.kind == "exponential":  # per-epoch decay
            return self.base_lr * (c.gamma ** epoch)
        if self.kind == "exponential-step":
            return self.base_lr * (c.gamma ** (step // max(c.step_size, 1)))
        if self.kind == "warmup":
            s = max(step, 1)
            lr = c.scale * self.base_lr * min(s ** -0.5, s * c.warmup_steps ** -1.5) \
                * (c.warmup_steps ** 0.5)
            for milestone in c.anneal_steps:
                if s > milestone:
                    lr = lr * c.anneal_rate
            return lr
        raise KeyError(f"Unknown lr scheduler {self.kind!r}")


def _decay_mask(params) -> Any:
    """True (decay) only for tensors with ndim >= 2 (no decay for biases,
    norm scales, embeddings-as-vectors) — reference optimizers.py:15-20."""
    return jax.tree_util.tree_map(lambda p: np.ndim(p) >= 2, params)


def build_optimizer(config: OptimizationConfig, params,
                    trainable_mask=None) -> tuple[optax.GradientTransformation, Schedule]:
    """Build the optax chain: clip -> optimizer(+wd mask) -> freeze mask,
    wrapped in MultiSteps for gradient accumulation."""
    cfg = config

    def make(learning_rate):
        chain = []
        if cfg.grad_clip_norm is not None and cfg.grad_clip_norm > 0:
            chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
        if cfg._target_ == "adamw":
            chain.append(optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps))
            if cfg.weight_decay:
                chain.append(optax.add_decayed_weights(cfg.weight_decay, mask=_decay_mask))
        elif cfg._target_ == "sgd":
            if cfg.momentum:
                chain.append(optax.trace(decay=cfg.momentum))
            if cfg.weight_decay:
                chain.append(optax.add_decayed_weights(cfg.weight_decay, mask=_decay_mask))
        else:
            raise KeyError(f"Unknown optimizer {cfg._target_!r}")
        chain.append(optax.scale_by_learning_rate(learning_rate))
        return optax.chain(*chain)

    tx = optax.inject_hyperparams(make)(learning_rate=cfg.learning_rate)

    if trainable_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree_util.tree_map(lambda t: "train" if t else "freeze", trainable_mask),
        )

    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)

    schedule = Schedule(cfg.lr_scheduler, cfg.learning_rate)
    return tx, schedule


def set_learning_rate(opt_state, lr: float, grad_accum: bool = False,
                      frozen_mask: bool = False):
    """Write the injected learning-rate hyperparam inside a (possibly
    MultiSteps/multi_transform-wrapped) optimizer state."""
    inner = opt_state
    if grad_accum:  # MultiSteps state
        inner = inner.inner_opt_state
    if frozen_mask:  # multi_transform state
        inner = inner.inner_states["train"].inner_state
    inner.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state


def global_grad_norm(grads) -> jnp.ndarray:
    """Global L2 norm; NaN/Inf produce NaN so the trainer can flag it
    (reference nulls non-finite grad norms, optimizers.py:238-239)."""
    return optax.global_norm(grads)
