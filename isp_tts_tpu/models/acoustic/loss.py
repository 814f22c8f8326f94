"""Acoustic model loss: mel MSE + flow loss + CTC alignment + binarization KL.

Capability parity with reference `tts/models/acoustic/loss.py:22-182`:
- MelLoss: masked mel MSE (:22-33)
- AttentionCTCLoss: blank column (logprob -1) padded at index 0, log_softmax,
  CTC against the target sequence 1..text_len with zero_infinity (:41-79) —
  here a banded forward algorithm specialized to ordered distinct labels
  (see _ordered_ctc_neg_logp; equality with optax.ctc_loss is tested) with
  torch 'mean' reduction semantics (per-sample / target_length, batch mean)
- AttentionBinarizationLoss: -mean log soft-attention at hard-attention
  positions (:87-105)
- adaptor flow_loss passed through from the model output (:158-161)
- each term has a weight + skip_steps gate (tts/modules/loss.py:26-30); the
  reference's dataclass trailing-comma bug (:109-118) is fixed by intent.

Returns ``(loss, {"model/mel_loss", "adaptor/flow_loss",
"aligner/attention_loss", "aligner/kl_loss"})``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from ...utils.masks import get_mask_from_lengths, masked_mean


@dataclass
class WeightedLossConfig:
    weight: float = 1.0
    skip_steps: int = 0


def weight_loss(loss: jnp.ndarray, cfg: WeightedLossConfig,
                step: jnp.ndarray | int | None = None) -> jnp.ndarray:
    """Scale by weight; zero until ``skip_steps`` (jit-safe: uses where)."""
    out = cfg.weight * loss
    if step is not None and cfg.skip_steps > 0:
        out = jnp.where(jnp.asarray(step) < cfg.skip_steps, 0.0, out)
    return out


@dataclass
class AttentionCTCLossConfig(WeightedLossConfig):
    blank_logprob: float = -1.0
    # auto: streamed Pallas kernels on TPU (ops/ctc_pallas.py), lax.scan
    # elsewhere; scan|pallas force an implementation
    ctc_impl: str = "auto"


@dataclass
class AttentionBinarizationLossConfig(WeightedLossConfig):
    eps: float = 1e-6


@dataclass
class AcousticLossConfig:
    mel_loss: WeightedLossConfig = field(default_factory=WeightedLossConfig)
    attention_loss: AttentionCTCLossConfig | None = field(default_factory=AttentionCTCLossConfig)
    attention_kl_loss: AttentionBinarizationLossConfig | None = field(
        default_factory=AttentionBinarizationLossConfig)


def mel_loss_fn(mel_out: jnp.ndarray, mel_target: jnp.ndarray,
                mel_lens: jnp.ndarray) -> jnp.ndarray:
    """Masked MSE over valid frames. mel: (B, M, n_mels)."""
    mask = get_mask_from_lengths(mel_lens, mel_out.shape[1])[..., None]
    mask = jnp.broadcast_to(mask, mel_out.shape)
    return masked_mean((mel_out - mel_target) ** 2, mask)


def _ordered_ctc_neg_logp(logprobs: jnp.ndarray, text_lens: jnp.ndarray,
                          mel_lens: jnp.ndarray) -> jnp.ndarray:
    """-log p(labels | logprobs) under CTC for the ORDERED label sequence
    [1..text_len] (the only labels this loss ever sees).

    Because every label is distinct and equals its own position + 1, the
    generic CTC lattice (per-state label gathers) collapses to a fixed banded
    recurrence over interleaved blank/label state vectors:

      blank_j <- logaddexp(blank_j, label_j)              + blank_lp
      label_j <- logaddexp(label_j, blank_{j-1}, label_{j-1}) + label_lp_j

    which is pure shifted vector math — no gathers, no per-state bookkeeping.
    The frame scan is unrolled 8x: the generic optax.ctc_loss while-loop ran
    M=768 sequential steps of tiny VPU work and profiled at ~4.3 ms/step
    (fwd+bwd) in the train step; this form is ~4x cheaper.

    Matches optax.ctc_loss / torch nn.CTCLoss(sum over final two states)
    numerics to fp tolerance (tested).

    logprobs: (B, M, T+1) log-softmaxed, blank at index 0.
    """
    B, M, Tp1 = logprobs.shape
    T = Tp1 - 1
    NEG = -1e30

    blank0 = jnp.full((B, T + 1), NEG).at[:, 0].set(0.0)
    label0 = jnp.full((B, T), NEG)

    frame_mask = get_mask_from_lengths(mel_lens, M)  # (B, M)

    def step(carry, xs):
        blank, label = carry
        lp, valid = xs  # (B, T+1), (B,)
        blank_lp, label_lp = lp[:, :1], lp[:, 1:]
        new_blank = jnp.logaddexp(
            blank, jnp.pad(label, ((0, 0), (1, 0)), constant_values=NEG),
        ) + blank_lp
        from_prev = jnp.logaddexp(
            blank[:, :-1], jnp.pad(label[:, :-1], ((0, 0), (1, 0)),
                                   constant_values=NEG))
        new_label = jnp.logaddexp(label, from_prev) + label_lp
        v = valid[:, None]
        return (jnp.where(v, new_blank, blank),
                jnp.where(v, new_label, label)), None

    (blank, label), _ = jax.lax.scan(
        step, (blank0, label0),
        (logprobs.transpose(1, 0, 2), frame_mask.T),
        unroll=8,
    )
    # total log-prob: sum of the final blank and final label states
    idx = jnp.clip(text_lens, 1, T)
    b_last = jnp.take_along_axis(blank, idx[:, None], axis=1)[:, 0]
    l_last = jnp.take_along_axis(label, idx[:, None] - 1, axis=1)[:, 0]
    return -jnp.logaddexp(b_last, l_last)


def attention_ctc_loss_fn(attn_logits: jnp.ndarray, text_lens: jnp.ndarray,
                          mel_lens: jnp.ndarray, blank_logprob: float = -1.0,
                          ctc_impl: str = "auto") -> jnp.ndarray:
    """CTC forcing each text token to be visited in order.

    attn_logits: (B, M, T). Targets are [1..text_len]; a blank column with
    fixed logprob is padded at index 0 (reference loss.py:41-79).
    """
    padded = jnp.pad(attn_logits, ((0, 0), (0, 0), (1, 0)),
                     constant_values=blank_logprob)
    logprobs = jax.nn.log_softmax(padded, axis=2)

    if ctc_impl == "auto":
        ctc_impl = "pallas" if jax.default_backend() not in ("cpu",) else "scan"
    if ctc_impl == "pallas":
        from ...ops.ctc_pallas import ordered_ctc_neg_logp_pallas

        per_example = ordered_ctc_neg_logp_pallas(logprobs, text_lens, mel_lens)
    else:
        per_example = _ordered_ctc_neg_logp(logprobs, text_lens, mel_lens)
    # torch nn.CTCLoss(reduction='mean'): divide by target length, then mean
    per_example = per_example / jnp.maximum(text_lens.astype(per_example.dtype), 1.0)
    # zero_infinity=True semantics. The banded recurrence never produces an
    # actual inf — an infeasible alignment surfaces as ~1e30 via the NEG
    # sentinel — so gate on the only infeasible case for ordered labels
    # (mel shorter than text) in addition to the finiteness check.
    feasible = mel_lens >= text_lens
    per_example = jnp.where(
        feasible & jnp.isfinite(per_example), per_example, 0.0)
    return jnp.mean(per_example)


def attention_binarization_loss_fn(attn_soft: jnp.ndarray, attn_hard: jnp.ndarray,
                                   eps: float = 1e-6) -> jnp.ndarray:
    """KL-style binarization loss: -mean log(soft) at hard positions."""
    log_soft = jnp.log(jnp.clip(attn_soft, eps, None))
    num = jnp.sum(log_soft * attn_hard)
    return -num / jnp.maximum(jnp.sum(attn_hard), 1.0)


class AcousticModelLoss:
    """Callable criterion: (inputs, outputs, step) -> (loss, loss_dict)."""

    Config = AcousticLossConfig

    def __init__(self, config: AcousticLossConfig | None = None):
        self.config = config or AcousticLossConfig()

    def __call__(self, inputs: dict, outputs, step=None):
        cfg = self.config
        losses = {}

        mel_l = mel_loss_fn(outputs.mel, inputs["mel"], inputs["mel_len"])
        mel_l = weight_loss(mel_l, cfg.mel_loss, step)
        losses["model/mel_loss"] = mel_l
        loss = mel_l

        if outputs.adaptor_output.losses is not None:
            for key, l in outputs.adaptor_output.losses.items():
                losses[f"adaptor/{key}"] = l
                loss = loss + l

        if cfg.attention_loss is not None and outputs.aligner_output is not None:
            attn_l = attention_ctc_loss_fn(
                outputs.aligner_output.attn_logits,
                inputs["text_len"], inputs["mel_len"],
                blank_logprob=cfg.attention_loss.blank_logprob,
                ctc_impl=cfg.attention_loss.ctc_impl,
            )
            attn_l = weight_loss(attn_l, cfg.attention_loss, step)
            losses["aligner/attention_loss"] = attn_l
            loss = loss + attn_l

        if cfg.attention_kl_loss is not None and outputs.aligner_output is not None:
            kl_l = attention_binarization_loss_fn(
                outputs.aligner_output.attn_soft,
                outputs.aligner_output.attn_hard,
                eps=cfg.attention_kl_loss.eps,
            )
            kl_l = weight_loss(kl_l, cfg.attention_kl_loss, step)
            losses["aligner/kl_loss"] = kl_l
            loss = loss + kl_l

        return loss, losses
