"""Acoustic model metrics: MCD-13, alignment length/strength, image logging.

Capability parity with reference `tts/models/acoustic/evaluator.py:14-137`:
- MCD: DCT-II(ortho) mel->MFCC skipping c0, log-dB constant 10*sqrt(2)/ln(10),
  per-frame L2 summed / length (:14-40)
- alignment length: argmax-track path length / diagonal length (:43-64)
- alignment strength: mean max attention over valid frames
- ``on_eval_epoch_end``: soft/hard alignment + target/predicted mel figures

The metric math is jittable JAX; figures are host-side matplotlib.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.masks import get_mask_from_lengths
from ...utils.plotting import plot_attention, plot_spectrogram

_LOGDB_CONST = 10.0 * np.sqrt(2.0) / np.log(10.0)


def dct_matrix(n_mfcc: int, n_mels: int) -> np.ndarray:
    """DCT-II basis with ortho norm, shape (n_mels, n_mfcc)
    (torchaudio.functional.create_dct semantics)."""
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)
    basis = np.cos(np.pi / n_mels * (n[:, None] + 0.5) * k[None, :])
    basis[:, 0] *= 1.0 / np.sqrt(n_mels)
    basis[:, 1:] *= np.sqrt(2.0 / n_mels)
    return basis.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_mfcc",))
def mcd(mels_out: jnp.ndarray, mels_target: jnp.ndarray, mel_lens: jnp.ndarray,
        n_mfcc: int = 13) -> jnp.ndarray:
    """Mel-cepstral distortion over a batch of (B, M, n_mels) mels."""
    dct = jnp.asarray(dct_matrix(n_mfcc, mels_out.shape[-1]))
    mf_out = (mels_out @ dct)[..., 1:]  # drop c0 (energy)
    mf_tgt = (mels_target @ dct)[..., 1:]
    mask = get_mask_from_lengths(mel_lens, mels_out.shape[1])
    frame_dist = jnp.sqrt(jnp.sum((mf_out - mf_tgt) ** 2, axis=2)) * mask
    per_sample = _LOGDB_CONST * jnp.sum(frame_dist, axis=1) / mel_lens
    return jnp.mean(per_sample)


@jax.jit
def alignment_metrics(attn_soft: jnp.ndarray, mel_lens: jnp.ndarray,
                      text_lens: jnp.ndarray):
    """(alignment_length, alignment_strength) from soft attention (B, M, T)."""
    M = attn_soft.shape[1]
    track = jnp.argmax(attn_soft, axis=2)  # (B, M)
    diffs = track[:, 1:] - track[:, :-1]
    step_mask = get_mask_from_lengths(mel_lens, M)[:, 1:]
    steps = jnp.sqrt(1.0 + diffs.astype(jnp.float32) ** 2) * step_mask
    path_len = jnp.sum(steps, axis=1)
    diag_len = jnp.sqrt(text_lens.astype(jnp.float32) ** 2 + mel_lens.astype(jnp.float32) ** 2)
    alignment_length = jnp.mean(path_len / diag_len)

    frame_mask = get_mask_from_lengths(mel_lens, M)
    max_attn = jnp.max(attn_soft, axis=2) * frame_mask
    alignment_strength = jnp.sum(max_attn) / jnp.sum(mel_lens)
    return alignment_length, alignment_strength


class AcousticModelEvaluator:
    """Per-batch metrics + eval-epoch-end image dashboards."""

    def __init__(self, model=None, n_mfcc: int = 13):
        self.model = model
        self.n_mfcc = n_mfcc

    def __call__(self, inputs: dict, outputs) -> dict:
        metrics = {
            f"metrics/mcd_{self.n_mfcc}": mcd(
                outputs.mel, inputs["mel"], inputs["mel_len"], self.n_mfcc),
        }
        if outputs.aligner_output is not None:
            a_len, a_str = alignment_metrics(
                outputs.aligner_output.attn_soft, inputs["mel_len"], inputs["text_len"])
            metrics["metrics/alignment_length"] = a_len
            metrics["metrics/alignment_strength"] = a_str
        return metrics

    def on_eval_epoch_end(self, inputs: dict, outputs) -> dict:
        idx = 0
        name = None
        filenames = inputs.get("filename")
        if filenames is not None:
            name = str(filenames[idx])
        text_len = int(inputs["text_vector_len"][idx] if "text_vector_len" in inputs
                       else inputs["text_len"][idx])
        mel_len = int(inputs["mel_len"][idx])

        images = {}
        if outputs.aligner_output is not None:
            images["images/eval/alignment"] = plot_attention({
                "soft": np.asarray(outputs.aligner_output.attn_soft[idx, :mel_len, :text_len]).T,
                "hard": np.asarray(outputs.aligner_output.attn_hard[idx, :mel_len, :text_len]).T,
            }, title=name)

        target = np.asarray(inputs["mel"][idx, :mel_len]).T  # (n_mels, M)
        pred = np.asarray(outputs.mel[idx, :mel_len]).T
        pred = np.clip(pred, target.min(), target.max())
        images["images/eval/mel_spectrogram"] = plot_spectrogram(
            {"target": target, "predicted": pred}, title=name)
        return images
