"""Monotonic Alignment Search (MAS), TPU-native.

The reference's only native/accelerator components are two numba MAS kernels
(CPU `tts/modules/aligner/mas.py:7-35`, CUDA `tts/modules/aligner/cuda_mas.py:11-47`)
dispatched with device<->host round-trips (`alignment.py:291-331`). Here MAS is
a fully on-device JAX computation:

- forward Viterbi DP as a ``lax.scan`` over mel frames, each step a (B, T)
  vector max (wavefront parallelism over the text dim and batch)
- backtrack as a reverse ``lax.scan`` over stored diagonal-choice bits,
  emitting one-hot alignment rows

DP recurrence (mel x text lattice): ``lp[i, j] = a[i, j] + max(lp[i-1, j],
lp[i-1, j-1])`` with first-column cumsum init and the first mel frame pinned to
the first token; backtrack starts at ``(mel_len-1, text_len-1)``.

A Pallas kernel variant lives in :mod:`isp_tts_tpu.ops.mas_pallas`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9


def monotonic_alignment_search(log_attn: jnp.ndarray, text_lens: jnp.ndarray,
                               mel_lens: jnp.ndarray) -> jnp.ndarray:
    """Binarize an attention map with MAS.

    Args:
      log_attn: (B, M, T) log-probabilities (mel x text).
      text_lens: (B,) valid text lengths.
      mel_lens: (B,) valid mel lengths.

    Returns:
      (B, M, T) float32 hard alignment in {0, 1}: each valid mel frame selects
      exactly one token, monotonically, starting at token 0 and ending at
      token ``text_len - 1``; padded rows are all-zero.
    """
    B, M, T = log_attn.shape
    log_attn = log_attn.astype(jnp.float32)
    col = jnp.arange(T)
    valid_text = col[None, :] < text_lens[:, None]  # (B, T)
    a = jnp.where(valid_text[:, None, :], log_attn, NEG_INF)

    # first mel frame must sit on token 0
    lp0 = jnp.where(col[None, :] == 0, a[:, 0, :], NEG_INF)

    def fwd_step(lp, a_row):
        shifted = jnp.pad(lp[:, :-1], ((0, 0), (1, 0)), constant_values=NEG_INF)
        diag = shifted >= lp  # True -> predecessor is j-1 (diagonal move)
        new_lp = a_row + jnp.maximum(shifted, lp)
        return new_lp, diag

    _, diag_bits = jax.lax.scan(fwd_step, lp0, jnp.swapaxes(a, 0, 1)[1:])
    # diag_bits: (M-1, B, T) choice bits for rows 1..M-1
    diag_bits = jnp.concatenate(
        [jnp.zeros((1, B, T), dtype=bool), diag_bits], axis=0
    )  # row 0 has no predecessor

    row = jnp.arange(M)

    def back_step(j, inputs):
        i, diag_row = inputs  # i: scalar row index (descending), diag_row: (B, T)
        active = i < mel_lens  # (B,)
        onehot = (col[None, :] == j[:, None]) & active[:, None]
        step_back = jnp.take_along_axis(diag_row, j[:, None], axis=1)[:, 0]
        j_next = jnp.where(active & (i > 0), j - step_back.astype(j.dtype), j)
        return j_next, onehot

    j_init = text_lens - 1
    _, opt_rows = jax.lax.scan(
        back_step, j_init, (row[::-1], diag_bits[::-1]), unroll=1
    )
    # opt_rows emitted for i = M-1 .. 0 -> flip back
    opt = jnp.swapaxes(opt_rows[::-1], 0, 1)  # (B, M, T)
    return opt.astype(jnp.float32)


def mas_numpy(log_attn: np.ndarray, text_lens: np.ndarray, mel_lens: np.ndarray) -> np.ndarray:
    """Slow, obviously-correct host oracle for tests (per-element Viterbi)."""
    B, M, T = log_attn.shape
    out = np.zeros((B, M, T), dtype=np.float32)
    for b in range(B):
        tl, ml = int(text_lens[b]), int(mel_lens[b])
        lp = np.full((ml, tl), -np.inf, dtype=np.float64)
        lp[0, 0] = log_attn[b, 0, 0]
        for i in range(1, ml):
            for j in range(tl):
                best = lp[i - 1, j]
                if j > 0 and lp[i - 1, j - 1] >= best:
                    best = lp[i - 1, j - 1]
                lp[i, j] = log_attn[b, i, j] + best
        j = tl - 1
        for i in range(ml - 1, -1, -1):
            out[b, i, j] = 1.0
            if i > 0 and j > 0 and lp[i - 1, j - 1] >= lp[i - 1, j]:
                j -= 1
    return out
