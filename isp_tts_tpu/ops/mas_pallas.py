"""Monotonic Alignment Search as a Pallas TPU kernel.

The reference's only native/accelerator code is its numba CPU/CUDA MAS pair
(`tts/modules/aligner/mas.py`, `cuda_mas.py`); its CUDA kernel syncthreads
between every mel-frame wavefront and its CPU path round-trips device->host.
Here the whole DP — forward Viterbi + diagonal-choice bits + backtrack —
runs in ONE Pallas kernel invocation per batch element (grid over B), with
the running DP row held in VMEM and the backtrack token index in SMEM:

  forward:  lp[j] = a[i, j] + max(lp[j], lp[j-1])   (vectorized over T)
  choice:   diag[i, j] = lp[j-1] >= lp[j]           (stored as int8)
  backtrack: j <- j - diag[i, j] walking i = M-1 .. 0, emitting one-hot rows

vs. the pure-JAX `lax.scan` version (ops/mas.py) this avoids M separate
XLA loop iterations and the (M, B, T) choice-bit round-trip through HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _mas_kernel(text_len_ref, mel_len_ref, attn_ref, out_ref, lp_ref, diag_ref):
    """One batch element: attn_ref (1, M, T) -> out_ref (1, M, T) path."""
    _, M, T = attn_ref.shape
    b = pl.program_id(0)
    text_len = text_len_ref[b]
    mel_len = mel_len_ref[b]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    valid_text = col < text_len

    # row 0: only token 0 reachable
    a0 = jnp.where(valid_text, attn_ref[0, 0:1, :], NEG_INF)
    lp_ref[...] = jnp.where(col == 0, a0, NEG_INF)
    diag_ref[0:1, :] = jnp.zeros((1, T), jnp.int32)

    def fwd(i, _):
        lp = lp_ref[...]  # (1, T)
        # shifted[j] = lp[j-1]; shift right along the lane axis
        shifted = jnp.where(col == 0, NEG_INF, pltpu.roll(lp, 1, 1))
        diag = shifted >= lp
        a_row = jnp.where(valid_text, attn_ref[0, pl.ds(i, 1), :], NEG_INF)
        lp_ref[...] = a_row + jnp.maximum(shifted, lp)
        diag_ref[pl.ds(i, 1), :] = diag.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(1, mel_len, fwd, 0)

    out_ref[...] = jnp.zeros((1, M, T), jnp.float32)

    def back(k, j):
        i = mel_len - 1 - k
        onehot = col == j  # (1, T)
        out_ref[0, pl.ds(i, 1), :] = onehot.astype(jnp.float32)
        # diag[i, j] via masked reduction (vector op; Mosaic dislikes dynamic
        # scalar extraction)
        diag_row = diag_ref[pl.ds(i, 1), :]  # (1, T)
        diag_j = jnp.max(jnp.where(onehot, diag_row, 0))
        step = jnp.where(jnp.logical_and(i > 0, j > 0), diag_j, 0)
        return j - step

    jax.lax.fori_loop(0, mel_len, back, text_len - 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def monotonic_alignment_search_pallas(log_attn: jnp.ndarray, text_lens: jnp.ndarray,
                                      mel_lens: jnp.ndarray,
                                      interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ops.mas.monotonic_alignment_search.

    Args:
      log_attn: (B, M, T) float log-probabilities (mel x text).
      text_lens, mel_lens: (B,) int32 valid lengths.

    Returns:
      (B, M, T) float32 hard alignment.
    """
    B, M, T = log_attn.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # text_lens, mel_lens
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, M, T), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, M, T), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, T), jnp.float32),  # running DP row
            pltpu.VMEM((M, T), jnp.int32),  # diagonal-choice bits
        ],
    )

    return pl.pallas_call(
        _mas_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, M, T), jnp.float32),
        interpret=interpret,
    )(text_lens.astype(jnp.int32), mel_lens.astype(jnp.int32),
      log_attn.astype(jnp.float32))
