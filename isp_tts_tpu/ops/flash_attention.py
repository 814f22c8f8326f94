"""Streaming flash attention with in-kernel learned-ALiBi bias — Pallas TPU.

The reference had to DISABLE fused scaled-dot-product attention because its
additive ALiBi bias is incompatible with torch flash SDPA
(`tts/modules/transformer/attend.py:46`); it pays full O(N*M) logit
materialization in HBM. Here the bias is recomputed from the per-head slopes
INSIDE the kernels, so nothing of shape (B, H, N, M) ever touches HBM, and
the key axis is STREAMED in blocks with an online softmax, so VMEM usage is
O(block_q * block_k) regardless of sequence length (a ring variant can slot
in by extending the key grid axis across devices):

  forward: grid (B, H, Nq, Mk), key blocks innermost; running row-max m,
           normalizer l and output accumulator acc persist in VMEM scratch
           across key steps; blocks whose key start is past the valid key
           length are skipped; o and the row logsumexp emit on the last step.
  backward: two streamed kernels, recomputing p from (q, k, lse) —
           dq  grid (B, H, Nq, Mk): dq + ALiBi slope-gradient partials
               accumulate across key blocks in scratch;
           dkv grid (B, H, Mk, Nq): dk/dv accumulate across query blocks in
               scratch (no full-Q-in-VMEM residency).

Supports multi-query attention (Hkv == 1), symmetric or asymmetric (separate
lower/upper-triangle slope sets) ALiBi, and boolean key-length masking.
Differentiable in q, k, v, and the ALiBi log-slopes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEF_BLOCK_Q = 768
DEF_BLOCK_K = 1024


def _pick_block(n: int, bmax: int) -> int:
    """Largest 128-multiple block <= bmax minimizing padded length.

    Grid-program overhead dominates at short sequence lengths, so blocks are
    sized to the sequence when it fits (n_k == 1: the online softmax
    degenerates to one pass and no streaming overhead is paid); streaming
    engages only when the sequence exceeds bmax.
    """
    best = None
    for b in range(128, bmax + 1, 128):
        padded = -(-n // b) * b
        key = (padded, -b)
        if best is None or key < best[0]:
            best = (key, b)
    return best[1]


def _bias_block(slopes_lo, slopes_hi, rows, cols, offset):
    """ALiBi bias for a (BQ, BK) block from scalar slopes."""
    dist = -jnp.abs(cols[None, :] - rows[:, None] - offset).astype(jnp.float32)
    lower = cols[None, :] <= rows[:, None] + offset
    return jnp.where(lower, slopes_lo * dist, slopes_hi * dist), dist, lower


def _fwd_kernel(key_lens_ref, slopes_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_ref, l_ref, acc_ref, *, scale, offset, block_q, block_k):
    b, h = pl.program_id(0), pl.program_id(1)
    qi, ki = pl.program_id(2), pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(ki == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    key_len = key_lens_ref[b]

    @pl.when(ki * block_k < key_len)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)  # (BQ, D)
        k = k_ref[0, 0].astype(jnp.float32)  # (BK, D)
        v = v_ref[0, 0].astype(jnp.float32)  # (BK, D)

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        rows = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0)[:, 0]
        cols = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)[0]
        bias, _, _ = _bias_block(slopes_ref[0, h], slopes_ref[1, h],
                                 rows, cols, offset)
        s = s + bias
        s = jnp.where(cols[None, :] < key_len, s, NEG_INF)

        m_prev = m_ref[...]  # (BQ, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m_ref[...] = m_new

    @pl.when(ki == n_k - 1)
    def _():
        l = jnp.maximum(l_ref[...], 1e-30)
        o_ref[0, 0] = (acc_ref[...] / l).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_ref[...] + jnp.log(l))[:, 0][None, :]


def _dq_kernel(key_lens_ref, slopes_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
               delta_ref, dq_ref, dslo_ref, dshi_ref,
               dq_acc_ref, dslo_acc_ref, dshi_acc_ref,
               *, scale, offset, block_q, block_k):
    b, h = pl.program_id(0), pl.program_id(1)
    qi, ki = pl.program_id(2), pl.program_id(3)
    n_k = pl.num_programs(3)

    @pl.when(ki == 0)
    def _():
        dq_acc_ref[...] = jnp.zeros_like(dq_acc_ref)
        dslo_acc_ref[0, 0] = 0.0
        dshi_acc_ref[0, 0] = 0.0

    key_len = key_lens_ref[b]

    @pl.when(ki * block_k < key_len)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0]  # (1, BQ)
        delta = delta_ref[0, 0]  # (1, BQ)

        rows = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0)[:, 0]
        cols = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)[0]
        bias, dist, lower = _bias_block(slopes_ref[0, h], slopes_ref[1, h],
                                        rows, cols, offset)

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + bias
        valid = cols[None, :] < key_len
        s = jnp.where(valid, s, NEG_INF)
        p = jnp.exp(s - lse[0][:, None])  # (BQ, BK)

        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta[0][:, None])
        ds = jnp.where(valid, ds, 0.0)

        dq_acc_ref[...] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        ds_dist = ds * dist
        dslo_acc_ref[0, 0] += jnp.sum(jnp.where(lower, ds_dist, 0.0))
        dshi_acc_ref[0, 0] += jnp.sum(jnp.where(lower, 0.0, ds_dist))

    @pl.when(ki == n_k - 1)
    def _():
        dq_ref[0, 0] = dq_acc_ref[...].astype(dq_ref.dtype)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        first = (lane == 0) & (sub == 0)
        dslo_ref[0, 0] = jnp.where(first, dslo_acc_ref[0, 0], 0.0)
        dshi_ref[0, 0] = jnp.where(first, dshi_acc_ref[0, 0], 0.0)


def _dkv_kernel(key_lens_ref, slopes_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                delta_ref, dk_ref, dv_ref, dk_acc_ref, dv_acc_ref,
                *, scale, offset, block_q, block_k):
    b, h = pl.program_id(0), pl.program_id(1)
    ki, qi = pl.program_id(2), pl.program_id(3)
    n_q = pl.num_programs(3)

    @pl.when(qi == 0)
    def _():
        dk_acc_ref[...] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[...] = jnp.zeros_like(dv_acc_ref)

    key_len = key_lens_ref[b]

    @pl.when(ki * block_k < key_len)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)  # (BQ, D)
        k = k_ref[0, 0].astype(jnp.float32)  # (BK, D)
        v = v_ref[0, 0].astype(jnp.float32)  # (BK, D)
        do = do_ref[0, 0].astype(jnp.float32)  # (BQ, D)
        lse = lse_ref[0, 0]  # (1, BQ); +inf on padded query rows -> p = 0
        delta = delta_ref[0, 0]  # (1, BQ)

        rows = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0)[:, 0]
        cols = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)[0]
        bias, _, _ = _bias_block(slopes_ref[0, h], slopes_ref[1, h],
                                 rows, cols, offset)

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + bias
        valid = cols[None, :] < key_len
        s = jnp.where(valid, s, NEG_INF)
        p = jnp.exp(s - lse[0][:, None])  # (BQ, BK)

        dv_acc_ref[...] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (BK, D)

        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (BQ, BK)
        ds = p * (dp - delta[0][:, None])
        ds = jnp.where(valid, ds, 0.0)
        dk_acc_ref[...] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    @pl.when(qi == n_q - 1)
    def _():
        dk_ref[0, 0] = dk_acc_ref[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc_ref[...].astype(dv_ref.dtype)


def _pad_axis2(x, block):
    n = x.shape[2]
    pad = (-n) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x, n


#: set True (tests) to run the kernels in Pallas interpreter mode on CPU
INTERPRET = False


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def flash_attention(q, k, v, slopes, key_lens, scale, offset=0,
                    block_q=DEF_BLOCK_Q, block_k=DEF_BLOCK_K):
    """Streaming fused attention with ALiBi bias.

    Args:
      q: (B, H, N, D); k, v: (B, Hkv, M, D) with Hkv in {1, H}.
      slopes: (2, H) lower/upper-triangle ALiBi slopes (pass the same row
        twice for symmetric ALiBi; zeros disable the bias).
      key_lens: (B,) int32 valid key lengths.
      scale: logit scale (static).
      offset: ALiBi distance offset (static; keys lead queries by `offset`).

    Returns:
      (B, H, N, D) in q's dtype.
    """
    out, _ = _flash_fwd(q, k, v, slopes, key_lens, scale, offset,
                        block_q, block_k)
    return out


def _kv_spec(Hkv, block_k, D, kv_axis):
    """BlockSpec for k/v: head collapsed for MQA, blocked on grid axis 3/2."""
    if Hkv == 1:
        index = (lambda b, h, i, j, *_: (b, 0, j, 0)) if kv_axis == 3 else \
            (lambda b, h, i, j, *_: (b, 0, i, 0))
    else:
        index = (lambda b, h, i, j, *_: (b, h, j, 0)) if kv_axis == 3 else \
            (lambda b, h, i, j, *_: (b, h, i, 0))
    return pl.BlockSpec((1, 1, block_k, D), index, memory_space=pltpu.VMEM)


def _flash_fwd(q, k, v, slopes, key_lens, scale, offset, block_q, block_k):
    B, H, N, D = q.shape
    Hkv, M = k.shape[1], k.shape[2]
    block_q = _pick_block(N, block_q)
    block_k = _pick_block(M, block_k)
    qp, n_orig = _pad_axis2(q, block_q)
    kp, _ = _pad_axis2(k, block_k)
    vp, _ = _pad_axis2(v, block_k)
    Np, Mp = qp.shape[2], kp.shape[2]
    n_q, n_k = Np // block_q, Mp // block_k

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j, *_: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            _kv_spec(Hkv, block_k, D, kv_axis=3),
            _kv_spec(Hkv, block_k, D, kv_axis=3),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j, *_: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j, *_: (b, h, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),  # running row max
            pltpu.VMEM((block_q, 1), jnp.float32),  # running normalizer
            pltpu.VMEM((block_q, D), jnp.float32),  # output accumulator
        ],
    )
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, offset=offset,
                          block_q=block_q, block_k=block_k),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Np, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, 1, Np), jnp.float32),
        ],
        interpret=INTERPRET,
    )(key_lens.astype(jnp.int32), slopes.astype(jnp.float32), qp, kp, vp)
    out = out[:, :, :n_orig]
    lse = lse[:, :, 0, :n_orig]
    return out, (q, k, v, slopes, key_lens, out, lse)


def _flash_fwd_vjp(q, k, v, slopes, key_lens, scale, offset, block_q, block_k):
    out, res = _flash_fwd(q, k, v, slopes, key_lens, scale, offset,
                          block_q, block_k)
    return out, res


def _flash_bwd(scale, offset, block_q, block_k, res, g):
    q, k, v, slopes, key_lens, out, lse = res
    B, H, N, D = q.shape
    Hkv, M = k.shape[1], k.shape[2]
    block_q = _pick_block(N, block_q)
    block_k = _pick_block(M, block_k)

    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (B,H,N)

    qp, n_orig = _pad_axis2(q, block_q)
    gp, _ = _pad_axis2(g, block_q)
    kp, _ = _pad_axis2(k, block_k)
    vp, _ = _pad_axis2(v, block_k)
    Np, Mp = qp.shape[2], kp.shape[2]
    n_q, n_k = Np // block_q, Mp // block_k
    pad_n = Np - N
    # +inf on padded query rows -> p = 0 in both backward kernels
    lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, pad_n)),
                    constant_values=jnp.inf)[:, :, None, :]
    delta_p = jnp.pad(delta, ((0, 0), (0, 0), (0, pad_n)))[:, :, None, :]

    # ---- dq + dslope partials: stream key blocks, accumulate in scratch ----
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j, *_: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            _kv_spec(Hkv, block_k, D, kv_axis=3),
            _kv_spec(Hkv, block_k, D, kv_axis=3),
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j, *_: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j, *_: (b, h, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j, *_: (b, h, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j, *_: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda b, h, i, j, *_: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda b, h, i, j, *_: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
    )
    dq, dslo, dshi = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, offset=offset,
                          block_q=block_q, block_k=block_k),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Np, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, n_q * 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, H, n_q * 8, 128), jnp.float32),
        ],
        interpret=INTERPRET,
    )(key_lens.astype(jnp.int32), slopes.astype(jnp.float32),
      qp, kp, vp, gp, lse_p, delta_p)
    dq = dq[:, :, :n_orig]
    dslopes = jnp.stack([jnp.sum(dslo, axis=(0, 2, 3)),
                         jnp.sum(dshi, axis=(0, 2, 3))])  # (2, H)

    # ---- dk/dv: stream query blocks, accumulate in scratch ----
    grid_spec2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H, n_k, n_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j, *_: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            _kv_spec(Hkv, block_k, D, kv_axis=2),
            _kv_spec(Hkv, block_k, D, kv_axis=2),
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j, *_: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j, *_: (b, h, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j, *_: (b, h, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j, *_: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j, *_: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
    )
    dk_h, dv_h = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, offset=offset,
                          block_q=block_q, block_k=block_k),
        grid_spec=grid_spec2,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Mp, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Mp, D), jnp.float32),
        ],
        interpret=INTERPRET,
    )(key_lens.astype(jnp.int32), slopes.astype(jnp.float32),
      qp, kp, vp, gp, lse_p, delta_p)
    dk_h = dk_h[:, :, :M]
    dv_h = dv_h[:, :, :M]
    if Hkv == 1:  # MQA: sum head gradients
        dk = jnp.sum(dk_h, axis=1, keepdims=True).astype(k.dtype)
        dv = jnp.sum(dv_h, axis=1, keepdims=True).astype(v.dtype)
    else:
        dk = dk_h.astype(k.dtype)
        dv = dv_h.astype(v.dtype)

    return dq, dk, dv, dslopes.astype(slopes.dtype), None


flash_attention.defvjp(_flash_fwd_vjp, _flash_bwd)
