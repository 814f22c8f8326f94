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


def _head_keep(seed_ref, b, h, heads, qi, ki, block_q, block_k,
               n_true, m_true, thresh):
    """(BQ, BK) keep mask for a per-head-grid block from global
    (batch, head, row, col) indices — the same blocking-invariant hash as
    the folded-MQA family (see :func:`_mqa_keep`): indexed by the UNPADDED
    dims so forward/backward may tile the logits differently and still
    regenerate bit-identical masks."""
    rows = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, 1), 0)
    cols = ki * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (1, block_k), 1)
    idx = ((b * heads + h) * n_true + rows) * m_true + cols
    return _keep_hash(idx, seed_ref[0], thresh)


def _fwd_kernel(key_lens_ref, q_lens_ref, seed_ref, slopes_ref,
                q_ref, k_ref, v_ref,
                o_ref, lse_ref, m_ref, l_ref, acc_ref,
                *, scale, offset, block_q, block_k, causal, drop=None):
    b, h = pl.program_id(0), pl.program_id(1)
    qi, ki = pl.program_id(2), pl.program_id(3)
    n_k = pl.num_programs(3)
    heads = pl.num_programs(1)

    @pl.when(ki == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    key_len = key_lens_ref[b]
    # causal: key blocks entirely above the block diagonal are skipped —
    # the last row of this query block reaches keys <= row_max + offset
    reach = (True if not causal
             else ki * block_k <= (qi + 1) * block_q - 1 + offset)

    @pl.when((ki * block_k < key_len) & reach)
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
        valid = cols[None, :] < key_len
        if causal:
            valid &= cols[None, :] <= rows[:, None] + offset
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_ref[...]  # (BQ, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        # fully-masked rows: m_new = NEG_INF makes p = 1 everywhere; zero it
        # so l stays 0 and the epilogue can emit o = 0, lse = +inf
        p = jnp.where(valid, p, 0.0)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        if drop is not None:
            # probability dropout (reference attend.py drops post-softmax
            # weights): the normalizer l uses the UNdropped p; only the PV
            # accumulation sees the dropped/rescaled probabilities
            thresh, inv_keep, n_true, m_true = drop
            keep = _head_keep(seed_ref, b, h, heads, qi, ki,
                              block_q, block_k, n_true, m_true, thresh)
            p = jnp.where(keep, p * inv_keep, 0.0)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m_ref[...] = m_new

    @pl.when(ki == n_k - 1)
    def _():
        rows = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0)
        # a row is live iff it is a valid query AND saw >= 1 valid key;
        # dead rows emit o = 0 and lse = +inf so the backward recomputes
        # p = exp(s - inf) = 0 with no special-casing
        ok = (rows < q_lens_ref[b]) & (l_ref[...] > 0.0)
        l = jnp.maximum(l_ref[...], 1e-30)
        o_ref[0, 0] = jnp.where(ok, acc_ref[...] / l, 0.0).astype(o_ref.dtype)
        lse = jnp.where(ok, m_ref[...] + jnp.log(l), jnp.inf)
        lse_ref[0, 0] = lse[:, 0][None, :]


def _dq_kernel(key_lens_ref, q_lens_ref, seed_ref, slopes_ref,
               q_ref, k_ref, v_ref,
               do_ref, lse_ref, delta_ref, dq_ref, dslo_ref, dshi_ref,
               dq_acc_ref, dslo_acc_ref, dshi_acc_ref,
               *, scale, offset, block_q, block_k, causal, drop=None):
    b, h = pl.program_id(0), pl.program_id(1)
    qi, ki = pl.program_id(2), pl.program_id(3)
    n_k = pl.num_programs(3)
    heads = pl.num_programs(1)

    @pl.when(ki == 0)
    def _():
        dq_acc_ref[...] = jnp.zeros_like(dq_acc_ref)
        dslo_acc_ref[0, 0] = 0.0
        dshi_acc_ref[0, 0] = 0.0

    key_len = key_lens_ref[b]
    reach = (True if not causal
             else ki * block_k <= (qi + 1) * block_q - 1 + offset)

    @pl.when((ki * block_k < key_len) & reach)
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
        if causal:
            valid &= cols[None, :] <= rows[:, None] + offset
        s = jnp.where(valid, s, NEG_INF)
        p = jnp.exp(s - lse[0][:, None])  # (BQ, BK)

        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if drop is not None:
            # probability dropout: d(probs) passes only through kept weights
            # (delta = rowsum(do*o) already equals rowsum(dp_eff * p))
            thresh, inv_keep, n_true, m_true = drop
            keep = _head_keep(seed_ref, b, h, heads, qi, ki,
                              block_q, block_k, n_true, m_true, thresh)
            dp = jnp.where(keep, dp * inv_keep, 0.0)
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


def _dkv_kernel(key_lens_ref, q_lens_ref, seed_ref, slopes_ref,
                q_ref, k_ref, v_ref,
                do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                dk_acc_ref, dv_acc_ref,
                *, scale, offset, block_q, block_k, causal, drop=None):
    b, h = pl.program_id(0), pl.program_id(1)
    ki, qi = pl.program_id(2), pl.program_id(3)
    n_q = pl.num_programs(3)
    heads = pl.num_programs(1)

    @pl.when(qi == 0)
    def _():
        dk_acc_ref[...] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[...] = jnp.zeros_like(dv_acc_ref)

    key_len = key_lens_ref[b]
    reach = (True if not causal
             else ki * block_k <= (qi + 1) * block_q - 1 + offset)

    @pl.when((ki * block_k < key_len) & reach)
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
        if causal:
            valid &= cols[None, :] <= rows[:, None] + offset
        s = jnp.where(valid, s, NEG_INF)
        p = jnp.exp(s - lse[0][:, None])  # (BQ, BK)

        if drop is None:
            p_v = p
            mask_f = None
        else:
            thresh, inv_keep, n_true, m_true = drop
            keep = _head_keep(seed_ref, b, h, heads, qi, ki,
                              block_q, block_k, n_true, m_true, thresh)
            mask_f = jnp.where(keep, jnp.float32(inv_keep), 0.0)
            p_v = p * mask_f
        dv_acc_ref[...] += jax.lax.dot_general(
            p_v, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (BK, D)

        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (BQ, BK)
        if drop is not None:
            dp = dp * mask_f
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


def flash_attention(q, k, v, slopes, key_lens, scale, offset=0,
                    block_q=DEF_BLOCK_Q, block_k=DEF_BLOCK_K,
                    q_lens=None, causal=False,
                    dropout_rate=0.0, dropout_seed=None):
    """Streaming fused attention with ALiBi bias.

    Args:
      q: (B, H, N, D); k, v: (B, Hkv, M, D) with Hkv in {1, H}.
      slopes: (2, H) lower/upper-triangle ALiBi slopes (pass the same row
        twice for symmetric ALiBi; zeros disable the bias).
      key_lens: (B,) int32 valid key lengths.
      scale: logit scale (static).
      offset: ALiBi distance offset (static; keys lead queries by `offset`).
      q_lens: optional (B,) int32 valid query lengths — rows past them emit
        exactly 0 (and contribute nothing to any gradient).
      causal: query n attends keys <= n + offset (static; reference
        `attend.py:88-122` causal semantics); blocks above the diagonal are
        skipped entirely.
      dropout_rate: static; > 0 applies dropout to the post-softmax
        PROBABILITIES (reference attend.py semantics), regenerated from
        ``dropout_seed`` in the backward — nothing of shape (B, H, N, M) is
        ever stored. Keep probability is 8-bit quantized (dropout_thresh).
      dropout_seed: int32 scalar array; required when dropout_rate > 0.

    Returns:
      (B, H, N, D) in q's dtype.
    """
    if q_lens is None:
        q_lens = jnp.full((q.shape[0],), q.shape[2], jnp.int32)
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    if dropout_seed is None:
        dropout_seed = jnp.zeros((1,), jnp.int32)
    else:
        dropout_seed = jnp.reshape(dropout_seed, (1,)).astype(jnp.int32)
    return _flash_core(q, k, v, slopes, key_lens, q_lens, dropout_seed,
                       scale, offset, block_q, block_k, causal,
                       float(dropout_rate))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def _flash_core(q, k, v, slopes, key_lens, q_lens, seed, scale, offset,
                block_q, block_k, causal, dropout_rate):
    out, _ = _flash_fwd(q, k, v, slopes, key_lens, q_lens, seed, scale,
                        offset, block_q, block_k, causal, dropout_rate)
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


def _flash_fwd(q, k, v, slopes, key_lens, q_lens, seed, scale, offset,
               block_q, block_k, causal, dropout_rate=0.0):
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
        num_scalar_prefetch=4,
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
                          block_q=block_q, block_k=block_k, causal=causal,
                          drop=_drop_params(dropout_rate, N, M)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Np, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, 1, Np), jnp.float32),
        ],
        interpret=INTERPRET,
    )(key_lens.astype(jnp.int32), q_lens.astype(jnp.int32),
      seed.astype(jnp.int32), slopes.astype(jnp.float32), qp, kp, vp)
    out = out[:, :, :n_orig]
    lse = lse[:, :, 0, :n_orig]
    return out, (q, k, v, slopes, key_lens, q_lens, seed, out, lse)


def _flash_fwd_vjp(q, k, v, slopes, key_lens, q_lens, seed, scale, offset,
                   block_q, block_k, causal, dropout_rate):
    out, res = _flash_fwd(q, k, v, slopes, key_lens, q_lens, seed, scale,
                          offset, block_q, block_k, causal, dropout_rate)
    return out, res


def _flash_bwd(scale, offset, block_q, block_k, causal, dropout_rate, res, g):
    q, k, v, slopes, key_lens, q_lens, seed, out, lse = res
    B, H, N, D = q.shape
    Hkv, M = k.shape[1], k.shape[2]
    drop = _drop_params(dropout_rate, N, M)
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
        num_scalar_prefetch=4,
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
                          block_q=block_q, block_k=block_k, causal=causal,
                          drop=drop),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Np, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, n_q * 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, H, n_q * 8, 128), jnp.float32),
        ],
        interpret=INTERPRET,
    )(key_lens.astype(jnp.int32), q_lens.astype(jnp.int32),
      seed.astype(jnp.int32), slopes.astype(jnp.float32),
      qp, kp, vp, gp, lse_p, delta_p)
    dq = dq[:, :, :n_orig]
    dslopes = jnp.stack([jnp.sum(dslo, axis=(0, 2, 3)),
                         jnp.sum(dshi, axis=(0, 2, 3))])  # (2, H)

    # ---- dk/dv: stream query blocks, accumulate in scratch ----
    grid_spec2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
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
                          block_q=block_q, block_k=block_k, causal=causal,
                          drop=drop),
        grid_spec=grid_spec2,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Mp, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Mp, D), jnp.float32),
        ],
        interpret=INTERPRET,
    )(key_lens.astype(jnp.int32), q_lens.astype(jnp.int32),
      seed.astype(jnp.int32), slopes.astype(jnp.float32),
      qp, kp, vp, gp, lse_p, delta_p)
    dk_h = dk_h[:, :, :M]
    dv_h = dv_h[:, :, :M]
    if Hkv == 1:  # MQA: sum head gradients
        dk = jnp.sum(dk_h, axis=1, keepdims=True).astype(k.dtype)
        dv = jnp.sum(dv_h, axis=1, keepdims=True).astype(v.dtype)
    else:
        dk = dk_h.astype(k.dtype)
        dv = dv_h.astype(v.dtype)

    return dq, dk, dv, dslopes.astype(slopes.dtype), None, None, None


_flash_core.defvjp(_flash_fwd_vjp, _flash_bwd)


# ---------------------------------------------------------------------------
# Folded-MQA kernels: heads folded into the row axis.
#
# For multi-query attention every q head shares the single k/v head, so the
# (B, N, H, D) query tensor — the NATURAL layout produced by the q projection,
# a free reshape of (B, N, H*D) — can be viewed as (B, N*H, D) rows that all
# attend to the same keys. Row r corresponds to (n = r // H, h = r % H); the
# per-head ALiBi slope and the |col - n| distance are recomputed from the row
# index inside the kernel. Benefits over the per-head grid above:
#   * zero layout transposes anywhere in the attention op (profiled at ~5 ms
#     per train step for the 6-layer 768-frame decoder as (B,H,N,D) copies);
#   * one (N*H, D) x (D, M) matmul per program instead of H small ones;
#   * dk/dv come out pre-summed over heads as (B, M, D) — no (B, H, M, D)
#     f32 intermediates to reduce on the host;
#   * delta = rowsum(dO * O) is computed inside the backward kernels instead
#     of a separate full-tensor HBM pass.
# ---------------------------------------------------------------------------

# (block_r, block_k) f32 intermediates (s/p/ds + ALiBi geometry) live on the
# Mosaic stack. The defaults are sized for the STREAMED kernels under the
# default 16 MiB scoped-VMEM budget; the single-pass specializations below
# raise the per-kernel VMEM limit (v5e has 128 MiB physical) and widen the
# row block to amortize per-program overhead (fewer grid programs, bigger
# MXU tiles). 768 rows divide the model's folded row counts exactly
# (decoder 768*6, encoder 128*6, adaptor 128*4+).
DEF_BLOCK_R = 768
DEF_BLOCK_K_MQA = 768
# single-pass (whole key axis resident) row-block budget: block_r * block_k
# f32 tiles up to 1536x768 (4.7 MB each, ~5-6 live) fit comfortably once the
# scoped limit is raised
_SINGLE_PASS_TILE = 1536 * 768
# widest key axis the single-pass kernels keep resident. Covers the data
# pipeline's ceiling (audio < 20 s -> 1,723 mel frames): training at mel
# 1792 stays on the fused 5-matmul backward instead of falling off to the
# streamed 7-matmul pair. Beyond this, streaming engages with the default
# key block.
_SINGLE_PASS_KEY_MAX = 2048
_VMEM_LIMIT_BYTES = 96 * 1024 * 1024
_WIDE_VMEM: bool | None = None


def _wide_vmem() -> bool:
    """Whether the device's VMEM fits the wide single-pass tiles.

    The widened tiles + the raised 96 MiB scoped limit assume the 128 MiB
    VMEM of v4+ cores (v5e measured); v2/v3 cores have 16 MiB, where only
    the streamed defaults fit — on those, widening must stay off or Mosaic
    rejects the allocation for shapes the streamed path handles fine.
    Resolved lazily (first kernel call) so importing this module never
    initializes the JAX backend; `ISP_TTS_TPU_WIDE_VMEM=0/1` overrides."""
    global _WIDE_VMEM
    if _WIDE_VMEM is None:
        import os
        import re

        env = os.environ.get("ISP_TTS_TPU_WIDE_VMEM")
        if env is not None:
            _WIDE_VMEM = env.strip().lower() not in ("0", "false", "off")
        else:
            gen = None
            try:
                d = jax.devices()[0]
                m = re.search(r"v(\d+)", getattr(d, "device_kind", "") or "")
                gen = int(m.group(1)) if m else None
            except Exception:
                pass
            # non-TPU platforms run interpret mode, where limits don't apply
            _WIDE_VMEM = gen is None or gen >= 4
    return _WIDE_VMEM


def _single_pass_key_max() -> int:
    """Widest resident key axis; collapses to the streamed default block on
    small-VMEM cores (pre-widening behavior)."""
    return _SINGLE_PASS_KEY_MAX if _wide_vmem() else DEF_BLOCK_K_MQA


def _tpu_params(*dims: str):
    """CompilerParams for an MQA pallas_call: per-grid-dim semantics plus a
    raised scoped-VMEM limit (the wide single-pass tiles exceed Mosaic's
    16 MiB default; v5e has 128 MiB physical VMEM). On small-VMEM cores the
    limit stays at the Mosaic default, matching the streamed tile sizing."""
    return pltpu.CompilerParams(
        dimension_semantics=dims,
        vmem_limit_bytes=_VMEM_LIMIT_BYTES if _wide_vmem() else None)


def _pad_axis(x, axis, block):
    n = x.shape[axis]
    pad = (-n) % block
    if pad:
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        x = jnp.pad(x, widths)
    return x


def dropout_thresh(rate: float) -> int:
    """8-bit keep threshold: keep iff (hash >> 24) < thresh, i.e. keep
    probability quantized to round((1-rate)*256)/256 — the same quantization
    as nn.layers.FastDropout (a regularization knob, not a numerics
    contract)."""
    return int(round((1.0 - rate) * 256.0))


def _keep_hash(idx, seed, thresh):
    """Blocking-invariant dropout keep mask from GLOBAL element indices.

    A murmur-style integer finalizer on (global_index + seed) — pure VPU int
    ops, deterministic for a given (idx, seed) regardless of how the kernel
    grid tiles the matrix, so the forward and both backward kernels (which
    may use DIFFERENT block partitions of the same logits matrix) regenerate
    bit-identical masks. Runs in interpret mode too (plain jnp ops).

    Two multiplies + one xorshift (the trailing avalanche round was dropped:
    this hash runs per (row, col) element in every training attention kernel,
    and only the top byte is consumed — measured keep-rate and +-1/+-row
    adjacency correlations are indistinguishable from the 2-round version)."""
    u = idx.astype(jnp.uint32) + seed.astype(jnp.uint32)
    u = u * jnp.uint32(2654435761)
    u = u ^ (u >> 17)
    u = u * jnp.uint32(0x45D9F3B)
    return (u >> 24) < jnp.uint32(thresh)


def _mqa_keep(seed_ref, b, ri, ki, block_r, block_k, r_true, m_true, thresh):
    """(BR, BK) keep mask for a folded-MQA block from global (row, col).

    Indexed by the UNPADDED dims (r_true, m_true): forward and backward pad
    to different block multiples, so padded dims are not blocking-invariant.
    Out-of-range (padded) positions collide with other indices, which is
    harmless — they are masked to zero contribution everywhere."""
    rows = ri * block_r + jax.lax.broadcasted_iota(
        jnp.int32, (block_r, 1), 0)
    cols = ki * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (1, block_k), 1)
    idx = (b * r_true + rows) * m_true + cols  # (BR, BK); uint32 wrap is fine
    return _keep_hash(idx, seed_ref[0], thresh)


def _row_geometry(ri, ki, heads, offset, block_r, block_k, symmetric=False):
    """Per-(row, col) ALiBi geometry for a folded block: distance matrix,
    lower-triangle predicate, per-row head index and query position
    (both (block_r, 1)).

    The integer work (//, %) runs on (block_r, 1) column vectors; only the
    two broadcasting comparisons materialize (block_r, block_k) arrays."""
    rows = ri * block_r + jax.lax.broadcasted_iota(
        jnp.int32, (block_r, 1), 0)
    cols = ki * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (1, block_k), 1)
    n = rows // heads  # (BR, 1)
    h_col = rows % heads  # (BR, 1)
    dist = -jnp.abs(cols - n - offset).astype(jnp.float32)
    lower = None if symmetric else (cols <= n + offset)
    return dist, lower, h_col, n


def _row_slopes(slopes_ref, h_col, heads, symmetric):
    """(BR, 1) lower/upper slopes selected by per-row head index.

    symmetric=True uses only slopes[0] (hi is returned as None and callers
    skip the triangle split entirely — one fewer compare + two fewer selects
    on the (BR, BK) tile per block)."""
    lo = jnp.zeros_like(h_col, dtype=jnp.float32)
    hi = None if symmetric else jnp.zeros_like(h_col, dtype=jnp.float32)
    for h in range(heads):
        sel = h_col == h
        lo = jnp.where(sel, slopes_ref[0, h], lo)
        if not symmetric:
            hi = jnp.where(sel, slopes_ref[1, h], hi)
    return lo, hi


def _bias_term(slopes_ref, h_col, heads, symmetric, dist, lower):
    lo, hi = _row_slopes(slopes_ref, h_col, heads, symmetric)
    if symmetric:
        return lo * dist
    return jnp.where(lower, lo * dist, hi * dist)


def _mqa_fwd_kernel(key_lens_ref, q_lens_ref, seed_ref, slopes_ref,
                    q_ref, k_ref, v_ref,
                    o_ref, lse_ref, m_ref, l_ref, acc_ref,
                    *, scale, offset, heads, block_r, block_k, symmetric,
                    causal, drop=None, single_pass=False):
    b = pl.program_id(0)
    ri, ki = pl.program_id(1), pl.program_id(2)
    n_k = pl.num_programs(2)

    def drop_p(p):
        # probability dropout (reference attend.py drops the post-softmax
        # weights): the normalizer l uses the UNdropped p; only the PV
        # accumulation sees the dropped/rescaled probabilities
        if drop is None:
            return p
        thresh, inv_keep, r_true, m_true = drop
        keep = _mqa_keep(seed_ref, b, ri, ki, block_r, block_k,
                         r_true, m_true, thresh)
        return jnp.where(keep, p * inv_keep, 0.0)

    def logits():
        q = q_ref[0]  # (BR, D) input dtype; f32 accumulate in the matmul
        k = k_ref[0]  # (BK, D)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        dist, lower, h_col, n = _row_geometry(ri, ki, heads, offset,
                                              block_r, block_k, symmetric)
        s = s + _bias_term(slopes_ref, h_col, heads, symmetric, dist, lower)
        cols = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)
        valid = cols < key_lens_ref[b]
        if causal:
            valid = valid & (cols <= n + offset)
        return jnp.where(valid, s, NEG_INF), valid, n

    def finalize(n, acc, m, l_raw):
        # a row is live iff it is a valid query AND saw >= 1 valid key; dead
        # rows emit o = 0 and lse = +inf so the backward's p = exp(s - lse)
        # collapses to 0 with no special-casing
        ok = (n < q_lens_ref[b]) & (l_raw > 0.0)
        l = jnp.maximum(l_raw, 1e-30)
        o_ref[0] = jnp.where(ok, acc / l, 0.0).astype(o_ref.dtype)
        lse = jnp.where(ok, m + jnp.log(l), jnp.inf)
        lse_ref[0] = lse[:, 0][None, :]

    if single_pass:
        # n_k == 1: plain softmax — no scratch init, no running-max rescale
        # (the online bookkeeping is ~2 extra (BR, BK) passes per program)
        v = v_ref[0]
        s, valid, n = logits()
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        # fully-masked rows: m = NEG_INF makes p = 1 everywhere — zero p on
        # invalid positions so the output is ~0 (matching the streamed path)
        p = jnp.where(valid, p, 0.0)
        l_raw = jnp.sum(p, axis=1, keepdims=True)
        acc = jax.lax.dot_general(
            drop_p(p).astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        finalize(n, acc, m, l_raw)
        return

    @pl.when(ki == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    key_len = key_lens_ref[b]
    # causal: skip key blocks entirely above the diagonal — the last folded
    # row of this block is query n_max = ((ri+1)*block_r - 1) // heads
    reach = (True if not causal
             else ki * block_k <= ((ri + 1) * block_r - 1) // heads + offset)

    @pl.when((ki * block_k < key_len) & reach)
    def _():
        v = v_ref[0]
        s, valid, _ = logits()

        m_prev = m_ref[...]  # (BR, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        p = jnp.where(valid, p, 0.0)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        # p cast to bf16 for the PV matmul (f32 accumulate): f32 MXU inputs
        # run at half rate; p in [0,1] loses nothing that survives the bf16
        # output cast anyway
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            drop_p(p).astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[...] = m_new

    @pl.when(ki == n_k - 1)
    def _():
        rows = ri * block_r + jax.lax.broadcasted_iota(
            jnp.int32, (block_r, 1), 0)
        finalize(rows // heads, acc_ref[...], m_ref[...], l_ref[...])


def _mqa_dq_kernel(key_lens_ref, q_lens_ref, seed_ref, slopes_ref,
                   q_ref, k_ref, v_ref,
                   do_ref, o_ref, lse_ref, dq_ref, dslo_ref, dshi_ref,
                   dq_acc_ref, delta_ref, dsl_acc_ref,
                   *, scale, offset, heads, block_r, block_k, symmetric,
                   causal, drop=None):
    b = pl.program_id(0)
    ri, ki = pl.program_id(1), pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        dq_acc_ref[...] = jnp.zeros_like(dq_acc_ref)
        for i in range(2):
            for h in range(heads):
                dsl_acc_ref[i, h] = 0.0
        do = do_ref[0].astype(jnp.float32)
        o = o_ref[0].astype(jnp.float32)
        delta_ref[...] = jnp.sum(do * o, axis=1, keepdims=True)  # (BR, 1)

    key_len = key_lens_ref[b]
    reach = (True if not causal
             else ki * block_k <= ((ri + 1) * block_r - 1) // heads + offset)

    @pl.when((ki * block_k < key_len) & reach)
    def _():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0]  # (1, BR)

        dist, lower, h_col, n = _row_geometry(ri, ki, heads, offset,
                                              block_r, block_k, symmetric)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + _bias_term(slopes_ref, h_col, heads, symmetric, dist, lower)
        cols = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)
        valid = cols < key_len
        if causal:
            valid = valid & (cols <= n + offset)
        s = jnp.where(valid, s, NEG_INF)
        p = jnp.exp(s - lse[0][:, None])

        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if drop is not None:
            # probability dropout: d(probs) passes only through kept weights
            # (delta = rowsum(do*o) already equals rowsum(dp_eff * p))
            thresh, inv_keep, r_true, m_true = drop
            keep = _mqa_keep(seed_ref, b, ri, ki, block_r, block_k,
                             r_true, m_true, thresh)
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        # invalid columns: s = NEG_INF -> p underflows to exactly 0, no
        # re-mask of ds needed
        ds = p * (dp - delta_ref[...])

        dq_acc_ref[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        ds_dist = ds * dist
        if symmetric:
            # all of the slope gradient lands in row 0; the stack-VJP at the
            # caller sums both rows so the total is unchanged
            row_lo = jnp.sum(ds_dist, axis=1, keepdims=True)
            row_hi = None
        else:
            row_lo = jnp.sum(jnp.where(lower, ds_dist, 0.0), axis=1, keepdims=True)
            row_hi = jnp.sum(jnp.where(lower, 0.0, ds_dist), axis=1, keepdims=True)
        for h in range(heads):
            sel = h_col == h
            dsl_acc_ref[0, h] += jnp.sum(jnp.where(sel, row_lo, 0.0))
            if not symmetric:
                dsl_acc_ref[1, h] += jnp.sum(jnp.where(sel, row_hi, 0.0))

    @pl.when(ki == n_k - 1)
    def _():
        dq_ref[0] = dq_acc_ref[...].astype(dq_ref.dtype)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        zero = jnp.zeros((8, 128), jnp.float32)
        acc_lo, acc_hi = zero, zero
        for h in range(heads):
            at = (sub == 0) & (lane == h)
            acc_lo = jnp.where(at, dsl_acc_ref[0, h], acc_lo)
            acc_hi = jnp.where(at, dsl_acc_ref[1, h], acc_hi)
        dslo_ref[0, 0] = acc_lo
        dshi_ref[0, 0] = acc_hi


def _mqa_dkv_kernel(key_lens_ref, q_lens_ref, seed_ref, slopes_ref,
                    q_ref, k_ref, v_ref,
                    do_ref, o_ref, lse_ref, dk_ref, dv_ref,
                    dk_acc_ref, dv_acc_ref,
                    *, scale, offset, heads, block_r, block_k, symmetric,
                    causal, drop=None):
    b = pl.program_id(0)
    ki, ri = pl.program_id(1), pl.program_id(2)
    n_r = pl.num_programs(2)

    @pl.when(ri == 0)
    def _():
        dk_acc_ref[...] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[...] = jnp.zeros_like(dv_acc_ref)

    key_len = key_lens_ref[b]
    reach = (True if not causal
             else ki * block_k <= ((ri + 1) * block_r - 1) // heads + offset)

    @pl.when((ki * block_k < key_len) & reach)
    def _():
        q = q_ref[0]  # (BR, D)
        k = k_ref[0]  # (BK, D)
        v = v_ref[0]
        do = do_ref[0]
        o = o_ref[0]
        lse = lse_ref[0]  # (1, BR)
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=1, keepdims=True)  # (BR, 1)

        dist, lower, h_col, n = _row_geometry(ri, ki, heads, offset,
                                              block_r, block_k, symmetric)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + _bias_term(slopes_ref, h_col, heads, symmetric, dist, lower)
        cols = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)
        valid = cols < key_len
        if causal:
            valid = valid & (cols <= n + offset)
        s = jnp.where(valid, s, NEG_INF)
        p = jnp.exp(s - lse[0][:, None])  # (BR, BK)

        if drop is None:
            p_v = p
        else:
            thresh, inv_keep, r_true, m_true = drop
            keep = _mqa_keep(seed_ref, b, ri, ki, block_r, block_k,
                             r_true, m_true, thresh)
            mask_f = jnp.where(keep, jnp.float32(inv_keep), 0.0)
            p_v = p * mask_f
        dv_acc_ref[...] += jax.lax.dot_general(
            p_v.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (BK, D)

        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if drop is not None:
            dp = dp * mask_f
        # invalid columns: p is exactly 0 (s = NEG_INF), no re-mask needed
        ds = p * (dp - delta)
        dk_acc_ref[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    @pl.when(ri == n_r - 1)
    def _():
        dk_ref[0] = dk_acc_ref[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc_ref[...].astype(dv_ref.dtype)


def _mqa_dfused_kernel(key_lens_ref, q_lens_ref, seed_ref, slopes_ref,
                       q_ref, k_ref,
                       v_ref, do_ref, o_ref, lse_ref, dq_ref, dk_ref, dv_ref,
                       dslo_ref, dshi_ref, dk_acc_ref, dv_acc_ref,
                       *, scale, offset, heads, block_r, block_k, symmetric,
                       causal, drop=None):
    """Single-pass backward for the n_k == 1 case (whole key axis resident):
    s, p and dp are computed ONCE and feed dq, dk, dv and the slope grads —
    5 matmuls instead of the 7 the dq + dkv kernel pair pays. Grid (B, n_r),
    k/v blocks resident per batch element; dk/dv accumulate in scratch across
    the consecutive row-block steps and emit on the last one."""
    b = pl.program_id(0)
    ri = pl.program_id(1)
    n_r = pl.num_programs(1)

    @pl.when(ri == 0)
    def _():
        dk_acc_ref[...] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[...] = jnp.zeros_like(dv_acc_ref)

    key_len = key_lens_ref[b]
    # all matmul operands stay in the input dtype (bf16 in training): f32
    # MXU inputs run at half rate; accumulation is f32 via
    # preferred_element_type. p/ds are cast to bf16 for their matmuls —
    # p is in [0,1] and ds is a product of bounded terms, and the grad
    # tests bound the end-to-end error at 2e-2 relative
    q = q_ref[0]   # (BR, D)
    k = k_ref[0]   # (BK, D)
    v = v_ref[0]
    do = do_ref[0]
    o = o_ref[0]
    lse = lse_ref[0]                   # (1, BR)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=1, keepdims=True)  # (BR, 1)

    dist, lower, h_col, n = _row_geometry(ri, 0, heads, offset,
                                          block_r, block_k, symmetric)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + _bias_term(slopes_ref, h_col, heads, symmetric, dist, lower)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
    valid = cols < key_len
    if causal:
        valid = valid & (cols <= n + offset)
    s = jnp.where(valid, s, NEG_INF)
    p = jnp.exp(s - lse[0][:, None])   # (BR, BK) f32

    if drop is None:
        p_v = p
    else:
        # one select + two mults (vs two select+mult pairs): the rescale
        # factor is folded into the mask
        thresh, inv_keep, r_true, m_true = drop
        keep = _mqa_keep(seed_ref, b, ri, 0, block_r, block_k,
                         r_true, m_true, thresh)
        mask_f = jnp.where(keep, jnp.float32(inv_keep), 0.0)
        p_v = p * mask_f
    p_lo = p_v.astype(v.dtype)

    dv_acc_ref[...] += jax.lax.dot_general(
        p_lo, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if drop is not None:
        dp = dp * mask_f
    # invalid columns need no re-mask: s = NEG_INF there, so p (and every
    # term through it) is exactly 0 after the exp underflow
    ds = p * (dp - delta)
    ds_lo = ds.astype(k.dtype)

    dq_ref[0] = (jax.lax.dot_general(
        ds_lo, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
    dk_acc_ref[...] += jax.lax.dot_general(
        ds_lo, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    ds_dist = ds * dist
    if symmetric:
        row_lo = jnp.sum(ds_dist, axis=1, keepdims=True)
        row_hi = None
    else:
        row_lo = jnp.sum(jnp.where(lower, ds_dist, 0.0), axis=1, keepdims=True)
        row_hi = jnp.sum(jnp.where(lower, 0.0, ds_dist), axis=1, keepdims=True)
    # every program owns its (b, ri) slope-grad block and MUST write it —
    # the host sums over all blocks, and unwritten output blocks are
    # undefined memory (zero on hardware by luck, NaN in interpret mode)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    zero = jnp.zeros((8, 128), jnp.float32)
    acc_lo, acc_hi = zero, zero
    for h in range(heads):
        sel = h_col == h
        at = (sub == 0) & (lane == h)
        acc_lo = jnp.where(at, jnp.sum(jnp.where(sel, row_lo, 0.0)), acc_lo)
        if not symmetric:
            acc_hi = jnp.where(at, jnp.sum(jnp.where(sel, row_hi, 0.0)), acc_hi)
    dslo_ref[0, 0] = acc_lo
    dshi_ref[0, 0] = acc_hi

    @pl.when(ri == n_r - 1)
    def _():
        dk_ref[0] = dk_acc_ref[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc_ref[...].astype(dv_ref.dtype)


def _mqa_bwd_fused(scale, offset, symmetric, causal, drop, q2, kp, vp, g2, o2,
                   lse_p, key_lens, q_lens, seed, slopes, H, block_r, block_k,
                   n_r, dtypes):
    B, Rp, D = q2.shape
    Mp = kp.shape[1]
    q_dtype, k_dtype, v_dtype = dtypes
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, n_r),
        in_specs=[
            pl.BlockSpec((1, block_r, D), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_r, D), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_r, D), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_r), lambda b, i, *_: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_r, D), lambda b, i, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda b, i, *_: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda b, i, *_: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_mqa_dfused_kernel, scale=scale, offset=offset,
                          heads=H, block_r=block_r, block_k=block_k,
                          symmetric=symmetric, causal=causal, drop=drop),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Rp, D), q_dtype),
            jax.ShapeDtypeStruct((B, Mp, D), k_dtype),
            jax.ShapeDtypeStruct((B, Mp, D), v_dtype),
            jax.ShapeDtypeStruct((B, n_r, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, n_r, 8, 128), jnp.float32),
        ],
        compiler_params=_tpu_params("parallel", "arbitrary"),
        interpret=INTERPRET,
    )(key_lens.astype(jnp.int32), q_lens.astype(jnp.int32),
      seed.astype(jnp.int32), slopes.astype(jnp.float32),
      q2, kp, vp, g2, o2, lse_p)


def flash_attention_mqa(q, k, v, slopes, key_lens, scale, offset=0,
                        block_r=DEF_BLOCK_R, block_k=DEF_BLOCK_K_MQA,
                        symmetric=False, q_lens=None, causal=False,
                        dropout_rate=0.0, dropout_seed=None):
    """Folded multi-query flash attention with in-kernel ALiBi.

    Args:
      q: (B, N, H, D) — the projection's natural layout, no transpose.
      k, v: (B, M, D) single shared head.
      slopes: (2, H) lower/upper ALiBi slopes (zeros disable).
      key_lens: (B,) int32 valid key lengths.
      scale: logit scale (static). offset: key-lead offset (static).
      q_lens: optional (B,) int32 valid query lengths — rows past them emit
        exactly 0 and contribute nothing to any gradient.
      causal: query n attends keys <= n + offset (static); key blocks fully
        above the diagonal are skipped in forward AND both backwards.
      dropout_rate: static; > 0 applies dropout to the post-softmax
        PROBABILITIES (reference attend.py semantics), regenerated from
        ``dropout_seed`` in the backward — nothing of shape (N*H, M) is ever
        stored. Keep probability is 8-bit quantized (see dropout_thresh).
      dropout_seed: int32 scalar array; required when dropout_rate > 0.

    Returns:
      (B, N, H, D) in q's dtype.
    """
    if q_lens is None:
        q_lens = jnp.full((q.shape[0],), q.shape[1], jnp.int32)
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    if dropout_seed is None:
        dropout_seed = jnp.zeros((1,), jnp.int32)
    else:
        dropout_seed = jnp.reshape(dropout_seed, (1,)).astype(jnp.int32)
    return _mqa_core(q, k, v, slopes, key_lens, q_lens, dropout_seed,
                     scale, offset, block_r, block_k, symmetric, causal,
                     float(dropout_rate))


def _drop_params(dropout_rate, R, M):
    """Static kernel dropout spec: (thresh, 1/(1-rate), true R, true M)."""
    if not dropout_rate:
        return None
    thresh = dropout_thresh(dropout_rate)
    if thresh >= 256:
        # rate < 1/512 quantizes to keep-everything: treat as no dropout —
        # the same boundary the einsum path (ops/attention.py) and
        # FastDropout take, otherwise the kernel would still rescale by
        # 1/(1-rate) while dropping nothing
        return None
    return (thresh, 1.0 / (1.0 - dropout_rate), R, M)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13))
def _mqa_core(q, k, v, slopes, key_lens, q_lens, seed, scale, offset,
              block_r, block_k, symmetric, causal, dropout_rate):
    out, _ = _mqa_fwd(q, k, v, slopes, key_lens, q_lens, seed, scale, offset,
                      block_r, block_k, symmetric, causal, dropout_rate)
    return out


def _mqa_fwd(q, k, v, slopes, key_lens, q_lens, seed, scale, offset, block_r,
             block_k, symmetric=False, causal=False, dropout_rate=0.0):
    B, N, H, D = q.shape
    M = k.shape[1]
    R = N * H
    # the forward holds fewer live (block_r, block_k) f32 temporaries than
    # the backward, so it can afford a wider key block: prefer a single key
    # pass whenever the whole key axis fits (<= _SINGLE_PASS_KEY_MAX;
    # serving decodes at max_dec_len 1024 — streaming there cost ~40%
    # per-call — and mel-1792 training stays fused) and narrow the row
    # block to stay inside VMEM. Only the DEFAULT block is widened — an
    # explicit smaller block_k (tests forcing the streamed online-softmax
    # path) is honored as given
    if block_k == DEF_BLOCK_K_MQA:
        key_max = _single_pass_key_max()
        cap = key_max if M <= key_max else min(1024, key_max)
        block_k = _pick_block(M, max(block_k, cap))
    else:
        block_k = _pick_block(M, block_k)
    # (widening the forward row block to 1536 was tried and measured NEUTRAL
    # to slightly worse — the fwd holds fewer live tiles and pipelines better
    # at 768 rows; only the fused backward below wins from wider rows).
    # An EXPLICIT block_r is honored as given, like block_k above
    if block_r == DEF_BLOCK_R:
        block_r = _pick_block(R, 512 if block_k > 768 else block_r)
    else:
        block_r = _pick_block(R, block_r)
    q2 = _pad_axis(q.reshape(B, R, D), 1, block_r)
    kp = _pad_axis(k, 1, block_k)
    vp = _pad_axis(v, 1, block_k)
    Rp, Mp = q2.shape[1], kp.shape[1]
    n_r, n_k = Rp // block_r, Mp // block_k

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, n_r, n_k),
        in_specs=[
            pl.BlockSpec((1, block_r, D), lambda b, i, j, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i, j, *_: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i, j, *_: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_r, D), lambda b, i, j, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_r), lambda b, i, j, *_: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_r, 1), jnp.float32),
            pltpu.VMEM((block_r, 1), jnp.float32),
            pltpu.VMEM((block_r, D), jnp.float32),
        ],
    )
    out2, lse = pl.pallas_call(
        functools.partial(_mqa_fwd_kernel, scale=scale, offset=offset,
                          heads=H, block_r=block_r, block_k=block_k,
                          symmetric=symmetric, causal=causal,
                          drop=_drop_params(dropout_rate, R, M),
                          single_pass=(n_k == 1)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Rp, D), q.dtype),
            jax.ShapeDtypeStruct((B, 1, Rp), jnp.float32),
        ],
        compiler_params=_tpu_params("parallel", "parallel", "arbitrary"),
        interpret=INTERPRET,
    )(key_lens.astype(jnp.int32), q_lens.astype(jnp.int32),
      seed.astype(jnp.int32), slopes.astype(jnp.float32), q2, kp, vp)
    out = out2[:, :R].reshape(B, N, H, D)
    lse = lse[:, 0, :R]
    return out, (q, k, v, slopes, key_lens, q_lens, seed, out, lse)


def _mqa_fwd_vjp(q, k, v, slopes, key_lens, q_lens, seed, scale, offset,
                 block_r, block_k, symmetric, causal, dropout_rate):
    return _mqa_fwd(q, k, v, slopes, key_lens, q_lens, seed, scale, offset,
                    block_r, block_k, symmetric, causal, dropout_rate)


def _mqa_bwd(scale, offset, block_r, block_k, symmetric, causal, dropout_rate,
             res, g):
    q, k, v, slopes, key_lens, q_lens, seed, out, lse = res
    B, N, H, D = q.shape
    M = k.shape[1]
    R = N * H
    if block_k == DEF_BLOCK_K_MQA and M <= _single_pass_key_max():
        # whole key axis fits resident: widen the key block so the fused
        # 5-matmul kernel below engages (same policy as the forward)
        block_k = _pick_block(M, max(block_k, _single_pass_key_max()))
    else:
        block_k = _pick_block(M, block_k)
    if -(-M // block_k) == 1 and block_r == DEF_BLOCK_R:
        # fused single-pass backward: size the row block to the VMEM tile
        # budget (fewer programs, larger MXU tiles; at block_k 768 this is
        # the 1536-row block, at the 2048 ceiling it narrows to 576->512)
        block_r = _pick_block(
            R, max(128, _SINGLE_PASS_TILE // block_k // 128 * 128))
    else:
        block_r = _pick_block(R, block_r)

    q2 = _pad_axis(q.reshape(B, R, D), 1, block_r)
    g2 = _pad_axis(g.reshape(B, R, D), 1, block_r)
    o2 = _pad_axis(out.reshape(B, R, D), 1, block_r)
    kp = _pad_axis(k, 1, block_k)
    vp = _pad_axis(v, 1, block_k)
    Rp, Mp = q2.shape[1], kp.shape[1]
    n_r, n_k = Rp // block_r, Mp // block_k
    # padded rows have q = dO = O = 0: p is finite, every contribution zero
    lse_p = _pad_axis(lse, 1, block_r)[:, None, :]

    drop = _drop_params(dropout_rate, R, M)
    if n_k == 1:
        # whole key axis resident: single fused kernel (5 matmuls vs 7)
        dq2, dk, dv, dslo, dshi = _mqa_bwd_fused(
            scale, offset, symmetric, causal, drop, q2, kp, vp, g2, o2, lse_p,
            key_lens, q_lens, seed, slopes, H, block_r, block_k, n_r,
            (q.dtype, k.dtype, v.dtype))
        dq = dq2[:, :R].reshape(B, N, H, D)
        dslopes = jnp.stack([jnp.sum(dslo[:, :, 0, :H], axis=(0, 1)),
                             jnp.sum(dshi[:, :, 0, :H], axis=(0, 1))])
        return (dq, dk[:, :M], dv[:, :M], dslopes.astype(slopes.dtype),
                None, None, None)

    row_spec = pl.BlockSpec((1, block_r, D), lambda b, i, j, *_: (b, i, 0),
                            memory_space=pltpu.VMEM)
    key_spec = pl.BlockSpec((1, block_k, D), lambda b, i, j, *_: (b, j, 0),
                            memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, 1, block_r), lambda b, i, j, *_: (b, 0, i),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, n_r, n_k),
        in_specs=[row_spec, key_spec, key_spec, row_spec, row_spec, lse_spec],
        out_specs=[
            pl.BlockSpec((1, block_r, D), lambda b, i, j, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda b, i, j, *_: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda b, i, j, *_: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_r, D), jnp.float32),
            pltpu.VMEM((block_r, 1), jnp.float32),  # in-kernel delta
            pltpu.SMEM((2, H), jnp.float32),
        ],
    )
    dq2, dslo, dshi = pl.pallas_call(
        functools.partial(_mqa_dq_kernel, scale=scale, offset=offset,
                          heads=H, block_r=block_r, block_k=block_k,
                          symmetric=symmetric, causal=causal, drop=drop),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Rp, D), q.dtype),
            jax.ShapeDtypeStruct((B, n_r, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, n_r, 8, 128), jnp.float32),
        ],
        compiler_params=_tpu_params("parallel", "parallel", "arbitrary"),
        interpret=INTERPRET,
    )(key_lens.astype(jnp.int32), q_lens.astype(jnp.int32),
      seed.astype(jnp.int32), slopes.astype(jnp.float32),
      q2, kp, vp, g2, o2, lse_p)
    dq = dq2[:, :R].reshape(B, N, H, D)
    dslopes = jnp.stack([jnp.sum(dslo[:, :, 0, :H], axis=(0, 1)),
                         jnp.sum(dshi[:, :, 0, :H], axis=(0, 1))])

    grid_spec2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, n_k, n_r),
        in_specs=[
            pl.BlockSpec((1, block_r, D), lambda b, i, j, *_: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i, j, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i, j, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_r, D), lambda b, i, j, *_: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_r, D), lambda b, i, j, *_: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_r), lambda b, i, j, *_: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, D), lambda b, i, j, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i, j, *_: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
    )
    dk, dv = pl.pallas_call(
        functools.partial(_mqa_dkv_kernel, scale=scale, offset=offset,
                          heads=H, block_r=block_r, block_k=block_k,
                          symmetric=symmetric, causal=causal, drop=drop),
        grid_spec=grid_spec2,
        out_shape=[
            jax.ShapeDtypeStruct((B, Mp, D), k.dtype),
            jax.ShapeDtypeStruct((B, Mp, D), v.dtype),
        ],
        compiler_params=_tpu_params("parallel", "parallel", "arbitrary"),
        interpret=INTERPRET,
    )(key_lens.astype(jnp.int32), q_lens.astype(jnp.int32),
      seed.astype(jnp.int32), slopes.astype(jnp.float32),
      q2, kp, vp, g2, o2, lse_p)
    dk = dk[:, :M]
    dv = dv[:, :M]

    return dq, dk, dv, dslopes.astype(slopes.dtype), None, None, None


_mqa_core.defvjp(_mqa_fwd_vjp, _mqa_bwd)
