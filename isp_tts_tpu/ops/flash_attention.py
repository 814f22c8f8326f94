"""Fused (flash) attention with in-kernel learned-ALiBi bias — Pallas TPU.

The reference had to DISABLE fused scaled-dot-product attention because its
additive ALiBi bias is incompatible with torch flash SDPA
(`tts/modules/transformer/attend.py:46`); it pays full O(N*M) logit
materialization in HBM. Here the bias is recomputed from the per-head slopes
INSIDE the kernel, so nothing of shape (B, H, N, M) ever touches HBM:

  forward: grid (B, H, N/BN); per block: s = q@k^T*scale + slope*(-|j-i-off|),
           key-length mask, stable softmax over the full key axis held in
           VMEM, out = p@v; the row logsumexp is saved for the backward.
  backward: two kernels — dq (grid over query blocks) and dk/dv (grid over
           key blocks, full q in VMEM) — recomputing p from (q, k, lse);
           slope gradients accumulate via sum(ds * dist).

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
DEF_BLOCK_Q = 256


def _bias_block(slopes_lo, slopes_hi, rows, cols, offset):
    """ALiBi bias for a (BN, M) block from scalar slopes."""
    dist = -jnp.abs(cols[None, :] - rows[:, None] - offset).astype(jnp.float32)
    lower = cols[None, :] <= rows[:, None] + offset
    return jnp.where(lower, slopes_lo * dist, slopes_hi * dist)


def _fwd_kernel(key_lens_ref, slopes_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                *, scale, offset, block_q):
    b = pl.program_id(0)
    h = pl.program_id(1)
    qi = pl.program_id(2)

    q = q_ref[0, 0].astype(jnp.float32)  # (BN, D)
    k = k_ref[0, 0].astype(jnp.float32)  # (M, D)
    v = v_ref[0, 0].astype(jnp.float32)  # (M, D)
    M = k.shape[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale

    rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)[:, 0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)[0]
    s_lo = slopes_ref[0, h]
    s_hi = slopes_ref[1, h]
    s = s + _bias_block(s_lo, s_hi, rows, cols, offset)

    key_len = key_lens_ref[b]
    s = jnp.where(cols[None, :] < key_len, s, NEG_INF)

    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = o / jnp.maximum(denom, 1e-30)
    o_ref[0, 0] = o.astype(o_ref.dtype)
    lse_ref[0, 0] = (m[:, 0] + jnp.log(jnp.maximum(denom[:, 0], 1e-30)))[None, :]


def _dq_kernel(key_lens_ref, slopes_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
               delta_ref, dq_ref, dslo_ref, dshi_ref, *, scale, offset, block_q):
    b = pl.program_id(0)
    h = pl.program_id(1)
    qi = pl.program_id(2)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0]  # (1, BN)
    delta = delta_ref[0, 0]  # (1, BN)
    M = k.shape[0]

    rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)[:, 0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)[0]
    dist = -jnp.abs(cols[None, :] - rows[:, None] - offset).astype(jnp.float32)
    lower = cols[None, :] <= rows[:, None] + offset

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + jnp.where(lower, slopes_ref[0, h] * dist, slopes_ref[1, h] * dist)
    valid = cols[None, :] < key_lens_ref[b]
    s = jnp.where(valid, s, NEG_INF)
    p = jnp.exp(s - lse[0][:, None])  # (BN, M)

    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta[0][:, None])
    ds = jnp.where(valid, ds, 0.0)

    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)

    ds_dist = ds * dist
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    first = (lane == 0) & (sub == 0)
    dslo_ref[0, 0] = jnp.where(first, jnp.sum(jnp.where(lower, ds_dist, 0.0)), 0.0)
    dshi_ref[0, 0] = jnp.where(first, jnp.sum(jnp.where(lower, 0.0, ds_dist)), 0.0)


def _dkv_kernel(key_lens_ref, slopes_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                delta_ref, dk_ref, dv_ref, *, scale, offset, block_k):
    b = pl.program_id(0)
    h = pl.program_id(1)
    ki = pl.program_id(2)

    q = q_ref[0, 0].astype(jnp.float32)  # (N, D)
    k = k_ref[0, 0].astype(jnp.float32)  # (BK, D)
    v = v_ref[0, 0].astype(jnp.float32)  # (BK, D)
    do = do_ref[0, 0].astype(jnp.float32)  # (N, D)
    lse = lse_ref[0, 0]  # (1, N)
    delta = delta_ref[0, 0]  # (1, N)
    N = q.shape[0]
    BK = k.shape[0]

    rows = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0]
    cols = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, BK), 1)[0]
    dist = -jnp.abs(cols[None, :] - rows[:, None] - offset).astype(jnp.float32)
    lower = cols[None, :] <= rows[:, None] + offset

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + jnp.where(lower, slopes_ref[0, h] * dist, slopes_ref[1, h] * dist)
    valid = cols[None, :] < key_lens_ref[b]
    s = jnp.where(valid, s, NEG_INF)
    p = jnp.exp(s - lse[0][:, None])  # (N, BK)

    dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (BK, D)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)

    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (N, BK)
    ds = p * (dp - delta[0][:, None])
    ds = jnp.where(valid, ds, 0.0)
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)


def _pad_q(x, block_q):
    n = x.shape[2]
    pad = (-n) % block_q
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x, n


#: set True (tests) to run the kernels in Pallas interpreter mode on CPU
INTERPRET = False


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_attention(q, k, v, slopes, key_lens, scale, offset=0,
                    block_q=DEF_BLOCK_Q):
    """Fused attention with ALiBi bias.

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
    out, _ = _flash_fwd(q, k, v, slopes, key_lens, scale, offset, block_q)
    return out


def _flash_fwd(q, k, v, slopes, key_lens, scale, offset, block_q):
    B, H, N, D = q.shape
    Hkv, M = k.shape[1], k.shape[2]
    qp, n_orig = _pad_q(q, block_q)
    Np = qp.shape[2]
    n_q_blocks = Np // block_q

    kv_map = (lambda b, h, i, *_: (b, 0, 0, 0)) if Hkv == 1 else \
        (lambda b, h, i, *_: (b, h, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H, n_q_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, *_: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M, D), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M, D), kv_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, *_: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, *_: (b, h, 0, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, offset=offset,
                          block_q=block_q),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Np, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, 1, Np), jnp.float32),
        ],
        interpret=INTERPRET,
    )(key_lens.astype(jnp.int32), slopes.astype(jnp.float32), qp, k, v)
    out = out[:, :, :n_orig]
    lse = lse[:, :, 0, :n_orig]
    return out, (q, k, v, slopes, key_lens, out, lse)


def _flash_fwd_vjp(q, k, v, slopes, key_lens, scale, offset, block_q):
    out, res = _flash_fwd(q, k, v, slopes, key_lens, scale, offset, block_q)
    return out, res


def _flash_bwd(scale, offset, block_q, res, g):
    q, k, v, slopes, key_lens, out, lse = res
    B, H, N, D = q.shape
    Hkv, M = k.shape[1], k.shape[2]

    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (B,H,N)

    qp, n_orig = _pad_q(q, block_q)
    gp, _ = _pad_q(g, block_q)
    Np = qp.shape[2]
    n_q_blocks = Np // block_q
    pad_n = Np - N
    lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, pad_n)))[:, :, None, :]
    delta_p = jnp.pad(delta, ((0, 0), (0, 0), (0, pad_n)))[:, :, None, :]

    kv_map = (lambda b, h, i, *_: (b, 0, 0, 0)) if Hkv == 1 else \
        (lambda b, h, i, *_: (b, h, 0, 0))

    # ---- dq + dslope partials: grid over query blocks ----
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H, n_q_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, *_: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M, D), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M, D), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, *_: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, *_: (b, h, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, *_: (b, h, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, *_: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda b, h, i, *_: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda b, h, i, *_: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    dq, dslo, dshi = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, offset=offset,
                          block_q=block_q),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Np, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, n_q_blocks * 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, H, n_q_blocks * 8, 128), jnp.float32),
        ],
        interpret=INTERPRET,
    )(key_lens.astype(jnp.int32), slopes.astype(jnp.float32),
      qp, k, v, gp, lse_p, delta_p)
    dq = dq[:, :, :n_orig]
    dslopes = jnp.stack([jnp.sum(dslo, axis=(0, 2, 3)),
                         jnp.sum(dshi, axis=(0, 2, 3))])  # (2, H)

    # ---- dk/dv: grid over key blocks, full (padded) q in VMEM ----
    block_k = block_q
    pad_m = (-M) % block_k
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad_m), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad_m), (0, 0)))
    Mp = M + pad_m
    n_k_blocks = Mp // block_k

    kv_map_b = (lambda b, h, i, *_: (b, 0, i, 0)) if Hkv == 1 else \
        (lambda b, h, i, *_: (b, h, i, 0))

    grid_spec2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H, n_k_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, Np, D), lambda b, h, i, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), kv_map_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), kv_map_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np, D), lambda b, h, i, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, Np), lambda b, h, i, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, Np), lambda b, h, i, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, *_: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, *_: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    # mask padded queries out via lse = +inf -> p = 0
    lse_masked = jnp.pad(lse, ((0, 0), (0, 0), (0, pad_n)),
                         constant_values=jnp.inf)[:, :, None, :]
    dk_h, dv_h = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, offset=offset,
                          block_k=block_k),
        grid_spec=grid_spec2,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Mp, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Mp, D), jnp.float32),
        ],
        interpret=INTERPRET,
    )(key_lens.astype(jnp.int32), slopes.astype(jnp.float32),
      qp, kp, vp, gp, lse_masked, delta_p)
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
