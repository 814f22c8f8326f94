"""Ring attention: sequence-parallel ALiBi attention over a mesh axis.

Long-context capability (SURVEY.md §5.7): when a sequence is too long for
one chip's HBM, shard it across devices and rotate K/V shards around the
ring with ``ppermute`` while each device accumulates the online softmax for
its local queries. Logit semantics (learned two-sided ALiBi with
``offset``, global ``key_lens``/``q_lens`` raggedness, optional causal)
match :func:`ops.flash_attention.flash_attention` and the einsum oracle
(:func:`ops.attention.scaled_dot_product_attention`) exactly — tested
against both on a virtual 8-device mesh.

Pure-JAX by design: the per-step chunk attention is an einsum pipeline XLA
fuses well, ``ppermute`` rides ICI, and autodiff works through the whole
ring (``shard_map`` + ``lax.scan``) — so the same op serves training (with
``remat=True`` the per-step logits are recomputed in the backward, keeping
memory at one (n_local x m_local) block per device) and serving. The
single-device Pallas flash kernel remains the intra-chip fast path; this op
is the inter-chip layer above it.

The reference has no distributed-attention equivalent (its Attend,
tts/modules/transformer/attend.py, is single-GPU SDPA) — this is TPU-first
scaling machinery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .attention import NEG_INF


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   slopes: jnp.ndarray, key_lens: jnp.ndarray,
                   scale: float, *, axis_name: str, offset: int = 0,
                   q_lens: jnp.ndarray | None = None, causal: bool = False,
                   remat: bool = True, dropout_rate: float = 0.0,
                   dropout_seed: jnp.ndarray | None = None) -> jnp.ndarray:
    """Sequence-parallel attention; call INSIDE ``shard_map``.

    Args:
      q: (B, H, n_local, D) local query shard (sequence axis sharded over
        ``axis_name``; shard i holds rows [i*n_local, (i+1)*n_local)).
      k, v: (B, Hkv, m_local, D) local key/value shards, same layout.
        ``Hkv`` may be 1 (MQA) or H.
      slopes: (2, H) ALiBi slopes (lower, upper) — same contract as
        ``flash_attention``; zeros disable the bias.
      key_lens: (B,) GLOBAL valid key lengths (replicated).
      scale: logit scale.
      axis_name: mesh axis the sequence is sharded over.
      offset: ALiBi/causal diagonal offset (key_pos - offset aligns with
        query_pos), as in the flash kernel.
      q_lens: (B,) GLOBAL valid query lengths; dead rows emit zeros.
      causal: mask key positions > query position + offset.
      remat: checkpoint each ring step (recompute chunk logits in the
        backward instead of saving n_shards blocks of (n_local, m_local)).
      dropout_rate / dropout_seed: post-softmax probability dropout
        (reference attend.py semantics, same 8-bit keep quantization as the
        flash kernels). The keep mask is a counter hash of GLOBAL
        (b, h, query, key) coordinates + seed, so it is invariant to the
        ring shard count — training on a seq=4 mesh drops exactly the same
        probabilities as seq=1, which is what lets ``dryrun_multichip``
        assert sharded == single-device under live dropout. ``dropout_seed``
        is a replicated int32 scalar.

    Returns:
      (B, H, n_local, D) attention output for the local queries.
    """
    n_shards = jax.lax.psum(1, axis_name)
    me = jax.lax.axis_index(axis_name)
    B, H, n_local, D = q.shape
    m_local = k.shape[2]
    multi_query = k.shape[1] == 1 and H != 1

    rows = me * n_local + jnp.arange(n_local)  # global query positions
    # matmuls run in the INCOMING dtype with f32 accumulation (the flash
    # kernels' scheme): bf16 activations under the production policy keep
    # full MXU rate; f32 inputs (tests/oracles) are unchanged
    qf = q
    slopes_lo = slopes[0].astype(jnp.float32)[:, None, None]  # (H, 1, 1)
    slopes_hi = slopes[1].astype(jnp.float32)[:, None, None]
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    drop_active = dropout_rate > 0.0 and dropout_seed is not None
    if drop_active:
        from .flash_attention import _keep_hash, dropout_thresh

        thresh = dropout_thresh(dropout_rate)
        if thresh >= 256:
            drop_active = False  # sub-1/512 rate quantizes to a no-op
        N_global = n_shards * n_local
        M_global = n_shards * m_local
        inv_keep = 1.0 / (1.0 - dropout_rate)

    def accumulate(k_c, v_c, m, l, o, t):
        """Fold the chunk held at ring step ``t`` into the online softmax."""
        src = (me - t) % n_shards  # whose chunk we hold at step t
        cols = src * m_local + jnp.arange(m_local)  # global key positions

        kf = k_c
        if multi_query:
            s = jnp.einsum("bhnd,bmd->bhnm", qf, kf[:, 0],
                           preferred_element_type=jnp.float32)
        else:
            s = jnp.einsum("bhnd,bhmd->bhnm", qf, kf,
                           preferred_element_type=jnp.float32)
        s = s * scale

        dist = -jnp.abs(cols[None, :] - rows[:, None] - offset).astype(jnp.float32)
        lower = cols[None, :] <= rows[:, None] + offset
        s = s + jnp.where(lower, slopes_lo * dist, slopes_hi * dist)

        valid = (cols[None, :] < key_lens[:, None])[:, None, None, :]
        if causal:
            valid = valid & lower[None, None]
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m, jax.lax.stop_gradient(
            jnp.max(s, axis=-1, keepdims=True)))
        p = jnp.exp(s - m_new)
        p = jnp.where(valid, p, 0.0)  # fully-masked rows: keep l at 0
        alpha = jnp.exp(m - m_new)
        # the softmax NORMALIZER accumulates undropped weights (dropout acts
        # on the normalized probabilities, not the logits)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if drop_active:
            bh = jnp.arange(B)[:, None, None, None] * H + \
                jnp.arange(H)[None, :, None, None]
            idx = (bh * N_global + rows[None, None, :, None]) * M_global \
                + cols[None, None, None, :]
            keep = _keep_hash(idx, dropout_seed, thresh)
            p = jnp.where(keep, p, 0.0)
        # probabilities cast to the V dtype for the second matmul (bf16 MXU
        # under the policy, exactly the flash kernels' scheme); f32 stays f32
        pc = p.astype(v_c.dtype) if v_c.dtype != jnp.float32 else p
        if multi_query:
            pv = jnp.einsum("bhnm,bmd->bhnd", pc, v_c[:, 0],
                            preferred_element_type=jnp.float32)
        else:
            pv = jnp.einsum("bhnm,bhmd->bhnd", pc, v_c,
                            preferred_element_type=jnp.float32)
        return m_new, l, o * alpha + pv

    def step(carry, t):
        k_c, v_c, m, l, o = carry
        m, l, o = accumulate(k_c, v_c, m, l, o, t)
        k_c = jax.lax.ppermute(k_c, axis_name, perm)
        v_c = jax.lax.ppermute(v_c, axis_name, perm)
        return (k_c, v_c, m, l, o), None

    if remat:
        step = jax.checkpoint(step)

    from ..utils.jax_compat import pvary

    m0 = pvary(jnp.full((B, H, n_local, 1), NEG_INF, jnp.float32), axis_name)
    l0 = pvary(jnp.zeros((B, H, n_local, 1), jnp.float32), axis_name)
    o0 = pvary(jnp.zeros((B, H, n_local, D), jnp.float32), axis_name)
    # scan rotates after each accumulate; the LAST chunk is folded outside
    # the scan so no dead final ppermute rides the ring (n-1 hops total)
    (k_c, v_c, m, l, o), _ = jax.lax.scan(
        step, (k, v, m0, l0, o0), jnp.arange(n_shards - 1))
    _, l, o = accumulate(k_c, v_c, m, l, o, n_shards - 1)

    ok = l[..., 0] > 0.0  # saw >= 1 valid key
    if q_lens is not None:
        ok = ok & (rows[None, None, :] < q_lens[:, None, None])
    out = o / jnp.maximum(l, 1e-30)
    if drop_active:
        out = out * jnp.float32(inv_keep)
    return jnp.where(ok[..., None], out, 0.0).astype(q.dtype)


def ring_attention_sharded(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           slopes: jnp.ndarray, key_lens: jnp.ndarray,
                           scale: float, *, mesh, axis_name: str,
                           offset: int = 0,
                           q_lens: jnp.ndarray | None = None,
                           causal: bool = False, remat: bool = True,
                           dropout_rate: float = 0.0,
                           dropout_seed: jnp.ndarray | None = None
                           ) -> jnp.ndarray:
    """:func:`ring_attention` wrapped for use INSIDE a jitted model forward.

    Partial-manual ``shard_map``: manual over ``axis_name`` only — every
    other mesh axis (the trainer's ``data`` batch axis, a ``model`` TP
    axis) stays in GSPMD auto mode, so this drops into the middle of the
    nnx.jit train step and composes with the existing dp x tp sharding.
    This is the dispatch target of ``Attention(flash="ring")``
    (`nn/attention.py`) — the recipe-level switch that makes sequence
    parallelism a config property like the reference's Accelerate strategy
    (`/root/reference/tts/experiments/trainer.py:203`).

    ``q`` is (B, H, N, D) GLOBAL (sequence axis unsharded in the caller's
    view); in/out specs shard dim 2 over ``axis_name``. N and M must divide
    by the axis size — the caller guards and falls back.
    """
    from functools import partial

    from jax.sharding import PartitionSpec as P

    seq_spec = P(None, None, axis_name, None)
    fn = partial(ring_attention, scale=scale, axis_name=axis_name,
                 offset=offset, causal=causal, remat=remat,
                 dropout_rate=dropout_rate)

    if q_lens is None:
        q_lens = jnp.full((q.shape[0],), q.shape[2], jnp.int32)
    if dropout_seed is None:
        dropout_seed = jnp.zeros((), jnp.int32)  # unused when rate == 0

    def mapped(q, k, v, slopes, key_lens, q_lens, seed):
        return fn(q, k, v, slopes, key_lens, q_lens=q_lens,
                  dropout_seed=seed)

    return jax.shard_map(
        mapped, mesh=mesh, axis_names={axis_name},
        in_specs=(seq_spec, seq_spec, seq_spec, P(), P(), P(), P()),
        out_specs=seq_spec,
    )(q, k, v, slopes, key_lens, q_lens, dropout_seed)
