"""Attention microbenchmark: flash (Pallas) vs einsum SDPA, fwd and fwd+bwd.

Model shapes: decoder self-attention B=32, H=6 (MQA Hkv=1), N=M=768, D=64.
Chained-scan timing (see bench.py) to cancel dispatch latency.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


from isp_tts_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from isp_tts_tpu.nn.embeddings import alibi_slopes
from isp_tts_tpu.ops.attention import scaled_dot_product_attention
from isp_tts_tpu.ops.flash_attention import flash_attention, flash_attention_mqa


def timeit(fn, args, n_small=2, n_large=12):
    def make(n):
        @jax.jit
        def many(q, *rest):
            def body(carry, _):
                out = fn(q + carry, *rest)
                return jnp.minimum(jnp.sum(out) * 0.0, 0.0).astype(q.dtype), jnp.sum(out)
            _, outs = jax.lax.scan(body, jnp.zeros((), q.dtype), jnp.arange(n))
            return outs
        return many

    f_small, f_large = make(n_small), make(n_large)
    np.asarray(f_small(*args)); np.asarray(f_large(*args))

    def t(f):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        return time.perf_counter() - t0

    ts = min(t(f_small) for _ in range(3))
    tl = min(t(f_large) for _ in range(3))
    return (tl - ts) / (n_large - n_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--heads", type=int, default=6)
    ap.add_argument("--seq", type=int, default=768)
    ap.add_argument("--head-dim", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--dropout", type=float, default=0.0,
                    help="in-kernel probability dropout rate (mqa path)")
    ap.add_argument("--q-lens", action="store_true",
                    help="pass ragged query lengths (mqa path)")
    ap.add_argument("--only", default=None,
                    help="bench only this impl (mqa|flash|einsum)")
    args = ap.parse_args()

    B, H, N, D = args.batch, args.heads, args.seq, args.head_dim
    dt = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, N, D) * 0.3, dt)
    k = jnp.asarray(rng.randn(B, 1, N, D) * 0.3, dt)
    v = jnp.asarray(rng.randn(B, 1, N, D) * 0.3, dt)
    sl = jnp.asarray(alibi_slopes(H), jnp.float32)
    slopes2 = jnp.stack([sl, sl])
    key_lens = jnp.asarray(rng.randint(N // 2, N + 1, size=B), jnp.int32)
    scale = D ** -0.5

    def flash_f(q, k, v, s):
        return flash_attention(q, k, v, s, key_lens, scale)

    j = jnp.arange(N)[None, :]
    i = jnp.arange(N)[:, None]
    dist = -jnp.abs(j - i).astype(jnp.float32)

    def einsum_f(q, k, v, s):
        bias = s[0][:, None, None] * dist
        mask = (j < key_lens[:, None])[:, None, None, :]
        return scaled_dot_product_attention(q, k, v, scale=scale,
                                            bias=bias[None], mask=mask)

    def grad_of(f):
        g = jax.grad(lambda q, k, v, s: jnp.sum(f(q, k, v, s).astype(jnp.float32) ** 2),
                     argnums=(0, 1, 2, 3))

        def wrapped(q, k, v, s):
            dq, dk, dv, ds = g(q, k, v, s)
            return jnp.sum(dq) + jnp.sum(dk) + jnp.sum(dv) + jnp.sum(ds)
        return wrapped

    q_nhd = jnp.asarray(np.ascontiguousarray(np.asarray(q.astype(jnp.float32)).transpose(0, 2, 1, 3)), dt)

    from isp_tts_tpu.ops.flash_attention import DEF_BLOCK_K_MQA, DEF_BLOCK_R

    q_lens = (jnp.asarray(rng.randint(N // 2, N + 1, size=B), jnp.int32)
              if args.q_lens else None)
    seed = jnp.asarray(7, jnp.int32) if args.dropout > 0 else None

    def mqa_f(q, k, v, s):
        # (B,N,H,D) in/out — the production layout, no transposes; symmetric
        # slopes (the production config) take the specialized bias path
        return flash_attention_mqa(q, k[:, 0], v[:, 0], s, key_lens, scale,
                                   0, DEF_BLOCK_R, DEF_BLOCK_K_MQA, True,
                                   q_lens=q_lens, dropout_rate=args.dropout,
                                   dropout_seed=seed)

    impls = (("mqa", mqa_f, (q_nhd, k, v, slopes2)),
             ("flash", flash_f, (q, k, v, slopes2)),
             ("einsum", einsum_f, (q, k, v, slopes2)))
    for name, f, a in impls:
        if args.only and name != args.only:
            continue
        t_f = timeit(f, a)
        t_b = timeit(grad_of(f), a)
        print(f"{name:7s} B={B} H={H} N={N} D={D} {args.dtype}: "
              f"fwd {t_f*1e3:.3f} ms   fwd+bwd {t_b*1e3:.3f} ms")


if __name__ == "__main__":
    main()
