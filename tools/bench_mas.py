"""MAS microbenchmark: Pallas kernels vs the lax.scan DP, on device.

Correctness (vs the numpy oracle) and timing at training shapes, using the
chained-iteration timing trick from bench.py to cancel dispatch latency.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from isp_tts_tpu.ops import mas_numpy, monotonic_alignment_search
from isp_tts_tpu.ops.mas_pallas import monotonic_alignment_search_pallas


def lattice(B, M, T, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(B, M, T).astype(np.float32)
    i = np.arange(M)[:, None] / M
    j = np.arange(T)[None, :] / T
    logits += -8.0 * (i - j) ** 2
    return logits


def timeit(fn, attn, tl, ml, n_small=2, n_large=12):
    def make(n):
        @jax.jit
        def many(a):
            def body(carry, _):
                out = fn(a + carry, tl, ml)
                return jnp.minimum(jnp.sum(out) * 0.0, 0.0), jnp.sum(out)
            _, outs = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
            return outs
        return many

    f_small, f_large = make(n_small), make(n_large)
    np.asarray(f_small(attn)); np.asarray(f_large(attn))

    def t(f):
        t0 = time.perf_counter()
        np.asarray(f(attn))
        return time.perf_counter() - t0

    ts = min(t(f_small) for _ in range(3))
    tl_ = min(t(f_large) for _ in range(3))
    return (tl_ - ts) / (n_large - n_small)


def main():
    B, M, T = 32, 768, 192
    rng = np.random.RandomState(0)
    logits = lattice(B, M, T)
    tl = rng.randint(T // 2, T + 1, size=B).astype(np.int32)
    ml = rng.randint(M // 2, M + 1, size=B).astype(np.int32)

    a = jax.device_put(logits)
    tld = jax.device_put(tl)
    mld = jax.device_put(ml)

    # correctness on device
    got_p = np.asarray(monotonic_alignment_search_pallas(a, tld, mld))
    got_s = np.asarray(monotonic_alignment_search(a, tld, mld))
    oracle = mas_numpy(logits, tl, ml)
    np.testing.assert_array_equal(got_p, oracle)
    np.testing.assert_array_equal(got_s, oracle)
    print("correctness: pallas == scan == oracle (B=32, ragged)")

    t_scan = timeit(monotonic_alignment_search, a, tld, mld)
    t_pallas = timeit(monotonic_alignment_search_pallas, a, tld, mld)
    print(f"B={B} M={M} T={T}: scan {t_scan*1e3:.2f} ms   "
          f"pallas {t_pallas*1e3:.2f} ms   speedup {t_scan/t_pallas:.2f}x")

    # single-stream shape
    B2 = 1
    a2 = jax.device_put(lattice(B2, M, T, seed=1))
    tl2 = jax.device_put(np.full(B2, T, np.int32))
    ml2 = jax.device_put(np.full(B2, M, np.int32))
    t_scan2 = timeit(monotonic_alignment_search, a2, tl2, ml2)
    t_pallas2 = timeit(monotonic_alignment_search_pallas, a2, tl2, ml2)
    print(f"B={B2} M={M} T={T}: scan {t_scan2*1e3:.2f} ms   "
          f"pallas {t_pallas2*1e3:.2f} ms   speedup {t_scan2/t_pallas2:.2f}x")


if __name__ == "__main__":
    main()
