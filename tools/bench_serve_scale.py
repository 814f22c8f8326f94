"""Serving latency at production model scale: does `weights_dtype` matter?

The 23M core model's weights stay VMEM-resident during a batch-1 decode, so
casting them to bf16 moves nothing (bench.py's b1 lanes, docs/PERF_R3.md).
This measures the claim's other half on the ~119M `--preset large` config
(475 MB f32 / 237 MB bf16 — both beyond the 128 MiB VMEM, so every scan
step streams weights from HBM and halving the bytes should show directly).

  python tools/bench_serve_scale.py            # b1 + b32, f32 vs bf16 weights

Chained-scan timing (see bench.py): N iterations inside one jit, host-fetch,
difference two scan lengths to cancel the relay dispatch latency.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from isp_tts_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

ODE_STEPS = 4
SAMPLE_RATE, HOP = 22050, 256


def build_large():
    from flax import nnx

    import bench_train

    model, *_ = bench_train.build(1, 16, 64,
                                  model_overrides=bench_train.LARGE_OVERRIDES)
    model.eval()
    return nnx.split(model)


def measure(graphdef, state, batch, text_len, dec_len, n_small, n_large):
    from flax import nnx

    rng = np.random.RandomState(0)
    text = jax.device_put(
        rng.randint(2, 148, size=(batch, text_len)).astype(np.int32))
    durations = jax.device_put(
        np.full((batch, text_len), dec_len // text_len, np.float32))

    def make(n_iter):
        @jax.jit
        def synth_many(state, key):
            m = nnx.merge(graphdef, state)

            def body(carry, k):
                mel, _ = m.infer(text, max_dec_len=dec_len,
                                 duration_target=durations,
                                 steps=ODE_STEPS, key=k, pitch_delta=carry)
                nxt = jnp.minimum(jnp.abs(jnp.mean(mel)), 0.0).astype(jnp.float32)
                return nxt, jnp.mean(mel).astype(jnp.float32)

            _, outs = jax.lax.scan(body, jnp.float32(0.0),
                                   jax.random.split(key, n_iter))
            return outs

        return synth_many

    f_small, f_large = make(n_small), make(n_large)
    o = np.asarray(f_small(state, jax.random.PRNGKey(0)))
    assert np.isfinite(o).all()
    np.asarray(f_large(state, jax.random.PRNGKey(0)))

    def timed(f, key):
        t0 = time.perf_counter()
        np.asarray(f(state, key))
        return time.perf_counter() - t0

    t_small = min(timed(f_small, jax.random.PRNGKey(i)) for i in (1, 2))
    t_large = min(timed(f_large, jax.random.PRNGKey(i)) for i in (3, 4))
    return (t_large - t_small) / (n_large - n_small)


def main():
    from isp_tts_tpu.serving import cast_float_state
    from isp_tts_tpu.utils.misc import count_parameters

    graphdef, state = build_large()
    n_params = count_parameters(state)
    print(f"large preset: {n_params:,} params "
          f"({n_params * 4 / 2**20:.0f} MB f32 / {n_params * 2 / 2**20:.0f} MB bf16)")

    lanes = [("b1", 1, 32, 256, 32, 160), ("b32", 32, 128, 1024, 2, 12)]
    for dtype in (None, "bf16"):
        s = state if dtype is None else cast_float_state(state, dtype)
        tag = "f32 " if dtype is None else "bf16"
        for name, batch, text_len, dec_len, n_small, n_large in lanes:
            per = measure(graphdef, s, batch, text_len, dec_len,
                          n_small, n_large)
            audio_s = batch * dec_len * HOP / SAMPLE_RATE
            print(f"  {name} weights={tag}: {per*1000:7.2f} ms/call "
                  f"({audio_s/per:,.0f}x realtime)")


if __name__ == "__main__":
    main()
