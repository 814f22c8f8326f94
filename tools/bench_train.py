"""Train-step microbenchmark + profiler for the core acoustic model.

Measures the fully-jitted train step (forward + loss + grad + optimizer) on
the available accelerator at production shapes (batch 32, text 128, mel 768 —
the shapes behind STATUS.md's ms/step numbers), using the same
chained-scan methodology as bench.py to cancel the ~30 ms relay dispatch
latency of this environment.

Usage:
  python tools/bench_train.py               # print ms/step
  python tools/bench_train.py --profile     # also dump an xplane trace
  python tools/bench_train.py --mel-len 1536 --batch 64
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


def build(batch, text_len, mel_len, seed=0):
    from flax import nnx

    from isp_tts_tpu.config import build_config, load_recipe
    from isp_tts_tpu.models.acoustic.model import AcousticModel, AcousticModelConfig
    from isp_tts_tpu.nn.policy import compute_dtype
    from isp_tts_tpu.training.optimizers import build_optimizer
    from isp_tts_tpu.training.trainer_config import OptimizationConfig

    recipe = load_recipe("acoustic/core", "recipes", overrides={
        "dataset": {"root": "."},
    })
    cfg_dict = dict(recipe["model"])
    cfg_dict["encoding_map"] = {f"c{i}": i for i in range(150)}
    cfg = build_config(AcousticModelConfig, cfg_dict)
    with compute_dtype("bf16"):
        model = AcousticModel(cfg, rngs=nnx.Rngs(seed, dropout=seed + 1))
    model.train()
    criterion = AcousticModel.get_criterion(dict(recipe["criterion"]))

    opt_cfg = build_config(OptimizationConfig, {"learning_rate": 1e-4})
    tx, _sched = build_optimizer(opt_cfg, nnx.state(model, nnx.Param))

    rng = np.random.RandomState(0)
    batch_data = {
        "text_vector": jnp.asarray(
            rng.randint(2, 148, size=(batch, text_len)), jnp.int32),
        "text_vector_len": jnp.full((batch,), text_len, jnp.int32),
        "mel": jnp.asarray(
            rng.randn(batch, mel_len, 80) * 0.5, jnp.float32),
        "mel_len": jnp.full((batch,), mel_len, jnp.int32),
        "pitch": jnp.asarray(rng.randn(batch, mel_len), jnp.float32),
        "energy": jnp.asarray(rng.randn(batch, mel_len), jnp.float32),
    }
    return model, criterion, tx, batch_data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--text-len", type=int, default=128)
    ap.add_argument("--mel-len", type=int, default=768)
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--trace-dir", default="/tmp/traintrace")
    ap.add_argument("--n-small", type=int, default=2)
    ap.add_argument("--n-large", type=int, default=12)
    ap.add_argument("--threefry", action="store_true",
                    help="use the default threefry PRNG instead of rbg "
                         "(the trainer defaults to fast_rng=rbg; bench the "
                         "production configuration unless asked otherwise)")
    args = ap.parse_args()

    if not args.threefry:  # match Trainer fast_rng=True (experiment.py)
        jax.config.update("jax_default_prng_impl", "rbg")

    from flax import nnx

    model, criterion, tx, batch = build(args.batch, args.text_len, args.mel_len)
    graphdef, state = nnx.split(model)
    params = nnx.state(model, nnx.Param)
    opt_state = tx.init(params)

    def one_step(model_state, opt_state, step):
        m = nnx.merge(graphdef, model_state)

        def loss_fn(mm):
            inputs = mm.prepare_inputs(batch)
            outputs = mm(**inputs)
            loss, losses = criterion(inputs, outputs, step)
            return loss.astype(jnp.float32), losses

        (loss, _losses), grads = nnx.value_and_grad(loss_fn, has_aux=True)(m)
        p = nnx.state(m, nnx.Param)
        updates, opt_state = tx.update(grads, opt_state, p)
        nnx.update(m, jax.tree.map(lambda a, b: a + b, p, updates))
        _gd, new_state = nnx.split(m)
        return new_state, opt_state, loss

    def make(n_iter):
        @jax.jit
        def many(model_state, opt_state):
            def body(carry, step):
                ms, os = carry
                ms, os, loss = one_step(ms, os, step)
                return (ms, os), loss

            (_ms, _os), losses = jax.lax.scan(
                body, (model_state, opt_state),
                jnp.arange(n_iter, dtype=jnp.int32))
            return losses

        return many

    f_small, f_large = make(args.n_small), make(args.n_large)
    t0 = time.perf_counter()
    out = np.asarray(f_small(state, opt_state))
    print(f"compile+run small: {time.perf_counter()-t0:.1f}s loss={out[-1]:.4f}")
    t0 = time.perf_counter()
    np.asarray(f_large(state, opt_state))
    print(f"compile+run large: {time.perf_counter()-t0:.1f}s")

    def timed(f):
        t0 = time.perf_counter()
        np.asarray(f(state, opt_state))
        return time.perf_counter() - t0

    t_small = min(timed(f_small) for _ in range(2))
    t_large = min(timed(f_large) for _ in range(2))
    per_step = (t_large - t_small) / (args.n_large - args.n_small)
    print(f"device={jax.devices()[0]} batch={args.batch} mel={args.mel_len} "
          f"text={args.text_len}: {per_step*1000:.2f} ms/step "
          f"({args.batch/per_step:.0f} samples/s)")

    if args.profile:
        with jax.profiler.trace(args.trace_dir):
            np.asarray(f_large(state, opt_state))
        print(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
