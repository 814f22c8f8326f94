"""Vocoder GAN train-step benchmark (chained-scan device timing + profile).

Mirrors tools/bench_train.py for the GAN family: builds the default-scale
VocoderModel + VocoderGANLoss (recipes/vocoder/vocos.yaml shapes: batch 16
x 16384 samples), compiles the SAME alternating D/G update GANTrainer jits
(training/gan_trainer.py:88-128), chains N steps in one jit via lax.scan
and differences two scan lengths — wall timing through the TPU relay is
unreliable, host-fetching a scan result is the repo's standard recipe.

Usage: python tools/bench_gan.py [--batch 16] [--segment 16384] [--profile]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from isp_tts_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
from flax import nnx  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--segment", type=int, default=16384)
    ap.add_argument("--n-small", type=int, default=2)
    ap.add_argument("--n-large", type=int, default=12)
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--trace-dir", default="/tmp/gantrace")
    args = ap.parse_args()

    from isp_tts_tpu.config.registry import build_config
    from isp_tts_tpu.models.vocoder import VocoderModel, VocoderModelConfig
    from isp_tts_tpu.models.vocoder.loss import VocoderGANLoss, VocoderGANLossConfig
    from isp_tts_tpu.nn.policy import compute_dtype

    with compute_dtype(jnp.bfloat16):
        model_cfg = build_config(VocoderModelConfig, {})  # recipe defaults
        model = VocoderModel(model_cfg, rngs=nnx.Rngs(0))
    criterion = VocoderGANLoss(build_config(VocoderGANLossConfig, {}))

    tx = optax.adamw(2e-4, b1=0.8, b2=0.9)
    gen, disc = model.generator, model.discriminator
    opt_state = {"gen": tx.init(nnx.state(gen, nnx.Param)),
                 "disc": tx.init(nnx.state(disc, nnx.Param))}

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((args.batch, args.segment)) * 0.1,
                        jnp.float32)

    graphdef, params, rest = nnx.split(model, nnx.Param, ...)

    def one_step(carry, _):
        params, opt_state = carry
        mdl = nnx.merge(graphdef, params, rest)
        mel = jax.lax.stop_gradient(mdl.features(audio))
        fake = jax.lax.stop_gradient(mdl.generator(mel))

        def d_loss_fn(d):
            loss, _ = criterion.disc_loss(d, audio, fake)
            return loss.astype(jnp.float32)

        d_grads = nnx.grad(d_loss_fn)(mdl.discriminator)
        d_params = nnx.state(mdl.discriminator, nnx.Param)
        d_updates, d_state = tx.update(d_grads, opt_state["disc"], d_params)
        nnx.update(mdl.discriminator, optax.apply_updates(d_params, d_updates))

        def g_loss_fn(g):
            fake2 = g(mel)
            loss, _ = criterion.gen_loss(mdl.discriminator, audio, fake2, mel)
            return loss.astype(jnp.float32)

        g_loss, g_grads = nnx.value_and_grad(g_loss_fn)(mdl.generator)
        g_params = nnx.state(mdl.generator, nnx.Param)
        g_updates, g_state = tx.update(g_grads, opt_state["gen"], g_params)
        nnx.update(mdl.generator, optax.apply_updates(g_params, g_updates))

        # nnx.update mutated the merged module in place; re-extract params
        return (nnx.state(mdl, nnx.Param),
                {"gen": g_state, "disc": d_state}), g_loss

    from functools import partial

    @partial(jax.jit, static_argnums=2)
    def run(params, opt_state, n):
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), None, length=n)
        return params, opt_state, losses[-1]

    def timed(n):
        t0 = time.perf_counter()
        p, o, loss = run(params, opt_state, n)
        loss = float(np.asarray(loss))
        return time.perf_counter() - t0, loss

    # each scan length is its own compile (static n): warm both, then time
    t0, loss = timed(args.n_small)
    print(f"compile+run small({args.n_small}): {t0:.1f}s loss={loss:.4f}",
          flush=True)
    t0, _ = timed(args.n_large)
    print(f"compile+run large({args.n_large}): {t0:.1f}s", flush=True)
    t_small, _ = timed(args.n_small)
    if args.profile:
        os.makedirs(args.trace_dir, exist_ok=True)
        with jax.profiler.trace(args.trace_dir):
            t_large, _ = timed(args.n_large)
    else:
        t_large, _ = timed(args.n_large)
    per_step = (t_large - t_small) / (args.n_large - args.n_small)
    dev = jax.devices()[0].device_kind
    print(f"device={dev} batch={args.batch} segment={args.segment}: "
          f"{per_step * 1e3:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
