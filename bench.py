"""Benchmark: batch-32 mel synthesis throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": "mel_synthesis_xrt_b32", "value": N, "unit": "x_realtime",
   "vs_baseline": N}

value = aggregate real-time factor: seconds of speech synthesized per
wall-clock second, batch 32, 4 ODE steps, full core.yaml model size (23M
params). Baseline = 95.2x RT, the reference's warm single-stream acoustic
inference on a Colab GPU (0.0315 s for a ~3 s utterance,
BASELINE.md / training.ipynb cell 26).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_XRT = 95.2  # reference warm GPU RTF (single stream)

BATCH = 32
TEXT_LEN = 128
MAX_DEC_LEN = 1024
ODE_STEPS = 4
SAMPLE_RATE = 22050
HOP = 256


def build_model():
    from flax import nnx

    from isp_tts_tpu.config import build_config, load_recipe
    from isp_tts_tpu.models.acoustic.model import AcousticModel, AcousticModelConfig
    from isp_tts_tpu.nn.policy import compute_dtype

    recipe = load_recipe("acoustic/core", "recipes", overrides={
        "dataset": {"root": "."},  # satisfy required field; dataset unused
    })
    cfg_dict = dict(recipe["model"])
    cfg_dict["encoding_map"] = {f"c{i}": i for i in range(150)}
    cfg = build_config(AcousticModelConfig, cfg_dict)
    with compute_dtype("bf16"):
        model = AcousticModel(cfg, rngs=nnx.Rngs(0))
    model.eval()
    return model


def main():
    model = build_model()
    from flax import nnx

    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(2, 148, size=(BATCH, TEXT_LEN)), jnp.int32)
    lens = jnp.full((BATCH,), TEXT_LEN, jnp.int32)
    # fixed durations (8 frames/token) keep output frames static across runs
    durations = jnp.full((BATCH, TEXT_LEN), MAX_DEC_LEN // TEXT_LEN, jnp.float32)
    key = jax.random.PRNGKey(0)

    @nnx.jit(static_argnums=(4,))
    def synth(model, text, lens, durations, steps, key):
        mel, ad = model.infer(
            text, text_lengths=lens, max_dec_len=MAX_DEC_LEN,
            duration_target=durations, steps=steps, key=key)
        return mel, ad.dec_lengths

    # warm-up / compile
    mel, dec_lens = synth(model, text, lens, durations, ODE_STEPS, key)
    mel.block_until_ready()

    n_iters = 10
    t0 = time.perf_counter()
    for i in range(n_iters):
        mel, dec_lens = synth(model, text, lens, durations, ODE_STEPS,
                              jax.random.fold_in(key, i))
    mel.block_until_ready()
    wall = (time.perf_counter() - t0) / n_iters

    frames = float(jnp.sum(dec_lens))
    audio_seconds = frames * HOP / SAMPLE_RATE
    xrt = audio_seconds / wall

    print(f"device={jax.devices()[0]} wall/call={wall*1000:.1f}ms "
          f"frames/call={frames:.0f} mel_frames/s={frames/wall:,.0f}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "mel_synthesis_xrt_b32",
        "value": round(xrt, 1),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / BASELINE_XRT, 2),
    }))


if __name__ == "__main__":
    main()
