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


#: production-scale preset (~115M params): wider residual stream, deeper
#: stacks, and 128-wide heads — the MXU-native tile width (the 23M core
#: model's D=64 heads use half the systolic array's contraction lanes).
#: Evidence that the framework's kernels/step hold their efficiency beyond
#: the reference's model scale.
LARGE_OVERRIDES = {
    "_defaults_": {"dim": 768},
    "encoder": {"depth": 8, "transformer_layer": {
        "attention": {"heads": 6, "head_dim": 128},
        "feed_forward": {"inner_dim": 3072}}},
    "decoder": {"depth": 8},
    "temporal_adaptor": {
        "predictor": {"transformer": {"dim": 512, "depth": 4,
                      "transformer_layer": {
                          "attention": {"heads": 4, "head_dim": 128},
                          "feed_forward": {"inner_dim": 2048}}}},
        "embedding": {"transformer": {"dim": 512, "transformer_layer": {
            "attention": {"heads": 4, "head_dim": 128},
            "feed_forward": {"inner_dim": 2048}}}},
    },
}


def build(batch, text_len, mel_len, seed=0, model_overrides=None):
    from flax import nnx

    from isp_tts_tpu.config import build_config, load_recipe
    from isp_tts_tpu.models.acoustic.model import AcousticModel, AcousticModelConfig
    from isp_tts_tpu.nn.policy import compute_dtype
    from isp_tts_tpu.training.optimizers import build_optimizer
    from isp_tts_tpu.training.trainer_config import OptimizationConfig

    overrides = {"dataset": {"root": "."}}
    if model_overrides:
        overrides["model"] = model_overrides
    recipe = load_recipe("acoustic/core", "recipes", overrides=overrides)
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
    return model, criterion, tx, batch_data, dict(recipe["model"])


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
    ap.add_argument("--preset", choices=["core", "large"], default="core",
                    help="'large' = ~115M-param config (dim 768, depth 8, "
                         "128-wide heads): framework efficiency beyond the "
                         "reference's 23M model scale")
    ap.add_argument("--ring", action="store_true",
                    help="run encoder/decoder attention through the "
                         "sequence-parallel ring path (flash='ring') over a "
                         "seq axis spanning the available chips — on ONE "
                         "chip this measures ring's overhead vs the flash "
                         "kernel (the sp mode's worst case: the full "
                         "sequence on one device, einsum chunk math)")
    args = ap.parse_args()

    if not args.threefry:  # match Trainer fast_rng=True (experiment.py)
        jax.config.update("jax_default_prng_impl", "rbg")

    from flax import nnx

    overrides = dict(LARGE_OVERRIDES) if args.preset == "large" else None
    if args.ring:
        from isp_tts_tpu.parallel.context import (ParallelContext,
                                                  set_parallel_context)
        from isp_tts_tpu.parallel.mesh import make_mesh

        n = len(jax.devices())
        mesh = make_mesh(data=1, seq=n, devices=jax.devices()[:n])
        set_parallel_context(ParallelContext(mesh=mesh, seq_axis="seq"))
        overrides = overrides or {}
        overrides.setdefault("encoder", {}).setdefault(
            "transformer_layer", {}).setdefault(
            "attention", {})["flash"] = "ring"
        print(f"ring mode: seq axis over {n} device(s)")

    model, criterion, tx, batch, model_cfg = build(
        args.batch, args.text_len, args.mel_len, model_overrides=overrides)
    from isp_tts_tpu.utils.misc import count_parameters

    graphdef, state = nnx.split(model)
    params = nnx.state(model, nnx.Param)
    print(f"preset={args.preset} params={count_parameters(params):,}")
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

    _print_mfu(f_large, state, opt_state, args, per_step, model_cfg)

    if args.profile:
        with jax.profiler.trace(args.trace_dir):
            np.asarray(f_large(state, opt_state))
        print(f"trace written to {args.trace_dir}")


#: bf16 peak TFLOP/s by device kind (dense); fallback assumes v5e
_PEAK_TFLOPS = {"TPU v4": 275.0, "TPU v5e": 197.0, "TPU v5 lite": 197.0,
                "TPU v5p": 459.0, "TPU v6e": 918.0, "TPU v6 lite": 918.0}


def _hlo_matmul_flops(text: str) -> float:
    """Sum matmul/conv FLOPs from optimized HLO text.

    On TPU every dot lowers to a `convolution` op; for each one
    flops = 2 * prod(output_shape) * prod(rhs_shape) / rhs_'o'_dim — the
    reduction length per output element is the kernel's non-output-feature
    extent (holds for feature/batch-grouped convs incl. wgrad). XLA's
    executable cost_analysis undercounts badly here (fused dots), so this
    parses the module text instead. Pallas custom-call flops are invisible
    to both and counted analytically by the caller.
    """
    import re

    def_dims: dict[str, str] = {}
    name_re = re.compile(r"^\s*(?:ROOT\s+)?%([\w.\-]+) = \(?\w+\[([\d,]*)\]",
                         re.M)
    for m in name_re.finditer(text):
        def_dims.setdefault(m.group(1), m.group(2))

    conv_re = re.compile(
        r"= \w+\[([\d,]*)\]\S* convolution\(%([\w.\-]+), %([\w.\-]+)\),"
        r".*?dim_labels=\w+_(\w+)->")
    total = 0.0
    for m in conv_re.finditer(text):
        out_dims, _lhs, rhs, rhs_labels = m.groups()
        rdims = def_dims.get(rhs)
        if rdims is None or "o" not in rhs_labels:
            continue
        out_n = 1
        for d in out_dims.split(","):
            if d:
                out_n *= int(d)
        rshape = [int(d) for d in rdims.split(",") if d]
        red = 1
        for lbl, d in zip(rhs_labels, rshape):
            if lbl != "o":
                red *= d
        total += 2.0 * out_n * red
    return total


def _print_mfu(f_large, state, opt_state, args, per_step, model_cfg):
    """MFU estimate: HLO-parsed matmul flops + analytic Pallas flash-kernel
    flops (custom calls are opaque to XLA) over the bf16 peak. The scan
    body appears once in the module text, so the parsed total is per-step
    (out-of-loop setup ops contribute <1%)."""
    try:
        text = f_large.lower(state, opt_state).compile().as_text()
        xla_flops = _hlo_matmul_flops(text)
    except Exception as e:  # noqa: BLE001
        print(f"(hlo flop census unavailable: {e})")
        return
    B = args.batch

    # folded-MQA flash per layer: fwd 2 matmuls + fused bwd 5, each
    # 2*(N*H)*M*D FLOP; heads/head_dim/depth read from the resolved recipe
    def attn_flops(n, m, block):
        a = block["transformer_layer"]["attention"]
        return (int(block.get("depth", 1)) * 7 * 2
                * (n * int(a["heads"])) * m * int(a["head_dim"]) * B)

    ta = model_cfg["temporal_adaptor"]
    if getattr(args, "ring", False):
        # ring mode: enc/dec attention runs as plain einsums, which the HLO
        # census already counts — adding the flash-analytic term would
        # double-count it (the predictor/embedding stacks still use flash)
        flash = (attn_flops(args.text_len, args.text_len,
                            ta["predictor"]["transformer"])
                 + attn_flops(args.mel_len, args.mel_len,
                              ta["embedding"]["transformer"]))
    else:
        flash = (attn_flops(args.text_len, args.text_len, model_cfg["encoder"])
                 + attn_flops(args.mel_len, args.mel_len, model_cfg["decoder"])
                 + attn_flops(args.text_len, args.text_len,
                              ta["predictor"]["transformer"])
                 + attn_flops(args.mel_len, args.mel_len,
                              ta["embedding"]["transformer"]))
    total = xla_flops + flash
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in _PEAK_TFLOPS.items() if k in kind), 197.0)
    achieved = total / per_step / 1e12
    print(f"flops/step: hlo-matmul {xla_flops/1e9:.1f}G + flash(analytic) "
          f"{flash/1e9:.1f}G = {total/1e9:.1f}G -> {achieved:.1f} TFLOP/s "
          f"= {100 * achieved / peak:.1f}% MFU ({kind} bf16 peak {peak:.0f}T)")


if __name__ == "__main__":
    main()
