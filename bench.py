"""Benchmark: batch-32 mel synthesis throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": "mel_synthesis_xrt_b32", "value": N, "unit": "x_realtime",
   "vs_baseline": N}

value = aggregate real-time factor: seconds of speech synthesized per
wall-clock second of DEVICE time, batch 32, 4 ODE steps, full core.yaml
model (23M params, bf16). Baseline = 95.2x RT, the reference's warm
single-stream acoustic inference on a Colab GPU (0.0315 s for a ~3 s
utterance, BASELINE.md / training.ipynb cell 26).

Methodology: host wall timing through this environment's TPU relay includes
~30 ms of fixed dispatch latency and `block_until_ready` does not reliably
wait, so the measurement runs N synthesis iterations chained inside ONE jit
(`lax.scan`, data-dependent carry) and host-fetches the per-iteration means;
device time per call = (t_large - t_small) / (N_large - N_small).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


from isp_tts_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

BASELINE_XRT = 95.2  # reference warm GPU RTF (single stream)

BATCH = 32
TEXT_LEN = 128
MAX_DEC_LEN = 1024
ODE_STEPS = 4
SAMPLE_RATE = 22050
HOP = 256
N_SMALL, N_LARGE = 2, 12


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
    try:
        _run()
    except Exception as e:  # noqa: BLE001 — always emit the contract line
        print(f"bench fallback ({type(e).__name__}: {e})", file=sys.stderr)
        print(json.dumps({
            "metric": "mel_synthesis_xrt_b32", "value": 0.0,
            "unit": "x_realtime", "vs_baseline": 0.0,
        }))
        raise SystemExit(1)


def _run():
    from flax import nnx

    model = build_model()
    graphdef, state = nnx.split(model)

    rng = np.random.RandomState(0)
    text = jax.device_put(rng.randint(2, 148, size=(BATCH, TEXT_LEN)).astype(np.int32))
    lens = jax.device_put(np.full((BATCH,), TEXT_LEN, np.int32))
    # fixed durations (8 frames/token) keep output frames static across runs
    durations = jax.device_put(
        np.full((BATCH, TEXT_LEN), MAX_DEC_LEN // TEXT_LEN, np.float32))

    def make(n_iter, predicted: bool, inputs=None, post=None):
        """One jitted program chaining n_iter synth calls; ``post(mel, key)``
        optionally extends each iteration (Griffin-Lim, neural vocoder)."""
        b_text, b_lens, b_dur, b_dec = inputs or (text, lens, durations,
                                                  MAX_DEC_LEN)

        @jax.jit
        def synth_many(state, key):
            m = nnx.merge(graphdef, state)

            def body(carry, k):
                mel, _ = m.infer(
                    b_text, text_lengths=b_lens, max_dec_len=b_dec,
                    duration_target=None if predicted else b_dur,
                    steps=ODE_STEPS, key=k, pitch_delta=carry)
                out = post(mel, k) if post is not None else mel
                nxt = jnp.minimum(jnp.abs(jnp.mean(out)), 0.0).astype(jnp.float32)
                return nxt, jnp.mean(out).astype(jnp.float32)

            keys = jax.random.split(key, n_iter)
            _, outs = jax.lax.scan(body, jnp.float32(0.0), keys)
            return outs

        return synth_many

    def timed(f, key):
        t0 = time.perf_counter()
        np.asarray(f(state, key))  # host fetch forces completion
        return time.perf_counter() - t0

    def measure(predicted: bool, inputs=None, n_small=N_SMALL,
                n_large=N_LARGE, post=None) -> float:
        f_small = make(n_small, predicted, inputs, post)
        f_large = make(n_large, predicted, inputs, post)
        o = np.asarray(f_small(state, jax.random.PRNGKey(0)))  # warm/compile
        np.asarray(f_large(state, jax.random.PRNGKey(0)))
        assert np.isfinite(o).all()
        t_small = min(timed(f_small, jax.random.PRNGKey(i)) for i in (1, 2))
        t_large = min(timed(f_large, jax.random.PRNGKey(i)) for i in (3, 4))
        return (t_large - t_small) / (n_large - n_small)

    per_call = measure(predicted=False)
    # the real serving path: durations predicted by the flow (exp/round/clip
    # + soft-path construction included in the measured program); shapes stay
    # static at max_dec_len so cost is shape-independent (VERDICT r1 weak #8)
    per_call_pred = measure(predicted=True)

    # single-stream latency (BASELINE.md tracked metric "RTF at batch 1"):
    # one ~8-word utterance, 4 ODE steps, device time per call. Reference
    # warm number: 31.5 ms on a Colab GPU (training.ipynb cell 26).
    B1_TEXT, B1_DEC = 32, 256  # 32 tokens -> 256 frames ~= 2.97 s of speech
    b1_inputs = (
        jax.device_put(rng.randint(2, 148, size=(1, B1_TEXT)).astype(np.int32)),
        jax.device_put(np.full((1,), B1_TEXT, np.int32)),
        jax.device_put(np.full((1, B1_TEXT), B1_DEC // B1_TEXT, np.float32)),
        B1_DEC,
    )
    # per-iteration device time at B=1 is sub-ms, so the 2-vs-12 iteration
    # difference drowns in relay dispatch jitter — chain two orders of
    # magnitude more iterations to pull the signal out
    per_call_b1 = measure(predicted=True, inputs=b1_inputs,
                          n_small=64, n_large=512)

    # bf16 serving weights (serving.cast_float_state): B=1 is weights-
    # streaming-bound, so halving HBM bytes should show directly
    from isp_tts_tpu.serving import cast_float_state

    state_f32 = state
    state = cast_float_state(state, "bf16")
    try:
        per_call_b1_bf16 = measure(predicted=True, inputs=b1_inputs,
                                   n_small=64, n_large=512)
    finally:
        state = state_f32

    # text -> WAVEFORM: mel synthesis + the TPU-native matmul-DFT Griffin-Lim
    # (ops/vocoder.griffin_lim_matmul — no complex dtypes/FFT/scatter) fused
    # into one jitted program; the committed number is audible end-to-end
    # speech per device-second, not mel frames (VERDICT r2 missing #5)
    from isp_tts_tpu.ops.vocoder import mel_to_audio_tpu

    per_call_audio = measure(
        predicted=False,
        post=lambda mel, k: mel_to_audio_tpu(
            mel.astype(jnp.float32), SAMPLE_RATE, n_iter=16, key=k))

    # text -> waveform through the TRAINED in-repo neural vocoder (the
    # committed convergence-run checkpoint): acoustic infer + Vocos-style
    # generator chained in the same scanned program
    per_call_voc = None
    from pathlib import Path as _Path

    voc_ckpt = _Path(__file__).parent / "docs/assets/vocoder_r3/vocoder_synth_r3.f16.ckpt"
    if voc_ckpt.exists():
        from isp_tts_tpu.models import VocoderModel

        vocoder = VocoderModel.from_pretrained(voc_ckpt)
        vocoder.eval()
        voc_graphdef, voc_state = nnx.split(vocoder)

        def voc_post(mel, k):
            v = nnx.merge(voc_graphdef, voc_state)
            return v.infer(mel.astype(jnp.float32))

        per_call_voc = measure(predicted=False, post=voc_post)

    frames = BATCH * MAX_DEC_LEN
    xrt = frames * HOP / SAMPLE_RATE / per_call
    xrt_pred = frames * HOP / SAMPLE_RATE / per_call_pred
    xrt_audio = frames * HOP / SAMPLE_RATE / per_call_audio

    b1_audio_s = B1_DEC * HOP / SAMPLE_RATE

    print(f"device={jax.devices()[0]} per-call={per_call*1000:.2f}ms "
          f"(predicted-duration {per_call_pred*1000:.2f}ms, "
          f"text->waveform {per_call_audio*1000:.2f}ms, "
          f"b1 latency {per_call_b1*1000:.2f}ms) "
          f"mel_frames/s={frames/per_call:,.0f}", file=sys.stderr)
    result = {
        "metric": "mel_synthesis_xrt_b32",
        "value": round(xrt, 1),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / BASELINE_XRT, 2),
        "predicted_duration_xrt": round(xrt_pred, 1),
        "audio_xrt_b32": round(xrt_audio, 1),
        "b1_latency_ms": round(per_call_b1 * 1000, 2),
        "b1_xrt": round(b1_audio_s / per_call_b1, 1),
        "b1_latency_bf16w_ms": round(per_call_b1_bf16 * 1000, 2),
    }
    if per_call_voc is not None:
        result["neural_vocoder_xrt_b32"] = round(
            frames * HOP / SAMPLE_RATE / per_call_voc, 1)

    # end-to-end HOST-level serving lane (VERDICT r3 #3): text in -> wav
    # bytes out through the real Synthesizer/daemon dispatch path, so the
    # number a user feels (host encode + dispatch + relay + device) is
    # driver-tracked, not just the device-scan lanes above. NOTE: this
    # environment reaches the TPU through a relay that adds ~30 ms of fixed
    # per-call dispatch latency — b1_e2e_ms carries that constant; on a
    # directly-attached host the same path measures lower.
    try:
        result.update(_e2e_lane(model))
    except Exception as e:  # noqa: BLE001
        print(f"e2e lane skipped ({type(e).__name__}: {e})", file=sys.stderr)

    # train-step throughput (BASELINE.md tracked metric "train steps/sec";
    # reference: 20.7 samples/s T4 fine-tune, training.ipynb cell 16). Runs
    # LAST: it flips the PRNG impl to the trainer's rbg default, which must
    # not touch the serving measurements above. Failure here must not cost
    # the serving metrics.
    try:
        result.update(_train_lane())
    except Exception as e:  # noqa: BLE001
        print(f"train lane skipped ({type(e).__name__}: {e})", file=sys.stderr)
    print(json.dumps(result))


def _e2e_lane(model) -> dict:
    """b1_e2e_ms: wall-clock for ONE warm request (text -> tokens -> device
    -> waveform -> wav bytes) through the Synthesizer; daemon_req_s:
    sustained throughput of the HTTP daemon under 8 concurrent clients
    (coalescing + encoder-thread overlap included). Matches the reference's
    notebook timing contract (inference.ipynb cell 25 measures wall time)."""
    import threading
    import urllib.request

    from isp_tts_tpu.data.text.table import CodingTable
    from isp_tts_tpu.serving import Synthesizer, SynthesizerConfig
    from isp_tts_tpu.serving_server import ServerConfig, TTSServer, encode_wav

    synth = Synthesizer(model, SynthesizerConfig(
        steps=ODE_STEPS, text_buckets=(64, 128), frame_budgets=(512, 1024),
        batch_buckets=(1, 2, 4, 8), frames_per_token=8.0))
    # the bench model's embedding table is sized for a 150-symbol vocab; the
    # host path runs the REAL text front-end over the core charset (ids all
    # < 150, so every token hits a valid row)
    synth.text_provider.coding_table = CodingTable.from_charset(
        ["<pad>", "</s>", "#punct", "#en"])

    from pathlib import Path as _Path

    voc_ckpt = _Path(__file__).parent / "docs/assets/vocoder_r3/vocoder_synth_r3.f16.ckpt"
    if voc_ckpt.exists():
        try:
            from isp_tts_tpu.models import VocoderModel

            synth.attach_vocoder(VocoderModel.from_pretrained(voc_ckpt))
        except Exception as e:  # noqa: BLE001 — Griffin-Lim fallback is fine
            print(f"e2e lane: vocoder not attached ({e})", file=sys.stderr)

    text = ("printing, in the only sense with which we are at present "
            "concerned, differs from most other arts.")
    sr = int(synth.vocoder.features_config.sample_rate
             if synth.vocoder is not None
             else synth._audio_geometry()["sample_rate"])
    # warm/compile every shape the lane will hit: b1 for the latency loop,
    # the coalescing batch buckets for the daemon loop (a cold compile
    # inside the measurement window would swamp the throughput number)
    for b in (1, 2, 4, 8):
        wav = synth.synthesize_audio([text] * b)[0]
    audio_s = len(wav) / sr

    laps = []
    for i in range(20):
        t0 = time.perf_counter()
        out = synth.synthesize_audio(text, seed=i)[0]
        _payload = encode_wav(out, sr)
        laps.append(time.perf_counter() - t0)
    b1_e2e = float(np.median(laps))

    # daemon throughput: 8 concurrent clients x 8 requests each against the
    # real HTTP server (in-process; same chip) — coalescing batches them
    server = TTSServer(synth, port=0,
                       config=ServerConfig(max_batch=8, max_wait_ms=5.0))
    port = server.start()
    try:
        url = f"http://127.0.0.1:{port}/synthesize"

        lat_ms: list = []
        lat_lock = threading.Lock()

        def post():
            body = json.dumps({"text": text, "format": "wav"}).encode()
            req = urllib.request.Request(
                url, data=body, headers={"Content-Type": "application/json"})
            t0 = time.perf_counter()
            with urllib.request.urlopen(req, timeout=600) as resp:
                resp.read()
            dt = (time.perf_counter() - t0) * 1000
            with lat_lock:
                lat_ms.append(dt)

        post()  # warm the daemon path end-to-end
        lat_ms.clear()
        n_clients, per_client = 8, 8
        t0 = time.perf_counter()
        threads = [threading.Thread(target=lambda: [post() for _ in
                                                    range(per_client)])
                   for _ in range(n_clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        elapsed = time.perf_counter() - t0
        req_s = n_clients * per_client / elapsed
        # per-request latency UNDER the 8-client load (the serving-SLO
        # number: queueing + coalescing wait included, not bare compute)
        p50 = float(np.percentile(lat_ms, 50))
        p95 = float(np.percentile(lat_ms, 95))
    finally:
        server.stop()

    print(f"e2e: b1 {b1_e2e*1000:.1f} ms wall ({audio_s:.2f}s audio), "
          f"daemon {req_s:.1f} req/s p50 {p50:.0f} ms p95 {p95:.0f} ms "
          f"(coalesced "
          f"{server.stats['requests']}/{server.stats['batches']} per call)",
          file=sys.stderr)
    return {
        "b1_e2e_ms": round(b1_e2e * 1000, 1),
        "b1_e2e_xrt": round(audio_s / b1_e2e, 1),
        "daemon_req_s": round(req_s, 1),
        "daemon_p50_ms": round(p50, 1),
        "daemon_p95_ms": round(p95, 1),
    }


TRAIN_BASELINE_SAMPLES_S = 20.7  # reference T4 fine-tune (BASELINE.md)


def _train_lane() -> dict:
    """ms/step for the fully-jitted core-recipe train step (fwd + 4-term
    loss + grads + adamw) at production shapes, chained-scan methodology —
    the number behind docs/PERF_R3.md, recorded by the driver."""
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent / "tools"))
    import bench_train
    from flax import nnx

    jax.config.update("jax_default_prng_impl", "rbg")  # Trainer fast_rng
    model, criterion, tx, batch, _cfg = bench_train.build(32, 128, 768)
    graphdef, state = nnx.split(model)
    opt_state = tx.init(nnx.state(model, nnx.Param))

    def make(n_iter):
        @jax.jit
        def many(model_state, opt_state):
            def body(carry, step):
                ms, os_ = carry
                m = nnx.merge(graphdef, ms)

                def loss_fn(mm):
                    inputs = mm.prepare_inputs(batch)
                    loss, losses = criterion(inputs, mm(**inputs), step)
                    return loss.astype(jnp.float32), losses

                (loss, _), grads = nnx.value_and_grad(
                    loss_fn, has_aux=True)(m)
                p = nnx.state(m, nnx.Param)
                updates, os_ = tx.update(grads, os_, p)
                nnx.update(m, jax.tree.map(lambda a, b: a + b, p, updates))
                _gd, ms = nnx.split(m)
                return (ms, os_), loss

            (_ms, _os), losses = jax.lax.scan(
                body, (model_state, opt_state),
                jnp.arange(n_iter, dtype=jnp.int32))
            return losses

        return many

    f_small, f_large = make(N_SMALL), make(N_LARGE)
    losses = np.asarray(f_small(state, opt_state))  # warm/compile
    assert np.isfinite(losses).all()
    np.asarray(f_large(state, opt_state))

    def timed(f):
        t0 = time.perf_counter()
        np.asarray(f(state, opt_state))
        return time.perf_counter() - t0

    t_small = min(timed(f_small) for _ in range(2))
    t_large = min(timed(f_large) for _ in range(2))
    per_step = (t_large - t_small) / (N_LARGE - N_SMALL)
    samples_s = 32 / per_step
    print(f"train step: {per_step*1000:.2f} ms (B=32, mel 768) "
          f"= {samples_s:.0f} samples/s", file=sys.stderr)
    return {
        "train_step_ms_b32": round(per_step * 1000, 2),
        "train_samples_per_s": round(samples_s, 1),
        "vs_train_baseline": round(samples_s / TRAIN_BASELINE_SAMPLES_S, 1),
    }


if __name__ == "__main__":
    main()
