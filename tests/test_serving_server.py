"""Dynamic-batching serving daemon tests (stdlib HTTP client, tiny model)."""

import io
import json
import threading
import urllib.error
import urllib.request
import wave

import numpy as np
import pytest
from flax import nnx

from isp_tts_tpu.config import build_config
from isp_tts_tpu.models.acoustic.model import AcousticModel, AcousticModelConfig
from isp_tts_tpu.serving import Synthesizer, SynthesizerConfig
from isp_tts_tpu.serving_server import (ServerConfig, TTSServer, encode_wav)

from test_serving import TINY


@pytest.fixture(scope="module")
def server():
    from isp_tts_tpu.data.text.table import CodingTable

    charset = ["<pad>", "</s>", "#punct", "#en"]
    ct = CodingTable.from_charset(charset)
    cfg_dict = dict(TINY, encoding_map=dict(ct.encoding_map))
    model = AcousticModel(build_config(AcousticModelConfig, cfg_dict),
                          rngs=nnx.Rngs(0))
    synth = Synthesizer(model, SynthesizerConfig(
        text_buckets=(16, 32), frame_budgets=(64,), frames_per_token=3.0,
        steps=1, charset=tuple(charset)))
    srv = TTSServer(synth, port=0, config=ServerConfig(
        max_batch=8, max_wait_ms=400.0, default_format="mel"))
    port = srv.start()
    yield srv, port
    srv.stop()


def _post(port, payload, path="/synthesize"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as resp:
        return resp.status, resp.headers.get("Content-Type"), resp.read()


def test_healthz(server):
    _, port = server
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz",
                                timeout=30) as resp:
        body = json.loads(resp.read())
    assert resp.status == 200 and body["ok"] is True
    assert set(body["stats"]) >= {"requests", "batches", "max_coalesced"}


def test_single_request_mel(server):
    _, port = server
    status, ctype, body = _post(port, {"text": "hello world."})
    assert status == 200 and ctype == "application/x-npy"
    mel = np.load(io.BytesIO(body))
    assert mel.ndim == 2 and mel.shape[1] == 16 and np.isfinite(mel).all()


def test_wav_format(server):
    _, port = server
    status, ctype, body = _post(port, {"text": "hi there.", "format": "wav"})
    assert status == 200 and ctype == "audio/wav"
    with wave.open(io.BytesIO(body)) as w:
        assert w.getframerate() == 22050
        assert w.getsampwidth() == 2 and w.getnchannels() == 1
        assert w.getnframes() > 0


def test_concurrent_requests_coalesce_into_one_batch(server):
    """N clients inside one batching window must share ONE device call:
    batches advances by less than requests, and max_coalesced > 1."""
    srv, port = server
    # settle in-flight state and warm the bucket so the window isn't
    # dominated by a compile
    _post(port, {"text": "warm."})
    with srv._stats_lock:
        before = dict(srv.stats)

    results, errs = [], []

    def call(i):
        try:
            results.append(_post(port, {"text": f"request number {i}."}))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errs and len(results) == 6
    assert all(s == 200 for s, _, _ in results)
    with srv._stats_lock:
        after = dict(srv.stats)
    assert after["requests"] - before["requests"] == 6
    n_batches = after["batches"] - before["batches"]
    assert n_batches < 6, f"no coalescing: {n_batches} batches for 6 requests"
    assert after["max_coalesced"] > 1


def test_distinct_controls_are_separate_device_calls(server):
    """Controls are batch-wide scalars in the compiled executable, so
    requests with different seeds cannot share a call — but both succeed."""
    srv, port = server
    with srv._stats_lock:
        before = srv.stats["batches"]
    results = []

    def call(seed):
        results.append(_post(port, {"text": "same text.", "seed": seed}))

    threads = [threading.Thread(target=call, args=(s,)) for s in (1, 2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert all(s == 200 for s, _, _ in results)
    with srv._stats_lock:
        assert srv.stats["batches"] - before >= 2


def test_bad_requests(server):
    _, port = server
    for payload in ({}, {"text": ""}, {"text": "ok.", "format": "ogg"},
                    # wrong-typed fields must be HTTP 400, not a dropped
                    # connection: list text (one utterance per request),
                    # non-numeric controls, non-object body
                    {"text": ["a.", "b."]},
                    {"text": "ok.", "speaker": [1]},
                    {"text": "ok.", "duration_factor": None},
                    [1, 2]):
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(port, payload)
        assert exc.value.code == 400, f"payload {payload!r}"
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(port, {"text": "x."}, path="/nope")
    assert exc.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(f"http://127.0.0.1:{port}/nope", timeout=30)
    assert exc.value.code == 404


def test_synthesis_error_is_http_500(server):
    """A failing device call surfaces as HTTP 500 on every coalesced
    request, and the server stays alive."""
    srv, port = server
    real = srv.synthesizer._synthesize_mel

    def boom(*a, **k):
        raise RuntimeError("injected failure")

    srv.synthesizer._synthesize_mel = boom
    try:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(port, {"text": "will fail."})
        assert exc.value.code == 500
        assert "injected failure" in json.loads(exc.value.read())["error"]
    finally:
        srv.synthesizer._synthesize_mel = real
    status, _, _ = _post(port, {"text": "alive again."})
    assert status == 200


def test_pcm_format(server):
    _, port = server
    status, ctype, body = _post(port, {"text": "hi.", "format": "pcm"})
    assert status == 200 and ctype.startswith("audio/L16")
    assert "rate=22050" in ctype
    assert len(body) > 0 and len(body) % 2 == 0  # int16 frames


def test_synthesize_long_streams_chunked_pcm(server):
    """Long-form endpoint: chunked raw-PCM stream — head sentence alone
    (time-to-first-audio), tail sentences coalesced into one device call,
    pause silence between sentences."""
    srv, port = server
    with srv._stats_lock:
        before = dict(srv.stats)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/synthesize_long",
        data=json.dumps({"text": "first one. second bit! third part?",
                         "pause_s": 0.1}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"].startswith("audio/L16")
        assert resp.headers.get("Transfer-Encoding") == "chunked"
        body = resp.read()
    pause = 2 * int(0.1 * 22050)
    assert len(body) > 2 * pause and len(body) % 2 == 0
    with srv._stats_lock:
        after = dict(srv.stats)
    # 3 sentences = 3 requests, but at most 2 device batches (head + tail)
    assert after["requests"] - before["requests"] == 3
    assert after["batches"] - before["batches"] <= 2

    # degenerate input -> 400 before any streaming starts
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(port, {"text": "   "}, path="/synthesize_long")
    assert exc.value.code == 400


def test_synthesize_long_many_sentences_waves(server):
    """A document with more sentences than max_batch streams in bounded
    waves (backpressure can't orphan accepted requests)."""
    srv, port = server
    with srv._stats_lock:
        before = dict(srv.stats)
    text = " ".join(f"sentence number {i}." for i in range(10))
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/synthesize_long",
        data=json.dumps({"text": text, "pause_s": 0.05}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as resp:
        body = resp.read()
    assert len(body) > 9 * 2 * int(0.05 * 22050)
    with srv._stats_lock:
        after = dict(srv.stats)
    assert after["requests"] - before["requests"] == 10
    # head + ceil(9 / max_batch=8) = 2 waves -> at most 3 device calls
    assert after["batches"] - before["batches"] <= 3


def test_transient_error_fails_batch_without_retry_amplification(server):
    """A non-ValueError (transient device error) on a coalesced window must
    fail the window as HTTP 500 WITHOUT N sequential single-row retries."""
    srv, port = server
    real = srv.synthesizer._synthesize_mel
    calls = []

    def boom(*a, **k):
        calls.append(1)
        raise RuntimeError("transient device error")

    srv.synthesizer._synthesize_mel = boom
    try:
        codes = []

        def call(i):
            try:
                _post(port, {"text": f"will fail {i}."})
            except urllib.error.HTTPError as e:
                codes.append(e.code)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
    finally:
        srv.synthesizer._synthesize_mel = real
    assert codes == [500, 500, 500, 500]
    # no amplification: at most one device attempt per coalesced window
    assert len(calls) <= 2


def test_stop_fails_queued_requests_promptly():
    """stop() must fail anything still queued so handler threads don't sit
    out the full request timeout against a dead batcher."""
    from isp_tts_tpu.serving_server import _Pending

    srv = TTSServer.__new__(TTSServer)  # no model needed for this path
    import queue as _q
    import threading as _t

    srv._queue = _q.Queue()
    srv._encode_queue = _q.Queue()
    srv._threads = []
    srv._httpd = None
    srv._stopping = False
    pending = _Pending(text="never served.", controls=(0,))
    srv._queue.put(pending)
    srv.stop()
    assert pending.done.is_set()
    assert pending.error == "server shutting down"


def test_warmup_covers_speaker_variant():
    """warmup() must pre-compile BOTH executable variants on a multi-speaker
    checkpoint (use_speaker is part of the compile key) — otherwise a
    daemon's first speaker-carrying request stalls on a cold compile."""
    from isp_tts_tpu.data.text.table import CodingTable

    charset = ["<pad>", "</s>", "#punct", "#en"]
    ct = CodingTable.from_charset(charset)
    model = AcousticModel(build_config(AcousticModelConfig, dict(
        TINY, encoding_map=dict(ct.encoding_map), num_speakers=2)),
        rngs=nnx.Rngs(0))
    synth = Synthesizer(model, SynthesizerConfig(
        text_buckets=(16,), frame_budgets=(64,), steps=1,
        charset=tuple(charset)))
    synth.warmup(batch_sizes=(1,))
    keys = set(synth._compiled)
    assert (16, 64, 1, False) in keys and (16, 64, 1, True) in keys

    # single-speaker: only the no-speaker variant exists
    model1 = AcousticModel(build_config(AcousticModelConfig, dict(
        TINY, encoding_map=dict(ct.encoding_map))), rngs=nnx.Rngs(0))
    synth1 = Synthesizer(model1, SynthesizerConfig(
        text_buckets=(16,), frame_budgets=(64,), steps=1,
        charset=tuple(charset)))
    synth1.warmup(batch_sizes=(1,))
    assert set(synth1._compiled) == {(16, 64, 1, False)}


def test_daemon_over_mesh_synthesizer():
    """The daemon composes with mesh-sharded serving: a Synthesizer bound
    to the virtual 8-device mesh serves HTTP requests identically (weights
    replicated, coalesced batches sharded over the data axis)."""
    from isp_tts_tpu.data.text.table import CodingTable
    from isp_tts_tpu.parallel.mesh import make_mesh

    charset = ["<pad>", "</s>", "#punct", "#en"]
    ct = CodingTable.from_charset(charset)
    model = AcousticModel(build_config(AcousticModelConfig, dict(
        TINY, encoding_map=dict(ct.encoding_map))), rngs=nnx.Rngs(0))
    synth = Synthesizer(model, SynthesizerConfig(
        text_buckets=(16,), frame_budgets=(64,), frames_per_token=3.0,
        steps=1, charset=tuple(charset)), mesh=make_mesh(data=-1, model=1))
    srv = TTSServer(synth, port=0, config=ServerConfig(
        max_batch=8, max_wait_ms=200.0, default_format="mel"))
    port = srv.start()
    try:
        status, _, body = _post(port, {"text": "mesh served."})
        assert status == 200
        mel = np.load(io.BytesIO(body))
        assert mel.shape[1] == 16 and np.isfinite(mel).all()

        results = []

        def call(i):
            results.append(_post(port, {"text": f"mesh batch {i}."}))

        threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert len(results) == 4 and all(s == 200 for s, _, _ in results)
        with srv._stats_lock:
            assert srv.stats["max_coalesced"] >= 2
    finally:
        srv.stop()


def test_poison_request_does_not_fail_the_batch(server):
    """One bad input in a coalesced window (text over the largest bucket ->
    ValueError) must fail ONLY the offender (HTTP 400), not the innocent
    requests sharing its device call."""
    srv, port = server
    results, codes = [], []

    def good(i):
        try:
            results.append(_post(port, {"text": f"fine request {i}."}))
        except urllib.error.HTTPError as e:
            codes.append(("good", e.code))

    def poison():
        try:
            _post(port, {"text": "x" * 500})  # exceeds every text bucket
        except urllib.error.HTTPError as e:
            codes.append(("poison", e.code))

    threads = [threading.Thread(target=good, args=(i,)) for i in range(3)]
    threads.append(threading.Thread(target=poison))
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(results) == 3 and all(s == 200 for s, _, _ in results)
    assert ("poison", 400) in codes
    assert not any(k == "good" for k, _ in codes)


def test_queue_backpressure_returns_503():
    """Requests beyond max_queue are rejected (HTTP 503 via
    OverloadedError), not buffered without bound."""
    from isp_tts_tpu.serving_server import OverloadedError, _Pending

    srv = TTSServer.__new__(TTSServer)
    import queue as _q
    import threading as _t

    srv._queue = _q.Queue()
    srv._stats_lock = _t.Lock()
    srv.stats = {"requests": 0, "batches": 0, "errors": 0,
                 "max_coalesced": 0, "rejected": 0}
    srv.config = ServerConfig(max_queue=2)
    srv.enqueue("one."), srv.enqueue("two.")
    with pytest.raises(OverloadedError):
        srv.enqueue("three.")
    assert srv.stats["rejected"] == 1 and srv.stats["requests"] == 2


def test_daemon_serves_from_aot_artifact(tmp_path):
    """The daemon runs from an exported artifact alone (ArtifactServing):
    wav + streaming endpoints work, mel format is a client error, and the
    coalescing cap respects the artifact's single compiled batch shape."""
    from isp_tts_tpu.export import ExportedSynthesizer, export_serving
    from isp_tts_tpu.serving_server import ArtifactServing
    from test_export import _make_synth

    synth = _make_synth(vocoder=True)
    path = tmp_path / "daemon.tts.zip"
    export_serving(synth, path, text_bucket=16, frame_budget=64, batch=4)
    adapter = ArtifactServing(ExportedSynthesizer(path))
    assert adapter.max_batch == 4
    srv = TTSServer(adapter, port=0, config=ServerConfig(
        max_batch=4, max_wait_ms=200.0, default_format="wav"))
    port = srv.start()
    try:
        status, ctype, body = _post(port, {"text": "hi there."})
        assert status == 200 and ctype == "audio/wav"
        with wave.open(io.BytesIO(body)) as w:
            assert w.getframerate() == 22050 and w.getnframes() > 0

        # mel is a client error on an audio artifact
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(port, {"text": "hi.", "format": "mel"})
        assert exc.value.code == 400

        # concurrent requests coalesce within the artifact's batch shape
        results = []

        def call(i):
            results.append(_post(port, {"text": f"batch {i}."}))

        threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert len(results) == 4 and all(s == 200 for s, _, _ in results)

        # streaming long-form through the artifact
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize_long",
            data=json.dumps({"text": "one. two. three."}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"].startswith("audio/L16")
            assert len(resp.read()) > 0
    finally:
        srv.stop()

    # a mel artifact is rejected at adapter construction
    path2 = tmp_path / "mel.tts.zip"
    export_serving(_make_synth(), path2, text_bucket=16, frame_budget=64)
    with pytest.raises(ValueError, match="audio artifact"):
        ArtifactServing(ExportedSynthesizer(path2))


def test_encode_wav_roundtrip():
    sr = 16000
    audio = np.sin(np.linspace(0, 100, 1600)).astype(np.float32) * 0.5
    data = encode_wav(audio, sr)
    with wave.open(io.BytesIO(data)) as w:
        assert w.getframerate() == sr and w.getnframes() == 1600
        pcm = np.frombuffer(w.readframes(1600), "<i2").astype(np.float32)
    np.testing.assert_allclose(pcm / 32767.0, audio, atol=1e-4)


def test_lone_request_skips_batching_window(server):
    """A lone request on an idle daemon must dispatch immediately — the
    max_wait_ms coalescing window only opens on evidence of concurrency
    (peers queued / previous window >1), so single-stream latency never
    pays it. A 5 s window with a << 2.5 s response proves the skip."""
    import time

    srv, _ = server
    srv2 = TTSServer(srv.synthesizer, port=0, config=ServerConfig(
        max_batch=8, max_wait_ms=5000.0, default_format="mel"))
    port2 = srv2.start()
    try:
        _post(port2, {"text": "warm."})  # executables already cached
        t = time.monotonic()
        status, _, _ = _post(port2, {"text": "solo goes now."})
        elapsed = time.monotonic() - t
        assert status == 200
        assert elapsed < 2.5, f"lone request waited the window: {elapsed:.2f}s"
    finally:
        srv2.stop()
