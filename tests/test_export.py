"""AOT serving export tests: artifact == live Synthesizer, no model code."""

import numpy as np
import pytest
from flax import nnx

from isp_tts_tpu.config import build_config
from isp_tts_tpu.export import ExportedSynthesizer, export_serving
from isp_tts_tpu.models.acoustic.model import AcousticModel, AcousticModelConfig
from isp_tts_tpu.serving import Synthesizer, SynthesizerConfig

from test_serving import TINY

CHARSET = ["<pad>", "</s>", "#punct", "#en"]


def _make_synth(vocoder=False, num_speakers=0):
    from isp_tts_tpu.data.text.table import CodingTable

    ct = CodingTable.from_charset(CHARSET)
    cfg = dict(TINY, encoding_map=dict(ct.encoding_map))
    if num_speakers:
        cfg["num_speakers"] = num_speakers
    model = AcousticModel(build_config(AcousticModelConfig, cfg),
                          rngs=nnx.Rngs(0))
    voc = None
    if vocoder:
        from isp_tts_tpu.config.registry import build_config as bc
        from isp_tts_tpu.models.vocoder import VocoderModel, VocoderModelConfig

        voc = VocoderModel(bc(VocoderModelConfig, {
            "features": {"sample_rate": 22050, "n_fft": 1024,
                         "hop_length": 256, "win_length": 1024, "n_mels": 16,
                         "f_min": 0.0, "f_max": 8000.0},
            "generator": {"dim": 16, "intermediate_dim": 32, "num_layers": 1},
            "discriminator": {"periods": [2], "resolutions": [[64, 16]],
                              "mpd_channels": [2], "mrd_channels": 2},
        }), rngs=nnx.Rngs(1))
    return Synthesizer(model, SynthesizerConfig(
        text_buckets=(16,), frame_budgets=(64,), frames_per_token=3.0,
        steps=1, charset=tuple(CHARSET)), vocoder=voc)


def test_exported_mel_matches_live_synthesizer(tmp_path):
    synth = _make_synth()
    path = tmp_path / "serving.tts.zip"
    meta = export_serving(synth, path, text_bucket=16, frame_budget=64,
                          batch=1)
    assert meta["output"] == "mel" and meta["platforms"]

    ex = ExportedSynthesizer(path)
    text = "hello world."
    got = ex(text, seed=5)[0]
    want = synth(text, seed=5)[0]
    assert got.shape == want.shape  # same dec_lengths
    np.testing.assert_allclose(got, want, atol=2e-5)

    # controls flow through the exported signature
    slow = ex(text, seed=5, duration_factor=1.5)[0]
    assert slow.shape[0] != got.shape[0] or not np.allclose(slow, got)


def test_exported_audio_artifact_is_self_contained(tmp_path):
    """tokens -> WAVEFORM in one exported function (acoustic + vocoder fused,
    mel never exposed), reconstructed from the artifact alone."""
    synth = _make_synth(vocoder=True)
    path = tmp_path / "serving_audio.tts.zip"
    meta = export_serving(synth, path, text_bucket=16, frame_budget=64,
                          batch=1)
    assert meta["output"] == "audio" and meta["hop_length"] == 256

    ex = ExportedSynthesizer(path)
    got = ex("hi there.", seed=3)[0]
    want = synth.synthesize_audio("hi there.", seed=3)[0]
    assert got.shape == want.shape
    # identical contract incl. the [-1, 1] clip (int16 encoders downstream)
    np.testing.assert_allclose(got, want, atol=2e-5)
    assert got.min() >= -1.0 and got.max() <= 1.0


def test_exported_speaker_variant_and_validation(tmp_path):
    synth = _make_synth(num_speakers=3)
    path = tmp_path / "spk.tts.zip"
    export_serving(synth, path, text_bucket=16, frame_budget=64, batch=2,
                   use_speaker=True)
    ex = ExportedSynthesizer(path)
    a = ex("hello.", seed=1, speaker=1)[0]
    b = ex("hello.", seed=1, speaker=2)[0]
    assert a.shape != b.shape or not np.allclose(a, b)
    want = synth("hello.", seed=1, speaker=1)[0]
    n = min(len(a), len(want))
    np.testing.assert_allclose(a[:n], want[:n], atol=2e-5)

    with pytest.raises(ValueError, match="batch"):
        ex(["a.", "b.", "c."])
    with pytest.raises(ValueError, match="bucket"):
        ex("x" * 100)

    # speaker list length must match the texts (live-path parity)
    with pytest.raises(ValueError, match="speaker list"):
        ex(["a.", "b."], speaker=[1])

    # artifact without speaker support rejects the control
    path2 = tmp_path / "nospk.tts.zip"
    export_serving(synth, path2, text_bucket=16, frame_budget=64, batch=1)
    with pytest.raises(ValueError, match="speaker"):
        ExportedSynthesizer(path2)("hello.", speaker=1)


def test_exported_saturation_warns(tmp_path, caplog):
    """A single-shape artifact can't rebucket like the live Synthesizer —
    saturating the exported frame budget must warn, not clip silently."""
    import logging

    synth = _make_synth()
    path = tmp_path / "sat.tts.zip"
    export_serving(synth, path, text_bucket=16, frame_budget=64, batch=1)
    ex = ExportedSynthesizer(path)
    with caplog.at_level(logging.WARNING, logger="isp_tts_tpu"):
        out = ex("hello there.", duration_factor=1000.0)[0]
    assert out.shape[0] == 64  # clamped at the budget
    assert any("saturated" in r.message for r in caplog.records)


def test_export_records_text_pipeline(tmp_path):
    """The phonemizer flag travels with the artifact: loading a
    phonemizer-exported artifact on a host without espeak fails loudly at
    construction instead of silently tokenizing graphemes into garbage."""
    import json
    import zipfile

    synth = _make_synth()
    path = tmp_path / "ph.tts.zip"
    export_serving(synth, path, text_bucket=16, frame_budget=64, batch=1)
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
    assert meta["phonemizer"] is False and meta["language"] == "en-us"

    # forge a phonemizer artifact (this env has no espeak to export one)
    forged = tmp_path / "ph2.tts.zip"
    meta["phonemizer"] = True
    with zipfile.ZipFile(path) as zin, zipfile.ZipFile(forged, "w") as zout:
        zout.writestr("meta.json", json.dumps(meta))
        zout.writestr("fn.jaxexport", zin.read("fn.jaxexport"))
    # ImportError when the phonemizer package is absent; RuntimeError when a
    # shimmed/espeak-less backend is present (tests/reference_shims.py
    # installs one suite-wide) — the contract is "fails LOUDLY at load"
    with pytest.raises((ImportError, RuntimeError)):
        ExportedSynthesizer(forged)


def test_precompiled_artifact_skips_xla_compile(tmp_path):
    """--precompile embeds the compiled executable: a matching host loads
    it (no StableHLO deserialize at all) and produces identical outputs; a
    fingerprint mismatch falls back to the portable path (VERDICT r3 #6 —
    the 354 s AOT cold start)."""
    import json
    import zipfile

    synth = _make_synth()
    plain = tmp_path / "plain.zip"
    pre = tmp_path / "pre.zip"
    export_serving(synth, plain, text_bucket=16, frame_budget=64, batch=1)
    meta = export_serving(synth, pre, text_bucket=16, frame_budget=64,
                          batch=1, precompile=True)
    assert meta.get("precompiled", {}).get("platform") == "cpu"
    assert "exec.xla" in zipfile.ZipFile(pre).namelist()

    # CPU hosts deliberately ignore the embedded executable (XLA:CPU AOT
    # in-process loading is machine-feature-fragile) and use the portable
    # path; accelerator hosts load it (exercised on the real chip by
    # tools/bench_artifact_cold.py)
    ex_pre = ExportedSynthesizer(pre)
    assert ex_pre._loaded is None and ex_pre._fn is not None
    ex_plain = ExportedSynthesizer(plain)
    text = "hello world."
    np.testing.assert_allclose(ex_pre(text, seed=3)[0],
                               ex_plain(text, seed=3)[0], atol=2e-5)

    # corrupt the fingerprint -> portable fallback, same result
    mismatched = tmp_path / "mismatch.zip"
    with zipfile.ZipFile(pre) as src, \
            zipfile.ZipFile(mismatched, "w") as dst:
        for name in src.namelist():
            data = src.read(name)
            if name == "meta.json":
                m = json.loads(data)
                m["precompiled"]["device_kind"] = "some-other-chip"
                data = json.dumps(m)
            dst.writestr(name, data)
    ex_mis = ExportedSynthesizer(mismatched)
    assert ex_mis._loaded is None and ex_mis._fn is not None
    np.testing.assert_allclose(ex_mis(text, seed=3)[0],
                               ex_plain(text, seed=3)[0], atol=2e-5)
