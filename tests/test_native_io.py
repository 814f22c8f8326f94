"""Native (C++) WAV decode: exact parity with the Python reader, batch
semantics, error surface, and graceful fallback.

The native library is the TPU build's counterpart of the reference's
torch-DataLoader native decode workers (reference trainer.py:211-239);
its contract is "bit-identical to data/audio.py, just parallel".
"""

import struct
import wave

import numpy as np
import pytest

from isp_tts_tpu import native
from isp_tts_tpu.data.audio import load_audio, load_audio_batch, read_wav, write_wav

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _write_pcm(path, data_i, sampwidth, rate=16000, channels=1):
    """Write raw integer PCM via the stdlib (supports 1/2/3/4-byte)."""
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        if sampwidth == 1:
            raw = (data_i.astype(np.int32) + 128).astype(np.uint8).tobytes()
        elif sampwidth == 2:
            raw = data_i.astype("<i2").tobytes()
        elif sampwidth == 4:
            raw = data_i.astype("<i4").tobytes()
        else:  # 24-bit: pack low/mid/high bytes
            v = data_i.astype(np.int64) & 0xFFFFFF
            b = np.zeros((len(v), 3), dtype=np.uint8)
            b[:, 0] = v & 0xFF
            b[:, 1] = (v >> 8) & 0xFF
            b[:, 2] = (v >> 16) & 0xFF
            raw = b.tobytes()
        w.writeframes(raw)


def _write_float32(path, data_f, rate=16000, channels=1, extensible=False):
    """IEEE-float WAV (fmt tag 3), optionally via WAVE_FORMAT_EXTENSIBLE —
    the stdlib wave module cannot write (or read) these."""
    payload = data_f.astype("<f4").tobytes()
    block = 4 * channels
    if extensible:
        sub = struct.pack("<HHI", 3, 0, 0) + b"\x00" * 10  # tag 3 GUID head
        fmt = struct.pack("<HHIIHHH", 0xFFFE, channels, rate, rate * block,
                          block, 32, 22) + struct.pack("<H", 32) + \
            struct.pack("<I", (1 << channels) - 1) + sub[:16]
    else:
        fmt = struct.pack("<HHIIHH", 3, channels, rate, rate * block, block, 32)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt +
              (b"\x00" if len(fmt) & 1 else b"") +
              b"data" + struct.pack("<I", len(payload)) + payload)
    riff = b"WAVE" + chunks
    path.write_bytes(b"RIFF" + struct.pack("<I", len(riff)) + riff)


@pytest.mark.parametrize("sampwidth,lo,hi", [
    (1, -128, 127), (2, -32768, 32767), (3, -(1 << 23), (1 << 23) - 1),
    (4, -(1 << 31), (1 << 31) - 1)])
def test_pcm_widths_match_python_reader_exactly(tmp_path, sampwidth, lo, hi):
    rng = np.random.default_rng(sampwidth)
    data = rng.integers(lo, hi, size=777, endpoint=True)
    data[:2] = (lo, hi)  # pin the extremes
    p = tmp_path / "t.wav"
    _write_pcm(p, data, sampwidth)
    ref, sr_ref = read_wav(p)
    got, sr = native.decode_wav_mono(p)
    assert sr == sr_ref == 16000
    np.testing.assert_array_equal(got, ref[0])


def test_stereo_mixdown_matches_python(tmp_path):
    rng = np.random.default_rng(7)
    data = rng.integers(-32768, 32767, size=500 * 2, endpoint=True)
    p = tmp_path / "st.wav"
    _write_pcm(p, data, 2, channels=2)
    ref_x, _ = read_wav(p)
    ref = ref_x.mean(axis=0)  # the Python load_audio mixdown
    got, _ = native.decode_wav_mono(p)
    np.testing.assert_array_equal(got, ref.astype(np.float32))


@pytest.mark.parametrize("extensible", [False, True])
def test_float32_and_extensible(tmp_path, extensible):
    rng = np.random.default_rng(3)
    data = rng.standard_normal(300).astype(np.float32) * 0.5
    p = tmp_path / "f.wav"
    _write_float32(p, data, extensible=extensible)
    got, sr = native.decode_wav_mono(p)
    assert sr == 16000
    np.testing.assert_array_equal(got, data)


def test_batch_equals_single_and_thread_counts(tmp_path):
    rng = np.random.default_rng(11)
    paths = []
    for i in range(9):
        p = tmp_path / f"b{i}.wav"
        _write_pcm(p, rng.integers(-32768, 32767, size=100 + 37 * i), 2)
        paths.append(p)
    singles = [native.decode_wav_mono(p) for p in paths]
    for n_threads in (0, 1, 3, 16):
        batch = native.decode_wav_batch(paths, n_threads=n_threads)
        assert len(batch) == len(paths)
        for (bx, bsr), (sx, ssr) in zip(batch, singles):
            assert bsr == ssr
            np.testing.assert_array_equal(bx, sx)


def test_error_surface(tmp_path):
    missing = tmp_path / "nope.wav"
    with pytest.raises(ValueError, match="missing"):
        native.decode_wav_mono(missing)
    junk = tmp_path / "junk.wav"
    junk.write_bytes(b"RIFFxxxxJUNK" + b"\x00" * 64)
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        native.decode_wav_mono(junk)
    ok = tmp_path / "ok.wav"
    _write_pcm(ok, np.arange(-5, 5), 2)
    with pytest.raises(ValueError, match="batch decode failed"):
        native.decode_wav_batch([ok, missing])


def test_load_audio_takes_native_path_and_falls_back(tmp_path, monkeypatch):
    p = tmp_path / "t.wav"
    write_wav(p, np.sin(np.linspace(0, 40, 4000, dtype=np.float32))[None], 16000)
    via_native = load_audio(p)
    # force the pure-Python path and compare
    monkeypatch.setattr(native, "_lib_cache", None)
    via_python = load_audio(p)
    np.testing.assert_array_equal(via_native, via_python)
    batch = load_audio_batch([p, p])  # python fallback branch
    np.testing.assert_array_equal(batch[0], via_python)


def test_load_audio_batch_resamples_like_single(tmp_path):
    p = tmp_path / "sr.wav"
    write_wav(p, np.sin(np.linspace(0, 60, 8000, dtype=np.float32))[None], 16000)
    single = load_audio(p, sample_rate=8000)
    (batched,) = load_audio_batch([p], sample_rate=8000)
    np.testing.assert_array_equal(batched, single)


def test_audio_provider_load_batch(tmp_path):
    from isp_tts_tpu.data.providers import AudioProvider

    prov = AudioProvider(sample_rate=16000)
    paths = []
    for i in range(3):
        p = tmp_path / f"p{i}.wav"
        write_wav(p, np.sin(np.linspace(0, 10 + i, 2000, dtype=np.float32))[None], 16000)
        paths.append(p)
    batch = prov.load_batch(paths)
    for p, got in zip(paths, batch):
        np.testing.assert_array_equal(got, prov(p))


def test_unsupported_codec_falls_back_to_python_error(tmp_path):
    # fmt tag 2 (ADPCM): native refuses; load_audio falls back to the wave
    # module, which also refuses -> the Python error surface is preserved
    p = tmp_path / "adpcm.wav"
    payload = b"\x00" * 32
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)
    riff = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt +
            b"data" + struct.pack("<I", len(payload)) + payload)
    p.write_bytes(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    with pytest.raises(ValueError, match="codec"):
        native.decode_wav_mono(p)
    with pytest.raises(Exception):
        load_audio(p)
