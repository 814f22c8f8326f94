import jax.numpy as jnp
import numpy as np
import pytest
import torch

from isp_tts_tpu.ops import (
    dynamic_range_compression,
    frame_energy,
    frame_signal,
    hann_window,
    log_mel_spectrogram,
    mel_filterbank,
    num_frames,
    stft_magnitude,
    yin_pitch,
)

SR = 22050
N_FFT, HOP, WIN = 1024, 256, 1024


def _rand_audio(n, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(n) * 0.1).astype(np.float32)


def test_hann_window_matches_torch():
    ours = np.asarray(hann_window(WIN))
    ref = torch.hann_window(WIN, periodic=True).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_frame_signal_shapes_and_content():
    x = jnp.arange(20.0)
    f = frame_signal(x, 8, 4)
    assert f.shape == (4, 8)
    np.testing.assert_array_equal(np.asarray(f[1]), np.arange(4.0, 12.0))


def test_stft_magnitude_matches_torch_stft():
    """Golden test: our STFT vs torch.stft with identical conventions."""
    audio = _rand_audio(SR)  # 1 second
    pad = (N_FFT - HOP) // 2
    ours = np.asarray(stft_magnitude(jnp.asarray(audio), N_FFT, HOP, WIN))

    padded = torch.nn.functional.pad(torch.from_numpy(audio), (pad, pad))
    ref = torch.stft(
        padded, N_FFT, hop_length=HOP, win_length=WIN,
        window=torch.hann_window(WIN, periodic=True),
        center=False, return_complex=True,
    ).abs().numpy()

    assert ours.shape == ref.shape == (N_FFT // 2 + 1, num_frames(SR, N_FFT, HOP))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_stft_batched_matches_single():
    a = np.stack([_rand_audio(4096, 1), _rand_audio(4096, 2)])
    batched = np.asarray(stft_magnitude(jnp.asarray(a)))
    singles = np.stack([np.asarray(stft_magnitude(jnp.asarray(x))) for x in a])
    np.testing.assert_allclose(batched, singles, atol=1e-5)


def test_mel_filterbank_structure():
    fb = mel_filterbank(SR, N_FFT, 80, 0.0, 8000.0)
    assert fb.shape == (80, N_FFT // 2 + 1)
    assert (fb >= 0).all()
    # every filter has support; filters are band-limited below 8000 Hz bin
    assert (fb.sum(axis=1) > 0).all()
    freqs = np.linspace(0, SR / 2, N_FFT // 2 + 1)
    assert fb[:, freqs > 8000.0 + freqs[1]].sum() == 0
    # slaney scale is linear below 1000 Hz: first mel centers equally spaced
    centers = freqs[fb.argmax(axis=1)]
    low = centers[centers < 900]
    steps = np.diff(low)
    assert steps.std() < 0.35 * steps.mean()  # equal up to bin quantization


def test_mel_filterbank_slaney_norm_area():
    # with slaney norm each triangle has area ~= 2/(width) * width/2 = 1
    fb = mel_filterbank(SR, N_FFT, 80, 0.0, 8000.0)
    df = (SR / 2) / (N_FFT // 2)
    areas = fb.sum(axis=1) * df
    # coarse bin quantization at low freqs; most filters integrate to ~1
    assert np.median(np.abs(areas - 1.0)) < 0.1


def test_dynamic_range_compression():
    x = jnp.array([0.0, 1e-6, 1.0])
    out = np.asarray(dynamic_range_compression(x))
    np.testing.assert_allclose(out, [np.log(1e-5), np.log(1e-5), 0.0], atol=1e-4)


def test_log_mel_shapes():
    audio = jnp.asarray(_rand_audio(SR))
    mel = log_mel_spectrogram(audio, SR)
    assert mel.shape == (80, num_frames(SR))


def test_frame_energy_matches_torch_norm():
    spec = np.abs(np.random.RandomState(0).randn(513, 50)).astype(np.float32)
    ours = np.asarray(frame_energy(jnp.asarray(spec)))
    ref = torch.log1p(torch.linalg.norm(torch.from_numpy(spec), dim=0)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


# ---------------------------------------------------------------------------
# YIN
# ---------------------------------------------------------------------------

def _sine(freq, n, sr=SR, amp=0.5):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.mark.parametrize("f0", [110.0, 220.0, 440.0])
def test_yin_recovers_sine_f0(f0):
    pitch_min = 2 * int(SR / WIN)  # reference convention, providers.py:299-300
    audio = _sine(f0, SR)
    pad = (WIN - HOP) // 2
    padded = jnp.pad(jnp.asarray(audio), (pad, pad))
    pitch = np.asarray(yin_pitch(padded, SR, pitch_min, 800.0, HOP))
    voiced = pitch[pitch > 0]
    assert len(voiced) > 0.9 * len(pitch)
    med = np.median(voiced)
    assert abs(med - f0) / f0 < 0.03, f"expected ~{f0}, got {med}"


def test_yin_silence_and_noise_unvoiced():
    pitch_min = 2 * int(SR / WIN)
    silent = jnp.zeros(8192)
    assert np.asarray(yin_pitch(silent, SR, pitch_min, 800.0, HOP)).max() == 0
    noise = jnp.asarray(np.random.RandomState(0).randn(8192).astype(np.float32))
    frac_voiced = (np.asarray(yin_pitch(noise, SR, pitch_min, 800.0, HOP)) > 0).mean()
    assert frac_voiced < 0.3


def test_yin_batched():
    audio = np.stack([_sine(220.0, 8192), _sine(330.0, 8192)])
    pitch_min = 2 * int(SR / WIN)
    p = np.asarray(yin_pitch(jnp.asarray(audio), SR, pitch_min, 800.0, HOP))
    assert p.shape[0] == 2
    assert abs(np.median(p[0][p[0] > 0]) - 220.0) < 8
    assert abs(np.median(p[1][p[1] > 0]) - 330.0) < 10


def test_batched_frontend_matches_per_sample_providers():
    """One jitted batch pipeline == per-utterance provider outputs."""
    from isp_tts_tpu.ops.frontend import FrontendConfig, bucket_audio, extract_features

    rng = np.random.RandomState(0)
    auds = [_sine(150.0 + 40 * i, 5000 + 1100 * i) + 0.01 * rng.randn(5000 + 1100 * i).astype(np.float32)
            for i in range(3)]
    batch, lens = bucket_audio(auds, multiple=4096)
    feats = extract_features(jnp.asarray(batch), jnp.asarray(lens), FrontendConfig())

    from isp_tts_tpu.data import providers as dp

    spec_p = dp.SpectrogramProvider(dp.SpectrogramProviderConfig())
    mel_p = dp.MelScaleProvider(dp.MelScaleProviderConfig(sample_rate=SR))
    en_p = dp.EnergyProvider()
    pitch_p = dp.PitchProvider(dp.PitchProviderConfig(sample_rate=SR))

    for i, aud in enumerate(auds):
        n = int(feats.mel_lens[i])
        spec = spec_p(aud)
        assert n == spec.shape[1]
        mel_ref = mel_p(spec).T  # (frames, n_mels)
        np.testing.assert_allclose(np.asarray(feats.mel[i, :n]), mel_ref,
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(feats.energy[i, :n]), en_p(spec),
                                   rtol=1e-3, atol=1e-3)
        pitch_ref = np.pad(pitch_p(aud), (0, max(0, n - len(pitch_p(aud)))))[:n]
        voiced = pitch_ref > 0
        np.testing.assert_allclose(np.asarray(feats.pitch[i, :n])[voiced],
                                   pitch_ref[voiced], rtol=1e-3, atol=1e-2)
    # padding frames are zeroed
    assert float(jnp.abs(feats.mel[0, int(feats.mel_lens[0]):]).max()) == 0.0


# ---------------------------------------------------------------------------
# penn pitch method via an injected fake backend (VERDICT r3 #8): the
# package is absent in this environment, so the call contract and the
# post-processing (periodicity threshold, normalization) are pinned the way
# the espeak pipeline is — with a deterministic fake
# (reference providers.py:329-342 semantics)
# ---------------------------------------------------------------------------

def test_penn_pitch_provider_with_fake_backend(monkeypatch):
    import sys
    import types

    import numpy as np
    import torch

    from isp_tts_tpu.data.providers import PitchProvider, PitchProviderConfig

    calls = {}

    def fake_from_audio(audio, sample_rate, hopsize, fmin, fmax,
                        batch_size, center):
        calls.update(sample_rate=sample_rate, hopsize=hopsize, fmin=fmin,
                     fmax=fmax, batch_size=batch_size, center=center,
                     shape=tuple(audio.shape))
        pitch = torch.tensor([[100.0, 150.0, 200.0, 250.0, 300.0, 350.0]])
        periodicity = torch.tensor([[0.9, 0.05, 0.8, 0.1, 0.95, 0.5]])
        return pitch, periodicity

    fake = types.ModuleType("penn")
    fake.from_audio = fake_from_audio
    monkeypatch.setitem(sys.modules, "penn", fake)

    provider = PitchProvider(PitchProviderConfig(
        sample_rate=22050, hop_length=256, f_min=40, f_max=800,
        method="penn", threshold=0.15))
    audio = np.zeros(22050, np.float32)
    out = provider(audio, mean=100.0, std=50.0)

    # call contract (reference providers.py:331-341): hopsize in SECONDS,
    # the configured f_min (penn does NOT get yin's forced f_min),
    # half-window centering by default, batched input
    assert calls["sample_rate"] == 22050
    assert calls["hopsize"] == pytest.approx(256 / 22050)
    assert calls["fmin"] == 40 and calls["fmax"] == 800
    assert calls["center"] == "half-window"
    assert calls["shape"][0] == 1

    # periodicity below threshold zeroes the pitch BEFORE standardization
    want = np.array([100.0, 0.0, 200.0, 0.0, 300.0, 350.0])
    np.testing.assert_allclose(out, (want - 100.0) / 50.0, atol=1e-6)

    # center=True -> 'zero'
    provider2 = PitchProvider(PitchProviderConfig(
        sample_rate=22050, hop_length=256, method="penn", center=True))
    provider2(audio)
    assert calls["center"] == "zero"

    # yin's frame-matching f_min override must NOT leak into penn
    assert provider.f_min == 40


def test_penn_method_without_package_raises(monkeypatch):
    import sys

    from isp_tts_tpu.data.providers import PitchProvider, PitchProviderConfig

    monkeypatch.setitem(sys.modules, "penn", None)
    provider = PitchProvider(PitchProviderConfig(method="penn"))
    with pytest.raises(ImportError, match="penn"):
        provider(np.zeros(1000, np.float32))
