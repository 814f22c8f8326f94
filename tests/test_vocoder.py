import jax.numpy as jnp
import numpy as np

from isp_tts_tpu.ops import log_mel_spectrogram, stft_magnitude
from isp_tts_tpu.ops.vocoder import griffin_lim, istft, mel_to_audio, mel_to_linear

SR = 22050


def _sine(freq, n, amp=0.4):
    t = np.arange(n) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_istft_roundtrip():
    """STFT -> ISTFT reconstructs the interior of the signal."""
    audio = _sine(440.0, 8192)
    pad = (1024 - 256) // 2
    x = jnp.pad(jnp.asarray(audio), (pad, pad))
    from isp_tts_tpu.ops.audio import frame_signal, hann_window

    frames = frame_signal(x, 1024, 256)
    spec = jnp.fft.rfft(frames * hann_window(1024), n=1024, axis=-1)
    recon = np.asarray(istft(jnp.swapaxes(spec, -1, -2)))
    # compare interior (edges lack full overlap)
    padded = np.asarray(x)
    np.testing.assert_allclose(recon[2048:4096], padded[2048:4096], atol=1e-3)


def test_mel_to_linear_recovers_peak():
    audio = _sine(440.0, SR)
    mel = log_mel_spectrogram(jnp.asarray(audio), SR).T  # (frames, n_mels)
    mag = np.asarray(mel_to_linear(mel, SR))  # (freqs, frames)
    freqs = np.linspace(0, SR / 2, 513)
    peak = freqs[mag.mean(axis=1).argmax()]
    assert abs(peak - 440.0) < 40.0


def test_griffin_lim_recovers_sine():
    audio = _sine(330.0, 8192)
    mag = stft_magnitude(jnp.asarray(audio))
    recon = np.asarray(griffin_lim(mag, n_iter=16))
    # dominant frequency preserved
    spec = np.abs(np.fft.rfft(recon))
    freqs = np.fft.rfftfreq(len(recon), 1 / SR)
    assert abs(freqs[spec.argmax()] - 330.0) < 15.0


def test_matmul_griffin_lim_equals_fft_version():
    """The TPU-native matmul-DFT Griffin-Lim (no complex dtypes, no FFT ops,
    no scatter) must match the FFT formulation to fp tolerance — same key,
    same iterate sequence."""
    import jax

    from isp_tts_tpu.ops.vocoder import griffin_lim_matmul

    audio = _sine(330.0, 4096)
    mag = stft_magnitude(jnp.asarray(audio))
    key = jax.random.PRNGKey(3)
    a = np.asarray(griffin_lim(mag, n_iter=6, key=key))
    b = np.asarray(griffin_lim_matmul(mag, n_iter=6, key=key))
    assert a.shape == b.shape
    np.testing.assert_allclose(b, a, atol=2e-3)


def test_mel_to_audio_tpu_variant_recovers_sine():
    from isp_tts_tpu.ops.vocoder import mel_to_audio_tpu

    audio = _sine(220.0, 8192)
    mel = log_mel_spectrogram(jnp.asarray(audio), SR).T
    out = np.asarray(mel_to_audio_tpu(mel, SR, n_iter=8))
    assert np.isfinite(out).all()
    spec = np.abs(np.fft.rfft(out))
    freqs = np.fft.rfftfreq(len(out), 1 / SR)
    assert abs(freqs[spec.argmax()] - 220.0) < 15.0


def test_mel_to_audio_end_to_end():
    audio = _sine(220.0, 8192)
    mel = log_mel_spectrogram(jnp.asarray(audio), SR).T
    out = np.asarray(mel_to_audio(mel, SR, n_iter=8))
    assert out.ndim == 1 and len(out) > 6000
    assert np.isfinite(out).all()
    spec = np.abs(np.fft.rfft(out))
    freqs = np.fft.rfftfreq(len(out), 1 / SR)
    assert abs(freqs[spec.argmax()] - 220.0) < 15.0
