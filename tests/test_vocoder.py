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

def test_short_window_synthesis_roundtrip():
    """win_length < n_fft crashed every synthesis-side function (the
    analysis STFT centered the short window; the inverses never mirrored
    it). Now the centered synthesis window round-trips and Griffin-Lim
    recovers the tone under a 512/1024 contract."""
    import jax

    from isp_tts_tpu.ops.vocoder import (_stft_matmul, griffin_lim,
                                         griffin_lim_matmul, istft_matmul)

    audio = _sine(330.0, 4096)
    n_fft, hop, win = 1024, 256, 512
    pad = (n_fft - hop) // 2

    # analysis parity: matmul STFT with the short window == the FFT-based
    # provider front-end (which has always centered it)
    re, im = _stft_matmul(jnp.asarray(audio)[None], n_fft, hop, win, pad)
    mag_ref = stft_magnitude(jnp.asarray(audio)[None], n_fft, hop, win)
    np.testing.assert_allclose(
        np.asarray(jnp.sqrt(re**2 + im**2)), np.asarray(mag_ref), atol=2e-3)

    # synthesis round-trip: istft_matmul inverts its own analysis (interior)
    recon, out_len = istft_matmul(re, im, n_fft, hop, win)
    recon = np.asarray(recon)[0]
    assert out_len == recon.shape[-1]
    padded = np.pad(audio, (pad, pad))
    np.testing.assert_allclose(recon[1024:3072], padded[1024:3072], atol=1e-2)

    # both Griffin-Lim formulations run and agree under the short window
    mag = stft_magnitude(jnp.asarray(audio), n_fft, hop, win)
    key = jax.random.PRNGKey(5)
    a = np.asarray(griffin_lim(mag, n_iter=4, n_fft=n_fft, hop_length=hop,
                               win_length=win, key=key))
    b = np.asarray(griffin_lim_matmul(mag, n_iter=4, n_fft=n_fft,
                                      hop_length=hop, win_length=win, key=key))
    np.testing.assert_allclose(b, a, atol=2e-3)


def test_tiny_dropout_rate_is_exact_noop():
    """dropout_rate < 1/512 quantizes to keep-everything in the 8-bit mask;
    the kernel spec must then be a true no-op (no 1/(1-rate) rescale), the
    same boundary the einsum and FastDropout paths take."""
    from isp_tts_tpu.ops.flash_attention import _drop_params, dropout_thresh

    assert dropout_thresh(1e-3) == 256
    assert _drop_params(1e-3, 64, 64) is None
    assert _drop_params(0.0, 64, 64) is None
    assert _drop_params(0.1, 64, 64) is not None
