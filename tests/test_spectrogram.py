"""Spectrogram numerics: the device op must match the librosa conventions the
reference relied on (librosa is not installed here, so the golden values come
from a straightforward numpy re-statement of librosa.stft's definition:
periodic hann centred into n_fft, constant center padding, rfft per frame)."""

import numpy as np
import pytest

import jax.numpy as jnp

from attention_based_tbn_tpu.data.audio import extract_window
from attention_based_tbn_tpu.ops.spectrogram import (
    dft_basis,
    log_mel_spectrogram,
    log_power_stft,
    mel_filterbank,
    num_frames,
    periodic_hann,
    spectrogram,
)


def golden_stft_logpower(y, sr=24000, n_fft=511, window_ms=10.0, hop_ms=5.0, eps=1e-6):
    """librosa.stft + log power, restated directly from its definition."""
    win_length = int(round(window_ms * sr / 1e3))
    hop = int(round(hop_ms * sr / 1e3))
    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win_length) / win_length)
    padded_window = np.zeros(n_fft)
    left = (n_fft - win_length) // 2
    padded_window[left : left + win_length] = window

    y_padded = np.pad(y.astype(np.float64), n_fft // 2, mode="constant")
    n = 1 + (len(y_padded) - n_fft) // hop
    spec = np.empty((n_fft // 2 + 1, n), dtype=np.complex128)
    for t in range(n):
        frame = y_padded[t * hop : t * hop + n_fft] * padded_window
        spec[:, t] = np.fft.rfft(frame)
    return np.log(np.real(spec * np.conj(spec)) + eps)


@pytest.fixture(scope="module")
def waveform():
    rng = np.random.default_rng(42)
    t = np.arange(int(0.5 * 24000)) / 24000.0
    return (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 3000 * t)
        + 0.05 * rng.standard_normal(t.shape)
    ).astype(np.float32)


def test_periodic_hann():
    w = periodic_hann(240)
    assert w[0] == 0.0
    np.testing.assert_allclose(w[120], 1.0, atol=1e-12)
    assert w.shape == (240,)


def test_num_frames():
    # 2.1 s @ 24 kHz: 50400 samples -> 420 frames (center padding 255)
    assert num_frames(50400, 511, 120) == 420
    # 4.0 s -> 800 frames
    assert num_frames(96000, 511, 120) == 800


def test_stft_matches_golden(waveform):
    ours = np.asarray(log_power_stft(waveform[None, :]))[0]
    golden = golden_stft_logpower(waveform)
    assert ours.shape == golden.shape == (256, num_frames(len(waveform), 511, 120))
    np.testing.assert_allclose(ours, golden, rtol=1e-3, atol=2e-3)


def test_stft_batch_shape(waveform):
    batch = np.stack([waveform, waveform * 0.5, waveform * 0.0])
    out = np.asarray(log_power_stft(batch))
    assert out.shape == (3, 256, num_frames(len(waveform), 511, 120))
    # silence -> log(eps)
    np.testing.assert_allclose(out[2], np.log(1e-6), atol=1e-4)


def test_dft_basis_orthogonality():
    cos_b, sin_b = dft_basis(511, 240)
    assert cos_b.shape == (511, 256)
    # spot-check one frame against rfft
    rng = np.random.default_rng(0)
    frame = rng.standard_normal(511).astype(np.float32)
    win = np.zeros(511)
    win[135:375] = periodic_hann(240)
    ref = np.fft.rfft(frame * win)
    np.testing.assert_allclose(frame @ cos_b, ref.real, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(frame @ sin_b, ref.imag, rtol=1e-3, atol=1e-3)


def test_mel_filterbank_properties():
    fb = mel_filterbank(24000, 511, 128)
    assert fb.shape == (256, 128)
    assert np.all(fb >= 0)
    # every filter has some support; slaney normalization keeps peaks ~2/bandwidth
    assert np.all(fb.sum(axis=0) > 0)


def test_log_mel_shapes_and_range(waveform):
    out = np.asarray(log_mel_spectrogram(waveform[None, :]))
    assert out.shape == (1, 128, num_frames(len(waveform), 511, 120))
    # power_to_db(ref=max): max is 0, floor at -80
    assert out.max() <= 1e-5
    assert out.min() >= -80.0 - 1e-5


def test_spectrogram_dispatch(waveform):
    assert spectrogram(waveform[None], "stft").shape[1] == 256
    assert spectrogram(waveform[None], "logms").shape[1] == 128
    with pytest.raises(ValueError):
        spectrogram(waveform[None], "nope")


class TestExtractWindow:
    def test_centred_window(self):
        sr, fps, length = 24000, 60.0, 2.1
        sample = np.arange(sr * 10, dtype=np.float32)
        # frame 300 -> t=5 s; start = 5 - 1.05 = 3.95 s
        win = extract_window(sample, 300, fps, length, sr)
        assert win.shape == (int(length * sr),)
        assert win[0] == int(3.95 * sr)

    def test_clamped_at_start(self):
        sr = 24000
        sample = np.arange(sr * 10, dtype=np.float32)
        win = extract_window(sample, 0, 60.0, 2.1, sr)
        assert win[0] == 0.0

    def test_clamped_at_end(self):
        sr = 24000
        sample = np.arange(sr * 10, dtype=np.float32)
        win = extract_window(sample, 599, 60.0, 2.1, sr)
        assert win[-1] == sample[-1]

    def test_short_sample_padded(self):
        sr = 24000
        sample = np.ones(sr // 2, dtype=np.float32)
        win = extract_window(sample, 10, 60.0, 2.1, sr)
        assert win.shape == (int(2.1 * sr),)
        assert win[0] == 1.0 and win[-1] == 0.0


def test_numpy_mirror_matches_device_op():
    """log_power_stft_np (host, loud-prior path) == log_power_stft (device)."""
    import numpy as np
    import jax.numpy as jnp

    from attention_based_tbn_tpu.ops.spectrogram import (
        log_power_stft,
        log_power_stft_np,
    )

    rng = np.random.default_rng(3)
    w = rng.standard_normal(int(1.279 * 24000)).astype(np.float32) * 0.2
    dev = np.asarray(log_power_stft(jnp.asarray(w)[None], sr=24000))[0]
    host = log_power_stft_np(w, sr=24000)
    assert host.shape == dev.shape
    np.testing.assert_allclose(host, dev, rtol=2e-4, atol=2e-4)
