"""Independent torch.stft oracle for the spectrogram numerics.

The golden tests (test_spectrogram.py) pin the device op against a numpy
restatement of librosa.stft's definition (librosa itself is absent here).
This file cross-checks both against a THIRD implementation that shares no
code with either: ``torch.stft``, whose conventions for
center=True/pad_mode="constant"/win_length<n_fft (centred window padding,
n_fft//2 signal padding, 1+(L_pad-n_fft)//hop frames) match librosa's —
the conventions the reference relies on (dataset.py:461-510: n_fft=511,
10 ms hann, 5 ms hop, log(|S|^2 + 1e-6)).
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

from attention_based_tbn_tpu.ops.spectrogram import (
    log_power_stft,
    log_power_stft_np,
)

SR = 24000
N_FFT = 511
WIN = int(round(10.0 * SR / 1e3))  # 240
HOP = int(round(5.0 * SR / 1e3))  # 120
EPS = 1e-6


def _torch_log_power(signal: np.ndarray) -> np.ndarray:
    spec = torch.stft(
        torch.from_numpy(signal.astype(np.float32)),
        n_fft=N_FFT,
        hop_length=HOP,
        win_length=WIN,
        window=torch.hann_window(WIN, periodic=True),
        center=True,
        pad_mode="constant",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    power = spec.real.square() + spec.imag.square()
    return torch.log(power + EPS).numpy()  # (n_bins, n_frames)


@pytest.mark.parametrize("length", [int(1.279 * SR), int(2.1 * SR), 5000])
@pytest.mark.parametrize("seed", [0, 3])
def test_device_op_matches_torch_stft(length, seed):
    rng = np.random.default_rng(seed)
    signal = (rng.standard_normal(length) * 0.3).astype(np.float32)

    want = _torch_log_power(signal)
    got = np.asarray(log_power_stft(signal))

    assert got.shape == want.shape
    # fp32 matmul-DFT vs torch's FFT: absolute tolerance on the log is a
    # relative tolerance on the power
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=0)


@pytest.mark.parametrize("length", [int(1.279 * SR), 7777])
def test_numpy_mirror_matches_torch_stft(length):
    rng = np.random.default_rng(11)
    signal = (rng.standard_normal(length) * 0.3).astype(np.float32)

    want = _torch_log_power(signal)
    got = log_power_stft_np(signal)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=0)


def test_silence_floor_matches():
    """All-zero input: every bin sits at log(eps) in all three
    implementations (the eps floor, not a denormal artifact)."""
    signal = np.zeros(SR, np.float32)
    want = _torch_log_power(signal)
    got = np.asarray(log_power_stft(signal))
    np.testing.assert_allclose(got, want, atol=1e-6)
    np.testing.assert_allclose(got, np.log(EPS), atol=1e-5)
