"""On-device audio spectrograms as MXU matmuls.

The reference computes log-power STFTs on the host with librosa per sample
(reference core/dataset/dataset.py:461-510: n_fft=511, hann, win=10 ms,
hop=5 ms, center padding, ``log(|S|^2 + 1e-6)``). On TPU we ship the raw
waveform window to the device (50k floats instead of a 256x420 image) and
compute the spectrogram inside the jitted step.

TPU-first design: n_fft=511 is odd, which is hostile to FFT hardware paths —
but the DFT of a 511-sample frame onto 256 bins is just a (511, 256) matmul,
and the hann window folds into the basis. Framing + windowed DFT + log-power
then compile to one gather + one MXU matmul + fused elementwise, batched over
(batch * segments) windows.

Numerics match librosa.stft(..., center=True, pad_mode="constant") exactly:
* periodic hann of ``win_length`` zero-padded (centred) to ``n_fft``;
* waveform zero-padded by ``n_fft // 2`` on both sides;
* frame count = 1 + (padded_len - n_fft) // hop.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _mm_precision(compute_dtype) -> jax.lax.Precision:
    """fp32 spectrograms must hit librosa parity: force full-precision MXU
    passes; bf16 compute keeps the fast default."""
    if jnp.dtype(compute_dtype) == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def periodic_hann(win_length: int) -> np.ndarray:
    n = np.arange(win_length, dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)


def _padded_window(win_length: int, n_fft: int) -> np.ndarray:
    window = periodic_hann(win_length)
    padded = np.zeros(n_fft, dtype=np.float64)
    left = (n_fft - win_length) // 2
    padded[left : left + win_length] = window
    return padded


@functools.lru_cache(maxsize=8)
def dft_basis(n_fft: int, win_length: int) -> Tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT basis: (n_fft, n_bins) cos / -sin matrices.

    ``frames @ cos_basis`` and ``frames @ sin_basis`` give Re/Im of
    rfft(window * frame).
    """
    n_bins = n_fft // 2 + 1
    window = _padded_window(win_length, n_fft)
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    angle = -2.0 * np.pi * n * k / n_fft
    cos_basis = (window[:, None] * np.cos(angle)).astype(np.float32)
    sin_basis = (window[:, None] * np.sin(angle)).astype(np.float32)
    return cos_basis, sin_basis


def num_frames(signal_len: int, n_fft: int, hop: int) -> int:
    padded = signal_len + 2 * (n_fft // 2)
    return 1 + (padded - n_fft) // hop


def hz_to_mel(freq: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa default, htk=False)."""
    freq = np.asarray(freq, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = freq >= min_log_hz
    mels = np.where(
        above, min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep, mels
    )
    return mels


def mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = mels >= min_log_mel
    return np.where(above, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)


@functools.lru_cache(maxsize=8)
def mel_filterbank(sr: int, n_fft: int, n_mels: int = 128) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, (n_bins, n_mels)."""
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # (n_bins, n_mels)


def _stft_power_conv(
    signal_2d: jnp.ndarray,  # (B, L)
    n_fft: int,
    win_length: int,
    hop: int,
    compute_dtype,
) -> jnp.ndarray:
    """Windowed-DFT power via polyphase matmuls: (B, T, n_bins).

    Frame t is padded[t*hop : t*hop + n_fft]. Splitting the waveform into
    hop-sized blocks, frame t = concat(blocks[t : t + ceil(n_fft/hop)]),
    so spec[t] = sum_j blocks[t+j] @ basis[j*hop:(j+1)*hop]. That's ONE
    dense (B*n_blocks, hop) x (hop, n_chunks*2*n_bins) MXU matmul plus a
    few shifted adds — no overlapping-frame gather and no strided conv
    (both of which XLA lowers to a slow gather materializing the frame
    tensor in HBM; this formulation is ~25x faster on TPU).
    """
    pad = n_fft // 2
    b, length = signal_2d.shape
    l2 = length + 2 * pad
    t_frames = 1 + (l2 - n_fft) // hop
    n_chunks = -(-n_fft // hop)  # ceil
    n_blocks = t_frames + n_chunks  # cover blocks t .. t + n_chunks - 1

    padded = jnp.pad(
        signal_2d.astype(compute_dtype),
        ((0, 0), (pad, pad + (n_blocks * hop - l2))),
    )
    blocks = padded.reshape(b, n_blocks, hop)

    cos_b, sin_b = dft_basis(n_fft, win_length)
    n_bins = cos_b.shape[1]
    basis = np.concatenate([cos_b, sin_b], axis=1)  # (n_fft, 2*n_bins)

    # ONE wide-K matmul: frames = the n_chunks shifted block views
    # lane-concatenated to (B, T, n_chunks*hop), times the zero-padded basis
    # (n_chunks*hop, 2*n_bins). The concat copies ~(B*T*n_fft) bf16 once;
    # the earlier per-phase accumulation instead wrote the (B, T, 2*n_bins)
    # fp32 accumulator n_chunks times (~1.4 GB/batch, ~1.7 ms on traces).
    # (A third formulation — one wide-OUTPUT matmul per block — was worse
    # still: it materialized (B, n_blocks, n_chunks*2*n_bins) + relayout.)
    frames = jnp.concatenate(
        [blocks[:, j : j + t_frames, :] for j in range(n_chunks)], axis=-1
    )
    wide = np.zeros((n_chunks * hop, 2 * n_bins), np.float32)
    wide[:n_fft] = basis
    out = jnp.matmul(
        frames,
        jnp.asarray(wide, dtype=compute_dtype),
        preferred_element_type=jnp.float32,
        precision=_mm_precision(compute_dtype),
    )

    re, im = out[..., :n_bins], out[..., n_bins:]
    return re * re + im * im  # (B, T, n_bins) fp32


def log_power_stft(
    signal: jnp.ndarray,
    sr: int = 24000,
    n_fft: int = 511,
    window_ms: float = 10.0,
    hop_ms: float = 5.0,
    eps: float = 1e-6,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """(..., L) waveform -> (..., n_bins, n_frames) log power spectrogram.

    Matches ``np.log(np.real(S * conj(S)) + eps)`` of the reference for
    compute_dtype=float32.
    """
    win_length = int(round(window_ms * sr / 1e3))
    hop = int(round(hop_ms * sr / 1e3))
    lead = signal.shape[:-1]
    power = _stft_power_conv(
        signal.reshape((-1, signal.shape[-1])), n_fft, win_length, hop, compute_dtype
    )
    spec = jnp.log(power + eps)  # (B, T, n_bins)
    spec = jnp.swapaxes(spec, -1, -2)  # (B, n_bins, T)
    return spec.reshape(lead + spec.shape[1:])


def log_power_stft_np(
    signal: np.ndarray,
    sr: int = 24000,
    n_fft: int = 511,
    window_ms: float = 10.0,
    hop_ms: float = 5.0,
    eps: float = 1e-6,
) -> np.ndarray:
    """Pure-numpy mirror of log_power_stft for host-side consumers (the
    ``loud`` attention prior runs in loader threads; dispatching the jitted
    device op per window from there serialized the whole input pipeline).
    Same math: center constant-padding, strided frames, padded periodic-hann
    window, rfft power, log(.+eps). Returns (n_bins, n_frames)."""
    win_length = int(round(window_ms * sr / 1e3))
    hop = int(round(hop_ms * sr / 1e3))
    pad = n_fft // 2
    padded = np.pad(np.asarray(signal, np.float32), (pad, pad))
    frames_n = 1 + (padded.shape[0] - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(frames_n)[:, None]
    frames = padded[idx]  # (T, n_fft)
    window = _padded_window(win_length, n_fft)
    spec = np.fft.rfft(frames * window, n=n_fft, axis=-1)
    power = (spec.real**2 + spec.imag**2).astype(np.float32)
    return np.log(power + eps).T  # (n_bins, T)


def log_mel_spectrogram(
    signal: jnp.ndarray,
    sr: int = 24000,
    n_fft: int = 511,
    window_ms: float = 10.0,
    hop_ms: float = 5.0,
    n_mels: int = 128,
    top_db: float = 80.0,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """(..., L) -> (..., n_mels, n_frames); librosa melspectrogram + power_to_db
    with ref=max (per-sample max over all axes), amin=1e-10, top_db=80."""
    win_length = int(round(window_ms * sr / 1e3))
    hop = int(round(hop_ms * sr / 1e3))
    lead = signal.shape[:-1]
    power = _stft_power_conv(
        signal.reshape((-1, signal.shape[-1])), n_fft, win_length, hop, compute_dtype
    )  # (B, T, n_bins)
    mel_b = jnp.asarray(mel_filterbank(sr, n_fft, n_mels), dtype=jnp.float32)
    mel = jnp.matmul(
        power, mel_b, preferred_element_type=jnp.float32,
        precision=_mm_precision(compute_dtype),
    )
    mel = jnp.swapaxes(mel, -1, -2)  # (B, n_mels, T)

    amin = 1e-10
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, mel))
    ref = jnp.max(mel, axis=(-2, -1), keepdims=True)
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(amin, ref))
    log_spec = jnp.maximum(
        log_spec, jnp.max(log_spec, axis=(-2, -1), keepdims=True) - top_db
    )
    return log_spec.reshape(lead + log_spec.shape[1:])


def spectrogram(
    signal: jnp.ndarray,
    spec_type: str = "stft",
    sr: int = 24000,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    if spec_type == "stft":
        return log_power_stft(signal, sr=sr, compute_dtype=compute_dtype)
    if spec_type == "logms":
        return log_mel_spectrogram(signal, sr=sr, compute_dtype=compute_dtype)
    raise ValueError(f"Unknown spectrogram representation {spec_type!r}")
