"""Host-side audio IO: WAV loading and window extraction.

The reference loads the *entire untrimmed* video's audio with librosa for
every sample (reference core/dataset/dataset.py:372-419) and cuts an
``audio_length``-second window centred on the sampled frame
(dataset.py:421-459). Here the window cut is a pure function, the waveform is
cached per video, and the spectrogram itself runs on device
(ops/spectrogram.py) — the host only ships raw waveform windows.
"""

from __future__ import annotations

import functools
import os
import threading
import wave
import numpy as np
from scipy import signal as scipy_signal


def read_wav(path: str, target_sr: int = 24000, mono: bool = True) -> np.ndarray:
    """Read a PCM WAV file to float32 in [-1, 1], resampled to target_sr.

    librosa-equivalent for the PCM files Epic-Kitchens ships; resampling uses
    polyphase filtering (scipy) instead of librosa's resampy.
    """
    with wave.open(path, "rb") as handle:
        sr = handle.getframerate()
        n_channels = handle.getnchannels()
        sample_width = handle.getsampwidth()
        raw = handle.readframes(handle.getnframes())

    if sample_width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sample_width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif sample_width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"Unsupported WAV sample width {sample_width} in {path}")

    if n_channels > 1:
        data = data.reshape(-1, n_channels)
        if mono:
            data = data.mean(axis=1)

    if sr != target_sr:
        gcd = np.gcd(sr, target_sr)
        data = scipy_signal.resample_poly(data, target_sr // gcd, sr // gcd).astype(
            np.float32
        )

    return np.ascontiguousarray(data, dtype=np.float32)


def read_audio_sample(
    root_dir: str,
    audio_prefix: str,
    vid_id: str,
    file_ext: str = "wav",
    sampling_rate: int = 24000,
    read_pickle: bool = False,
    use_native: bool = True,
) -> np.ndarray:
    """Load the full untrimmed waveform for a video (wav or .npy cache).

    ``use_native=False`` honors the ``tpu.native_io`` config gate the
    visual decode path obeys (dataset.VideoDataset) — A/B comparisons and
    parity debugging must be able to force the pure-Python reader."""
    if read_pickle:
        return np.load(os.path.join(root_dir, audio_prefix, f"{vid_id}.npy")).astype(
            np.float32
        )
    path = os.path.join(root_dir, audio_prefix, f"{vid_id}.{file_ext}")
    from .. import native as native_io

    if use_native and native_io.available():
        try:
            return native_io.read_wav(path, target_sr=sampling_rate)
        except IOError:
            pass  # non-PCM/truncated wav — fall back to the Python reader
    return read_wav(path, target_sr=sampling_rate)


def extract_window(
    sample: np.ndarray,
    frame_idx: int,
    vid_fps: float,
    audio_length: float,
    sampling_rate: int,
) -> np.ndarray:
    """Cut the ``audio_length``-second window centred at ``frame_idx``.

    Same placement as the reference (dataset.py:439-451): start at
    ``frame_idx/fps - audio_length/2`` seconds, clamped into the sample; the
    sample is right-padded with zeros when shorter than one window. (The
    reference's negative-start slice for too-short samples is fixed here by
    clamping to 0.)
    """
    min_len = int(audio_length * sampling_rate)
    max_len = sample.shape[0]

    if max_len < min_len:
        sample = np.pad(sample, (0, min_len - max_len))

    start_sec = float(frame_idx) / vid_fps - audio_length / 2.0
    start = int(max(0.0, start_sec * sampling_rate))
    if start + min_len > max_len:
        start = max(max_len - min_len, 0)

    return np.ascontiguousarray(sample[start : start + min_len], dtype=np.float32)


class AudioCache:
    """LRU cache of untrimmed waveforms keyed by video id.

    Per-key locking dedupes concurrent misses: the loader threads all hit
    a new video's segments at once, and without the lock each would decode
    and resample the entire multi-minute waveform (the most expensive host
    IO op) instead of one decoding while the rest wait."""

    def __init__(self, loader, max_items: int = 8):
        self._load = functools.lru_cache(maxsize=max_items)(loader)
        self._locks: dict = {}
        self._locks_guard = threading.Lock()

    def __call__(self, vid_id: str) -> np.ndarray:
        with self._locks_guard:
            lock = self._locks.setdefault(vid_id, threading.Lock())
        with lock:
            return self._load(vid_id)

    def clear(self) -> None:
        self._load.cache_clear()
        with self._locks_guard:
            self._locks.clear()
