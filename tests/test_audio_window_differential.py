"""Audio window-cut differential vs the reference's verbatim
``Video_Dataset._get_audio_segment`` (core/dataset/dataset.py:421-459).

The spectrogram/prior halves are stubbed to identity on an uninitialized
reference instance so the trimmed waveform itself can be compared bitwise
against our ``audio.extract_window`` across the placement edge cases:
center, clamp-at-start, clamp-at-end, fractional fps.

Also pins the one documented divergence (extract_window docstring): for a
sample SHORTER than one window the reference pads, but then clamps the
start frame against the PRE-pad length, producing a negative start whose
python slice is EMPTY — every too-short sample returns a zero-length
window there (the downstream spectrogram would crash). We clamp the start
to 0 and return the padded full window.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

from attention_based_tbn_tpu.data.audio import extract_window

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "core")),
    reason="reference tree unavailable",
)


def _reference_window(sample, frame_idx, vid_fps, audio_length, sr):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    try:
        from test_dataset_differential import _load_reference_dataset_pkg
    finally:
        sys.path.pop(0)
    ref_dataset, _ = _load_reference_dataset_pkg()
    ds = object.__new__(ref_dataset.Video_Dataset)
    ds.audio_length = audio_length
    ds.aud_sampling_rate = sr
    ds.vid_fps = vid_fps
    ds._get_spectrogram = lambda s: s
    ds._get_attn_weights = lambda spec, frame_idx, start_sec: None
    trimmed, _ = ds._get_audio_segment(frame_idx, sample)
    return trimmed


@pytest.mark.parametrize(
    "frame_idx,seconds",
    [
        (0, 10.0),      # window clamped at the start
        (5, 10.0),      # still start-clamped (center before 0)
        (300, 10.0),    # interior window
        (599, 10.0),    # clamped at the end
        (250, 2.2),     # short sample, interior
        (1, 2.2),       # short sample, both clamps interact
    ],
)
@pytest.mark.parametrize("vid_fps", [60.0, 59.94])
def test_window_matches_reference(frame_idx, seconds, vid_fps):
    sr, audio_length = 24000, 1.279
    rng = np.random.default_rng(frame_idx + int(seconds))
    sample = rng.standard_normal(int(seconds * sr)).astype(np.float32)

    want = _reference_window(sample.copy(), frame_idx, vid_fps, audio_length, sr)
    got = extract_window(sample, frame_idx, vid_fps, audio_length, sr)

    assert want.shape[0] == int(audio_length * sr)
    np.testing.assert_array_equal(got, np.asarray(want, dtype=np.float32))


def test_too_short_sample_reference_quirk():
    """Sample shorter than one window: the reference's post-pad clamp uses
    the pre-pad length, so its slice start goes negative and the returned
    window is EMPTY (dataset.py:441-451); ours returns the right-padded
    full window with the original content at the front."""
    sr, audio_length, vid_fps = 24000, 1.279, 60.0
    min_len = int(audio_length * sr)
    sample = np.linspace(-1, 1, sr // 2, dtype=np.float32)  # 0.5 s

    want = _reference_window(sample.copy(), 10, vid_fps, audio_length, sr)
    assert want.shape[0] == 0  # the quirk, pinned

    got = extract_window(sample, 10, vid_fps, audio_length, sr)
    assert got.shape[0] == min_len
    np.testing.assert_array_equal(got[: sample.shape[0]], sample)
    np.testing.assert_array_equal(
        got[sample.shape[0] :], np.zeros(min_len - sample.shape[0], np.float32)
    )
