"""TSN sampling differentials vs the reference's verbatim
``Video_Dataset._get_offsets`` (core/dataset/dataset.py:194-239) and the
``__getitem__`` sync/async index block (dataset.py:155-173).

Train-mode offsets are random: the reference draws one vectorized
``np.random.randint(seg_len, size=num_segments)`` from the legacy global
state per (record, modality); ours draws one
``rng.integers(0, seg_len, size=num_segments)`` from an explicit
Generator. A replay facade forwards our draw to the seeded legacy state —
identical draw structure, so given the same seed the sampled indices must
be bitwise equal, including the degenerate seg_len<=0 path (which draws
NOTHING in both, keeping the replay stream aligned across records).
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

from attention_based_tbn_tpu.data.sampling import (
    flow_stack_indices,
    sample_indices,
    segment_offsets,
)

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "core")),
    reason="reference tree unavailable",
)


def _reference_dataset_cls():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    try:
        from test_dataset_differential import _load_reference_dataset_pkg
    finally:
        sys.path.pop(0)
    ref_dataset, _ = _load_reference_dataset_pkg()
    return ref_dataset.Video_Dataset


class _ReplayRng:
    """Generator facade forwarding to the legacy global np.random state."""

    def integers(self, low, high=None, size=None):
        return np.random.randint(low, high, size=size)


def _record(num_frames, start_frame):
    return types.SimpleNamespace(num_frames=num_frames, start_frame=start_frame)


def _ref_instance(cls, mode, num_segments, flow_win):
    ds = object.__new__(cls)
    ds.mode = mode
    ds.num_segments = num_segments
    ds.frame_len = {"RGB": 1, "Flow": flow_win, "Audio": 1}
    return ds


# (num_frames per modality, start_frame per modality) sweeps: normal spans,
# seg_len exactly 1, and the degenerate seg_len == 0 collapse.
_CASES = [
    ({"RGB": 93, "Flow": 46, "Audio": 93}, {"RGB": 100, "Flow": 50, "Audio": 100}),
    ({"RGB": 9, "Flow": 4, "Audio": 9}, {"RGB": 0, "Flow": 0, "Audio": 0}),
    ({"RGB": 2, "Flow": 1, "Audio": 2}, {"RGB": 7, "Flow": 3, "Audio": 7}),
    ({"RGB": 31, "Flow": 15, "Audio": 31}, {"RGB": 4, "Flow": 2, "Audio": 4}),
]


@pytest.mark.parametrize("seed", [0, 1, 17])
@pytest.mark.parametrize("case", _CASES)
@pytest.mark.parametrize("modality", ["RGB", "Flow", "Audio"])
def test_train_offsets_replay(seed, case, modality):
    cls = _reference_dataset_cls()
    num_segments, flow_win = 3, 6
    record = _record(*case)
    ds = _ref_instance(cls, "train", num_segments, flow_win)

    np.random.seed(seed)
    want = ds._get_offsets(record, modality)

    np.random.seed(seed)
    frame_len = flow_win if modality == "Flow" else 1
    got = record.start_frame[modality] + segment_offsets(
        record.num_frames[modality],
        num_segments,
        frame_len=frame_len,
        mode="train",
        is_flow=(modality == "Flow"),
        rng=_ReplayRng(),
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert np.asarray(got).dtype == np.int64


@pytest.mark.parametrize("mode", ["val", "test"])
@pytest.mark.parametrize("case", _CASES)
@pytest.mark.parametrize("modality", ["RGB", "Flow", "Audio"])
def test_eval_offsets_differential(mode, case, modality):
    """Deterministic center offsets incl. the Flow window recentering and
    its clamp at 0 (reference dataset.py:225-228)."""
    cls = _reference_dataset_cls()
    num_segments, flow_win = 3, 6
    record = _record(*case)
    ds = _ref_instance(cls, mode, num_segments, flow_win)

    want = ds._get_offsets(record, modality)
    got = record.start_frame[modality] + segment_offsets(
        record.num_frames[modality],
        num_segments,
        frame_len=flow_win if modality == "Flow" else 1,
        mode=mode,
        is_flow=(modality == "Flow"),
        rng=None,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("seed", [0, 5, 23])
@pytest.mark.parametrize("sampling", ["sync", "async"])
def test_sample_indices_replay_full_block(seed, sampling):
    """Our sample_indices vs the reference's whole per-modality index
    block (dataset.py:155-166): branch selection, sync copy with the
    Flow /2 halving, async per-modality draws — the replay stream must
    stay aligned across the modality loop."""
    cls = _reference_dataset_cls()
    modality = ["RGB", "Flow", "Audio"]
    num_segments, flow_win = 3, 6
    record = _record(
        {"RGB": 93, "Flow": 46, "Audio": 93},
        {"RGB": 100, "Flow": 50, "Audio": 100},
    )
    ds = _ref_instance(cls, "train", num_segments, flow_win)

    np.random.seed(seed)
    want = {}
    for m_no, m in enumerate(modality):
        if m_no > 0 and sampling == "sync":
            want[m] = want[modality[0]]
            if m == "Flow":
                want[m] = (want[m] / 2).astype(np.int64)
        else:
            want[m] = ds._get_offsets(record, m)

    np.random.seed(seed)
    got = sample_indices(
        record,
        modality,
        num_segments,
        flow_win,
        mode="train",
        sampling=sampling,
        rng=_ReplayRng(),
    )
    for m in modality:
        np.testing.assert_array_equal(np.asarray(got[m]), np.asarray(want[m]))


def test_flow_stack_expansion_differential():
    """Per-frame flow index interleaving vs the reference expression at
    dataset.py:168-173."""
    num_segments, win = 4, 5
    indices = np.array([10, 31, 57, 80], dtype=np.int64)

    want = (
        indices.repeat(win) + np.tile(np.arange(win), num_segments)
    ).astype(np.int64)
    got = flow_stack_indices(indices, win, num_segments)
    np.testing.assert_array_equal(got, want)
