import numpy as np
import pytest

from attention_based_tbn_tpu.data.records import EpicRecord, record_from_row
from attention_based_tbn_tpu.data.sampling import (
    flow_stack_indices,
    sample_indices,
    segment_offsets,
)


def make_record(start=101, stop=400, labels=True):
    return EpicRecord(
        uid=7,
        video_id="P01_01",
        start_timestamp="00:00:01.00",
        stop_timestamp="00:00:05.00",
        csv_start_frame=start,
        csv_stop_frame=stop,
        verb_class=2 if labels else -1,
        noun_class=8 if labels else -1,
        has_labels=labels,
    )


class TestRecordMath:
    def test_frame_conventions(self):
        rec = make_record(start=101, stop=400)
        # RGB: csv start - 1; Flow halved; Audio same as RGB
        assert rec.start_frame == {"RGB": 100, "Flow": 50, "Audio": 100}
        # end = stop - 2 (Flow halved)
        assert rec.end_frame == {"RGB": 398, "Flow": 199, "Audio": 398}
        assert rec.num_frames == {"RGB": 298, "Flow": 149, "Audio": 298}

    def test_labels(self):
        rec = make_record(labels=True)
        assert rec.label == {"verb": 2, "noun": 8}
        rec = make_record(labels=False)
        assert rec.label == -1

    def test_record_from_row(self):
        import pandas as pd

        row = pd.Series(
            {
                "uid": 3,
                "video_id": "P01_02",
                "start_timestamp": "0",
                "stop_timestamp": "1",
                "start_frame": 11,
                "stop_frame": 60,
                "verb_class": 1,
                "noun_class": 2,
                "action_class": 9,
            }
        )
        rec = record_from_row(row, include_action_class=True)
        assert rec.label == {"verb": 1, "noun": 2, "action": 9}
        rec = record_from_row(row)
        assert rec.label == {"verb": 1, "noun": 2}


class TestSegmentOffsets:
    def test_eval_center_offsets(self):
        # 90 frames, 3 segments -> seg_len 30, center 15
        idx = segment_offsets(90, 3, mode="val")
        np.testing.assert_array_equal(idx, [15, 45, 75])

    def test_eval_flow_recentred(self):
        # seg_len 30, center 15, flow win 5 -> 15 - 2 = 13
        idx = segment_offsets(90, 3, frame_len=5, mode="val", is_flow=True)
        np.testing.assert_array_equal(idx, [13, 43, 73])

    def test_eval_flow_clamped(self):
        # seg_len 1 -> center 0 -> clamp at 0
        idx = segment_offsets(3, 3, frame_len=5, mode="val", is_flow=True)
        np.testing.assert_array_equal(idx, [0, 1, 2])

    def test_train_bounds_and_distribution(self, rng):
        # train seg_len = (90 - 5 + 1)//3 = 28
        for _ in range(50):
            idx = segment_offsets(90, 3, frame_len=5, mode="train", rng=rng)
            base = np.arange(3) * 28
            assert np.all(idx >= base) and np.all(idx < base + 28)

    def test_degenerate_segment(self, rng):
        idx = segment_offsets(2, 3, mode="train", rng=rng)
        np.testing.assert_array_equal(idx, [0, 0, 0])
        idx = segment_offsets(0, 3, mode="val")
        np.testing.assert_array_equal(idx, [0, 0, 0])

    def test_train_requires_rng(self):
        with pytest.raises(ValueError):
            segment_offsets(90, 3, mode="train")


class TestSampleIndices:
    def test_sync_copies_first_modality(self, rng):
        rec = make_record(start=101, stop=400)
        idx = sample_indices(
            rec, ["RGB", "Flow", "Audio"], 3, 5, mode="train", sampling="sync", rng=rng
        )
        np.testing.assert_array_equal(idx["Audio"], idx["RGB"])
        np.testing.assert_array_equal(idx["Flow"], (idx["RGB"] / 2).astype(np.int64))

    def test_async_resamples(self, rng):
        rec = make_record(start=101, stop=4000)
        idx = sample_indices(
            rec, ["RGB", "Audio"], 3, 5, mode="train", sampling="async", rng=rng
        )
        # asynchronous draws are nearly surely different somewhere over trials
        diffs = []
        for _ in range(10):
            idx = sample_indices(
                rec, ["RGB", "Audio"], 3, 5, mode="train", sampling="async", rng=rng
            )
            diffs.append(np.any(idx["RGB"] != idx["Audio"]))
        assert any(diffs)

    def test_eval_deterministic_and_absolute(self):
        rec = make_record(start=101, stop=400)
        idx = sample_indices(rec, ["RGB", "Flow"], 3, 5, mode="val", sampling="async")
        # RGB: start 100 + seg_len(298//3=99) centers 49 -> [149, 248, 347]
        np.testing.assert_array_equal(idx["RGB"], [149, 248, 347])
        # Flow: start 50, 149//3=49, center 24 - 2 = 22 -> [72, 121, 170]
        np.testing.assert_array_equal(idx["Flow"], [72, 121, 170])


def test_flow_stack_indices():
    seg = np.array([10, 50])
    idx = flow_stack_indices(seg, win_length=5, num_segments=2)
    np.testing.assert_array_equal(
        idx, [10, 11, 12, 13, 14, 50, 51, 52, 53, 54]
    )
