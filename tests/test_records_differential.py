"""Full-CSV differential: every annotation row through the reference's
verbatim ``EpicVideoRecord`` (/root/reference/core/dataset/epic_record.py)
vs our ``EpicRecord`` (data/records.py).

Sweeps ALL 28k rows of annotations/epic_train_val.csv — start/end frame and
num_frames per modality (the ±1 / ÷2 / stop−2 conventions), action_id,
video name, timestamps, and labels — plus the unlabeled S1/S2 path
(columns dropped → -1 sentinel). Covers odd/even start/stop frames, so the
Flow floor-division edge cases are all exercised on real data.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import pandas as pd
import pytest

from attention_based_tbn_tpu.data.records import MODALITIES, record_from_row

REFERENCE = "/root/reference"
CSV = os.path.join(os.path.dirname(__file__), "..", "annotations",
                   "epic_train_val.csv")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "core")),
    reason="reference tree unavailable",
)


def _load_reference_record_cls():
    base = os.path.join(REFERENCE, "core", "dataset")
    pkg = types.ModuleType("refdataset")
    pkg.__path__ = [base]
    sys.modules.setdefault("refdataset", pkg)
    for name in ("video_record", "epic_record"):
        full = f"refdataset.{name}"
        if full in sys.modules:
            continue
        spec = importlib.util.spec_from_file_location(
            full, os.path.join(base, f"{name}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
    return sys.modules["refdataset.epic_record"].EpicVideoRecord


def test_every_annotation_row_matches_reference():
    ref_cls = _load_reference_record_cls()
    table = pd.read_csv(CSV)
    assert len(table) > 20000  # the real 28k-row Epic-Kitchens-55 table

    for _, row in table.iterrows():
        ref = ref_cls(row)
        ours = record_from_row(row)

        assert ours.action_id == ref.action_id
        assert ours.untrimmed_video_name == ref.untrimmed_video_name
        assert ours.start_timestamp == ref.start_time
        assert ours.stop_timestamp == ref.stop_time
        for m in MODALITIES:
            assert ours.start_frame[m] == ref.start_frame[m], (row["uid"], m)
            assert ours.end_frame[m] == ref.end_frame[m], (row["uid"], m)
            assert ours.num_frames[m] == ref.num_frames[m], (row["uid"], m)

        ref_label = ref.label
        ours_label = ours.label
        assert set(ref_label.keys()) == {"verb", "noun"}
        assert ours_label["verb"] == ref_label["verb"]
        assert ours_label["noun"] == ref_label["noun"]
        # without an action head configured we add no extra key
        # (PARITY.md item 12 covers the include_action_class=True extension)
        assert set(ours_label.keys()) == set(ref_label.keys())


def test_unlabeled_rows_match_reference_sentinel():
    ref_cls = _load_reference_record_cls()
    table = pd.read_csv(CSV).head(64)
    # S1/S2 test CSVs carry no *_class columns (reference epic_record.py:49-59)
    table = table.drop(
        columns=["verb_class", "noun_class", "action_class", "verb", "noun",
                 "all_nouns", "all_noun_classes", "action"]
    )
    for _, row in table.iterrows():
        ref = ref_cls(row)
        ours = record_from_row(row)
        assert ref.label == -1
        assert ours.label == -1
        for m in MODALITIES:
            assert ours.num_frames[m] == ref.num_frames[m]
