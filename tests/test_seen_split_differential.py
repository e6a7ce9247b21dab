"""Seen-split differential vs the verbatim reference create_epic_split.

The seen mode is random (the reference shuffles each participant's videos
with stdlib ``random`` and holds out the last; we draw one uniform index
from an explicit Generator), so the held-out CHOICES cannot be aligned —
unlike the np.random paths, ``random.shuffle`` has no draw-for-draw
counterpart in our code. What is compared instead:

* structural invariants on the real 28k-row CSV — both implementations
  produce a train/val partition of all video ids with exactly one val
  video per participant, identically sorted output;
* the held-out distribution — over many seeds both pick each video of a
  participant uniformly;
* the one divergence, pinned: a participant with a SINGLE video sends it
  to val (and contributes nothing to train) in the reference
  (create_epic_split.py:76-78 ``vids[:-1]`` is empty); we keep it in
  train (no such participant exists in the real CSV — min is 3 videos).
"""

from __future__ import annotations

import collections
import importlib.util
import os
import random
from types import SimpleNamespace as NS

import numpy as np
import pandas as pd
import pytest

from attention_based_tbn_tpu.preprocessing.create_split import seen_split

REFERENCE = "/root/reference"
CSV = os.path.join(
    os.path.dirname(__file__), "..", "annotations", "epic_train_val.csv"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "preprocessing")),
    reason="reference tree unavailable",
)


def _load_reference_split():
    path = os.path.join(REFERENCE, "preprocessing", "create_epic_split.py")
    spec = importlib.util.spec_from_file_location("ref_split_seen", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.ars = NS(mode="seen")  # the reference's dead `ars` typo at :68
    return mod


def _reference_seen(mod, csv_path, out_dir, seed):
    random.seed(seed)
    mod.create_split(NS(annotation=csv_path, out_dir=str(out_dir), mode="seen"))
    with open(os.path.join(out_dir, "train_split.txt")) as fh:
        train = fh.read().split()
    with open(os.path.join(out_dir, "val_split.txt")) as fh:
        val = fh.read().split()
    return train, val


def test_seen_split_invariants_match_reference(tmp_path):
    mod = _load_reference_split()
    ref_train, ref_val = _reference_seen(mod, CSV, tmp_path, seed=0)

    video_ids = sorted(pd.read_csv(CSV)["video_id"].unique())
    our_train, our_val = seen_split(video_ids, np.random.default_rng(0))

    participants = {v.split("_")[0] for v in video_ids}
    for train, val in ((ref_train, ref_val), (our_train, our_val)):
        # partition of all videos
        assert sorted(train + val) == video_ids
        # exactly one val video per participant
        per = collections.Counter(v.split("_")[0] for v in val)
        assert set(per) == participants
        assert set(per.values()) == {1}
        # both emit sorted lists (the reference sorts at write time)
        assert train == sorted(train) and val == sorted(val)


def test_seen_split_heldout_distribution(tmp_path):
    """Both implementations hold out each of a participant's videos
    uniformly. 300 seeds over a 3-video participant: expect ~100 each;
    a fair-uniform bound of [60, 140] is ~5 sigma."""
    mod = _load_reference_split()
    vids = ["P01_01", "P01_02", "P01_03"]
    csv = tmp_path / "mini.csv"
    pd.DataFrame(
        {"participant_id": ["P01"] * 3, "video_id": vids}
    ).to_csv(csv, index=False)

    ref_counts = collections.Counter()
    our_counts = collections.Counter()
    for seed in range(300):
        _, ref_val = _reference_seen(mod, str(csv), tmp_path, seed)
        ref_counts[ref_val[0]] += 1
        _, our_val = seen_split(vids, np.random.default_rng(seed))
        our_counts[our_val[0]] += 1

    for counts in (ref_counts, our_counts):
        assert set(counts) == set(vids)
        for vid in vids:
            assert 60 <= counts[vid] <= 140, (counts, vid)


def test_single_video_participant_divergence(tmp_path):
    """Pinned divergence: the reference sends a single-video participant's
    only video to val (its train contribution vids[:-1] is empty); we keep
    it in train. Theoretical on the real CSV (every participant has >= 3
    videos)."""
    mod = _load_reference_split()
    csv = tmp_path / "one.csv"
    pd.DataFrame(
        {
            "participant_id": ["P01", "P02", "P02"],
            "video_id": ["P01_01", "P02_01", "P02_02"],
        }
    ).to_csv(csv, index=False)

    ref_train, ref_val = _reference_seen(mod, str(csv), tmp_path, seed=1)
    assert "P01_01" in ref_val and "P01_01" not in ref_train

    our_train, our_val = seen_split(
        ["P01_01", "P02_01", "P02_02"], np.random.default_rng(1)
    )
    assert "P01_01" in our_train and "P01_01" not in our_val
    # the multi-video participant still contributes exactly one val video
    assert len([v for v in our_val if v.startswith("P02")]) == 1
