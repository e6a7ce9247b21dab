"""Unit tests for synthetic.generate's Bayes-limiting ``class_jitter`` mode
(the convergence differential's non-saturating fixture — see
tests/test_convergence_differential.py)."""

import os

import numpy as np
import pytest

from attention_based_tbn_tpu.data import synthetic


def _gen(root, **kw):
    return synthetic.generate(
        root,
        videos=["P01_01", "P02_01"],
        frames_per_video=30,
        actions_per_video=2,
        image_hw=(48, 64),
        num_verbs=3,
        num_nouns=3,
        seed=3,
        learnable=True,
        **kw,
    )


def test_jitter_requires_learnable(tmp_path):
    with pytest.raises(ValueError, match="learnable"):
        synthetic.generate(str(tmp_path), class_jitter=0.5)


def test_jitter_zero_matches_plain_learnable(tmp_path):
    """Explicit class_jitter=0.0 takes the identical code path (no jitter
    rng construction), so outputs are byte-identical to the default."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _gen(a)
    _gen(b, class_jitter=0.0)
    for dirpath, _, files in os.walk(a):
        rel = os.path.relpath(dirpath, a)
        for fname in files:
            with open(os.path.join(dirpath, fname), "rb") as fh:
                want = fh.read()
            with open(os.path.join(b, rel, fname), "rb") as fh:
                got = fh.read()
            assert got == want, os.path.join(rel, fname)


def test_jitter_shifts_content_not_labels(tmp_path):
    """Jitter perturbs the class-coded content (images + audio) while the
    annotation CSV — the labels — stays identical: the task gets harder,
    the ground truth does not move."""
    import pandas as pd

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _gen(a)
    _gen(b, class_jitter=0.6)

    csv_a = pd.read_csv(os.path.join(a, "annotations", "epic_train_val.csv"))
    csv_b = pd.read_csv(os.path.join(b, "annotations", "epic_train_val.csv"))
    pd.testing.assert_frame_equal(csv_a, csv_b)

    import cv2

    # an in-span frame differs in mean brightness (content moved)
    fa = cv2.imread(os.path.join(a, "links", "P01_01", "img_0000000005.jpg"))
    fb = cv2.imread(os.path.join(b, "links", "P01_01", "img_0000000005.jpg"))
    assert abs(float(fa.mean()) - float(fb.mean())) > 0.5

    # jitter is bounded noise, not a different signal family: both stay
    # within the class-codable brightness band
    assert 20 < fb.mean() < 235


def test_jitter_is_deterministic(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _gen(a, class_jitter=0.6)
    _gen(b, class_jitter=0.6)
    fa = open(os.path.join(a, "audio", "P01_01.wav"), "rb").read()
    fb = open(os.path.join(b, "audio", "P01_01.wav"), "rb").read()
    assert fa == fb
