"""End-to-end TRAIN-pipeline replay differential vs the reference's
verbatim ``Video_Dataset`` in train mode.

The eval pipeline is compared bitwise in test_dataset_differential; the
train path adds randomness — TSN offset draws plus MultiScaleCrop/flip
draws — all from the legacy global np.random in the reference and from an
explicit Generator here. Under SYNC sampling the two frameworks consume
the global stream in the same order per sample (modality-0 sampling draw,
then per-modality MSC pair/offset and flip draws — the reference
interleaves sampling and transform per modality, but only modality 0
draws sampling offsets under sync, which is first in both), so a replay
facade makes the whole composed path comparable bitwise: annotation row
-> record -> random TSN offsets (Flow halving) -> decode -> MultiScaleCrop
-> flip -> stack -> normalize.

Async sampling interleaves differently — the reference draws each
modality's sampling offsets BETWEEN the previous modality's transform
draws, while we draw all sampling offsets first — so a straight replay
misaligns. The async test instead RECORDS the reference's draws (by
wrapping np.random while the verbatim __getitem__ runs) and serves them
back reordered: sampling draws are vectorized (size=num_segments) and
transform draws are scalars, and each category's RELATIVE order is the
same in both frameworks, so a two-queue facade reproduces the reference's
exact random choices in our consumption order.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

from attention_based_tbn_tpu.config import load_config
from attention_based_tbn_tpu.data.dataset import VideoDataset
from attention_based_tbn_tpu.data.synthetic import generate

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "core")),
    reason="reference tree unavailable",
)


def _machinery():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    try:
        import test_dataset_differential as m
    finally:
        sys.path.pop(0)
    return m


class _ReplayRng:
    """Generator facade forwarding to the seeded legacy global state."""

    def integers(self, low, high=None, size=None):
        return np.random.randint(low, high, size=size)

    def random(self):
        return np.random.random()


def _reference_train_transforms(m, T, cfg):
    """The train branches of reference create_dataloader.get_transforms
    (create_dataloader.py:23-60): MultiScaleCrop + flip + Stack + ToTensor
    + Normalize; Flow drops the 0.66 scale."""
    return {
        "RGB": m._Compose([
            T.MultiScaleCrop(cfg.data.train_crop_size, [1, 0.875, 0.75, 0.66]),
            T.RandomHorizontalFlip(prob=0.5),
            T.Stack("RGB"),
            T.ToTensor(),
            T.Normalize(list(cfg.data.rgb.mean), list(cfg.data.rgb.std)),
        ]),
        "Flow": m._Compose([
            T.MultiScaleCrop(cfg.data.train_crop_size, [1, 0.875, 0.75]),
            T.RandomHorizontalFlip(prob=0.5),
            T.Stack("Flow"),
            T.ToTensor(),
            T.Normalize(list(cfg.data.flow.mean), list(cfg.data.flow.std)),
        ]),
    }


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("epic_train_fixture")
    generate(str(root), videos=["P01_01", "P01_02"], frames_per_video=120)
    return str(root)


def test_train_pipeline_matches_reference_bitwise(fixture_root):
    m = _machinery()
    ref_dataset_mod, T = m._load_reference_dataset_pkg()

    n_seg = 3
    cfg = load_config(
        overrides=[
            f"data_dir={fixture_root}",
            "data.audio.enable=False",
            "model.attention.enable=False",
            "data.sampling=sync",
            f"train.num_segments={n_seg}",
            "tpu.native_io=False",  # pin the cv2 decode path: bitwise vs ref
        ]
    )
    modality = ["RGB", "Flow"]
    annotation = "annotations/epic_train_val.csv"
    vid_list = ["P01_01", "P01_02"]

    ours = VideoDataset(cfg, vid_list, annotation, modality, mode="train")
    ref = ref_dataset_mod.Video_Dataset(
        cfg,
        vid_list,
        annotation,
        modality,
        transform=_reference_train_transforms(m, T, cfg),
        mode="train",
    )
    assert len(ours) == len(ref) > 0

    for index in range(len(ours)):
        # one seed per sample keeps the replay streams aligned regardless
        # of how many draws the previous sample consumed
        np.random.seed(10_000 + index)
        ref_data, ref_target = ref[index]

        np.random.seed(10_000 + index)
        sample = ours.sample(index, _ReplayRng())

        assert sample["vid_id"] == ref_data["vid_id"]
        for mod in modality:
            np.testing.assert_array_equal(
                sample["indices"][mod], ref_data["indices"][mod],
                err_msg=f"{mod} train indices",
            )
        assert sample["labels"] == dict(ref_target["class"])

        ours_rgb = m._normalize_like_device(
            sample["RGB"], cfg.data.rgb.mean, cfg.data.rgb.std
        )
        np.testing.assert_array_equal(
            ours_rgb, ref_data["RGB"].numpy(), err_msg="RGB train pixels"
        )
        ours_flow = m._normalize_like_device(
            sample["Flow"], cfg.data.flow.mean, cfg.data.flow.std
        )
        np.testing.assert_array_equal(
            ours_flow, ref_data["Flow"].numpy(), err_msg="Flow train pixels"
        )


class _DrawRecorder:
    """Wrap np.random.{randint,random} to record every draw the reference
    makes while still delegating to the genuinely seeded global state."""

    def __init__(self):
        self.vectors = []  # (args, value) of size=... randint draws
        self.scalars = []  # ("randint"|"random", value)

    def __enter__(self):
        self._randint = np.random.randint
        self._random = np.random.random

        def randint(low, high=None, size=None, **kw):
            value = self._randint(low, high, size=size, **kw)
            if size is None:
                self.scalars.append(("randint", value))
            else:
                self.vectors.append(((low, high, size), value))
            return value

        def random(*a, **kw):
            value = self._random(*a, **kw)
            self.scalars.append(("random", value))
            return value

        np.random.randint = randint
        np.random.random = random
        return self

    def __exit__(self, *exc):
        np.random.randint = self._randint
        np.random.random = self._random
        return False


class _ReorderedReplay:
    """Serve recorded draws back in OUR consumption order: vectorized
    sampling draws from one queue, scalar transform draws from the other —
    each category's relative order matches the recording."""

    def __init__(self, recorder):
        self._vectors = list(recorder.vectors)
        self._scalars = list(recorder.scalars)

    def integers(self, low, high=None, size=None):
        if size is not None:
            args, value = self._vectors.pop(0)
            assert args[2] == size, (args, size)
            return value
        kind, value = self._scalars.pop(0)
        assert kind == "randint", kind
        return value

    def random(self):
        kind, value = self._scalars.pop(0)
        assert kind == "random", kind
        return value


def test_async_train_pipeline_matches_reference_reordered(fixture_root):
    m = _machinery()
    ref_dataset_mod, T = m._load_reference_dataset_pkg()

    n_seg = 3
    cfg = load_config(
        overrides=[
            f"data_dir={fixture_root}",
            "data.audio.enable=False",
            "model.attention.enable=False",
            "data.sampling=async",
            f"train.num_segments={n_seg}",
            "tpu.native_io=False",
        ]
    )
    modality = ["RGB", "Flow"]
    annotation = "annotations/epic_train_val.csv"
    vid_list = ["P01_01", "P01_02"]

    ours = VideoDataset(cfg, vid_list, annotation, modality, mode="train")
    ref = ref_dataset_mod.Video_Dataset(
        cfg,
        vid_list,
        annotation,
        modality,
        transform=_reference_train_transforms(m, T, cfg),
        mode="train",
    )
    assert len(ours) == len(ref) > 0

    for index in range(len(ours)):
        np.random.seed(20_000 + index)
        with _DrawRecorder() as rec:
            ref_data, ref_target = ref[index]

        sample = ours.sample(index, _ReorderedReplay(rec))

        for mod in modality:
            np.testing.assert_array_equal(
                sample["indices"][mod], ref_data["indices"][mod],
                err_msg=f"{mod} async train indices",
            )
        assert sample["labels"] == dict(ref_target["class"])
        ours_rgb = m._normalize_like_device(
            sample["RGB"], cfg.data.rgb.mean, cfg.data.rgb.std
        )
        np.testing.assert_array_equal(
            ours_rgb, ref_data["RGB"].numpy(), err_msg="RGB async pixels"
        )
        ours_flow = m._normalize_like_device(
            sample["Flow"], cfg.data.flow.mean, cfg.data.flow.std
        )
        np.testing.assert_array_equal(
            ours_flow, ref_data["Flow"].numpy(), err_msg="Flow async pixels"
        )
