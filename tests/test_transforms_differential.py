"""Train-time transform differentials vs the reference's verbatim
transform module (core/dataset/transform.py, imported from
/root/reference with torchvision stubbed).

The random train path (MultiScaleCrop -> RandomHorizontalFlip) cannot be
aligned bitwise through the RNG itself — the reference draws from the
legacy global ``np.random`` state while we take an explicit
``np.random.Generator`` — but the DRAW STRUCTURE is identical (one pair
index, one fixed-offset index / two span offsets, one flip uniform), so a
replay facade that forwards ``integers``/``random`` to the seeded legacy
state runs our pipeline on the reference's exact random choices. Given
the same choices, the pixel output must be bitwise identical.

Also pins the 10-crop path: our ``ten_crop`` vs the reference's
``FixedCrop(horizontal_flip=True)`` (transform.py:106-179), which the
reference ships but comments out at its call sites — same crop-major,
original-then-flip-per-frame ordering.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from attention_based_tbn_tpu.data import transforms as ours

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "core")),
    reason="reference tree unavailable",
)


def _stub(name, **attrs):
    # merge into an existing stub (test_whole_model_parity._stub_module
    # notes why: stub attribute sets differ per suite and test order must
    # not matter)
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for key, value in attrs.items():
        if not hasattr(mod, key):
            setattr(mod, key, value)
    return mod


def _load_reference_transform():
    if "refdset.transform" in sys.modules:
        return sys.modules["refdset.transform"]
    tvf = _stub("torchvision.transforms.functional")
    tvt = _stub("torchvision.transforms", functional=tvf)
    _stub("torchvision", transforms=tvt)
    path = os.path.join(REFERENCE, "core", "dataset", "transform.py")
    spec = importlib.util.spec_from_file_location("refdset.transform", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refdset.transform"] = mod
    spec.loader.exec_module(mod)
    return mod


class _ReplayRng:
    """``np.random.Generator`` facade forwarding to the legacy global
    ``np.random`` state, aligning our explicit-rng draws one-for-one with
    the reference's ``np.random.randint``/``np.random.random`` calls."""

    def integers(self, low, high=None):
        return np.random.randint(low, high)

    def random(self):
        return np.random.random()


def _frames(rng, n, h, w, c):
    return rng.integers(0, 256, size=(n, h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("seed", [0, 1, 7, 123, 2026])
@pytest.mark.parametrize(
    "h,w", [(128, 171), (171, 128), (160, 160), (135, 240)]
)
def test_train_path_replay_matches_reference(seed, h, w):
    """MultiScaleCrop(fix_crop) + RandomHorizontalFlip, bitwise, on the
    reference's exact random choices (reference transform.py:284-412 and
    :182-219 vs data/transforms.train_visual_transform)."""
    T = _load_reference_transform()
    crop_size = 112
    frames = _frames(np.random.default_rng(seed), 6, h, w, 3)

    np.random.seed(seed)
    got = ours.train_visual_transform(
        frames, crop_size, scales=(1, 0.875, 0.75, 0.66), flip_prob=0.5,
        rng=_ReplayRng(),
    )

    np.random.seed(seed)
    msc = T.MultiScaleCrop(crop_size)
    flip = T.RandomHorizontalFlip(prob=0.5)
    want = np.stack(flip(msc([f for f in frames])), axis=0)

    assert got.shape == want.shape == (6, crop_size, crop_size, 3)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", [0, 3, 11])
def test_train_path_replay_single_channel(seed):
    """Same replay on 2-D grayscale frames (the reference's Flow maps are
    (H, W) arrays; ours ride a trailing channel axis)."""
    T = _load_reference_transform()
    crop_size = 112
    h, w = 150, 200
    frames = _frames(np.random.default_rng(seed + 50), 4, h, w, 1)

    np.random.seed(seed)
    got = ours.train_visual_transform(
        frames, crop_size, scales=(1, 0.875, 0.75, 0.66), flip_prob=0.5,
        rng=_ReplayRng(),
    )

    np.random.seed(seed)
    msc = T.MultiScaleCrop(crop_size)
    flip = T.RandomHorizontalFlip(prob=0.5)
    want = np.stack(flip(msc([f[..., 0] for f in frames])), axis=0)

    np.testing.assert_array_equal(got[..., 0], want)


@pytest.mark.parametrize("seed", [0, 2, 9, 41])
def test_free_offset_replay_matches_reference(seed):
    """fix_crop=False replay (reference transform.py:371-374: two
    np.random.randint span draws, w then h). Scales exclude 1.0 so every
    span is positive — the span-0 case raises in the reference
    (documented divergence, transforms.py multi_scale_crop docstring)."""
    T = _load_reference_transform()
    crop_size = 112
    scales = (0.875, 0.75, 0.66)
    frames = _frames(np.random.default_rng(seed + 100), 3, 140, 190, 3)

    np.random.seed(seed)
    got = ours.multi_scale_crop(
        frames, crop_size, scales=scales, fix_crop=False, rng=_ReplayRng()
    )

    np.random.seed(seed)
    msc = T.MultiScaleCrop(crop_size, scales=list(scales), fix_crop=False)
    want = np.stack(msc([f for f in frames]), axis=0)

    np.testing.assert_array_equal(got, want)


def test_ten_crop_matches_reference_fixed_crop():
    """ten_crop vs the verbatim FixedCrop(locations 0-4, hflip=True):
    same location order (center, TL, TR, BL, BR) and the same
    original-then-flipped interleaving per frame."""
    T = _load_reference_transform()
    size = 112
    frames = _frames(np.random.default_rng(7), 3, 128, 171, 3)

    got = ours.ten_crop(frames, size)

    fixed = T.FixedCrop((size, size), horizontal_flip=True)
    want = np.stack(fixed([f for f in frames]), axis=0)

    assert got.shape == want.shape == (30, size, size, 3)
    np.testing.assert_array_equal(got, want)
