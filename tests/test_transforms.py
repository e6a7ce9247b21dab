"""Host transform semantics (reference core/dataset/transform.py parity)."""

import numpy as np
import pytest

from attention_based_tbn_tpu.data import transforms as T


@pytest.fixture
def frames():
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, (3, 256, 342, 3), dtype=np.uint8)


class TestRescale:
    def test_shorter_side_landscape(self, frames):
        out = T.rescale(frames, 128)
        # h < w: height becomes 128, width scales by 342/256
        assert out.shape == (3, 128, int(128 * 342 / 256), 3)

    def test_shorter_side_portrait(self):
        img = np.zeros((2, 342, 256, 1), np.uint8)
        out = T.rescale(img, 128)
        assert out.shape == (2, int(128 * 342 / 256), 128, 1)

    def test_exact_size(self, frames):
        out = T.rescale(frames, (100, 120))
        assert out.shape == (3, 100, 120, 3)

    def test_noop_when_same(self, frames):
        out = T.rescale(frames, (256, 342))
        assert out is frames

    def test_matches_cv2(self, frames):
        cv2 = pytest.importorskip("cv2")
        out = T.rescale(frames, 128)
        ref = cv2.resize(frames[0], (out.shape[2], 128), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_array_equal(out[0], ref)


class TestCrops:
    def test_center_crop(self, frames):
        out = T.center_crop(frames, 224)
        assert out.shape == (3, 224, 224, 3)
        y0, x0 = (256 - 224) // 2, (342 - 224) // 2
        np.testing.assert_array_equal(out[0], frames[0, y0 : y0 + 224, x0 : x0 + 224])

    def test_fixed_crop_offsets_grid(self):
        # reference transform.py:389-412: 5 base + 8 more_fix_crop offsets
        offsets = T.fixed_crop_offsets(342, 256, 224, 224, more_fix_crop=True)
        assert len(offsets) == 13
        w_step, h_step = (342 - 224) / 4, (256 - 224) / 4
        assert offsets[0] == (0, 0)
        assert offsets[1] == (int(4 * w_step), 0)
        assert offsets[4] == (int(2 * w_step), int(2 * h_step))
        assert offsets[9] == (int(1 * w_step), int(1 * h_step))

    def test_fixed_crop_offsets_basic(self):
        offsets = T.fixed_crop_offsets(342, 256, 224, 224, more_fix_crop=False)
        assert len(offsets) == 5


class TestMultiScaleCrop:
    def test_output_size_and_determinism(self, frames):
        rng1 = np.random.default_rng(3)
        rng2 = np.random.default_rng(3)
        a = T.multi_scale_crop(frames, 224, rng=rng1)
        b = T.multi_scale_crop(frames, 224, rng=rng2)
        assert a.shape == (3, 224, 224, 3)
        np.testing.assert_array_equal(a, b)

    def test_scale_snapping(self, frames):
        # base 256, scales incl. 0.875 -> 224 exactly (within-3px snap)
        seen_sizes = set()
        for seed in range(30):
            out = T.multi_scale_crop(
                frames, 224, scales=[1, 0.875], rng=np.random.default_rng(seed)
            )
            assert out.shape[1:3] == (224, 224)
            seen_sizes.add(out.shape[1])

    def test_requires_rng(self, frames):
        with pytest.raises(ValueError):
            T.multi_scale_crop(frames, 224)

    def test_flow_scales(self):
        rng = np.random.default_rng(0)
        flow = rng.integers(0, 255, (2, 256, 342, 10), dtype=np.uint8)
        out = T.multi_scale_crop(flow, 224, scales=[1, 0.875, 0.75], rng=rng)
        assert out.shape == (2, 224, 224, 10)


class TestFlip:
    def test_horizontal_flip(self, frames):
        out = T.horizontal_flip(frames)
        np.testing.assert_array_equal(out[:, :, ::-1], frames)

    def test_train_transform_flip_probability(self, frames):
        flipped = 0
        for seed in range(40):
            rng = np.random.default_rng(seed)
            out = T.train_visual_transform(frames, 224, [1], 0.5, rng)
            # with scales=[1] and the center offset the crop is deterministic
            # enough to detect flips statistically via asymmetry
            assert out.shape == (3, 224, 224, 3)
        # probability path exercised; flip itself tested above


class TestEvalTransform:
    def test_rescale_then_center_crop(self, frames):
        out = T.eval_visual_transform(frames, 256, 224)
        assert out.shape == (3, 224, 224, 3)
        assert out.dtype == np.uint8
