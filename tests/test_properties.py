"""Property-based edge-case coverage for the host-side math.

The unit suites pin golden values for the reference recipes; these
hypothesis tests sweep the argument space (tiny videos, fewer frames than
segments, audio shorter than one window, arbitrary signal lengths) and
assert the structural invariants each consumer relies on. Each property
names the reference convention it guards (file:line in /root/reference).
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from attention_based_tbn_tpu.config import load_config
from attention_based_tbn_tpu.data.audio import extract_window
from attention_based_tbn_tpu.data.loader import pad_batch
from attention_based_tbn_tpu.data.records import EpicRecord
from attention_based_tbn_tpu.data.sampling import (
    flow_stack_indices,
    sample_indices,
    segment_offsets,
)
from attention_based_tbn_tpu.data.transforms import (
    fixed_crop_offsets,
    multi_scale_crop,
)
from attention_based_tbn_tpu.ops.spectrogram import (
    _padded_window,
    log_power_stft_np,
    num_frames,
)

# Keep runs fast and deterministic across machines.
COMMON = dict(deadline=None, max_examples=80)


class TestSegmentOffsetsProps:
    """reference core/dataset/dataset.py:194-239 (TSN offset sampling)."""

    @given(
        nf=st.integers(0, 400),
        segs=st.integers(1, 25),
        frame_len=st.integers(1, 10),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(**COMMON)
    def test_train_window_stays_inside_record(self, nf, segs, frame_len, seed):
        rng = np.random.default_rng(seed)
        out = segment_offsets(nf, segs, frame_len=frame_len, mode="train", rng=rng)
        assert out.shape == (segs,) and out.dtype == np.int64
        seg_len = (nf - frame_len + 1) // segs
        if seg_len <= 0:
            np.testing.assert_array_equal(out, 0)
            return
        # each offset inside its own segment bin
        bins = np.arange(segs) * seg_len
        assert np.all(out >= bins) and np.all(out < bins + seg_len)
        # the full frame window fits inside the record
        assert out[-1] + frame_len - 1 <= nf - 1

    @given(nf=st.integers(1, 400), segs=st.integers(1, 25))
    @settings(**COMMON)
    def test_eval_center_deterministic_and_bounded(self, nf, segs):
        a = segment_offsets(nf, segs, mode="val")
        b = segment_offsets(nf, segs, mode="val")
        np.testing.assert_array_equal(a, b)
        seg_len = nf // segs
        if seg_len <= 0:
            np.testing.assert_array_equal(a, 0)
            return
        np.testing.assert_array_equal(
            a, np.arange(segs) * seg_len + seg_len // 2
        )
        assert a[-1] <= nf - 1

    @given(
        start=st.integers(1, 5000),
        length=st.integers(1, 400),
        segs=st.integers(1, 25),
        win=st.integers(1, 10),
        seed=st.integers(0, 2**31 - 1),
        mode=st.sampled_from(["train", "val"]),
    )
    @settings(**COMMON)
    def test_sync_flow_is_halved_visual(self, start, length, segs, win, seed, mode):
        """sync sampling copies modality-0 indices, Flow //2 (dataset.py:
        160-163). Property over arbitrary records."""
        record = EpicRecord(
            uid=0, video_id="P01_01", start_timestamp="0", stop_timestamp="0",
            csv_start_frame=start, csv_stop_frame=start + length,
        )
        rng = np.random.default_rng(seed)
        idx = sample_indices(
            record, ["RGB", "Flow", "Audio"], segs, flow_win_length=win,
            mode=mode, sampling="sync", rng=rng,
        )
        np.testing.assert_array_equal(idx["Flow"], idx["RGB"] // 2)
        np.testing.assert_array_equal(idx["Audio"], idx["RGB"])
        assert np.all(idx["RGB"] >= record.start_frame["RGB"])
        if record.num_frames["RGB"] > 0:
            assert np.all(idx["RGB"] <= record.end_frame["RGB"])

    @given(
        segs=st.integers(1, 25),
        win=st.integers(1, 12),
        base=st.integers(0, 10000),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(**COMMON)
    def test_flow_stack_consecutive_runs(self, segs, win, base, seed):
        """dataset.py:168-173: segment index i expands to i..i+win-1."""
        rng = np.random.default_rng(seed)
        seg_idx = base + np.sort(rng.integers(0, 1000, size=segs))
        out = flow_stack_indices(seg_idx, win, segs)
        assert out.shape == (segs * win,)
        runs = out.reshape(segs, win)
        np.testing.assert_array_equal(runs[:, 0], seg_idx)
        np.testing.assert_array_equal(
            runs, seg_idx[:, None] + np.arange(win)[None, :]
        )


class TestRecordProps:
    """reference core/dataset/epic_record.py:25-46 frame conventions."""

    @given(start=st.integers(1, 10**6), length=st.integers(1, 10**4))
    @settings(**COMMON)
    def test_frame_math(self, start, length):
        stop = start + length
        r = EpicRecord(
            uid=1, video_id="P01_01", start_timestamp="0", stop_timestamp="0",
            csv_start_frame=start, csv_stop_frame=stop,
        )
        assert r.start_frame["RGB"] == start - 1
        assert r.end_frame["RGB"] == stop - 2
        assert r.start_frame["Flow"] == (start - 1) // 2
        assert r.end_frame["Flow"] == (stop - 2) // 2
        assert r.num_frames["RGB"] == length - 1
        # flow frame count follows from the halved endpoints
        assert r.num_frames["Flow"] == (stop - 2) // 2 - (start - 1) // 2
        assert r.start_frame["Audio"] == r.start_frame["RGB"]
        assert r.label == -1  # no class columns -> fake test label


class TestExtractWindowProps:
    """reference core/dataset/dataset.py:439-451 (audio window cut)."""

    @given(
        wav_len=st.integers(0, 120_000),
        frame_idx=st.integers(0, 3000),
        fps=st.sampled_from([29.97, 30.0, 50.0, 59.94]),
        audio_length=st.sampled_from([0.5, 1.28, 2.1]),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(**COMMON)
    def test_window_shape_and_content(self, wav_len, frame_idx, fps,
                                      audio_length, seed):
        sr = 24000
        rng = np.random.default_rng(seed)
        wav = rng.standard_normal(wav_len).astype(np.float32)
        out = extract_window(wav, frame_idx, fps, audio_length, sr)

        min_len = int(audio_length * sr)
        assert out.shape == (min_len,) and out.dtype == np.float32

        padded = wav if wav_len >= min_len else np.pad(wav, (0, min_len - wav_len))
        start_sec = frame_idx / fps - audio_length / 2.0
        start = int(max(0.0, start_sec * sr))
        start = min(start, max(padded.shape[0] - min_len, 0))
        np.testing.assert_array_equal(out, padded[start : start + min_len])
        # window never reads past the sample and never starts negative
        assert 0 <= start and start + min_len <= padded.shape[0]


class TestPadBatchProps:
    @given(
        rows=st.integers(1, 40),
        total=st.integers(1, 48),
        cols=st.integers(1, 5),
    )
    @settings(**COMMON)
    def test_pad_semantics(self, rows, total, cols):
        batch = {"RGB": np.arange(rows * cols, dtype=np.float32).reshape(rows, cols)}
        targets = {"class": {"verb": np.arange(rows, dtype=np.int64)}}
        b, t = pad_batch(batch, targets, total)
        want_rows = max(rows, total)
        assert b["RGB"].shape == (want_rows, cols)
        assert t["class"]["verb"].shape == (want_rows,)
        np.testing.assert_array_equal(b["RGB"][:rows], batch["RGB"])
        if want_rows > rows:
            np.testing.assert_array_equal(
                b["RGB"][rows:], np.repeat(batch["RGB"][:1], want_rows - rows, 0)
            )
            np.testing.assert_array_equal(t["class"]["verb"][rows:], 0)


class TestCropProps:
    """reference core/dataset/transform.py:284-412 (TSN MultiScaleCrop)."""

    @given(
        image_w=st.integers(64, 512),
        image_h=st.integers(64, 512),
        crop_w=st.integers(16, 64),
        crop_h=st.integers(16, 64),
        more=st.booleans(),
    )
    @settings(**COMMON)
    def test_fixed_offsets_in_bounds(self, image_w, image_h, crop_w, crop_h, more):
        offsets = fixed_crop_offsets(image_w, image_h, crop_w, crop_h, more)
        assert len(offsets) == (13 if more else 5)
        for x, y in offsets:
            assert 0 <= x <= image_w - crop_w
            assert 0 <= y <= image_h - crop_h
            assert isinstance(x, int) and isinstance(y, int)

    @given(
        h=st.integers(64, 300),
        w=st.integers(64, 300),
        n=st.integers(1, 4),
        seed=st.integers(0, 2**31 - 1),
        fix=st.booleans(),
    )
    @settings(deadline=None, max_examples=40)
    def test_multi_scale_crop_shape(self, h, w, n, seed, fix):
        size = 64
        frames = np.random.default_rng(seed).integers(
            0, 255, size=(n, h, w, 3)
        ).astype(np.uint8)
        out = multi_scale_crop(
            frames, size, rng=np.random.default_rng(seed), fix_crop=fix
        )
        assert out.shape == (n, size, size, 3)
        assert np.isfinite(np.asarray(out, np.float32)).all()


class TestSTFTProps:
    """ops/spectrogram.py strided framing vs a literal per-frame loop
    (independent of the vectorized indexing), librosa conventions:
    center constant-padding by n_fft//2, padded periodic-hann window,
    rfft power, log(.+eps). Also pins the num_frames closed form."""

    @given(sig_len=st.integers(1, 3000), seed=st.integers(0, 2**31 - 1))
    @settings(deadline=None, max_examples=30)
    def test_np_mirror_matches_per_frame_loop(self, sig_len, seed):
        sr, n_fft, window_ms, hop_ms = 24000, 511, 10.0, 5.0
        hop = int(round(hop_ms * sr / 1e3))
        win_length = int(round(window_ms * sr / 1e3))
        rng = np.random.default_rng(seed)
        signal = rng.standard_normal(sig_len).astype(np.float32)

        got = log_power_stft_np(signal, sr, n_fft, window_ms, hop_ms)

        pad = n_fft // 2
        padded = np.pad(signal, (pad, pad))
        window = _padded_window(win_length, n_fft)
        frames = []
        start = 0
        while start + n_fft <= padded.shape[0]:
            frames.append(padded[start : start + n_fft])
            start += hop
        want = []
        for frame in frames:
            spec = np.fft.rfft(frame * window, n=n_fft)
            want.append(np.log((spec.real**2 + spec.imag**2).astype(np.float32) + 1e-6))
        want = np.stack(want).T  # (n_bins, T)

        assert got.shape == (n_fft // 2 + 1, len(frames))
        assert num_frames(sig_len, n_fft, hop) == len(frames)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


class TestMetricProps:
    """Metric accumulators (reference core/utils/metric.py:50-157) vs a
    naive per-sample python reimplementation: per-head top-k percentages,
    all_class product-of-correctness, confusion matrices, pad-row masking
    via true_bs, and the consumed-batch denominator."""

    ROWS, NV, NN = 6, 5, 7  # fixed shapes: one jit trace for the suite

    @given(
        data=st.data(),
        n_batches=st.integers(1, 3),
    )
    @settings(deadline=None, max_examples=25)
    def test_matches_naive_accounting(self, data, n_batches):
        import jax.numpy as jnp

        from attention_based_tbn_tpu.utils.metrics import Metric

        cfg = load_config(
            overrides=[
                "model.num_classes={verb: %d, noun: %d}" % (self.NV, self.NN),
                "val.topk=[1, 3]",
                "model.attention.enable=False",
            ]
        )
        metric = Metric(cfg, no_batches=n_batches)

        rng = np.random.default_rng(data.draw(st.integers(0, 2**31 - 1)))
        want_acc = {"verb": np.zeros(2), "noun": np.zeros(2),
                    "all_class": np.zeros(2)}
        want_conf = {"verb": np.zeros((self.NV, self.NV)),
                     "noun": np.zeros((self.NN, self.NN))}
        classes = {"verb": self.NV, "noun": self.NN}

        for _ in range(n_batches):
            true_bs = data.draw(st.integers(1, self.ROWS))
            preds = {k: rng.standard_normal((self.ROWS, n)).astype(np.float32)
                     for k, n in classes.items()}
            labels = {k: rng.integers(0, n, size=self.ROWS)
                      for k, n in classes.items()}
            metric.update(
                {k: jnp.asarray(v) for k, v in preds.items()},
                {"class": {k: jnp.asarray(v) for k, v in labels.items()}},
                {"verb": jnp.asarray(0.0), "noun": jnp.asarray(0.0),
                 "all_class": jnp.asarray(0.0), "total": jnp.asarray(0.0)},
                batch_size=true_bs,
            )

            within = {}
            for key, n in classes.items():
                order = np.argsort(-preds[key], axis=1)
                ranks = np.argmax(order == labels[key][:, None], axis=1)
                within[key] = ranks[:, None] < np.asarray([1, 3])[None, :]
                for row in range(true_bs):
                    want_conf[key][labels[key][row], order[row, 0]] += 1
            for ki in range(2):
                for key in classes:
                    want_acc[key][ki] += (
                        within[key][:true_bs, ki].sum() * 100.0 / true_bs
                    )
                want_acc["all_class"][ki] += (
                    (within["verb"][:true_bs, ki] & within["noun"][:true_bs, ki])
                    .sum() * 100.0 / true_bs
                )

        _, acc, conf = metric.compute()
        for key in ("verb", "noun", "all_class"):
            np.testing.assert_allclose(
                acc[key], np.round(want_acc[key] / n_batches, 2), atol=0.011,
                err_msg=key,
            )
        for key in ("verb", "noun"):
            np.testing.assert_array_equal(conf[key], want_conf[key])


class TestPriorProps:
    """data/priors.py vs reference dataset.py:534-575 / attention.py:121-124."""

    @given(length=st.floats(0.1, 10.0))
    @settings(**COMMON)
    def test_window_size_formula(self, length):
        from attention_based_tbn_tpu.data.priors import attention_window_size

        assert attention_window_size(length) == round(length * 25 / 4)

    @given(win=st.integers(1, 31))
    @settings(**COMMON)
    def test_gaussian_uniform_normalized(self, win):
        from attention_based_tbn_tpu.data.priors import (
            gaussian_prior,
            uniform_prior,
        )

        for prior in (gaussian_prior(win), uniform_prior(win)):
            assert prior.shape == (win, 1) and prior.dtype == np.float32
            # sigma-1 float32 tails underflow to exact 0 past ~13 taps
            assert (prior >= 0).all()
            np.testing.assert_allclose(prior.sum(), 1.0, rtol=1e-5)

    @given(
        win=st.integers(5, 16),
        t_blocks=st.integers(1, 6),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(**COMMON)
    def test_loud_prior_structure(self, win, t_blocks, seed):
        from attention_based_tbn_tpu.data.priors import (
            gaussian_prior,
            loud_prior,
        )

        rng = np.random.default_rng(seed)
        spec = rng.standard_normal((16, t_blocks * win)).astype(np.float32)
        out = loud_prior(spec, win)
        assert out.shape == (win, 1) and out.dtype == np.float32
        assert (out >= 0).all()

        gauss = gaussian_prior(win)
        loudness = [
            spec[:, i : i + win].max() for i in range(0, spec.shape[1], win)
        ]
        loudest = int(np.argsort(loudness)[-1])
        center = win // 2
        if loudest > win or (center - 2 <= loudest <= center + 2):
            # gate closed: prior stays the centred gaussian
            np.testing.assert_allclose(out, gauss, rtol=1e-6)
        elif loudest < win:
            # rolled: the gaussian peak survives (flattening keeps the
            # +/-4 window around it) and lands at the loudest block index
            # — cv2's EVEN kernels carry a double peak at (center-1,
            # center), and a wrap-around roll can place either tap first.
            assert np.max(out) == np.max(gauss)
            assert out.argmax() in {(loudest - 1) % win, loudest % win}
        # loudest == win: documented reference quirk (the roll pushes the
        # peak off the end before flattening) — shape/dtype claims only

    @pytest.mark.parametrize("ksize", [3, 5, 7, 9, 13, 25])
    def test_gaussian_matches_cv2(self, ksize):
        cv2 = pytest.importorskip("cv2")

        from attention_based_tbn_tpu.data.priors import gaussian_kernel

        want = np.asarray(cv2.getGaussianKernel(ksize, 1.0))
        np.testing.assert_allclose(gaussian_kernel(ksize, 1.0), want, rtol=1e-12)
