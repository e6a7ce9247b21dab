"""End-to-end eval-pipeline differential vs the reference's verbatim
``Video_Dataset`` (core/dataset/dataset.py + transform.py, imported from
/root/reference with librosa/torchvision stubbed — both unused on the
RGB/Flow eval path).

The composed host pipeline — annotation row -> EpicVideoRecord -> center
TSN offsets (incl. the Flow window recentering) -> cv2 JPEG decode ->
Rescale(shorter side) -> CenterCrop -> stack -> normalize — is run through
BOTH frameworks on the same synthetic fixture and compared bitwise: our
uint8 crops, pushed through the same /255-then-(x-mean)/std arithmetic the
model applies on device (models/tbn.py input pipeline), must equal the
reference's host-normalized tensors exactly, and sampling indices / labels
/ uids must agree.

This composes what the unit suites pin piecewise (test_sampling,
test_transforms, test_records_differential) into one whole-path check for
val AND test mode, sync sampling, RGB+Flow.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

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


# ---------------------------------------------------------------------------
# Reference import machinery (librosa/torchvision absent here; both are
# module-level imports that the RGB/Flow eval path never calls)
# ---------------------------------------------------------------------------


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


def _load_reference_dataset_pkg():
    if "refdset.dataset" in sys.modules:
        return sys.modules["refdset.dataset"], sys.modules["refdset.transform"]

    _stub("librosa")
    tvf = _stub("torchvision.transforms.functional")
    tvt = _stub("torchvision.transforms", functional=tvf)
    _stub("torchvision", transforms=tvt)

    pkg = types.ModuleType("refdset")
    pkg.__path__ = [os.path.join(REFERENCE, "core", "dataset")]
    sys.modules["refdset"] = pkg
    for name in ("video_record", "epic_record", "dataset_class", "epic_class",
                 "transform", "dataset"):
        path = os.path.join(REFERENCE, "core", "dataset", f"{name}.py")
        spec = importlib.util.spec_from_file_location(f"refdset.{name}", path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refdset.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["refdset.dataset"], sys.modules["refdset.transform"]


class _Compose:
    """torchvision.transforms.Compose's trivial chain (stubbed dependency)."""

    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


def _reference_eval_transforms(T, cfg):
    """The eval branches of reference create_dataloader.get_transforms:19-81
    (Rescale + CenterCrop + Stack + ToTensor + Normalize; FixedCrop is
    commented out there)."""
    return {
        "RGB": _Compose([
            T.Rescale(cfg.data.test_scale_size),
            T.CenterCrop(cfg.data.test_crop_size),
            T.Stack("RGB"),
            T.ToTensor(),
            T.Normalize(list(cfg.data.rgb.mean), list(cfg.data.rgb.std)),
        ]),
        "Flow": _Compose([
            T.Rescale(cfg.data.test_scale_size),
            T.CenterCrop(cfg.data.test_crop_size),
            T.Stack("Flow"),
            T.ToTensor(),
            T.Normalize(list(cfg.data.flow.mean), list(cfg.data.flow.std)),
        ]),
    }


# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("epic_fixture")
    generate(str(root), videos=["P01_01", "P01_02"], frames_per_video=120)
    return str(root)


def _our_cfg(fixture_root, mode_key, n_seg):
    return load_config(
        overrides=[
            f"data_dir={fixture_root}",
            "data.audio.enable=False",
            "model.attention.enable=False",
            "data.sampling=sync",
            f"{mode_key}.num_segments={n_seg}",
            "tpu.native_io=False",  # pin the cv2 decode path: bitwise vs ref
        ]
    )


def _normalize_like_device(crops_u8, mean, std):
    """(N, H, W, C) uint8 -> reference-normalized (N, C, H, W) float32 —
    the exact arithmetic models/tbn.py applies on device (/255, -mean, /std,
    fp32), restated in numpy for the comparison."""
    x = crops_u8.astype(np.float32) / np.float32(255.0)
    mean = np.asarray(mean, np.float32).reshape(1, 1, 1, -1)
    std = np.asarray(std, np.float32).reshape(1, 1, 1, -1)
    c = crops_u8.shape[-1]
    reps = c // mean.shape[-1]
    x = (x - np.tile(mean, (1, 1, 1, reps))) / np.tile(std, (1, 1, 1, reps))
    return np.transpose(x, (0, 3, 1, 2))


@pytest.mark.parametrize("mode,n_seg", [("val", 3), ("test", 5)])
def test_eval_pipeline_matches_reference_bitwise(fixture_root, mode, n_seg):
    ref_dataset_mod, T = _load_reference_dataset_pkg()

    mode_key = {"val": "val", "test": "test"}[mode]
    cfg = _our_cfg(fixture_root, mode_key, n_seg)
    modality = ["RGB", "Flow"]
    annotation = "annotations/epic_train_val.csv"
    vid_list = ["P01_01", "P01_02"]

    ours = VideoDataset(cfg, vid_list, annotation, modality, mode=mode)
    ref = ref_dataset_mod.Video_Dataset(
        cfg,
        vid_list,
        annotation,
        modality,
        transform=_reference_eval_transforms(T, cfg),
        mode=mode,
    )
    assert len(ours) == len(ref) > 0

    for index in range(len(ours)):
        ref_data, ref_target, ref_uid = ref[index]
        sample = ours.sample(index)

        assert sample["uid"] == ref_uid
        assert sample["vid_id"] == ref_data["vid_id"]
        assert sample["start_time"] == ref_data["start_time"]
        assert sample["stop_time"] == ref_data["stop_time"]
        for m in modality:
            np.testing.assert_array_equal(
                sample["indices"][m], ref_data["indices"][m], err_msg=f"{m} idx"
            )
        assert sample["labels"] == dict(ref_target["class"])

        ours_rgb = _normalize_like_device(
            sample["RGB"], cfg.data.rgb.mean, cfg.data.rgb.std
        )
        np.testing.assert_array_equal(
            ours_rgb, ref_data["RGB"].numpy(), err_msg="RGB pixels"
        )
        ours_flow = _normalize_like_device(
            sample["Flow"], cfg.data.flow.mean, cfg.data.flow.std
        )
        np.testing.assert_array_equal(
            ours_flow, ref_data["Flow"].numpy(), err_msg="Flow pixels"
        )


@pytest.mark.parametrize("prior_type", ["gaussian", "uniform", "loud"])
@pytest.mark.parametrize("audio_length", [1.279, 2.1, 4.0])
def test_attention_priors_match_reference_verbatim(prior_type, audio_length):
    """data/priors.py vs the reference's verbatim _get_attn_weights
    (dataset.py:534-575), incl. the loud-roll re-centering quirk, over
    random spectrograms and the shipped audio lengths."""
    import types as _types

    from attention_based_tbn_tpu.data.priors import (
        attention_prior,
        attention_window_size,
    )

    ref_dataset_mod, _ = _load_reference_dataset_pkg()
    ref_ds = object.__new__(ref_dataset_mod.Video_Dataset)
    ref_ds.audio_length = audio_length
    ref_ds.cfg = _types.SimpleNamespace(
        model=_types.SimpleNamespace(
            attention=_types.SimpleNamespace(prior_type=prior_type)
        )
    )

    win = attention_window_size(audio_length)
    rng = np.random.default_rng(hash((prior_type, audio_length)) % 2**31)
    for _ in range(8):
        spec = rng.standard_normal((256, rng.integers(win, 8 * win))).astype(
            np.float32
        )
        ref_wts = ref_ds._get_attn_weights(spec, None, None).numpy()
        ours = attention_prior(prior_type, win, spec)
        np.testing.assert_array_equal(
            np.asarray(ours, np.float32).reshape(ref_wts.shape), ref_wts
        )


def test_flow_pickle_artifacts_interchange_with_reference(fixture_root):
    """Artifact compatibility: .npz flow stacks written by OUR preprocessing
    CLI (preprocessing/create_flow_pickle.py) are read by the REFERENCE's
    verbatim pickle branch (dataset.py:336-352) and by ours, bitwise-equal
    end-to-end — a reference user can reuse caches produced by either
    framework's tooling (reference preprocessing/create_epic_flow_pickle.py
    writes the same frame_%010d.npz / key "flow" format)."""
    from attention_based_tbn_tpu.preprocessing.create_flow_pickle import main

    pickle_dir = os.path.join(fixture_root, "flow_pickle")
    if not os.path.isdir(pickle_dir):
        main([
            "--in_dir", os.path.join(fixture_root, "links"),
            "--out_dir", pickle_dir,
            "--win_length", "5",
        ])

    ref_dataset_mod, T = _load_reference_dataset_pkg()
    cfg = load_config(
        overrides=[
            f"data_dir={fixture_root}",
            "data.audio.enable=False",
            "model.attention.enable=False",
            "data.sampling=sync",
            "val.num_segments=3",
            "data.flow.dir_prefix=flow_pickle",
            "data.flow.read_flow_pickle=True",
            "tpu.native_io=False",
        ]
    )
    modality = ["RGB", "Flow"]
    annotation = "annotations/epic_train_val.csv"
    vid_list = ["P01_01", "P01_02"]

    ours = VideoDataset(cfg, vid_list, annotation, modality, mode="val")
    ref = ref_dataset_mod.Video_Dataset(
        cfg, vid_list, annotation, modality,
        transform=_reference_eval_transforms(T, cfg), mode="val",
    )
    assert len(ours) == len(ref) > 0
    for index in range(len(ours)):
        ref_data, _, _ = ref[index]
        sample = ours.sample(index)
        ours_flow = _normalize_like_device(
            sample["Flow"], cfg.data.flow.mean, cfg.data.flow.std
        )
        np.testing.assert_array_equal(
            ours_flow, ref_data["Flow"].numpy(), err_msg="Flow pickle pixels"
        )
