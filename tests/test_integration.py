"""Full-pipeline integration: synthetic dataset -> run_trainer (SPMD on the
8-device CPU mesh) -> checkpoint -> run_tester -> challenge JSON."""

import json
import logging
import os

import numpy as np
import pytest

from attention_based_tbn_tpu.config import load_config
from attention_based_tbn_tpu.data import synthetic


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("epic_e2e")
    videos = synthetic.generate(
        str(root),
        videos=["P01_01", "P02_03"],
        frames_per_video=90,
        num_verbs=11,
        num_nouns=13,
    )
    return str(root), videos


def make_cfg(root, **over):
    base = {
        "data_dir": root,
        "out_dir": root,
        "exp_name": "e2e",
        "num_workers": 2,
        "data.flow.enable": False,
        "data.audio.audio_length": 1.279,
        "data.train_scale_size": 80,
        "data.train_crop_size": 64,
        "data.test_scale_size": 80,
        "data.test_crop_size": 64,
        "model.attention.enable": False,
        "model.pretrained": False,
        "model.num_classes": "{verb: 11, noun: 13}",
        "train.vid_list": os.path.join(root, "train_split.txt"),
        "train.batch_size": 4,
        "train.epochs": 1,
        "train.num_segments": 2,
        "val.vid_list": os.path.join(root, "train_split.txt"),
        "val.batch_size": 4,
        "val.num_segments": 3,
        "test.batch_size": 4,
        "test.num_segments": 3,
    }
    base.update(over)
    return load_config(overrides=[f"{k}={v}" for k, v in base.items()])


@pytest.mark.slow
def test_train_checkpoint_test_roundtrip(fixture_root):
    root, videos = fixture_root
    cfg = make_cfg(root)

    logger = logging.getLogger("e2e")
    logger.setLevel(logging.INFO)

    from attention_based_tbn_tpu.tools.train import run_trainer

    state = run_trainer(cfg, logger, ["RGB", "Audio"], writer=None)

    ckpt = os.path.join(
        root, "tbn_weights", "e2e", "epic_tbn_bninception_RGB_Audio"
    )
    assert os.path.isdir(ckpt)
    assert os.path.exists(ckpt + ".history.json")
    with open(ckpt + ".history.json") as fh:
        hist = json.load(fh)
    assert hist["epoch"] == 0
    assert len(hist["train_loss"]) == 1
    assert np.isfinite(hist["train_loss"][0]["total"])

    # --- test phase with the saved checkpoint + challenge JSON
    cfg_test = make_cfg(
        root,
        **{
            "test.enable": True,
            "test.annotation_file": "['annotations/epic_train_val.csv']",
            "test.vid_list": os.path.join(root, "train_split.txt"),
            "test.save_results": True,
            "test.results_file": "['e2e.json']",
            "test.pre_trained": ckpt,
        },
    )
    from attention_based_tbn_tpu.tools.test import run_tester

    results = run_tester(cfg_test, logger, ["RGB", "Audio"])
    assert results[0] is not None  # labeled -> metrics computed
    loss, acc, conf = results[0]
    assert np.isfinite(loss["total"])
    assert "verb" in acc

    out_file = os.path.join(root, "inferences", "e2e.json")
    assert os.path.exists(out_file)
    with open(out_file) as fh:
        payload = json.load(fh)
    assert payload["challenge"] == "action_recognition"
    assert len(payload["results"]) == 6
    sample = next(iter(payload["results"].values()))
    assert set(sample.keys()) == {"verb", "noun"}
    assert len(sample["verb"]) == 11


@pytest.mark.slow
def test_resume_extends_epochs(fixture_root):
    root, videos = fixture_root
    cfg = make_cfg(root, **{"exp_name": "resume", "val.enable": False})

    logger = logging.getLogger("e2e_resume")
    from attention_based_tbn_tpu.tools.train import run_trainer

    run_trainer(cfg, logger, ["RGB"], writer=None)
    ckpt = os.path.join(root, "tbn_weights", "resume", "epic_tbn_bninception_RGB")

    cfg2 = make_cfg(
        root,
        **{
            "exp_name": "resume",
            "val.enable": False,
            "train.pre_trained": ckpt,
            "train.epochs": 1,
        },
    )
    run_trainer(cfg2, logger, ["RGB"], writer=None)
    with open(ckpt + ".history.json") as fh:
        hist = json.load(fh)
    assert hist["epoch"] == 1  # resumed from 0, trained one more
    assert len(hist["train_loss"]) == 2
