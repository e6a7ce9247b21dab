import os

import pytest

from attention_based_tbn_tpu.config import load_config, make_run_dir


def test_defaults_compose():
    cfg = load_config()
    # Full reference key surface must be present with matching defaults
    # (reference config/{config,data/tbn_data,model/tbn_model,...}.yaml).
    assert cfg.data.dataset == "epic"
    assert cfg.data.sampling == "sync"
    assert cfg.data.rgb.enable is True
    assert cfg.data.rgb.mean == [0.408, 0.459, 0.502]
    assert cfg.data.flow.win_length == 5
    assert cfg.data.audio.sampling_rate == 24000
    assert cfg.data.audio.audio_length == 2.1
    assert cfg.data.audio.spec_type == "stft"
    assert cfg.model.arch == "bninception"
    assert cfg.model.attention.enable is True
    assert cfg.model.attention.type == "mha"
    assert cfg.model.attention.attn_heads == 4
    assert cfg.model.attention.decay_step == 10
    assert cfg.model.num_classes == {"verb": 125, "noun": 352}
    assert cfg.model.freeze_mode == "partialbn"
    assert cfg.train.batch_size == 12
    assert cfg.train.epochs == 30
    assert cfg.train.optim.lr == pytest.approx(1e-2)
    assert cfg.train.optim.accumulator_step == 1
    assert cfg.train.scheduler.lr_steps == [20]
    assert cfg.train.clip_grad == 20
    assert cfg.train.num_segments == 3
    assert cfg.val.num_segments == 25
    assert cfg.val.topk == [1, 5]
    assert cfg.test.num_segments == 25
    assert len(cfg.test.annotation_file) == 2
    assert cfg.num_workers == 8
    assert cfg.gpu_ids == []


def test_dot_overrides():
    cfg = load_config(
        overrides=[
            "model.attention.type=proto",
            "model.attention.use_entropy=True",
            "train.optim.lr=1e-3",
            "train.scheduler.lr_steps=[10, 20]",
            "data.audio.audio_length=4.0",
            "data.flow.enable=False",
            "exp_name=unit_test",
            "model.num_classes={verb: 125, noun: 352, action: 2513}",
        ]
    )
    assert cfg.model.attention.type == "proto"
    assert cfg.model.attention.use_entropy is True
    assert cfg.train.optim.lr == pytest.approx(1e-3)
    assert cfg.train.scheduler.lr_steps == [10, 20]
    assert cfg.data.audio.audio_length == pytest.approx(4.0)
    assert cfg.data.flow.enable is False
    assert cfg.exp_name == "unit_test"
    assert cfg.model.num_classes["action"] == 2513


def test_custom_group_file(tmp_path):
    group_dir = tmp_path / "train"
    group_dir.mkdir()
    (group_dir / "fast.yaml").write_text("train:\n  batch_size: 2\n  epochs: 1\n")
    cfg = load_config(overrides=["train=fast"], config_dir=str(tmp_path))
    assert cfg.train.batch_size == 2
    assert cfg.train.epochs == 1
    # untouched groups keep their defaults
    assert cfg.val.batch_size == 2
    assert cfg.model.arch == "bninception"


def test_pretty_roundtrip():
    cfg = load_config()
    text = cfg.pretty()
    assert "bninception" in text
    assert "num_classes" in text


def test_run_dir(tmp_path):
    import datetime

    cfg = load_config(overrides=[f"out_dir={tmp_path}", "exp_name=exp/sub"])
    run_dir = make_run_dir(cfg, now=datetime.datetime(2026, 1, 2, 3, 4, 5))
    assert os.path.isdir(run_dir)
    assert run_dir.endswith("run_bninception_epic_2026-01-02_03-04-05")
    assert f"{tmp_path}/log/exp/sub" in run_dir


def test_unknown_override_creates_path():
    cfg = load_config(overrides=["extra.flag=3"])
    assert cfg.extra.flag == 3
