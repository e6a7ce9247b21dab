"""Model builder: validation and pretrained-weight loading paths."""

import numpy as np
import pytest
import torch

from attention_based_tbn_tpu.config import load_config
from attention_based_tbn_tpu.models.builder import build_model, load_pretrained_towers


def test_build_validates_arch():
    cfg = load_config(overrides=["model.arch=alexnet"])
    with pytest.raises(AssertionError):
        build_model(cfg, ["RGB"])


def test_build_validates_loss():
    cfg = load_config(overrides=["model.loss_fn=hinge"])
    with pytest.raises(AssertionError):
        build_model(cfg, ["RGB"])


def test_load_pretrained_npz(tmp_path):
    from tests.test_convert import synth_bninception_state_dict
    from attention_based_tbn_tpu.models.convert import convert_bninception
    from attention_based_tbn_tpu.models.convert_cli import save_npz

    t_params, t_stats = convert_bninception(synth_bninception_state_dict())
    save_npz(str(tmp_path / "imagenet_bninception_rgb.npz"), t_params, t_stats)

    cfg = load_config(overrides=[f"model.weights_dir={tmp_path}"])
    params = {"Base_RGB": {}, "Base_Audio": {}, "classifier": {"verb": {"kernel": np.ones(1)}}}
    stats = {}
    params, stats = load_pretrained_towers(cfg, ["RGB", "Audio"], params, stats)

    np.testing.assert_allclose(
        params["Base_RGB"]["conv1_7x7_s2"]["conv"]["kernel"],
        t_params["conv1_7x7_s2"]["conv"]["kernel"],
    )
    # audio conv1 channel-meaned to 1 input channel
    assert params["Base_Audio"]["conv1_7x7_s2"]["conv"]["kernel"].shape == (7, 7, 1, 64)
    assert "Base_RGB" in stats


def test_load_pretrained_pth(tmp_path):
    from tests.test_convert import synth_bninception_state_dict

    torch.save(
        synth_bninception_state_dict(),
        tmp_path / "imagenet_bninception_rgb.pth",
    )
    cfg = load_config(overrides=[f"model.weights_dir={tmp_path}"])
    params, stats = load_pretrained_towers(cfg, ["RGB"], {"Base_RGB": {}}, {})
    assert params["Base_RGB"]["conv1_7x7_s2"]["conv"]["kernel"].shape == (7, 7, 3, 64)


def test_missing_weights_keeps_init(tmp_path):
    cfg = load_config(overrides=[f"model.weights_dir={tmp_path}"])
    sentinel = {"Base_RGB": {"x": np.ones(2)}}
    params, stats = load_pretrained_towers(cfg, ["RGB"], dict(sentinel), {})
    np.testing.assert_array_equal(params["Base_RGB"]["x"], sentinel["Base_RGB"]["x"])
