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


def _synth_resnet_sd(depth):
    """Synthetic torchvision-style resnet state dict shaped by our model."""
    import jax
    import jax.numpy as jnp

    from attention_based_tbn_tpu.models.resnet import ResNet
    from tests.test_convert import TestResNetConvert, tree_shapes

    model = ResNet(depth=depth)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    sd = {}
    for path, shape in tree_shapes(variables["params"]).items():
        name = TestResNetConvert._torch_name(path)
        if path[-1] == "kernel":
            h, w, i, o = shape
            sd[name] = torch.randn(o, i, h, w)
        else:
            sd[name] = torch.randn(*shape)
    for path, shape in tree_shapes(variables["batch_stats"]).items():
        sd[TestResNetConvert._torch_name(path)] = torch.randn(*shape)
    return sd


def _synth_vgg16_sd():
    import jax
    import jax.numpy as jnp

    from attention_based_tbn_tpu.models.vgg import VGG
    from tests.test_convert import tree_shapes

    model = VGG(vgg_type="16")
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    expect_p = tree_shapes(variables["params"])
    feat_indices = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    sd = {}
    for conv_i, feat_i in enumerate(feat_indices):
        h, w, i, o = expect_p[(f"conv{conv_i}", "kernel")]
        sd[f"features.{feat_i}.weight"] = torch.randn(o, i, h, w)
        sd[f"features.{feat_i}.bias"] = torch.randn(o)
    sd["classifier.0.weight"] = torch.randn(4096, 25088)
    sd["classifier.0.bias"] = torch.randn(4096)
    sd["classifier.3.weight"] = torch.randn(4096, 4096)
    sd["classifier.3.bias"] = torch.randn(4096)
    sd["classifier.6.weight"] = torch.randn(1000, 4096)
    sd["classifier.6.bias"] = torch.randn(1000)
    return sd


def test_load_pretrained_resnet_all_modalities(tmp_path):
    """Converted torchvision resnet weights load into all three towers with
    first-conv channel-mean-tile adaptation for Flow/Audio (reference
    resnet.py:26-36; the tile makes Flow actually usable)."""
    sd = _synth_resnet_sd(50)
    torch.save(sd, tmp_path / "resnet50.pth")

    cfg = load_config(
        overrides=[f"model.weights_dir={tmp_path}", "model.arch=resnet",
                   "model.resnet.depth=50", "model.attention.enable=False"]
    )
    params = {f"Base_{m}": {} for m in ("RGB", "Flow", "Audio")}
    params, stats = load_pretrained_towers(
        cfg, ["RGB", "Flow", "Audio"], params, {}
    )

    assert params["Base_RGB"]["conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert params["Base_Flow"]["conv1"]["kernel"].shape == (7, 7, 10, 64)
    assert params["Base_Audio"]["conv1"]["kernel"].shape == (7, 7, 1, 64)
    # tiled mean: every input channel carries the RGB channel-mean
    mean = sd["conv1.weight"].numpy().mean(axis=1).transpose(1, 2, 0)
    np.testing.assert_allclose(
        params["Base_Flow"]["conv1"]["kernel"][:, :, 4, :], mean, rtol=1e-6
    )
    assert "Base_Flow" in stats and "layer1_0" in params["Base_RGB"]


def test_load_pretrained_vgg_all_modalities(tmp_path):
    sd = _synth_vgg16_sd()
    torch.save(sd, tmp_path / "vgg16.pth")

    cfg = load_config(
        overrides=[f"model.weights_dir={tmp_path}", "model.arch=vgg",
                   "model.vgg.type=16", "model.attention.enable=False"]
    )
    params = {f"Base_{m}": {} for m in ("RGB", "Flow", "Audio")}
    params, _ = load_pretrained_towers(cfg, ["RGB", "Flow", "Audio"], params, {})

    assert params["Base_RGB"]["conv0"]["kernel"].shape == (3, 3, 3, 64)
    assert params["Base_Flow"]["conv0"]["kernel"].shape == (3, 3, 10, 64)
    assert params["Base_Audio"]["conv0"]["kernel"].shape == (3, 3, 1, 64)
    assert params["Base_RGB"]["fc1"]["kernel"].shape == (25088, 4096)


def test_audio_alt_stem_skips_pretrained(tmp_path):
    """model.bninception.audio_stem=true: no pretrained counterpart exists
    for the (3,1)/(1,3) stem — the audio tower keeps random init."""
    from tests.test_convert import synth_bninception_state_dict

    torch.save(synth_bninception_state_dict(),
               tmp_path / "imagenet_bninception_rgb.pth")
    cfg = load_config(
        overrides=[f"model.weights_dir={tmp_path}",
                   "model.bninception.audio_stem=True"]
    )
    sentinel = {"untouched": np.ones(1)}
    params = {"Base_RGB": {}, "Base_Audio": sentinel}
    params, _ = load_pretrained_towers(cfg, ["RGB", "Audio"], params, {})
    assert "conv1_7x7_s2" in params["Base_RGB"]
    assert params["Base_Audio"] is sentinel


def test_spec_validates_pool_impl():
    """A typo'd tpu.pool_impl must raise, not silently select reduce_window
    (the A/B-mislabeling failure mode)."""
    import dataclasses

    from attention_based_tbn_tpu.models.tbn import TBNSpec

    cfg = load_config(overrides=["model.pretrained=False"])
    spec = TBNSpec.from_config(cfg, ["RGB"])
    spec.validate()  # default impl is valid
    bad = dataclasses.replace(spec, pool_impl="pallaspool")
    with pytest.raises(ValueError, match="pool_impl"):
        bad.validate()
