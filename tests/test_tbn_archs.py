"""TBN end-to-end with the ResNet and VGG tower families."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from attention_based_tbn_tpu.config import load_config
from attention_based_tbn_tpu.models.tbn import TBNModel, TBNSpec


def run_forward(cfg, modality, batch):
    spec = TBNSpec.from_config(cfg, modality)
    model = TBNModel(spec)
    rngs = {
        "params": jax.random.key(0),
        "dropout": jax.random.key(1),
        "gumbel": jax.random.key(2),
        "audio_dropout": jax.random.key(3),
    }
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(rngs, batch)
    return model.apply(variables, batch, train=False)


def test_resnet_tbn_multimodal():
    cfg = load_config(
        overrides=[
            "model.arch=resnet",
            "model.resnet.depth=18",
            "model.attention.enable=False",
            "model.num_classes={verb: 5, noun: 7}",
        ]
    )
    rng = np.random.default_rng(0)
    batch = {
        "RGB": jnp.asarray(rng.integers(0, 255, (2, 2, 64, 64, 3)), jnp.uint8),
        "Flow": jnp.asarray(rng.integers(0, 255, (2, 2, 64, 64, 10)), jnp.uint8),
    }
    out = run_forward(cfg, ["RGB", "Flow"], batch)
    assert out["verb"].shape == (2, 5)
    assert np.all(np.isfinite(np.asarray(out["verb"])))


def test_vgg_tbn_rgb():
    cfg = load_config(
        overrides=[
            "model.arch=vgg",
            "model.vgg.type=11",
            "model.attention.enable=False",
            "model.num_classes={verb: 5, noun: 7}",
        ]
    )
    rng = np.random.default_rng(1)
    batch = {
        "RGB": jnp.asarray(rng.integers(0, 255, (1, 2, 224, 224, 3)), jnp.uint8)
    }
    out = run_forward(cfg, ["RGB"], batch)
    assert out["verb"].shape == (1, 5)


def test_resnet_audio_attention_rejected():
    cfg = load_config(
        overrides=["model.arch=resnet", "model.attention.type=mha"]
    )
    spec = TBNSpec.from_config(cfg, ["RGB", "Audio"])
    with pytest.raises(ValueError):
        spec.validate()
