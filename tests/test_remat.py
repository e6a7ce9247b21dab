"""Rematerialization flag: gradients flow and match the non-remat path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from attention_based_tbn_tpu.config import load_config
from attention_based_tbn_tpu.models.losses import tbn_loss
from attention_based_tbn_tpu.models.tbn import TBNModel, TBNSpec


def _grads(remat: bool):
    cfg = load_config(
        overrides=[
            "model.attention.enable=False",
            "model.num_classes={verb: 3, noun: 3}",
            "model.pretrained=False",
            f"tpu.remat={'true' if remat else 'false'}",
        ]
    )
    spec = TBNSpec.from_config(cfg, ["RGB"])
    model = TBNModel(spec)
    rng = np.random.default_rng(0)
    batch = {"RGB": jnp.asarray(rng.integers(0, 255, (2, 2, 64, 64, 3)), jnp.uint8)}
    targets = {
        "class": {
            "verb": jnp.asarray([0, 1], jnp.int32),
            "noun": jnp.asarray([1, 2], jnp.int32),
        }
    }
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {
            "params": jax.random.key(0),
            "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2),
            "audio_dropout": jax.random.key(3),
        },
        batch,
    )

    def loss_fn(params):
        preds, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch,
            train=True,
            rngs={"dropout": jax.random.key(5), "audio_dropout": jax.random.key(6)},
            mutable=["batch_stats"],
        )
        return tbn_loss(preds, targets, cfg, train=True)["total"]

    return jax.jit(jax.grad(loss_fn))(variables["params"])


@pytest.mark.slow  # ~95 s: compiles the backward twice (remat on/off)
def test_remat_grads_match():
    g_plain = _grads(remat=False)
    g_remat = _grads(remat=True)
    leaf_a = np.asarray(
        g_plain["Base_RGB"]["conv1_7x7_s2"]["conv"]["kernel"]
    )
    leaf_b = np.asarray(
        g_remat["Base_RGB"]["conv1_7x7_s2"]["conv"]["kernel"]
    )
    assert np.abs(leaf_a).sum() > 0
    np.testing.assert_allclose(leaf_a, leaf_b, rtol=1e-4, atol=1e-5)
    head_a = np.asarray(g_plain["classifier"]["verb"]["kernel"])
    head_b = np.asarray(g_remat["classifier"]["verb"]["kernel"])
    np.testing.assert_allclose(head_a, head_b, rtol=1e-4, atol=1e-5)
