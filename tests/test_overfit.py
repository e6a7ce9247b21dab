"""Learning sanity: the full SPMD training stack must overfit a tiny set.

Validates optimizer wiring, BN statistics, partial-BN freezing, the LR
schedule plumbing and loss gradients end-to-end — a distribution-level
correctness check the per-op parity tests can't provide.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from attention_based_tbn_tpu.config import load_config
from attention_based_tbn_tpu.models.tbn import TBNModel, TBNSpec
from attention_based_tbn_tpu.parallel.optim import build_optimizer
from attention_based_tbn_tpu.parallel.train_step import (
    create_train_state,
    make_eval_step,
    make_train_step,
)


@pytest.mark.slow
def test_overfits_tiny_dataset():
    cfg = load_config(
        overrides=[
            "model.attention.enable=False",
            "model.num_classes={verb: 4, noun: 4}",
            "model.pretrained=False",
            "train.optim.lr=0.02",
            "train.scheduler.lr_steps=[]",
        ]
    )
    modality = ["RGB"]
    spec = TBNSpec.from_config(cfg, modality)
    model = TBNModel(spec)

    rng = np.random.default_rng(0)
    b, n, hw = 8, 2, 64
    # distinct per-class image statistics so the task is learnable
    labels_v = np.arange(b) % 4
    labels_n = (np.arange(b) + 1) % 4
    images = np.zeros((b, n, hw, hw, 3), np.uint8)
    for i in range(b):
        images[i] = (labels_v[i] * 60 + 20) + rng.integers(
            0, 20, (n, hw, hw, 3)
        ).astype(np.uint8)
        images[i, :, : hw // 2] = (labels_n[i] * 60 + 10) + rng.integers(
            0, 20, (n, hw // 2, hw, 3)
        ).astype(np.uint8)

    batch = {"RGB": jnp.asarray(images)}
    targets = {
        "class": {
            "verb": jnp.asarray(labels_v, jnp.int32),
            "noun": jnp.asarray(labels_n, jnp.int32),
        }
    }

    params = jax.jit(lambda r, b_: model.init(r, b_, train=False))(
        {
            "params": jax.random.key(0),
            "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2),
            "audio_dropout": jax.random.key(3),
        },
        batch,
    )["params"]
    tx, _ = build_optimizer(cfg, params, modality)
    state = create_train_state(model, batch, tx, jax.random.key(0))
    step = make_train_step(model, tx, cfg)
    eval_step = make_eval_step(model, cfg)

    first_loss = None
    for i in range(60):
        state, loss, _ = step(
            state, batch, targets, jax.random.key(42), jnp.asarray(0),
            jnp.asarray(b, jnp.int32),
        )
        if first_loss is None:
            first_loss = float(loss["total"])
    final_loss = float(loss["total"])

    assert final_loss < first_loss * 0.5, (first_loss, final_loss)

    _, preds = eval_step(
        state, batch, targets, jnp.asarray(0), jnp.asarray(b, jnp.int32)
    )
    verb_acc = (np.asarray(preds["verb"]).argmax(-1) == labels_v).mean()
    assert verb_acc >= 0.75, verb_acc
