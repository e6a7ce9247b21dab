"""Metric accounting tests (reference core/utils/metric.py semantics)."""

import numpy as np

import jax.numpy as jnp

from attention_based_tbn_tpu.config import load_config
from attention_based_tbn_tpu.utils.metrics import Metric, topk_correct


def make_cfg():
    return load_config(
        overrides=[
            "model.num_classes={verb: 4, noun: 3}",
            "val.topk=[1, 2]",
            "model.attention.enable=False",
        ]
    )


def test_topk_correct():
    logits = jnp.asarray(
        [[0.1, 0.9, 0.0, 0.0], [0.8, 0.1, 0.05, 0.05], [0.0, 0.0, 0.3, 0.7]]
    )
    labels = jnp.asarray([1, 2, 2])
    corr, top1 = topk_correct(logits, labels, maxk=2)
    corr = np.asarray(corr)
    # sample 0: label 1 is top-1; sample 1: label 2 not in top-2? top2 = [0, 1]
    assert corr[0, 0] and not corr[0, 1]
    assert not corr[:, 1].any()
    # sample 2: label 2 is rank 2
    assert not corr[0, 2] and corr[1, 2]
    np.testing.assert_array_equal(np.asarray(top1), [1, 0, 3])


def test_accuracy_and_confusion():
    cfg = make_cfg()
    metric = Metric(cfg, no_batches=1)
    preds = {
        "verb": jnp.asarray([[0.9, 0.0, 0.0, 0.1], [0.0, 0.9, 0.1, 0.0]]),
        "noun": jnp.asarray([[0.9, 0.1, 0.0], [0.1, 0.0, 0.9]]),
    }
    targets = {"class": {"verb": jnp.asarray([0, 1]), "noun": jnp.asarray([1, 2])}}
    loss = {
        "verb": jnp.asarray(1.0),
        "noun": jnp.asarray(2.0),
        "all_class": jnp.asarray(3.0),
        "total": jnp.asarray(3.0),
    }
    metric.update(preds, targets, loss)
    loss_out, acc, conf = metric.compute()

    assert acc["verb"] == [100.0, 100.0]
    assert acc["noun"] == [50.0, 100.0]  # noun sample 0: label 1, pred 0 -> top2 hits
    assert acc["all_class"] == [50.0, 100.0]
    assert loss_out["total"] == 3.0
    assert conf["verb"][0, 0] == 1 and conf["verb"][1, 1] == 1
    assert conf["noun"][1, 0] == 1 and conf["noun"][2, 2] == 1


def test_batch_averaging():
    cfg = make_cfg()
    metric = Metric(cfg, no_batches=2)
    preds = {
        "verb": jnp.asarray([[1.0, 0, 0, 0]]),
        "noun": jnp.asarray([[1.0, 0, 0]]),
    }
    t_hit = {"class": {"verb": jnp.asarray([0]), "noun": jnp.asarray([0])}}
    t_miss = {"class": {"verb": jnp.asarray([1]), "noun": jnp.asarray([1])}}
    loss = {k: jnp.asarray(1.0) for k in ("verb", "noun", "all_class", "total")}
    metric.update(preds, t_hit, loss)
    metric.update(preds, t_miss, loss)
    _, acc, _ = metric.compute()
    assert acc["verb"][0] == 50.0  # (100 + 0) / 2 batches
