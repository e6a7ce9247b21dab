"""Evaluation metrics with the reference's accounting.

Matches reference core/utils/metric.py: per-head top-k accuracy, a combined
``all_class`` accuracy (a sample counts only when *every* head's top-k
contains the label), per-head confusion matrices, and running means of every
loss term; all per-batch percentages averaged over the number of batches.

Top-k correctness and confusion updates run on device (lax.top_k +
one-hot matmul); the host accumulates Python floats.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np


import functools


@functools.partial(jax.jit, static_argnames=("maxk",))
def topk_correct(logits: jnp.ndarray, labels: jnp.ndarray, maxk: int = 5):
    """(B, C) logits -> bool (maxk, B): row k true when pred k == label."""
    _, preds = jax.lax.top_k(logits, maxk)
    return (preds == labels[:, None]).T, preds[:, 0]


def confusion_update(conf: np.ndarray, labels: np.ndarray, top1: np.ndarray):
    np.add.at(conf, (labels, top1), 1.0)
    return conf


class Metric:
    def __init__(self, cfg, no_batches: int):
        self.cfg = cfg
        self.topk: List[int] = list(cfg.val.topk)
        self.maxk = max(self.topk)
        self.no_batches = max(no_batches, 1)
        # Batches actually consumed. The reference divides by a *precomputed*
        # batch count (train.py:61 rounds, train.py:142 floors), which
        # inflates or deflates every averaged metric whenever the dataset
        # size doesn't divide the batch size (a floor of 1 with 2 consumed
        # batches reports 200% top-k). Divergence: compute() prefers the
        # consumed count when updates happened.
        self.updates = 0
        self.num_classes: Dict[str, int] = dict(cfg.model.num_classes)
        self.multi_class = len(self.num_classes) > 1

        self.accuracy: Dict[str, List[float]] = {
            key: [0.0] * len(self.topk) for key in self.num_classes
        }
        self.conf_mat: Dict[str, np.ndarray] = {
            key: np.zeros((n, n), dtype=np.float64)
            for key, n in self.num_classes.items()
        }
        self.loss: Dict[str, float] = {key: 0.0 for key in self.num_classes}
        if self.multi_class:
            self.loss["all_class"] = 0.0
            self.accuracy["all_class"] = [0.0] * len(self.topk)

        att = cfg.model.attention
        if att.enable and not att.use_fixed:
            if att.use_prior:
                self.loss["prior"] = 0.0
            if att.use_contrast:
                self.loss["contrast"] = 0.0
            if att.use_entropy:
                self.loss["entropy"] = 0.0
        self.loss["total"] = 0.0

    def update(
        self,
        preds: Mapping[str, jnp.ndarray],
        targets: Mapping[str, jnp.ndarray],
        batch_loss: Mapping[str, jnp.ndarray],
        batch_size: Optional[int] = None,
    ) -> None:
        self.updates += 1
        correct: Dict[str, np.ndarray] = {}
        for key in self.num_classes:
            labels = jnp.asarray(targets["class"][key])
            if batch_size is None:
                batch_size = int(labels.shape[0])
            corr, top1 = topk_correct(preds[key], labels, self.maxk)
            # predictions may carry mesh-padding rows; keep the true batch
            correct[key] = np.asarray(corr)[:, :batch_size]
            confusion_update(
                self.conf_mat[key],
                np.asarray(labels)[:batch_size],
                np.asarray(top1)[:batch_size],
            )
            if key in batch_loss:
                self.loss[key] += float(batch_loss[key])

        for extra in ("all_class", "prior", "contrast", "entropy", "total"):
            if extra in self.loss and extra in batch_loss:
                self.loss[extra] += float(batch_loss[extra])

        for i, k in enumerate(self.topk):
            for key in self.num_classes:
                acc = correct[key][:k].any(axis=0).sum() * 100.0 / batch_size
                self.accuracy[key][i] += float(acc)
            if self.multi_class:
                joint = np.ones(batch_size, dtype=bool)
                for key in self.num_classes:
                    joint &= correct[key][:k].any(axis=0)
                self.accuracy["all_class"][i] += float(
                    joint.sum() * 100.0 / batch_size
                )

    def compute(self):
        denom = self.updates or self.no_batches
        accuracy = {
            key: [round(v / denom, 2) for v in values]
            for key, values in self.accuracy.items()
        }
        loss = {key: round(v / denom, 5) for key, v in self.loss.items()}
        return loss, accuracy, self.conf_mat
