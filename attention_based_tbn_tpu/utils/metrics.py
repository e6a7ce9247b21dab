"""Evaluation metrics with the reference's accounting, accumulated on device.

Matches reference core/utils/metric.py: per-head top-k accuracy, a combined
``all_class`` accuracy (a sample counts only when *every* head's top-k
contains the label), per-head confusion matrices, and running means of every
loss term; per-batch percentages averaged over the number of batches.

TPU-native accounting: ``update`` runs one jitted program that folds the
batch into device-resident accumulators (top-k counts, confusion scatter,
loss sums) — no device->host readback per step. ``compute`` blocks exactly
once at the end of the epoch. Padding rows appended by the loader to fill
the mesh are masked with the true batch size.

Divergence from the reference: averages divide by the number of *consumed*
batches. The reference divides by a precomputed count (train.py:61 rounds,
train.py:142 floors), inflating or deflating every metric whenever the
dataset size doesn't divide the batch size (a floor of 1 with 2 consumed
batches reports 200% top-k accuracy).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("maxk",))
def topk_correct(logits: jnp.ndarray, labels: jnp.ndarray, maxk: int = 5):
    """(B, C) logits -> bool (maxk, B): row k true when pred k == label."""
    _, preds = jax.lax.top_k(logits, maxk)
    return (preds == labels[:, None]).T, preds[:, 0]


@functools.lru_cache(maxsize=None)
def _make_updater(keys: Tuple[str, ...], topk: Tuple[int, ...], maxk: int,
                  multi: bool):
    """One jitted fold: (accumulators, batch) -> accumulators.

    Cached per (keys, topk, maxk, multi): Metric instances are created
    fresh every epoch/validation pass, and an uncached closure would
    retrace + recompile the top-k/confusion program each time."""

    @jax.jit
    def update(acc, conf, preds, labels, true_bs):
        rows = next(iter(preds.values())).shape[0]
        mask = jnp.arange(rows) < true_bs
        scale = 100.0 / true_bs.astype(jnp.float32)

        cum = {}
        for key in keys:
            _, p = jax.lax.top_k(preds[key], maxk)
            within = jnp.cumsum(p == labels[key][:, None], axis=1) > 0
            cum[key] = within  # (B, maxk)
            conf[key] = conf[key].at[labels[key], p[:, 0]].add(
                mask.astype(conf[key].dtype)
            )
            counts = jnp.stack(
                [(within[:, k - 1] & mask).sum() for k in topk]
            ).astype(jnp.float32)
            acc[key] = acc[key] + counts * scale
        if multi:
            per_k = []
            for k in topk:
                j = mask
                for key in keys:
                    j = j & cum[key][:, k - 1]
                per_k.append(j.sum())
            acc["all_class"] = acc["all_class"] + jnp.stack(per_k).astype(
                jnp.float32
            ) * scale
        return acc, conf

    return update


class Metric:
    def __init__(self, cfg, no_batches: int):
        self.cfg = cfg
        self.topk: List[int] = list(cfg.val.topk)
        self.maxk = max(self.topk)
        self.no_batches = max(no_batches, 1)
        self.updates = 0
        self.num_classes: Dict[str, int] = dict(cfg.model.num_classes)
        self.multi_class = len(self.num_classes) > 1

        k = len(self.topk)
        self._acc: Dict[str, jnp.ndarray] = {
            key: jnp.zeros(k, jnp.float32) for key in self.num_classes
        }
        self._conf: Dict[str, jnp.ndarray] = {
            key: jnp.zeros((n, n), jnp.float32)
            for key, n in self.num_classes.items()
        }
        self.loss: Dict[str, jnp.ndarray] = {key: 0.0 for key in self.num_classes}
        if self.multi_class:
            self.loss["all_class"] = 0.0
            self._acc["all_class"] = jnp.zeros(k, jnp.float32)

        att = cfg.model.attention
        if att.enable and not att.use_fixed:
            if att.use_prior:
                self.loss["prior"] = 0.0
            if att.use_contrast:
                self.loss["contrast"] = 0.0
            if att.use_entropy:
                self.loss["entropy"] = 0.0
        self.loss["total"] = 0.0

        self._updater = _make_updater(
            tuple(self.num_classes), tuple(self.topk), self.maxk, self.multi_class
        )

    def update(
        self,
        preds: Mapping[str, jnp.ndarray],
        targets: Mapping[str, jnp.ndarray],
        batch_loss: Mapping[str, jnp.ndarray],
        batch_size: Optional[int] = None,
    ) -> None:
        self.updates += 1
        labels = {
            key: jnp.asarray(targets["class"][key]) for key in self.num_classes
        }
        rows = next(iter(labels.values())).shape[0]
        if batch_size is None:
            batch_size = rows
        head_preds = {key: jnp.asarray(preds[key]) for key in self.num_classes}
        self._acc, self._conf = self._updater(
            self._acc, self._conf, head_preds, labels, jnp.asarray(batch_size)
        )
        # loss terms stay device scalars; summing is lazy/async
        for key in self.loss:
            if key in batch_loss:
                self.loss[key] = self.loss[key] + batch_loss[key]

    def compute(self):
        """Single host sync: returns (loss, accuracy, conf_mat) as numpy."""
        denom = self.updates or self.no_batches
        accuracy = {
            key: [round(float(v) / denom, 2) for v in np.asarray(values)]
            for key, values in self._acc.items()
        }
        loss = {key: round(float(v) / denom, 5) for key, v in self.loss.items()}
        conf = {key: np.asarray(v, dtype=np.float64) for key, v in self._conf.items()}
        return loss, accuracy, conf

    # Back-compat views used by tests / tools -------------------------------
    @property
    def accuracy(self) -> Dict[str, List[float]]:
        return {k: [float(x) for x in np.asarray(v)] for k, v in self._acc.items()}

    @property
    def conf_mat(self) -> Dict[str, np.ndarray]:
        return {k: np.asarray(v, dtype=np.float64) for k, v in self._conf.items()}
