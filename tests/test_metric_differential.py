"""Verbatim-reference differential for the Metric accumulators.

Runs the reference's own ``Metric`` class (core/utils/metric.py, imported
verbatim, device=cpu) and ours (utils/metrics.py) over the same prediction
stream and asserts the final (loss, accuracy, conf_mat) triples are equal —
including the reference's round-2 accuracy / round-5 loss formatting and
the attention-loss key construction (prior/contrast/entropy).

Batches are full and the batch count divides evenly, so the documented
consumed-batch-denominator divergence (utils/metrics.py module docstring)
is out of play and the comparison is exact. Scores are continuous random
floats → tie-free top-k on both sides.
"""

from __future__ import annotations

import importlib.util
import os
from types import SimpleNamespace as NS

import numpy as np
import pytest

from attention_based_tbn_tpu.config import load_config
from attention_based_tbn_tpu.utils.metrics import Metric

REFERENCE = "/root/reference/core/utils/metric.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE), reason="reference tree unavailable"
)

ROWS, NV, NN = 8, 6, 9
TOPK = [1, 3]
N_BATCHES = 3


def _load_reference_metric():
    spec = importlib.util.spec_from_file_location("ref_metric", REFERENCE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import torch

    class RefMetric(mod.Metric):
        # torch-2 shim, zero semantic change: the reference was written for
        # torch 1.x where ``preds.t().eq(...)`` returned a contiguous tensor;
        # torch 2.x keeps the transposed layout and its ``view(-1)`` at
        # metric.py:104 raises. Same math, one added .contiguous().
        @staticmethod
        def _get_correct_score(out, target, topk, device):
            corr, cm = mod.Metric._get_correct_score(
                out, target, [1], device  # maxk=1 path avoids the view
            )
            maxk = max(topk)
            _, preds = out.topk(maxk, 1, largest=True, sorted=True)
            preds = preds.t()
            correct = preds.eq(
                target.view(1, -1).expand_as(preds)
            ).contiguous()
            return correct, cm

    return RefMetric


def _ref_cfg(attention: bool):
    return NS(
        val=NS(topk=TOPK),
        model=NS(
            num_classes={"verb": NV, "noun": NN},
            attention=NS(
                enable=attention,
                use_fixed=False,
                use_prior=attention,
                use_contrast=attention,
                use_entropy=attention,
            ),
        ),
    )


def _our_cfg(attention: bool):
    return load_config(
        overrides=[
            "model.num_classes={verb: %d, noun: %d}" % (NV, NN),
            "val.topk=%s" % TOPK,
            "model.attention.enable=%s" % attention,
            "model.attention.use_fixed=False",
            "model.attention.use_prior=%s" % attention,
            "model.attention.use_contrast=%s" % attention,
            "model.attention.use_entropy=%s" % attention,
        ]
    )


@pytest.mark.parametrize("attention", [False, True])
def test_metric_matches_reference_verbatim(attention):
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    RefMetric = _load_reference_metric()
    ref = RefMetric(_ref_cfg(attention), no_batches=N_BATCHES,
                    device=torch.device("cpu"))
    ours = Metric(_our_cfg(attention), no_batches=N_BATCHES)

    rng = np.random.default_rng(11)
    for step in range(N_BATCHES):
        preds = {
            "verb": rng.standard_normal((ROWS, NV)).astype(np.float32),
            "noun": rng.standard_normal((ROWS, NN)).astype(np.float32),
        }
        labels = {
            "verb": rng.integers(0, NV, ROWS).astype(np.int64),
            "noun": rng.integers(0, NN, ROWS).astype(np.int64),
        }
        # exact binary fractions -> bitwise-identical accumulation both sides
        loss_vals = {
            "verb": 0.5 + 0.25 * step,
            "noun": 1.25 - 0.125 * step,
        }
        loss_vals["all_class"] = loss_vals["verb"] + loss_vals["noun"]
        loss_vals["total"] = loss_vals["all_class"]
        if attention:
            loss_vals.update(
                prior=0.0625 * (step + 1), contrast=-0.5 + 0.25 * step,
                entropy=2.0 - 0.5 * step,
            )
            loss_vals["total"] = loss_vals["all_class"] + loss_vals["prior"]

        ref.set_metrics(
            {k: torch.from_numpy(v) for k, v in preds.items()},
            {"class": {k: torch.from_numpy(v) for k, v in labels.items()}},
            ROWS,
            {k: torch.tensor(v) for k, v in loss_vals.items()},
        )
        ours.update(
            {k: jnp.asarray(v) for k, v in preds.items()},
            {"class": {k: jnp.asarray(v) for k, v in labels.items()}},
            {k: jnp.asarray(v) for k, v in loss_vals.items()},
            batch_size=ROWS,
        )

    ref_loss, ref_acc, ref_conf = ref.get_metrics()
    our_loss, our_acc, our_conf = ours.compute()

    assert set(our_loss) == set(ref_loss)
    for key in ref_loss:
        assert our_loss[key] == ref_loss[key], key
    assert set(our_acc) == set(ref_acc)
    for key in ref_acc:
        assert our_acc[key] == ref_acc[key], key
    for key in ("verb", "noun"):
        np.testing.assert_array_equal(
            our_conf[key], ref_conf[key].cpu().numpy(), err_msg=key
        )
