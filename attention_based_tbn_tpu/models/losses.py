"""Losses: per-head classification + attention auxiliaries, as pure functions.

Reproduces the reference loss surface (core/models/model_builder.py:16-22,
core/models/model.py:264-334, core/models/contrast_loss.py):

* classification: crossentropy / nll per head, summed (kl/mse/smoothl1 are
  registry names only — see CLASSIFICATION_LOSSES);
* prior loss on attention weights (KL against a gaussian/uniform/loud prior,
  "batchmean"-reduced, applied to log-weights);
* contrast loss: sum(off-peak) - sum(peak) under a detached threshold mask;
* entropy of the attention distribution, with a train-time early-stop
  threshold;
* all three gated to 0 before ``decay_step`` epochs and scaled by their decay
  multipliers after (model.py:300-332).

Everything is jit-compatible: epoch enters as a traced scalar and gates
resolve via ``jnp.where``.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp


def _row_mean(values: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean over the leading (row) axis; with ``mask`` (0/1 per row), a
    weighted mean over the unmasked rows only — how every mean-reduced loss
    excludes the loader's pad rows (the reference never pads,
    core/tools/train.py:76-94, so its plain means are the mask==all-ones
    case)."""
    if mask is None:
        return jnp.mean(values)
    mask = mask.astype(jnp.float32)
    shaped = mask.reshape(mask.shape + (1,) * (values.ndim - 1))
    denom = jnp.maximum(jnp.sum(mask), 1.0) * float(
        math.prod(values.shape[1:])
    )
    return jnp.sum(values * shaped) / denom


def cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """torch.nn.CrossEntropyLoss (mean reduction; pad rows masked out)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return -_row_mean(picked, mask)


def nll_loss(
    log_probs: jnp.ndarray, labels: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """torch.nn.NLLLoss (mean reduction) — expects log-probabilities."""
    picked = jnp.take_along_axis(
        log_probs.astype(jnp.float32), labels[:, None], axis=-1
    )[:, 0]
    return -_row_mean(picked, mask)


def mse_loss(
    pred: jnp.ndarray, target: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    sq = jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return _row_mean(sq, mask)


def smooth_l1_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    beta: float = 1.0,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    val = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return _row_mean(val, mask)


def kl_div(
    log_pred: jnp.ndarray,
    target: jnp.ndarray,
    reduction: str = "batchmean",
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """torch.nn.KLDivLoss: input is log-probs, target is probs."""
    target = target.astype(jnp.float32)
    log_pred = log_pred.astype(jnp.float32)
    pointwise = target * (jnp.log(jnp.clip(target, 1e-30)) - log_pred)
    pointwise = jnp.where(target > 0, pointwise, 0.0)
    if mask is not None:
        shaped = mask.astype(jnp.float32).reshape(
            mask.shape + (1,) * (pointwise.ndim - 1)
        )
        pointwise = pointwise * shaped
        rows = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    else:
        rows = log_pred.shape[0]
    if reduction == "batchmean":
        return jnp.sum(pointwise) / rows
    if reduction == "sum":
        return jnp.sum(pointwise)
    if mask is not None:
        return jnp.sum(pointwise) / (rows * math.prod(log_pred.shape[1:]))
    return jnp.mean(pointwise)


# Head (classification) losses by cfg.model.loss_fn. Only these two have
# integer-label semantics; "kl"/"mse"/"smoothl1" are valid loss NAMES in the
# reference's registry (model_builder.py:16-22) but are usable only as the
# prior loss (wt_loss) — the reference's get_loss hardwires
# criterion["crossentropy"] for the heads (model.py:294), so selecting any
# other head loss raises a KeyError there; here it raises a clear error in
# tbn_loss instead of silently training with the wrong objective.
CLASSIFICATION_LOSSES = {
    "crossentropy": cross_entropy,
    "nll": nll_loss,
}


def contrast_loss(
    weights: jnp.ndarray,
    threshold: float = 0.1,
    reduction: str = "batchmean",
    row_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """sum(off-peak) - sum(peak) per row under a detached binary mask
    (reference contrast_loss.py:15-25)."""
    w = weights.astype(jnp.float32)
    mask = jax.lax.stop_gradient((w >= threshold).astype(jnp.float32))
    loss = (w * (1.0 - mask) - w * mask).sum(axis=1)
    if reduction in ("mean", "batchmean"):
        return _row_mean(loss, row_mask)
    if row_mask is not None:
        return jnp.sum(loss * row_mask.astype(jnp.float32))
    return loss.sum()


def attention_entropy(
    weights: jnp.ndarray, eps: float = 1e-6, row_mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Mean entropy of the (renormalized) attention rows — matches
    torch.distributions.Categorical(probs=wts + eps).entropy().mean()
    (model.py:324), which normalizes probs by their sum."""
    p = weights.astype(jnp.float32) + eps
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    ent = -jnp.sum(p * jnp.log(p), axis=-1)
    return _row_mean(ent, row_mask)


def prior_loss(
    weights: jnp.ndarray,
    prior: jnp.ndarray,
    wt_loss: str = "kl",
    reduction: str = "batchmean",
    row_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Prior supervision of the attention weights (model.py:312-319).

    For "kl", the reference feeds log(wts + 1e-7) as the (log-)input and the
    prior as the target.
    """
    if wt_loss == "kl":
        return kl_div(
            jnp.log(weights.astype(jnp.float32) + 1e-7), prior, reduction,
            mask=row_mask,
        )
    if wt_loss == "mse":
        return mse_loss(weights, prior, mask=row_mask)
    if wt_loss == "smoothl1":
        return smooth_l1_loss(weights, prior, mask=row_mask)
    raise ValueError(f"Unsupported wt_loss {wt_loss!r}")


def tbn_loss(
    preds: Mapping[str, jnp.ndarray],
    targets: Mapping[str, Any],
    cfg,
    epoch: jnp.ndarray | int = 0,
    train: bool = True,
    attention_weights: Optional[jnp.ndarray] = None,
    true_batch: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Total TBN loss dict (keys mirror the reference: per-head, all_class,
    prior/contrast/entropy, total).

    ``true_batch``: traced scalar — the true (unpadded) batch size. The
    loader pads every batch to a multiple of the mesh size by repeating
    sample 0 (data/loader.py pad_batch); rows >= true_batch are excluded
    from every mean so the padded duplicates neither bias the gradient nor
    corrupt the reported losses. None = no padding (all rows real)."""
    att_cfg = cfg.model.attention
    try:
        loss_fn = CLASSIFICATION_LOSSES[cfg.model.loss_fn]
    except KeyError:
        raise ValueError(
            f"model.loss_fn={cfg.model.loss_fn!r} has no integer-label head "
            "semantics; it is a prior-loss (model.attention.wt_loss) option. "
            "The reference likewise cannot train heads with it "
            "(core/models/model.py:294 hardwires criterion['crossentropy'])."
        ) from None

    loss: Dict[str, jnp.ndarray] = {}
    all_class = 0.0
    sample_mask = None
    for key, labels in targets["class"].items():
        if true_batch is not None and sample_mask is None:
            rows = preds[key].shape[0]
            sample_mask = (
                jnp.arange(rows) < jnp.asarray(true_batch)
            ).astype(jnp.float32)
        loss[key] = loss_fn(preds[key], labels, mask=sample_mask)
        all_class = all_class + loss[key]
    loss["all_class"] = all_class
    total = all_class

    use_attention = att_cfg.enable and not att_cfg.use_fixed
    if use_attention and attention_weights is not None:
        epoch = jnp.asarray(epoch)
        # aux losses switch on at epoch decay_step (1-indexed, model.py:301)
        gate = jnp.where(
            jnp.logical_and(train, epoch + 1 < att_cfg.decay_step), 0.0, 1.0
        )
        wts = attention_weights
        if wts.ndim == 3:  # (B*, 1, S) from MHA
            wts = wts[:, 0, :]

        # attention rows are (batch, segments) folded batch-major: repeat
        # the per-sample mask over each sample's segment rows
        wt_mask = None
        if sample_mask is not None:
            per_sample = wts.shape[0] // sample_mask.shape[0]
            wt_mask = jnp.repeat(sample_mask, per_sample)

        if att_cfg.use_prior:
            # targets["weights"] is (B, N, W, 1) — one prior per (sample,
            # segment). Under 10-crop eval the attention rows are tiled
            # crop-major to B*10*N (models/tbn.tile_crop_rows); tile the
            # prior identically so each crop row pairs its own segment's
            # prior (the bare reshape would need W % crops == 0 and still
            # mispair segments).
            b, n = targets["weights"].shape[:2]
            prior = targets["weights"].reshape(b * n, -1)
            if wts.shape[0] != b * n:
                from .tbn import tile_crop_rows

                prior = tile_crop_rows(prior, b, wts.shape[0] // (b * n))
            loss["prior"] = prior_loss(
                wts, prior, att_cfg.wt_loss, att_cfg.loss_reduction,
                row_mask=wt_mask,
            )
            total = total + gate * att_cfg.wt_decay * loss["prior"]
        if att_cfg.use_contrast:
            loss["contrast"] = contrast_loss(
                wts, att_cfg.contrast_thresh, att_cfg.loss_reduction,
                row_mask=wt_mask,
            )
            total = total + gate * att_cfg.contrast_decay * loss["contrast"]
        if att_cfg.use_entropy:
            loss["entropy"] = attention_entropy(wts, row_mask=wt_mask)
            # early stop: once entropy sinks below the threshold, drop the term
            ent_gate = jnp.where(
                jnp.logical_and(
                    train,
                    jnp.logical_and(gate > 0, loss["entropy"] < att_cfg.entropy_thresh),
                ),
                0.0,
                1.0,
            )
            total = total + gate * ent_gate * att_cfg.entropy_decay * loss["entropy"]

    loss["total"] = total
    return loss
