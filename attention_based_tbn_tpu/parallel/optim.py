"""Optimizers, LR schedules and parameter-freezing masks.

Mirrors the reference recipe (core/tools/train.py:189-217, core/models/
model.py:148-176):

* SGD(momentum, weight_decay) + MultiStepLR(milestones, gamma), or Adam;
* optional GradualWarmupScheduler ramp;
* global grad-norm clipping;
* gradient accumulation (``optax.MultiSteps``, the reference's
  accumulator_step with its loss/k scaling);
* freeze_base "all" (whole towers frozen) or "partialbn" (BN affine params
  frozen except the stem's FIRST BN, reference model.py:170-176). Note the
  reference's Audio clause ``(modality == "Audio" and mod_no > 6) or
  mod_no > 1`` is dead code — the ``or mod_no > 1`` short-circuits it, so
  even on the two-branch audio stem only child index 1's BN
  (conv1_1x3_s2_bn) stays trainable and conv1_3x1_s2_bn (child index 4)
  is frozen. We reproduce the as-written behavior (see PARITY.md and
  tests/test_whole_model_parity.py partialbn dynamics).

The learning rate is injected via ``optax.inject_hyperparams`` so the host
can retune it per epoch (torch-scheduler style) without recompilation.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import optax

# Stem modules whose BN affine params stay trainable under partialbn:
# the reference keeps only the tower's FIRST BN child trainable (see module
# docstring) — conv1_7x7_s2_bn on the standard graph, conv1_1x3_s2_bn on the
# two-branch audio stem (conv1_3x1_s2_bn is frozen by the as-written rule).
_STEM_BN_TRAINABLE = ("conv1_7x7_s2", "conv1_1x3_s2")


def lr_at_epoch(cfg, epoch: int) -> float:
    """Host-side LR schedule: MultiStepLR (+ optional warmup ramp).

    MultiStepLR: ``lr * gamma^(number of milestones passed)`` (reference
    core/tools/train.py:193-199, torch MultiStepLR closed form).

    Warmup matches GradualWarmupScheduler as driven by the reference
    (core/tools/train.py:211-217 builds it, :292-293 calls
    ``scheduler_warmup.step(epoch + 1)`` at the END of each epoch), so
    epoch ``e`` trains at ramp position ``e``: ``base * e / T`` for
    multiplier 1, else ``base * ((m - 1) * e / T + 1)``. After warmup
    the wrapper steps the wrapped MultiStepLR with ``epoch - T`` from
    base lrs scaled by the multiplier, i.e. the decay milestones are
    offset by the warmup length. Documented divergence: the upstream
    package serves ONE stale lr (the un-scaled base) for the first
    post-warmup epoch before the hand-off settles; we use the intended
    value ``base * m * gamma^(milestones <= e - T)`` for every
    post-warmup epoch (see PARITY.md).
    """
    base = float(cfg.train.optim.lr)
    if cfg.train.optim.type.lower() == "adam":
        return base

    steps = list(cfg.train.scheduler.lr_steps or [])
    gamma = float(cfg.train.scheduler.lr_decay)

    warm = cfg.train.warmup
    if not warm.enable:
        return base * (gamma ** sum(1 for s in steps if epoch >= s))

    total = max(int(warm.epochs), 1)
    mult = float(warm.multiplier)
    if mult < 1.0:
        raise ValueError("train.warmup.multiplier must be >= 1")
    if epoch <= total:
        if mult == 1.0:
            return base * epoch / total
        return base * ((mult - 1.0) * epoch / total + 1.0)
    effective = epoch - total
    return base * mult * (gamma ** sum(1 for s in steps if effective >= s))


def _freeze_labels(params: Dict, cfg, modality) -> Dict:
    """Label tree: "train" / "freeze" per leaf."""
    freeze_base = bool(cfg.model.freeze_base)
    freeze_mode = cfg.model.freeze_mode
    arch = cfg.model.arch
    if freeze_base and freeze_mode == "partialbn" and arch != "bninception":
        # the reference silently ignores partialbn for resnet/vgg towers
        # (model.py:164: the elif requires bninception); same dynamics
        # here, but surface the ignored request instead of matching the
        # silence
        import logging

        logging.getLogger(__name__).warning(
            "model.freeze_mode='partialbn' only applies to the bninception "
            "arch (reference model.py:164-176); arch=%r trains ALL tower "
            "parameters — use model.freeze_mode='all' to freeze the towers.",
            arch,
        )

    def label_tower(tower_params: Dict) -> Dict:
        def walk(node, path):
            out = {}
            for key, value in node.items():
                if isinstance(value, dict):
                    out[key] = walk(value, path + (key,))
                else:
                    if freeze_mode == "all":
                        out[key] = "freeze"
                    elif freeze_mode == "partialbn" and arch == "bninception":
                        # freeze BN affine params outside the stem's first BN(s)
                        in_bn = "bn" in path
                        stem = path and path[0] in _STEM_BN_TRAINABLE
                        out[key] = "freeze" if (in_bn and not stem) else "train"
                    else:
                        out[key] = "train"
            return out

        return walk(tower_params, ())

    labels: Dict = {}
    for key, value in params.items():
        if key.startswith("Base_") and freeze_base:
            labels[key] = label_tower(value)
        else:
            labels[key] = jax.tree.map(lambda _: "train", value)
    return labels


def build_optimizer(
    cfg, params: Dict, modality, accumulate: bool = True
) -> Tuple[optax.GradientTransformation, Dict]:
    """(optimizer, freeze-label tree). Apply with the labeled multi_transform.

    ``accumulate=False`` skips the ``optax.MultiSteps`` wrap even when
    ``accumulator_step > 1`` — for the fused-accumulation train step
    (parallel/train_step.make_fused_accum_step), where the G micro-batch
    gradients are averaged inside one program and the raw chain must see
    the mean exactly once."""
    opt_cfg = cfg.train.optim

    if opt_cfg.type.lower() == "sgd":
        def make_tx(learning_rate):
            return optax.sgd(
                learning_rate,
                momentum=float(opt_cfg.momentum),
            )
    elif opt_cfg.type.lower() == "adam":
        def make_tx(learning_rate):
            return optax.adam(learning_rate, b1=0.9, b2=0.999)
    else:
        raise ValueError(f"Unsupported optimizer {opt_cfg.type!r}")

    chain = []
    if cfg.train.clip_grad:
        chain.append(optax.clip_by_global_norm(float(cfg.train.clip_grad)))
    if float(opt_cfg.weight_decay) > 0:
        chain.append(optax.add_decayed_weights(float(opt_cfg.weight_decay)))
    inner = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(*chain, make_tx(learning_rate))
    )(learning_rate=float(opt_cfg.lr))

    labels = _freeze_labels(params, cfg, modality)
    tx = optax.multi_transform(
        {"train": inner, "freeze": optax.set_to_zero()}, labels
    )

    k = int(opt_cfg.accumulator_step)
    if k > 1 and accumulate:
        tx = optax.MultiSteps(tx, every_k_schedule=k)
    return tx, labels


def _find_hyperparam_nodes(opt_state):
    """All inject_hyperparams states carrying a learning_rate entry."""
    found = []

    def walk(node):
        if "learning_rate" in getattr(node, "hyperparams", {}):
            found.append(node)
            return
        if hasattr(node, "_fields"):  # NamedTuple
            for field in node._fields:
                walk(getattr(node, field))
        elif isinstance(node, (list, tuple)):
            for item in node:
                walk(item)
        elif isinstance(node, dict):
            for item in node.values():
                walk(item)

    walk(opt_state)
    if not found:
        raise ValueError("No injected learning_rate found in optimizer state")
    return found


def set_learning_rate(opt_state, lr: float):
    """Retune the injected LR inside (possibly MultiSteps-wrapped) state.

    Mutates the hyperparams dict in place (torch-scheduler style, once per
    epoch on the host); the jitted step reads the new value on its next call.
    """
    for node in _find_hyperparam_nodes(opt_state):
        node.hyperparams["learning_rate"] = jax.numpy.asarray(
            lr, dtype=node.hyperparams["learning_rate"].dtype
        )
    return opt_state


def current_learning_rate(opt_state) -> float:
    return float(_find_hyperparam_nodes(opt_state)[0].hyperparams["learning_rate"])
