"""The jitted SPMD train / eval steps.

One ``jax.jit`` with sharding annotations replaces the reference's whole
device loop (core/tools/train.py:69-104): forward (+ on-device spectrogram),
loss, backward, grad clip, optimizer update and BN-stat update all fuse into
a single XLA program. The batch is sharded over the mesh's ``data`` axis;
parameters and optimizer state are replicated; XLA inserts the psum for
gradients and the global BN statistics.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.losses import tbn_loss
from ..models.tbn import TBNModel
from .mesh import DATA_AXIS


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def init_variables(
    model: TBNModel, batch: Mapping[str, jnp.ndarray], rng: jax.Array
):
    """Model init with the canonical 4-stream rng dict — the ONE init
    recipe, shared by create_train_state and the production trainer
    (tools/train.run_trainer, which must load pretrained towers between
    init and tx.init and so cannot use create_train_state wholesale)."""
    rngs = {
        "params": rng,
        "dropout": jax.random.fold_in(rng, 1),
        "gumbel": jax.random.fold_in(rng, 2),
        "audio_dropout": jax.random.fold_in(rng, 3),
    }
    # init must run jitted: unjitted tracing dispatches thousands of tiny
    # ops to the device individually (minutes over a TPU tunnel)
    return jax.jit(lambda r, b: model.init(r, b, train=False))(rngs, batch)


def create_train_state(
    model: TBNModel,
    batch: Mapping[str, jnp.ndarray],
    tx: optax.GradientTransformation,
    rng: jax.Array,
) -> TrainState:
    variables = init_variables(model, batch, rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def _forward(model, params, batch_stats, batch, train, rngs, true_batch=None):
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    if train:
        out, mutated = model.apply(
            variables, batch, train=True, true_batch=true_batch, rngs=rngs,
            mutable=["batch_stats"],
        )
        return out, mutated.get("batch_stats", batch_stats)
    out = model.apply(variables, batch, train=False)
    return out, batch_stats


def _mask_dispatcher(fns):
    """Route a step call to the masked or unmasked jitted program based on
    whether the batch actually contains pad rows (true_bs < rows). The
    check is host-side (true_bs is a host scalar from the loader's meta,
    the final positional argument); each variant compiles at most once."""

    def dispatch(state, batch, targets, *rest):
        true_bs = rest[-1]
        if isinstance(true_bs, jax.Array):
            # tolerate device scalars (tests), but the hot path should pass
            # a host int: int() on a device array is a blocking readback,
            # and on the tunneled TPU platform readbacks cost 30 ms-2 s
            true_bs = int(true_bs)
        rows = next(
            v.shape[0] for v in batch.values() if hasattr(v, "shape")
        )
        masked = true_bs != int(rows)
        return fns[masked](
            state, batch, targets, *rest[:-1], jnp.int32(true_bs)
        )

    dispatch.fns = fns  # the underlying jitted programs (AOT tools/tests)
    return dispatch


def _build_train_step_fn(model, tx, cfg, masked: bool):
    """One full training step as a pure function (forward + loss + backward
    + clip + optimizer + BN-stat update) — the body shared by the
    per-batch (`make_train_step`) and scanned (`make_multi_train_step`)
    entry points."""

    def step_fn(state: TrainState, batch, targets, rng, epoch, true_bs):
        tb = true_bs if masked else None
        step_rng = jax.random.fold_in(rng, state.step)
        rngs = {
            "dropout": step_rng,
            "gumbel": jax.random.fold_in(step_rng, 1),
            "audio_dropout": jax.random.fold_in(step_rng, 2),
        }

        def loss_fn(params):
            preds, new_stats = _forward(
                model, params, state.batch_stats, batch, True, rngs,
                true_batch=tb,
            )
            loss = tbn_loss(
                preds,
                targets,
                cfg,
                epoch=epoch,
                train=True,
                attention_weights=preds.get("weights"),
                true_batch=tb,
            )
            return loss["total"], (loss, preds, new_stats)

        grads, (loss, preds, new_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, loss, preds

    return step_fn


def make_train_step(
    model: TBNModel,
    tx: optax.GradientTransformation,
    cfg,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """Returns fn(state, batch, targets, rng, epoch, true_bs) ->
    (state, loss_dict, preds). ``true_bs``: the true (unpadded) batch size
    — pad rows (loader pads to the mesh size) are masked out of every loss
    mean and every live BatchNorm statistic, so padding changes nothing but
    shapes. Whether masking is active is a COMPILE-TIME property: full
    batches (true_bs == rows, the common case) take an unmasked program
    with zero masking overhead (~2 ms/step of weighted BN reductions);
    only ragged last batches compile + run the masked variant."""

    def build(masked: bool):
        return _build_train_step_fn(model, tx, cfg, masked)

    if mesh is None:
        fns = {m: jax.jit(build(m), donate_argnums=(0,)) for m in (False, True)}
    else:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(DATA_AXIS))
        fns = {
            m: jax.jit(
                build(m),
                in_shardings=(repl, data, data, repl, repl, repl),
                out_shardings=(repl, repl, repl),
                donate_argnums=(0,),
            )
            for m in (False, True)
        }
    return _mask_dispatcher(fns)


def _compose_group_ema(old_stats, group_stats, momentum: float, groups: int):
    """Replay G sequential running-stat EMA updates from per-group results.

    Under ``jax.vmap`` every BN module computed, per micro-batch group i,
    ``new_i = (1-m)*old + m*s_i`` against the SAME broadcast ``old``. The
    reference applies its G micro-batch updates sequentially
    (core/tools/train.py:69-94 runs G separate forwards); recover each
    group's batch statistic ``s_i`` and re-apply the updates in order —
    exact, and O(G * num_channels) work.

    ``momentum`` must be the momentum EVERY BatchNorm in the model used
    (the recovery divides by it); TBN sets layers.BN_MOMENTUM globally
    and TBNModel never overrides the per-module field. A model mixing
    momenta cannot use the fused-accumulation path."""

    def leaf(old, new_g):
        s = (new_g - (1.0 - momentum) * old[None]) / momentum
        r = old
        for i in range(groups):
            r = (1.0 - momentum) * r + momentum * s[i]
        return r

    return jax.tree.map(leaf, old_stats, group_stats)


def _build_fused_accum_step_fn(model, tx, cfg, masked: bool):
    """Gradient accumulation as ONE program: ``jax.vmap`` over the G
    micro-batches (the reference's ``accumulator_step`` loop,
    core/tools/train.py:66-94).

    TPU rationale (hypothesis): XLA collapses the vmapped dimension into
    the conv/pool batch, so the folded row count per op grows G-fold — at
    the reference recipe (batch 12 x 3 segments = 36 folded rows) the
    lane-tiled ops pad 36 rows up to the 128-wide lane tile; G=4 fills
    144 of 256 lanes. MEASURED NEGATIVE on v5e (59.6 ms/micro-batch vs
    42.3 sequential, PERF.md round 3): the fused backward holds G× the
    activation footprint and the resulting scheduling/spill cost exceeds
    the lane-fill win. Off by default (``tpu.fuse_accum``); kept as a
    correct, tested opt-in for small-model / tiny-batch regimes.
    Semantics match G sequential accumulate-then-step micro-batches
    exactly:

    * per-group BatchNorm batch statistics (vmap maps the BN reductions
      per group — each micro-batch is normalized by its own moments, as
      the reference's G separate forwards are);
    * running stats: the G sequential EMA updates are replayed in order
      (:func:`_compose_group_ema`);
    * gradient: d/dp mean_g(loss_g) == the mean of the G micro-gradients
      (what ``optax.MultiSteps`` hands its inner transform on the G-th
      step), fed ONCE to the raw (un-wrapped) optimizer chain — build the
      optimizer with ``build_optimizer(..., accumulate=False)``;
    * rng: per-group fold of the step rng (stream differs from the
      sequential path; distributions identical).

    The returned fn is shape-generic over G (a ragged final group of
    fewer micro-batches recompiles once for its G and updates with the
    mean over those groups — the reference instead carries a partial
    accumulator across the epoch boundary; divergence documented in
    PARITY.md).
    """
    from ..models.layers import BN_MOMENTUM

    def step_fn(state: TrainState, batches, targetss, rng, epoch, true_bss):
        groups = next(
            v.shape[0] for v in batches.values() if hasattr(v, "shape")
        )
        step_rng = jax.random.fold_in(rng, state.step)

        def group_rngs(i):
            r = jax.random.fold_in(step_rng, i)
            return {
                "dropout": r,
                "gumbel": jax.random.fold_in(r, 1),
                "audio_dropout": jax.random.fold_in(r, 2),
            }

        rngs_g = jax.vmap(group_rngs)(jnp.arange(groups))

        def loss_fn(params):
            def one(batch, targets, rngs, tb):
                tb = tb if masked else None
                preds, new_stats = _forward(
                    model, params, state.batch_stats, batch, True, rngs,
                    true_batch=tb,
                )
                loss = tbn_loss(
                    preds,
                    targets,
                    cfg,
                    epoch=epoch,
                    train=True,
                    attention_weights=preds.get("weights"),
                    true_batch=tb,
                )
                return loss["total"], (loss, preds, new_stats)

            totals, aux = jax.vmap(one)(batches, targetss, rngs_g, true_bss)
            return jnp.mean(totals), aux

        grads, (loss, preds, statss) = jax.grad(loss_fn, has_aux=True)(
            state.params
        )
        new_stats = state.batch_stats
        if new_stats:
            new_stats = _compose_group_ema(
                new_stats, statss, BN_MOMENTUM, groups
            )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, loss, preds

    return step_fn


def make_fused_accum_step(
    model: TBNModel,
    tx: optax.GradientTransformation,
    cfg,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """Returns fn(state, batches, targetss, rng, epoch, true_bss) ->
    (state, loss_dict_per_group, preds_per_group): ONE optimizer update
    from G stacked micro-batches (leaves ``(G, B, ...)``;
    ``true_bss``: host sequence of per-group true batch sizes). See
    :func:`_build_fused_accum_step_fn`. ``tx`` must be the raw optimizer
    (``build_optimizer(..., accumulate=False)``) — accumulation IS the
    fused mean, wrapping it in ``optax.MultiSteps`` would double-count.

    Masked-vs-unmasked is compile-time static like ``make_train_step``:
    groups of full batches run the unmasked program; a group containing a
    padded (ragged) batch runs the masked one with per-group row masks."""

    def build(masked: bool):
        return _build_fused_accum_step_fn(model, tx, cfg, masked)

    if mesh is None:
        fns = {
            m: jax.jit(build(m), donate_argnums=(0,)) for m in (False, True)
        }
    else:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(None, DATA_AXIS))
        fns = {
            m: jax.jit(
                build(m),
                in_shardings=(repl, data, data, repl, repl, repl),
                out_shardings=(repl, repl, repl),
                donate_argnums=(0,),
            )
            for m in (False, True)
        }

    def dispatch(state, batches, targetss, rng, epoch, true_bss):
        rows = next(
            v.shape[1] for v in batches.values() if hasattr(v, "shape")
        )
        tbs = tuple(int(t) for t in true_bss)
        masked = any(t != int(rows) for t in tbs)
        return fns[masked](
            state, batches, targetss, rng, epoch,
            jnp.asarray(tbs, jnp.int32),
        )

    dispatch.fns = fns
    return dispatch


def make_multi_train_step(
    model: TBNModel,
    tx: optax.GradientTransformation,
    cfg,
    mesh: Optional[Mesh] = None,
    steps: int = 4,
) -> Callable:
    """``steps`` full training steps per dispatch via an in-graph
    ``lax.scan``: fn(state, batches, targetss, rng, epoch) ->
    (state, loss_dicts, preds) where ``batches``/``targetss`` are the
    per-step pytrees stacked on a new leading axis of length ``steps``
    and every output leaf carries the per-step leading axis.

    Rationale: one dispatch per step pays the host->device launch
    round-trip per batch (~9 ms on a tunneled runtime; still ~10s of us
    locally) and caps throughput at the Python loop rate. Scanning K steps
    inside one executable runs them back-to-back on device — the TPU-native
    equivalent of the reference's tight CUDA-stream loop
    (core/tools/train.py:69-104). Semantics are identical to K sequential
    `make_train_step` calls on full (unpadded) batches: the per-step rng
    folds state.step exactly like the single-step path, and BN statistics /
    optimizer state thread through the scan carry
    (tests/test_train_step.py::test_multi_step_matches_sequential).

    Pad-row masking is NOT supported here — ragged tail batches must go
    through `make_train_step`'s masked program (tools/train.py routes
    them there)."""

    step_fn = _build_train_step_fn(model, tx, cfg, masked=False)

    def multi_fn(state: TrainState, batches, targetss, rng, epoch):
        rows = next(
            v.shape[1] for v in batches.values() if hasattr(v, "shape")
        )

        def body(st, xs):
            batch, targets = xs
            st, loss, preds = step_fn(
                st, batch, targets, rng, epoch, jnp.int32(rows)
            )
            return st, (loss, preds)

        state, (losses, preds) = jax.lax.scan(
            body, state, (batches, targetss), length=steps
        )
        return state, losses, preds

    if mesh is None:
        return jax.jit(multi_fn, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(None, DATA_AXIS))
    return jax.jit(
        multi_fn,
        in_shardings=(NamedSharding(mesh, P()), data, data, repl, repl),
        out_shardings=(NamedSharding(mesh, P()),) * 3,
        donate_argnums=(0,),
    )


def make_multi_fused_step(
    model: TBNModel,
    tx: optax.GradientTransformation,
    cfg,
    mesh: Optional[Mesh] = None,
    steps: int = 4,
) -> Callable:
    """``steps`` fused-accumulation updates per dispatch: scan over K
    groups of G stacked micro-batches (leaves ``(K, G, B, ...)``) —
    the scan-per-dispatch of :func:`make_multi_train_step` composed with
    the vmap-per-update of :func:`make_fused_accum_step`. Full (unpadded)
    batches only; ragged tails go through the per-group dispatcher."""

    step_fn = _build_fused_accum_step_fn(model, tx, cfg, masked=False)

    def multi_fn(state: TrainState, batches, targetss, rng, epoch):
        def body(st, xs):
            batch, targets = xs
            st, loss, preds = step_fn(st, batch, targets, rng, epoch, None)
            return st, (loss, preds)

        state, (losses, preds) = jax.lax.scan(
            body, state, (batches, targetss), length=steps
        )
        return state, losses, preds

    if mesh is None:
        return jax.jit(multi_fn, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(None, None, DATA_AXIS))
    return jax.jit(
        multi_fn,
        in_shardings=(NamedSharding(mesh, P()), data, data, repl, repl),
        out_shardings=(NamedSharding(mesh, P()),) * 3,
        donate_argnums=(0,),
    )


def make_eval_step(model: TBNModel, cfg, mesh: Optional[Mesh] = None) -> Callable:
    """Returns fn(state, batch, targets, epoch, true_bs) ->
    (loss_dict, preds). Pad rows are masked out of the loss; eval BatchNorm
    uses running statistics, so no activation masking is needed. Like the
    train step, mask-active is compile-time static (full batches take the
    unmasked program)."""

    def build(masked: bool):
        def step_fn(state: TrainState, batch, targets, epoch, true_bs):
            tb = true_bs if masked else None
            preds, _ = _forward(
                model, state.params, state.batch_stats, batch, False, {}
            )
            loss = tbn_loss(
                preds,
                targets,
                cfg,
                epoch=epoch,
                train=False,
                attention_weights=preds.get("weights"),
                true_batch=tb,
            )
            return loss, preds

        return step_fn

    if mesh is None:
        fns = {m: jax.jit(build(m)) for m in (False, True)}
    else:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(DATA_AXIS))
        fns = {
            m: jax.jit(
                build(m),
                in_shardings=(repl, data, data, repl, repl),
                out_shardings=(repl, repl),
            )
            for m in (False, True)
        }
    return _mask_dispatcher(fns)


def make_infer_step(model: TBNModel, mesh: Optional[Mesh] = None) -> Callable:
    """Pure forward for testing/submission: fn(state, batch) -> preds."""

    def step_fn(state: TrainState, batch):
        preds, _ = _forward(model, state.params, state.batch_stats, batch, False, {})
        return preds

    if mesh is None:
        return jax.jit(step_fn)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(step_fn, in_shardings=(repl, data), out_shardings=repl)
