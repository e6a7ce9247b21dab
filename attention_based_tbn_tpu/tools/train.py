"""The training driver: epochs of SPMD train steps + validation.

Re-implements reference core/tools/train.py on the TPU stack: one jitted
train step (forward + loss + grads + clip + update + BN stats) over the
device mesh, host-side LR scheduling (MultiStepLR / warmup), per-epoch
validation, Orbax checkpointing with resume-extends-epochs semantics, and
TensorBoard scalars.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import create_dataloader
from ..models.builder import build_model
from ..parallel.mesh import (
    make_mesh,
    maybe_initialize_distributed,
    shard_batch,
)
from ..parallel.optim import (
    build_optimizer,
    lr_at_epoch,
    set_learning_rate,
)
from ..parallel.train_step import (
    TrainState,
    init_variables,
    make_eval_step,
    make_multi_train_step,
    make_train_step,
)
from ..utils.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
    wait_until_finished,
)
from ..utils.logging import Plotter
from ..utils.metrics import Metric
from ..utils.misc import get_time_diff


def _check_grouped_dispatch_single_host(cfg) -> None:
    """Fail fast: tpu.steps_per_call>1 / tpu.fuse_accum=true are
    single-host modes.

    Grouped dispatch stacks loader batches EAGERLY on the host
    (train_one_epoch flush_group); multi-host batches are global arrays
    from ``make_array_from_process_local_data`` whose shards live on
    other processes, and ``jnp.stack`` on a non-fully-addressable array
    raises deep inside the first grouped epoch. Surface the
    misconfiguration before any compile instead.
    """
    accum_k = int(cfg.train.optim.accumulator_step)
    fuse_accum = bool(cfg.get_path("tpu.fuse_accum", False)) and accum_k > 1
    steps_per_call = int(cfg.get_path("tpu.steps_per_call", 1) or 1)
    if jax.process_count() > 1 and (fuse_accum or steps_per_call > 1):
        raise ValueError(
            "tpu.steps_per_call>1 / tpu.fuse_accum=true are single-host "
            "modes: they stack batches on the host before dispatch, which "
            "is unsupported for multi-host (non-fully-addressable) global "
            "arrays. With tpu.multihost=true leave tpu.steps_per_call=1 "
            "and tpu.fuse_accum=false."
        )


def _device_put_factory(mesh):
    """Loader-output placement closure; one logic home: mesh.shard_batch."""

    def device_put(tree):
        return shard_batch(tree, mesh)

    return device_put


def train_one_epoch(
    cfg, state, step_fn, loader, metric, epoch, rng, logger, run_dir=None,
    multi_step=None, fused_step=None,
):
    no_batches = max(len(loader), 1)  # loader __len__ = true batch count
    log_interval = max(no_batches // 4, 1)
    # Device-resident running loss: the per-step float() readback was a
    # 30 ms-2 s host sync on the tunneled platform; now the loop enqueues
    # async adds and blocks only at the (4x/epoch) log points.
    loss_tracker = jnp.zeros((), jnp.float32)

    # First-class profiling: capture a device trace of the first N steps of
    # epoch 0 into the run dir (view with tensorboard / xprof).
    profile_steps = int(cfg.get_path("tpu.profile_steps", 0) or 0)
    profiling = profile_steps > 0 and epoch == 0 and run_dir
    if profiling:
        jax.profiler.start_trace(os.path.join(run_dir, "profile"))

    # tpu.steps_per_call > 1: group consecutive FULL batches and run them
    # through one scanned executable (parallel/train_step.py
    # make_multi_train_step) — per-batch dispatch overhead is paid once
    # per group. Ragged (padded) tail batches flush through the per-batch
    # masked program unchanged.
    multi_fn, group_len = multi_step if multi_step else (None, 1)

    step_times = []
    iter_no = -1
    clips_done = 0
    epoch_start = time.perf_counter()
    epoch_dev = jnp.asarray(epoch)

    def after_step(loss, preds, targets, bs, elapsed):
        nonlocal loss_tracker, iter_no, profiling, clips_done
        iter_no += 1
        clips_done += int(bs)
        metric.update(preds, targets, loss, batch_size=bs)
        loss_tracker = loss_tracker + loss["total"]
        step_times.append(elapsed)
        if profiling and iter_no + 1 >= profile_steps:
            jax.profiler.stop_trace()
            profiling = False
            logger.info(f"Saved device trace to {run_dir}/profile")
        if iter_no == 0 or (iter_no + 1) % log_interval == 0:
            logger.info(
                "Batch Progress: [{}/{}] || Train Loss: {:.5f} || "
                "{:.3f} s/step".format(
                    iter_no + 1,
                    no_batches,
                    float(loss_tracker) / (iter_no + 1),
                    float(np.mean(step_times[-log_interval:])),
                )
            )

    pending = []

    # tpu.fuse_accum: accumulator_step micro-batches -> ONE fused program
    # (vmap over the group axis, parallel/train_step.make_fused_accum_step)
    # and ONE optimizer update — the reference's accumulate-then-step loop
    # (core/tools/train.py:66-94) with the G forwards sharing every op's
    # lane tiles. A ragged final group (epoch end, or a shape-changing
    # padded tail batch) runs as a smaller group: the update averages over
    # the groups it has (the reference instead carries a partial
    # accumulator across epochs — PARITY.md).
    fused_fn, accum_k = fused_step if fused_step else (None, 1)

    def flush_group(fn, with_true_bs):
        """Stack the queued batches, run ONE grouped executable, and feed
        the per-element results through after_step (shared by the fused
        and the scanned multi-step paths)."""
        nonlocal state
        if not pending:
            return
        step_start = time.perf_counter()
        batches = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[p[0] for p in pending]
        )
        targetss = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[p[1] for p in pending]
        )
        args = (state, batches, targetss, rng, epoch_dev)
        if with_true_bs:
            args += ([p[2] for p in pending],)
        state, losses, predss = fn(*args)
        per = (time.perf_counter() - step_start) / len(pending)
        for i, (_, tgt, b) in enumerate(pending):
            loss_i, preds_i = jax.tree.map(lambda x: x[i], (losses, predss))
            after_step(loss_i, preds_i, tgt, b, per)
        pending.clear()

    def drain_sequential():
        nonlocal state
        for qbatch, qtargets, qbs in pending:
            step_start = time.perf_counter()
            state, loss, preds = step_fn(
                state, qbatch, qtargets, rng, epoch_dev, qbs
            )
            after_step(
                loss, preds, qtargets, qbs, time.perf_counter() - step_start
            )
        pending.clear()

    loader.set_epoch(epoch)
    for batch, targets, meta in loader:
        bs = int(meta["batch_size"])
        rows = next(v.shape[0] for v in batch.values() if hasattr(v, "shape"))
        if fused_fn is not None:
            if pending and rows != next(
                v.shape[0] for v in pending[0][0].values()
                if hasattr(v, "shape")
            ):
                # shape change (padded tail): close the group
                flush_group(fused_fn, with_true_bs=True)
            pending.append((batch, targets, bs))
            if len(pending) == accum_k:
                flush_group(fused_fn, with_true_bs=True)
            continue
        if multi_fn is not None and bs == rows:
            if pending and rows != next(
                v.shape[0] for v in pending[0][0].values()
                if hasattr(v, "shape")
            ):
                # smaller-but-unpadded tail (batch % mesh == 0): it cannot
                # stack with the open group — drain that group first
                drain_sequential()
            pending.append((batch, targets, bs))
            if len(pending) == group_len:
                flush_group(multi_fn, with_true_bs=False)
            continue
        # ragged batch (or multi-step disabled): drain any queued full
        # batches one by one, then run this one through the dispatcher
        drain_sequential()
        step_start = time.perf_counter()
        state, loss, preds = step_fn(
            state, batch, targets, rng, epoch_dev, bs
        )
        after_step(loss, preds, targets, bs, time.perf_counter() - step_start)

    if fused_fn is not None:
        flush_group(fused_fn, with_true_bs=True)  # ragged final group
    else:
        drain_sequential()

    if profiling:
        jax.profiler.stop_trace()
    train_loss, _, _ = metric.compute()
    # metric.compute() reads the device accumulators back, so the wall
    # below covers loader + H2D + every dispatched step to COMPLETION —
    # the honest end-to-end rate (per-step walls are dispatch times on
    # the async runtime and mean nothing alone). First epoch includes
    # the compile.
    wall = time.perf_counter() - epoch_start
    if clips_done and wall > 0:
        logger.info(
            "Train epoch throughput: {:.2f} clips/s ({} clips in {:.1f} s, "
            "loader in loop, synced by the metric readback)".format(
                clips_done / wall, clips_done, wall
            )
        )
    return state, train_loss


def validate(cfg, state, eval_fn, loader, epoch, logger):
    no_batches = max(len(loader), 1)
    metric = Metric(cfg, no_batches)

    for batch, targets, meta in loader:
        loss, preds = eval_fn(
            state, batch, targets, jnp.asarray(epoch),
            int(meta["batch_size"]),
        )
        metric.update(preds, targets, loss, batch_size=meta["batch_size"])

    return metric.compute()


def run_trainer(cfg, logger, modality, writer=None):
    epochs = int(cfg.train.epochs)

    logger.info("Initializing model...")
    maybe_initialize_distributed(cfg)
    _check_grouped_dispatch_single_host(cfg)
    mesh = make_mesh(cfg)
    logger.info(
        f"Mesh: {mesh.shape} over {mesh.size} device(s), "
        f"{jax.process_count()} host(s)"
    )

    model, spec = build_model(cfg, modality)
    device_put = _device_put_factory(mesh)

    # The loader pads to the mesh size and device_puts in its producer
    # thread, overlapping H2D transfer with device compute.
    train_loader = create_dataloader(
        cfg, modality, mode="train", device_put=device_put, pad_to=mesh.size
    )
    val_loader = create_dataloader(
        cfg, modality, mode="val", device_put=device_put, pad_to=mesh.size
    )

    # Initialize from one synchronously assembled probe batch (padded /
    # packed / device_put exactly like the producer's output, but without
    # spinning the prefetch pipeline, which would decode-and-discard
    # ``prefetch`` batches and re-decode batch 0 on the real first epoch)
    probe_batch, _, _ = train_loader.probe_batch()
    probe_batch = jax.tree.map(jnp.asarray, probe_batch)

    rng = jax.random.key(int(cfg.data.manual_seed))
    variables = init_variables(model, probe_batch, rng)
    params = variables["params"]

    # Pretrained tower weights
    from ..models.builder import load_pretrained_towers

    params, batch_stats = load_pretrained_towers(
        cfg, modality, params, variables.get("batch_stats", {}), logger
    )

    # Fused gradient accumulation (vmap over the micro-batch group inside
    # one program + one raw-optimizer update) replaces the MultiSteps wrap
    # when accumulation is on — see parallel/train_step.make_fused_accum_step.
    accum_k = int(cfg.train.optim.accumulator_step)
    fuse_accum = bool(cfg.get_path("tpu.fuse_accum", False)) and accum_k > 1
    tx, _ = build_optimizer(cfg, params, modality, accumulate=not fuse_accum)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
    logger.info("Model initialized.")

    start_epoch = 0
    train_loss_hist: List = []
    val_loss_hist: List = []
    # track every accuracy Metric reports — incl. the combined "all_class"
    # (multi-head only), which is also the best-checkpoint ranking metric
    val_acc_hist: Dict[str, List] = {k: [] for k in cfg.model.num_classes.keys()}
    if len(cfg.model.num_classes) > 1:
        val_acc_hist["all_class"] = []

    checkpoint_name = "tbn_{}_{}".format(cfg.model.arch, "_".join(modality))
    if cfg.data.dataset:
        checkpoint_name = "_".join([cfg.data.dataset, checkpoint_name])
    checkpoint = os.path.join(
        cfg.out_dir, cfg.model.checkpoint_dir, cfg.exp_name, checkpoint_name
    )

    if cfg.train.pre_trained:
        logger.info("Loading pre-trained state...")
        state, history = restore_checkpoint(cfg.train.pre_trained, state)
        start_epoch = int(history.get("epoch", -1)) + 1
        epochs += start_epoch  # reference semantics: resume extends epochs
        train_loss_hist = history.get("train_loss", [])
        val_loss_hist = history.get("validation_loss", [])
        restored_acc = history.get("validation_accuracy", val_acc_hist)
        # checkpoints from before all_class tracking: backfill with None so
        # the per-epoch append keeps every curve the same length
        for key in val_acc_hist:
            if key not in restored_acc:
                depth = max((len(v) for v in restored_acc.values()), default=0)
                restored_acc[key] = [None] * depth
        val_acc_hist = restored_acc
        logger.info(f"Model will continue training from epoch no {start_epoch + 1}")

    fused_step = None
    if fuse_accum:
        from ..parallel.train_step import make_fused_accum_step

        fused_step = (make_fused_accum_step(model, tx, cfg, mesh), accum_k)
        # every batch goes through the fused path; the per-batch step below
        # stays for the eval/ragged plumbing but is not hit in training
    train_step = make_train_step(model, tx, cfg, mesh)
    steps_per_call = int(cfg.get_path("tpu.steps_per_call", 1) or 1)
    multi_step = None
    if steps_per_call > 1 and not fuse_accum:
        multi_step = (
            make_multi_train_step(model, tx, cfg, mesh, steps=steps_per_call),
            steps_per_call,
        )
    elif steps_per_call > 1:
        logger.warning(
            "tpu.steps_per_call is ignored when tpu.fuse_accum is enabled: "
            "each fused accumulation group dispatches individually. (The "
            "composed kernel exists as parallel/train_step."
            "make_multi_fused_step — see benchmarks/train_bench.py — but "
            "fuse_accum measured slower than sequential dispatch on v5e, "
            "so the trainer does not wire the combination.)"
        )
    eval_step = make_eval_step(model, cfg, mesh)
    # best-checkpoint threshold survives resume: re-seed from the restored
    # ranking-metric history so a worse post-resume epoch cannot overwrite
    # the pre-resume best
    rank_key = (
        "all_class" if len(cfg.model.num_classes) > 1
        else next(iter(cfg.model.num_classes))
    )
    seen_best = [
        acc[0] for acc in (val_acc_hist.get(rank_key) or []) if acc
    ]
    best_acc = max(seen_best) if seen_best else float("-inf")

    plotter = Plotter(writer)
    plotter.add_config(cfg)

    logger.info("Training in progress...")
    start_time = time.time()

    for epoch in range(start_epoch, epochs):
        epoch_start = time.time()
        lr = lr_at_epoch(cfg, epoch)
        set_learning_rate(state.opt_state, lr)

        no_batches = max(len(train_loader), 1)
        metric = Metric(cfg, no_batches)
        state, train_loss = train_one_epoch(
            cfg, state, train_step, train_loader, metric, epoch,
            jax.random.fold_in(rng, epoch), logger,
            run_dir=cfg.get_path("run_dir"),
            multi_step=multi_step,
            fused_step=fused_step,
        )
        train_loss_hist.append(train_loss)

        if cfg.val.enable:
            logger.info("Validation in progress...")
            val_loss, val_acc, conf_mat = validate(
                cfg, state, eval_step, val_loader, epoch, logger
            )
            val_loss_hist.append(val_loss)
            for key in val_acc_hist:
                val_acc_hist[key].append(val_acc.get(key))
        else:
            val_loss, val_acc, conf_mat = None, None, None

        save_checkpoint(
            checkpoint,
            state,
            epoch,
            train_loss_hist,
            val_loss_hist,
            val_acc_hist,
            conf_mat,
        )
        # best-accuracy checkpoint (the reference has this commented out,
        # train.py:297-310; opt-in here via train.save_best)
        # rank by combined accuracy when multi-head ("all_class" exists only
        # then); a single-head config falls back to its one head, whatever
        # it is named (num_classes is an arbitrary mapping per CONFIG.md).
        cur_acc = (
            val_acc["all_class"] if val_acc and "all_class" in val_acc
            else next(iter(val_acc.values())) if val_acc else None
        )
        if (
            cfg.get_path("train.save_best", False)
            and cfg.val.enable
            and cur_acc is not None
            and cur_acc[0] > best_acc
        ):
            best_acc = cur_acc[0]
            save_checkpoint(
                checkpoint + "_best",
                state,
                epoch,
                train_loss_hist,
                val_loss_hist,
                val_acc_hist,
                conf_mat,
            )

        plotter.plot_scalar(lr, epoch, "train/learning_rate")
        for key, value in train_loss.items():
            plotter.plot_scalar(value, epoch, f"train/{key}_loss")
            if cfg.val.enable and val_loss is not None and key in val_loss:
                plotter.plot_scalar(val_loss[key], epoch, f"val/{key}_loss")
        if cfg.val.enable and val_acc:
            for cls, accs in val_acc.items():
                for k_idx, acc in enumerate(accs):
                    plotter.plot_scalar(
                        acc, epoch, f"val/accuracy/{cls}_top_{cfg.val.topk[k_idx]}"
                    )

        hours, minutes, seconds = get_time_diff(epoch_start, time.time())
        logger.info("-" * 58)
        logger.info(f"Epoch: [{epoch + 1}/{epochs}] || Learning Rate: {lr}")
        logger.info(f"Train_loss: {train_loss}")
        logger.info(f"Val_Loss: {val_loss}")
        logger.info(f"Epoch Time: {hours} hours, {minutes} minutes, {seconds} seconds")
        logger.info(f"Accuracy Top {cfg.val.topk}:")
        logger.info(json.dumps(val_acc, indent=2))
        logger.info("-" * 58)

    wait_until_finished()  # last async checkpoint becomes durable
    hours, minutes, seconds = get_time_diff(start_time, time.time())
    logger.info(
        f"Training completed. Total time taken: {hours} hours, "
        f"{minutes} minutes, {seconds} seconds"
    )
    return state
