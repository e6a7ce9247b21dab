"""The evaluation / challenge-submission driver.

Re-implements reference core/tools/test.py: loads a checkpoint (required),
iterates over one or more annotation files (labeled validation or unlabeled
S1/S2 test CSVs), computes metrics when labels exist, and optionally dumps
the Epic-Kitchens challenge JSON.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import VideoDataset
from ..data.loader import DataLoader, visual_packing_enabled
from ..data.records import read_vid_list, resolve_vid_list_path
from ..models.builder import build_model
from ..parallel.mesh import make_mesh, maybe_initialize_distributed
from ..parallel.train_step import TrainState, make_eval_step, make_infer_step
from ..utils.metrics import Metric
from ..utils.misc import get_time_diff, save_scores
from .train import _device_put_factory


def load_state(cfg, logger) -> TrainState:
    """Eval-state restore from ``test.pre_trained``: a reference ``.pth``
    (via the weight converter, reference test.py:120-132) or an Orbax
    checkpoint directory."""
    if not cfg.test.pre_trained:
        raise ValueError(
            "No pre-trained weights exist. Please set the pre_trained "
            "parameter for test in config file."
        )
    logger.info(f"Loading pre-trained weights {cfg.test.pre_trained}...")
    if cfg.test.pre_trained.endswith(".pth"):
        # torch checkpoint from the reference framework
        from ..models.convert import convert_tbn_checkpoint, load_torch_file

        sd = load_torch_file(cfg.test.pre_trained)
        params, batch_stats = convert_tbn_checkpoint(
            sd, arch=cfg.model.arch, vgg_type=str(cfg.model.vgg.type)
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=(),
        )
    else:
        from ..utils.checkpoint import restore_for_eval

        params, batch_stats, _ = restore_for_eval(cfg.test.pre_trained)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=jax.tree.map(jnp.asarray, params),
            batch_stats=jax.tree.map(jnp.asarray, batch_stats),
            opt_state=(),
        )
    logger.info("Done.")
    return state


def run_tester(cfg, logger, modality, state: Optional[TrainState] = None):
    maybe_initialize_distributed(cfg)
    mesh = make_mesh(cfg)
    model, spec = build_model(cfg, modality)
    device_put = _device_put_factory(mesh)
    n_devices = mesh.size

    if state is None:
        state = load_state(cfg, logger)

    eval_step = make_eval_step(model, cfg, mesh)
    infer_step = make_infer_step(model, mesh)

    annotation_files = cfg.test.annotation_file
    if isinstance(annotation_files, str):
        annotation_files = [annotation_files]
    logger.info(f"No of files to test: {len(annotation_files)}")

    if cfg.test.save_results:
        assert len(annotation_files) == len(cfg.test.results_file), (
            f"Number of annotations files to test ({len(annotation_files)}) and "
            f"number of result files ({len(cfg.test.results_file)}) do not match"
        )

    start_time = time.time()
    all_results = []

    for idx, annotation in enumerate(annotation_files):
        vid_list = None
        if cfg.test.vid_list:
            vid_list = read_vid_list(resolve_vid_list_path(cfg.test.vid_list))

        logger.info(f"Creating the dataset using {annotation}...")
        dataset = VideoDataset(cfg, vid_list, annotation, modality, mode="test")
        loader = DataLoader(
            dataset,
            batch_size=int(cfg.test.batch_size),
            shuffle=False,
            num_workers=int(cfg.num_workers),
            device_put=device_put,
            pad_to=n_devices,
            # multi-host: each host decodes only its slice of the global
            # batch (matches _device_put_factory's global-array assembly)
            shard=(
                (jax.process_index(), jax.process_count())
                if jax.process_count() > 1
                else None
            ),
            pack_visual=visual_packing_enabled(cfg),
        )
        logger.info(f"{len(dataset)} action segments to be processed.")
        logger.info("Inference in progress...")

        no_batches = max(round(len(dataset) / loader.batch_size), 1)
        metric = Metric(cfg, no_batches)
        labeled = False
        output = {"action_id": []}
        for key in cfg.model.num_classes.keys():
            output[key] = []

        sweep_start = time.perf_counter()
        first_done = first_clips = None
        clips_done = 0
        for batch, targets, meta in loader:
            true_bs = meta["batch_size"]
            clips_done += int(true_bs)
            if targets["class"] is not None:
                labeled = True
                loss, preds = eval_step(
                    state, batch, targets, jnp.asarray(0), int(true_bs)
                )
                metric.update(preds, targets, loss, batch_size=true_bs)
            else:
                preds = infer_step(state, batch)
            if first_done is None:
                # force the first batch to completion (a readback — on the
                # tunneled platform block_until_ready returns early) so the
                # sustained rate below excludes the compile
                _ = float(np.asarray(next(iter(preds.values()))).sum())
                first_done, first_clips = time.perf_counter(), clips_done

            if cfg.test.save_results:
                # GLOBAL uid order, derived from the loader's pre-shard
                # index list: identical on every host (multi-host shards
                # hold only local uid slices in meta["uid"], but preds are
                # the replicated global batch — reference misc.py:115-165
                # never faced this because it never sharded).
                uids = [
                    dataset.record(int(i)).action_id
                    for i in meta["global_indices"][:true_bs]
                ]
                output["action_id"].append(np.asarray(uids))
                for key in cfg.model.num_classes.keys():
                    output[key].append(np.asarray(preds[key])[:true_bs])

        if clips_done:
            # close the dispatch chain with one readback, then report the
            # loader-in-the-loop rate (overall incl. compile; sustained
            # excludes the first batch)
            _ = float(np.asarray(next(iter(preds.values()))).sum())
            end = time.perf_counter()
            wall = end - sweep_start
            msg = (
                f"Inference throughput: {clips_done / wall:.2f} clips/s "
                f"({clips_done} clips in {wall:.1f} s incl. compile"
            )
            if first_done is not None and clips_done > first_clips and end > first_done:
                sustained = (clips_done - first_clips) / (end - first_done)
                msg += f"; sustained {sustained:.2f} clips/s excl. first batch"
            logger.info(msg + ")")

        if labeled:
            test_loss, test_acc, conf_mat = metric.compute()
            logger.info(f"Test_Loss: {test_loss}")
            logger.info(f"Accuracy Top {cfg.val.topk}:")
            logger.info(json.dumps(test_acc, indent=2))
            all_results.append((test_loss, test_acc, conf_mat))
        else:
            all_results.append(None)

        if cfg.test.save_results and jax.process_index() == 0:
            # primary-host gate: every process holds the same global
            # results; only one writes the file (matches the checkpoint
            # writer's _is_primary_host gating, utils/checkpoint.py)
            out_dir = cfg.out_dir or "."
            out_file = os.path.join(out_dir, "inferences", cfg.test.results_file[idx])
            action_names = None
            names_path = os.path.join(
                cfg.data_dir, "annotations", "action_id_to_name.pkl"
            )
            if os.path.exists(names_path):
                import pandas as pd

                action_names = pd.read_pickle(names_path)
            try:
                save_scores(output, out_file, action_names)
                logger.info(f"Saved results to {out_file}")
            except Exception as exc:  # noqa: BLE001 — mirror reference resilience
                logger.exception(exc)

    hours, minutes, seconds = get_time_diff(start_time, time.time())
    logger.info(f"Inference time: {hours} hours, {minutes} minutes, {seconds} seconds")
    return all_results

