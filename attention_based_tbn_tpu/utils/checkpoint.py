"""Checkpoint save / resume via Orbax (+ JSON history sidecars).

The reference saves a .pth dict every epoch — model/optimizer/scheduler
state, epoch index and metric histories (reference core/utils/misc.py:56-112)
— and resumes by *extending* total epochs (train.py:219-236). Here the train
state pytree (params, batch_stats, optimizer state, step) is saved with
Orbax and the histories go to a JSON sidecar; reference .pth checkpoints are
importable via models/convert.py.

Durability model (the reference overwrote one .pth in place — a preemption
mid-save destroyed the only checkpoint):

* every save writes to a fresh ``<path>.tmp-<epoch>`` directory, then
  atomically renames over ``<path>`` (the previous checkpoint is moved
  aside first and deleted only after the rename succeeds);
* saves are asynchronous (ocp.AsyncCheckpointer) — the train loop keeps
  stepping while the previous epoch's state serializes; the handoff
  happens in ``_finalize`` right before the next save / at close.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

_ASYNC: Dict[str, Any] = {"checkpointer": None, "pending": None}


def _history_path(path: str) -> str:
    return path.rstrip("/") + ".history.json"


def _checkpointer() -> ocp.AsyncCheckpointer:
    if _ASYNC["checkpointer"] is None:
        kwargs = {}
        if jax.process_count() > 1:
            # save_checkpoint is multi-host-gated: only process 0 (holding
            # the state as plain host numpy) ever calls save, so orbax must
            # not run its cross-process sync_global_processes barriers —
            # the other processes never join them and the stray collective
            # collides with whatever barrier they reach next (caught by
            # tests/test_multiprocess.py; invisible to in-process mesh
            # tests where process_count()==1 makes the barriers no-ops).
            kwargs["multiprocessing_options"] = ocp.options.MultiprocessingOptions(
                primary_host=0, active_processes={0}
            )
        _ASYNC["checkpointer"] = ocp.AsyncCheckpointer(
            ocp.StandardCheckpointHandler(), **kwargs
        )
    return _ASYNC["checkpointer"]


def _finalize() -> None:
    """Complete the pending async save: wait for durability, then atomically
    swap the tmp dir into place."""
    pending = _ASYNC["pending"]
    if pending is None:
        return
    _ASYNC["pending"] = None
    tmp_path, final_path, history = pending
    _checkpointer().wait_until_finished()
    if not os.path.exists(tmp_path):
        return
    old_path = final_path + ".old"
    if os.path.exists(old_path):
        shutil.rmtree(old_path)
    if os.path.exists(final_path):
        os.rename(final_path, old_path)
    os.rename(tmp_path, final_path)
    if os.path.exists(old_path):
        shutil.rmtree(old_path)
    # history lands only after the checkpoint it describes is durable
    hist_tmp = _history_path(final_path) + ".tmp"
    with open(hist_tmp, "w") as handle:
        json.dump(history, handle)
    os.replace(hist_tmp, _history_path(final_path))


def _is_primary_host() -> bool:
    return jax.process_count() == 1 or jax.process_index() == 0


def _multihost() -> bool:
    return jax.process_count() > 1


def _local_replica(x):
    """Host-numpy copy of this process's replica of a (replicated) global
    array; non-jax leaves pass through."""
    if hasattr(x, "addressable_shards"):
        return np.asarray(x.addressable_shards[0].data)
    return x


def wait_until_finished() -> None:
    """Block until every outstanding save is durable and swapped in."""
    _finalize()


def save_checkpoint(
    path: str,
    state,
    epoch: int,
    train_loss_hist=None,
    val_loss_hist=None,
    val_acc_hist=None,
    conf_mat: Optional[Dict[str, np.ndarray]] = None,
    block: bool = False,
) -> None:
    # Multi-host: the data-parallel state is fully replicated, so process 0
    # alone owns every byte; the other hosts must NOT race it on the shared
    # out_dir (the tmp->final renames in _finalize are per-path and not
    # multi-writer safe). But an Orbax save of the global jax.Arrays
    # themselves is a COLLECTIVE (multihost barriers inside the
    # non-fully-addressable array handlers) — process 0 calling it alone
    # would hang. Every process therefore materializes its LOCAL replica
    # as host numpy (no collectives: replicated arrays have an addressable
    # shard on every host), and only process 0 writes the numpy tree.
    if _multihost():
        state = jax.tree.map(_local_replica, state)
    if not _is_primary_host():
        return
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)

    # finish (and swap in) the previous epoch's save before starting a new
    # one; the previous checkpoint stays intact until this one is durable
    _finalize()

    history = {
        "epoch": int(epoch),
        "train_loss": train_loss_hist or [],
        "validation_loss": val_loss_hist or [],
        "validation_accuracy": val_acc_hist or {},
    }
    if conf_mat:
        history["conf_mat"] = {k: np.asarray(v).tolist() for k, v in conf_mat.items()}

    tmp_path = f"{path}.tmp-{int(epoch)}"
    if os.path.exists(tmp_path):
        shutil.rmtree(tmp_path)
    _checkpointer().save(tmp_path, state)
    _ASYNC["pending"] = (tmp_path, path, history)

    if block:
        _finalize()


def restore_numpy_tree(path: str):
    """Template-free Orbax restore with every leaf as HOST numpy.

    The one orbax-API-version-sensitive incantation (PyTreeCheckpointer +
    item_metadata + per-leaf ``RestoreArgs(restore_type=np.ndarray)``),
    shared by :func:`restore_for_eval` and the serving runtime
    (tools/serve.py). Numpy leaves deliberately drop the SAVED sharding
    metadata so a checkpoint written on one topology (8-device training
    mesh) restores on another (single serving chip).
    """
    path = os.path.abspath(path)
    checkpointer = ocp.PyTreeCheckpointer()
    meta = checkpointer.metadata(path).item_metadata
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta
    )
    return checkpointer.restore(path, restore_args=restore_args)


def restore_for_eval(path: str) -> Tuple[Dict, Dict, Dict]:
    """Template-free restore for inference: (params, batch_stats, history).

    Restores the raw pytree (optimizer state included but returned as plain
    containers and ignored), so evaluation doesn't need to reconstruct the
    optimizer to match the saved structure.

    Leaves come back as host numpy arrays, NOT device arrays with the
    SAVED sharding: a template-free ``StandardCheckpointer.restore``
    replays the checkpoint's device metadata and refuses when the current
    topology differs — which is exactly the serving flow (train on an
    8-device mesh, restore on one chip). Callers feed the tree straight
    into jit'd ``model.apply``, which device-puts for the current
    platform.
    """
    _finalize()
    path = os.path.abspath(path)
    tree = restore_numpy_tree(path)
    params = tree["params"]
    batch_stats = tree.get("batch_stats", {})

    history: Dict = {}
    hist_path = _history_path(path)
    if os.path.exists(hist_path):
        with open(hist_path) as handle:
            history = json.load(handle)
    return params, batch_stats, history


def restore_checkpoint(path: str, abstract_state) -> Tuple[Any, Dict]:
    """Restore (state, history). ``abstract_state`` is a matching pytree
    (e.g. a freshly created TrainState) used as the restore template."""
    _finalize()
    path = os.path.abspath(path)
    checkpointer = ocp.StandardCheckpointer()
    template = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
    state = checkpointer.restore(path, template)

    history: Dict = {}
    hist_path = _history_path(path)
    if os.path.exists(hist_path):
        with open(hist_path) as handle:
            history = json.load(handle)
    return state, history
