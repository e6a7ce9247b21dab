"""Checkpoint save / resume via Orbax (+ JSON history sidecars).

The reference saves a .pth dict every epoch — model/optimizer/scheduler
state, epoch index and metric histories (reference core/utils/misc.py:56-112)
— and resumes by *extending* total epochs (train.py:219-236). Here the train
state pytree (params, batch_stats, optimizer state, step) is saved with
Orbax (async-capable, preemption-safe) and the histories go to a JSON
sidecar; reference .pth checkpoints are importable via models/convert.py.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _history_path(path: str) -> str:
    return path.rstrip("/") + ".history.json"


def save_checkpoint(
    path: str,
    state,
    epoch: int,
    train_loss_hist=None,
    val_loss_hist=None,
    val_acc_hist=None,
    conf_mat: Optional[Dict[str, np.ndarray]] = None,
) -> None:
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    checkpointer = ocp.StandardCheckpointer()
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    checkpointer.save(path, state)
    checkpointer.wait_until_finished()

    history = {
        "epoch": int(epoch),
        "train_loss": train_loss_hist or [],
        "validation_loss": val_loss_hist or [],
        "validation_accuracy": val_acc_hist or {},
    }
    if conf_mat:
        history["conf_mat"] = {k: np.asarray(v).tolist() for k, v in conf_mat.items()}
    with open(_history_path(path), "w") as handle:
        json.dump(history, handle)


def restore_for_eval(path: str) -> Tuple[Dict, Dict, Dict]:
    """Template-free restore for inference: (params, batch_stats, history).

    Restores the raw pytree (optimizer state included but returned as plain
    containers and ignored), so evaluation doesn't need to reconstruct the
    optimizer to match the saved structure.
    """
    path = os.path.abspath(path)
    checkpointer = ocp.StandardCheckpointer()
    tree = checkpointer.restore(path)
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
