"""Attention-weight visualization (offline matplotlib).

Re-implements reference core/tools/vis.py + Visualize.ipynb without the
qgrid/moviepy interactivity: load a checkpoint, build an action-filtered
dataset, sweep it to tabulate ground truth / predictions / attention
entropy, and render per-sample grids (RGB frames, spectrograms, attention
curves, class-score bars) to PNG.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import ConfigNode, load_config
from ..data.dataset import VideoDataset
from ..data.loader import collate
from ..models.builder import build_model
from ..parallel.train_step import TrainState, make_infer_step


def initialize(
    config_path_or_overrides=None,
    checkpoint: Optional[str] = None,
    config_name: str = "config_vis",
):
    """(cfg, model, state): load config + checkpoint for visualization
    (reference vis.py:314-364). Defaults to the first-class vis config
    entry point ``config_vis`` (the reference's config/config_vis.yaml:
    3 segments, batch 1); pass ``config_name="config"`` for the main one."""
    if isinstance(config_path_or_overrides, (list, tuple)):
        cfg = load_config(
            overrides=config_path_or_overrides, config_name=config_name
        )
    elif isinstance(config_path_or_overrides, ConfigNode):
        cfg = config_path_or_overrides
    else:
        cfg = load_config(config_name=config_name)

    from ..utils.misc import get_modality

    modality = get_modality(cfg)
    model, spec = build_model(cfg, modality)

    checkpoint = checkpoint or cfg.get_path("test.pre_trained", "")
    state = None
    if checkpoint:
        if checkpoint.endswith(".pth"):
            from ..models.convert import convert_tbn_checkpoint, load_torch_file

            params, batch_stats = convert_tbn_checkpoint(
                load_torch_file(checkpoint),
                arch=cfg.model.arch,
                vgg_type=str(cfg.model.vgg.type),
            )
            state = TrainState(
                step=jnp.zeros((), jnp.int32),
                params=params,
                batch_stats=batch_stats,
                opt_state=(),
            )
        else:
            # template-free Orbax restore, same path as tools.test.load_state
            from ..utils.checkpoint import restore_for_eval

            params, batch_stats, _ = restore_for_eval(checkpoint)
            state = TrainState(
                step=jnp.zeros((), jnp.int32),
                params=jax.tree.map(jnp.asarray, params),
                batch_stats=jax.tree.map(jnp.asarray, batch_stats),
                opt_state=(),
            )
    return cfg, model, modality, state


def create_dataset(cfg, modality, action_list=None, annotation_file=None):
    """Action-filtered eval dataset (reference vis.py:240-311)."""
    annotation_file = annotation_file or cfg.train.annotation_file
    vid_list = None
    if cfg.get_path("val.vid_list"):
        from ..data.records import read_vid_list, resolve_vid_list_path

        vid_list = read_vid_list(resolve_vid_list_path(cfg.val.vid_list))
    return VideoDataset(
        cfg, vid_list, annotation_file, modality, mode="test", action_list=action_list
    )


def get_info(
    cfg, model, state, dataset, max_samples: Optional[int] = None, epic_classes=None
):
    """Full no-grad sweep building the summary table (reference vis.py:30-93):
    one row per sample with gt/pred classes and attention entropy.

    ``epic_classes`` (an :class:`~..data.classes.EpicClasses`) additionally
    maps class ids to names — ``gt_verb_name``/``pred_verb_name`` columns,
    the reference table's presentation (vis.py:69-79 shows names only)."""
    infer = make_infer_step(model)
    name_tables = {}
    if epic_classes is not None:
        name_tables = {"verb": epic_classes.verbs, "noun": epic_classes.nouns}
    rows: List[Dict] = []
    n = len(dataset) if max_samples is None else min(len(dataset), max_samples)
    for index in range(n):
        sample = dataset.sample(index)
        batch, targets, meta = collate([sample])
        batch = jax.tree.map(jnp.asarray, batch)
        preds = infer(state, batch)

        row = {"uid": meta["uid"][0], "vid_id": meta["vid_id"][0]}
        for key in cfg.model.num_classes.keys():
            scores = np.asarray(preds[key])[0]
            row[f"pred_{key}"] = int(scores.argmax())
            if targets["class"] is not None:
                row[f"gt_{key}"] = int(targets["class"][key][0])
            names = name_tables.get(key)
            if names:
                row[f"pred_{key}_name"] = names[row[f"pred_{key}"]]
                if f"gt_{key}" in row:
                    row[f"gt_{key}_name"] = names[row[f"gt_{key}"]]
        if "weights" in preds:
            # the reference's exact entropy: -(w * log(w + 1e-6)).sum(1).mean()
            # on the raw softmax weights (vis.py:80-86) — NOT a renormalized
            # distribution; w rows already sum to 1
            wts = np.asarray(preds["weights"], np.float32).reshape(
                -1, preds["weights"].shape[-1]
            )
            row["attn_entropy"] = float(
                -(wts * np.log(wts + 1e-6)).sum(-1).mean()
            )
        rows.append(row)
    return rows


def save_action_segment(
    data_dir: str,
    vid_id: str,
    start_time,
    stop_time,
    out_path: str = "results/temp.MP4",
    fps: float = 60.0,
    rgb_prefix: str = "links",
):
    """Trim the action's clip to ``out_path`` (reference vis.py:96-114 used
    moviepy; this is a dependency-light rewrite). Sources, in order:

    * ``<data_dir>/vid_symlinks/<vid_id>.MP4`` via cv2.VideoCapture;
    * the frame directory ``<data_dir>/<rgb_prefix>/<vid_id>/img_*.jpg``
      (0-indexed, as laid out by preprocessing/create_symlinks.py —
    ``rgb_prefix`` is ``cfg.data.rgb.dir_prefix``).

    Falls back to an animated GIF (PIL) when cv2's mp4 encoder is
    unavailable. Returns the written path.
    """
    import cv2

    def _to_seconds(value) -> float:
        if isinstance(value, (int, float)):
            return float(value)
        parts = [float(p) for p in str(value).split(":")]
        return sum(p * 60.0**i for i, p in enumerate(reversed(parts)))

    start_s, stop_s = _to_seconds(start_time), _to_seconds(stop_time)

    frames = []
    vid_file = os.path.join(data_dir, "vid_symlinks", f"{vid_id}.MP4")
    if os.path.exists(vid_file):
        cap = cv2.VideoCapture(vid_file)
        src_fps = cap.get(cv2.CAP_PROP_FPS) or fps
        cap.set(cv2.CAP_PROP_POS_MSEC, start_s * 1000.0)
        while cap.isOpened():
            ok, frame = cap.read()
            if not ok or cap.get(cv2.CAP_PROP_POS_MSEC) > stop_s * 1000.0:
                break
            frames.append(frame)
        cap.release()
        fps = src_fps
    else:
        frame_dir = os.path.join(data_dir, rgb_prefix, vid_id)
        first = int(start_s * fps)
        last = int(stop_s * fps)
        for i in range(first, last + 1):
            path = os.path.join(frame_dir, f"img_{i:010d}.jpg")
            if os.path.exists(path):
                frame = cv2.imread(path)
                if frame is None:  # zero-byte / corrupt JPEG
                    continue
                frames.append(frame)
    if not frames:
        raise FileNotFoundError(
            f"no video source for {vid_id} under {data_dir} "
            "(vid_symlinks/*.MP4 or rgb frame dir)"
        )

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    h, w = frames[0].shape[:2]
    writer = cv2.VideoWriter(
        out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    if writer.isOpened():
        for frame in frames:
            writer.write(frame)
        writer.release()
        if os.path.getsize(out_path) > 0:
            return out_path
    # GIF fallback (no mp4 encoder in this cv2 build)
    from PIL import Image

    gif_path = os.path.splitext(out_path)[0] + ".gif"
    images = [Image.fromarray(f[..., ::-1]) for f in frames]  # BGR -> RGB
    images[0].save(
        gif_path,
        save_all=True,
        append_images=images[1:],
        duration=int(1000.0 / fps),
        loop=0,
    )
    return gif_path


def visualize(
    cfg,
    model,
    state,
    dataset,
    index: int,
    out_path: str = "results/vis.png",
    save_clip: bool = False,
):
    """Render one sample: RGB frames / spectrograms / attention curves /
    class bars -> PNG (reference vis.py:96-237)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..ops.spectrogram import spectrogram as spec_fn

    sample = dataset.sample(index)
    batch, targets, meta = collate([sample])
    batch_j = jax.tree.map(jnp.asarray, batch)
    preds = make_infer_step(model)(state, batch_j)

    n_seg = sample["RGB"].shape[0] if "RGB" in sample else sample["Audio"].shape[0]
    n_rows = sum(k in sample for k in ("RGB", "Audio")) + (
        1 if "weights" in preds else 0
    ) + 1
    fig, axes = plt.subplots(
        n_rows, n_seg, figsize=(3 * n_seg, 3 * n_rows), squeeze=False
    )
    row = 0
    if "RGB" in sample:
        for seg in range(n_seg):
            axes[row][seg].imshow(sample["RGB"][seg][..., ::-1])  # BGR -> RGB
            axes[row][seg].set_title(f"segment {seg}")
            axes[row][seg].axis("off")
        row += 1
    if "Audio" in sample:
        specs = np.asarray(spec_fn(jnp.asarray(sample["Audio"])))
        for seg in range(n_seg):
            axes[row][seg].imshow(specs[seg], aspect="auto", origin="lower")
            axes[row][seg].axis("off")
        row += 1
    if "weights" in preds:
        wts = np.asarray(preds["weights"]).reshape(n_seg, -1)
        for seg in range(n_seg):
            axes[row][seg].plot(wts[seg])
            axes[row][seg].set_ylim(0, 1)
        row += 1
    for col, key in enumerate(cfg.model.num_classes.keys()):
        if col >= n_seg:
            break
        scores = np.asarray(preds[key])[0]
        top = np.argsort(scores)[::-1][:5]
        axes[row][col].bar([str(i) for i in top], scores[top])
        axes[row][col].set_title(key)

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=80)
    plt.close(fig)

    if save_clip:
        # the reference also writes the trimmed action clip (vis.py:96-237)
        clip_path = os.path.join(
            os.path.dirname(os.path.abspath(out_path)), "temp.MP4"
        )
        save_action_segment(
            cfg.data_dir,
            meta["vid_id"][0],
            meta["start_time"][0],
            meta["stop_time"][0],
            out_path=clip_path,
            fps=float(cfg.data.vid_fps),
            rgb_prefix=cfg.data.rgb.dir_prefix,
        )
    return out_path
