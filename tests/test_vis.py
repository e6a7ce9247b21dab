"""Visualization tool smoke tests over the synthetic fixture."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from attention_based_tbn_tpu.config import load_config
from attention_based_tbn_tpu.data import synthetic
from attention_based_tbn_tpu.data.dataset import VideoDataset
from attention_based_tbn_tpu.models.builder import build_model
from attention_based_tbn_tpu.parallel.train_step import TrainState
from attention_based_tbn_tpu.tools import vis


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("epic_vis")
    videos = synthetic.generate(
        str(root), videos=["P01_01"], frames_per_video=60,
        num_verbs=7, num_nouns=9,
    )
    cfg = load_config(
        overrides=[
            f"data_dir={root}",
            f"out_dir={root}",
            "data.flow.enable=False",
            "data.audio.audio_length=1.279",
            "data.test_scale_size=80",
            "data.test_crop_size=64",
            "model.num_classes={verb: 7, noun: 9}",
            "model.pretrained=False",
            "test.num_segments=2",
            "num_workers=1",
        ]
    )
    modality = ["RGB", "Audio"]
    model, spec = build_model(cfg, modality)
    dataset = VideoDataset(
        cfg, videos, "annotations/epic_train_val.csv", modality, mode="test"
    )

    from attention_based_tbn_tpu.data.loader import collate

    batch, _, _ = collate([dataset.sample(0)])
    batch = jax.tree.map(jnp.asarray, batch)
    rngs = {
        "params": jax.random.key(0),
        "dropout": jax.random.key(1),
        "gumbel": jax.random.key(2),
        "audio_dropout": jax.random.key(3),
    }
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(rngs, batch)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=(),
    )
    return cfg, model, state, dataset, str(root)


def test_get_info(setup):
    cfg, model, state, dataset, root = setup
    rows = vis.get_info(cfg, model, state, dataset, max_samples=2)
    assert len(rows) == 2
    row = rows[0]
    assert {"uid", "vid_id", "pred_verb", "gt_verb", "pred_noun"} <= set(row)
    assert "attn_entropy" in row  # mha attention on by default
    assert np.isfinite(row["attn_entropy"])


def test_get_info_entropy_matches_reference_expression(setup):
    """attn_entropy must be the reference's exact expression on the raw
    attention weights — ``-(w * log(w + 1e-6)).sum(1).mean()`` (reference
    vis.py:80-86), not a renormalized-distribution entropy. Recomputed here
    through torch on an identical infer pass."""
    torch = pytest.importorskip("torch")
    cfg, model, state, dataset, root = setup
    rows = vis.get_info(cfg, model, state, dataset, max_samples=1)

    from attention_based_tbn_tpu.data.loader import collate
    from attention_based_tbn_tpu.parallel.train_step import make_infer_step

    batch, _, _ = collate([dataset.sample(0)])
    preds = make_infer_step(model)(state, jax.tree.map(jnp.asarray, batch))
    w = torch.from_numpy(
        np.asarray(preds["weights"], np.float32).reshape(
            -1, preds["weights"].shape[-1]
        )
    )
    expected = (-1 * (w * torch.log(w + 1e-6)).sum(1)).mean().item()
    assert rows[0]["attn_entropy"] == pytest.approx(expected, rel=1e-6)


def test_get_info_maps_class_names(setup):
    """With an EpicClasses-like table, get_info adds the name columns the
    reference's qgrid table displays (vis.py:69-79)."""
    cfg, model, state, dataset, root = setup

    class Classes:
        verbs = [f"verb_{i}" for i in range(7)]
        nouns = [f"noun_{i}" for i in range(9)]

    rows = vis.get_info(
        cfg, model, state, dataset, max_samples=1, epic_classes=Classes()
    )
    row = rows[0]
    assert row["pred_verb_name"] == f"verb_{row['pred_verb']}"
    assert row["gt_noun_name"] == f"noun_{row['gt_noun']}"


def test_visualize_renders_png(setup):
    cfg, model, state, dataset, root = setup
    out = vis.visualize(
        cfg, model, state, dataset, 0, out_path=os.path.join(root, "vis.png")
    )
    assert os.path.exists(out)
    assert os.path.getsize(out) > 1000


def test_save_action_segment_from_frames(setup):
    """Clip export (reference vis.py:96-114) from the frame directory."""
    cfg, model, state, dataset, root = setup
    out = vis.save_action_segment(
        cfg.data_dir, "P01_01", 0.1, 0.5,
        out_path=os.path.join(root, "results", "clip.MP4"),
        fps=float(cfg.data.vid_fps),
    )
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_initialize_loads_config_vis_entry_point():
    """initialize() defaults to the first-class ``config_vis`` entry point
    (reference config/config_vis.yaml + vis.py:314-364): composes the main
    groups, applies the vis recipe (3 segments, batch 1, no result dump,
    mha+entropy), and still honors CLI-style overrides."""
    cfg, model, modality, state = vis.initialize(
        ["model.pretrained=False", "data.flow.enable=False"]
    )
    assert cfg.test.num_segments == 3
    assert cfg.test.batch_size == 1
    assert cfg.test.save_results is False
    assert cfg.model.attention.type == "mha"
    assert cfg.model.attention.use_entropy is True
    assert cfg.data.audio.dropout == 0.5
    # override applied: flow dropped from the modality resolution
    assert modality == ["RGB", "Audio"]
    assert state is None  # no checkpoint given
    # the composed groups are the main ones (spot-check a train key)
    assert cfg.train.batch_size > 0


def test_visualize_writes_clip(setup):
    cfg, model, state, dataset, root = setup
    out_png = os.path.join(root, "results", "vis_clip.png")
    vis.visualize(cfg, model, state, dataset, 0, out_path=out_png, save_clip=True)
    results = os.listdir(os.path.dirname(out_png))
    assert any(name.startswith("temp.") for name in results), results
