"""10-crop eval path: dataset transform + model audio tiling end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from attention_based_tbn_tpu.config import load_config
from attention_based_tbn_tpu.data import synthetic
from attention_based_tbn_tpu.data.dataset import VideoDataset
from attention_based_tbn_tpu.data.loader import collate
from attention_based_tbn_tpu.data.transforms import ten_crop
from attention_based_tbn_tpu.models.tbn import TBNModel, TBNSpec


def test_ten_crop_transform():
    frames = np.random.default_rng(0).integers(0, 255, (3, 96, 120, 3), np.uint8)
    out = ten_crop(frames, 64)
    assert out.shape == (30, 64, 64, 3)
    # flip pairs: even index original, odd index mirrored
    np.testing.assert_array_equal(out[1], out[0][:, ::-1])


@pytest.mark.slow  # ~90 s: full dataset+model e2e on 20-crop batches
def test_ten_crop_dataset_and_model(tmp_path):
    videos = synthetic.generate(
        str(tmp_path), videos=["P01_01"], frames_per_video=60,
        num_verbs=5, num_nouns=5,
    )
    cfg = load_config(
        overrides=[
            f"data_dir={tmp_path}",
            "data.flow.enable=False",
            "data.audio.audio_length=1.279",
            "data.test_scale_size=80",
            "data.test_crop_size=64",
            "model.attention.enable=False",
            "model.num_classes={verb: 5, noun: 5}",
            "test.num_segments=2",
            "test.ten_crop=true",
        ]
    )
    ds = VideoDataset(
        cfg, videos, "annotations/epic_train_val.csv", ["RGB", "Audio"], mode="test"
    )
    sample = ds.sample(0)
    assert sample["RGB"].shape == (20, 64, 64, 3)  # 2 segments x 10 crops
    assert sample["Audio"].shape == (2, int(1.279 * 24000))

    batch, targets, _ = collate([sample])
    batch = jax.tree.map(jnp.asarray, batch)
    spec = TBNSpec.from_config(cfg, ["RGB", "Audio"])
    model = TBNModel(spec)
    rngs = {
        "params": jax.random.key(0),
        "dropout": jax.random.key(1),
        "gumbel": jax.random.key(2),
        "audio_dropout": jax.random.key(3),
    }
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(rngs, batch)
    out = model.apply(variables, batch, train=False)
    assert out["verb"].shape == (1, 5)  # consensus over 20 visual streams
