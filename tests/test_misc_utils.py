"""save_scores challenge JSON and loader device_put coverage."""

import json

import numpy as np

from attention_based_tbn_tpu.utils.misc import get_modality, get_time_diff, save_scores


class TestSaveScores:
    def test_challenge_json_with_action_head(self, tmp_path):
        rng = np.random.default_rng(0)
        scores = {
            "action_id": [np.asarray([3, 7]), np.asarray([9])],
            "verb": [rng.standard_normal((2, 5)), rng.standard_normal((1, 5))],
            "noun": [rng.standard_normal((2, 4)), rng.standard_normal((1, 4))],
            "action": [rng.standard_normal((2, 200)), rng.standard_normal((1, 200))],
        }
        names = {i: f"act{i}" for i in range(200)}
        out = tmp_path / "sub" / "result.json"
        save_scores(scores, str(out), action_names=names, top_actions=100)

        payload = json.loads(out.read_text())
        assert payload["version"] == "0.1"
        assert payload["challenge"] == "action_recognition"
        assert set(payload["results"].keys()) == {"3", "7", "9"}
        entry = payload["results"]["3"]
        assert len(entry["verb"]) == 5
        assert len(entry["action"]) == 100  # top-100 only
        assert all(k.startswith("act") for k in entry["action"])

    def test_without_action_names(self, tmp_path):
        scores = {
            "action_id": [np.asarray([1])],
            "verb": [np.asarray([[0.2, 0.8]])],
        }
        out = tmp_path / "r.json"
        save_scores(scores, str(out))
        payload = json.loads(out.read_text())
        assert payload["results"]["1"]["verb"]["1"] > payload["results"]["1"]["verb"]["0"]


def test_get_modality_order():
    from attention_based_tbn_tpu.config import load_config

    cfg = load_config()
    assert get_modality(cfg) == ["RGB", "Flow", "Audio"]
    cfg = load_config(overrides=["data.rgb.enable=False"])
    assert get_modality(cfg) == ["Flow", "Audio"]


def test_get_time_diff():
    assert get_time_diff(0, 3723) == (1, 2, 3)


def test_loader_device_put(tmp_path):
    from attention_based_tbn_tpu.config import load_config
    from attention_based_tbn_tpu.data import synthetic
    from attention_based_tbn_tpu.data.dataset import VideoDataset
    from attention_based_tbn_tpu.data.loader import DataLoader

    import jax.numpy as jnp

    videos = synthetic.generate(
        str(tmp_path), videos=["P01_01"], frames_per_video=40,
        num_verbs=3, num_nouns=3,
    )
    cfg = load_config(
        overrides=[
            f"data_dir={tmp_path}",
            "data.flow.enable=False",
            "data.audio.enable=False",
            "model.attention.enable=False",
            "train.num_segments=2",
        ]
    )
    ds = VideoDataset(cfg, videos, "annotations/epic_train_val.csv", ["RGB"],
                      mode="train")

    def to_device(tree):
        import jax

        return jax.tree.map(
            lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree
        )

    loader = DataLoader(ds, batch_size=3, num_workers=1, device_put=to_device)
    batch, targets, meta = next(iter(loader))
    assert isinstance(batch["RGB"], jnp.ndarray)
    assert isinstance(targets["class"]["verb"], jnp.ndarray)
