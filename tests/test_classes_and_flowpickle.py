"""EpicClasses metadata and the flow-pickle dataset path."""

import os

import numpy as np
import pandas as pd
import pytest

from attention_based_tbn_tpu.config import load_config
from attention_based_tbn_tpu.data import synthetic
from attention_based_tbn_tpu.data.classes import EpicClasses
from attention_based_tbn_tpu.data.dataset import VideoDataset


class TestEpicClasses:
    @pytest.fixture
    def ann_dir(self, tmp_path):
        pd.DataFrame(
            {
                "verb_id": [0, 1, 2],
                "class_key": ["take", "put", "open"],
                "verbs": ["['take', 'grab']", "['put', 'place']", "['open']"],
            }
        ).to_csv(tmp_path / "EPIC_verb_classes.csv", index=False)
        pd.DataFrame(
            {
                "noun_id": [0, 1],
                "class_key": ["door", "cup"],
                "nouns": ["['door']", "['cup', 'mug']"],
            }
        ).to_csv(tmp_path / "EPIC_noun_classes.csv", index=False)
        return str(tmp_path)

    def test_class_key_lists(self, ann_dir):
        """``verbs``/``nouns`` are the class-id-indexed class_key lists the
        reference exposes as properties (epic_class.py:12-18,33-38) and the
        vis table indexes by predicted id (vis.py:69-79)."""
        classes = EpicClasses(ann_dir)
        assert classes.verbs == ["take", "put", "open"]
        assert classes.nouns == ["door", "cup"]
        assert classes.verbs[classes.verb_id("grab")] == "take"

    def test_missing_class_key_raises(self, tmp_path):
        """A csv without class_key must fail loudly on .verbs/.nouns access,
        matching the reference's AttributeError on df.class_key
        (epic_class.py:12-18) rather than silently returning []."""
        pd.DataFrame(
            {"verb_id": [0], "verbs": ["['take']"]}
        ).to_csv(tmp_path / "EPIC_verb_classes.csv", index=False)
        pd.DataFrame(
            {"noun_id": [0], "nouns": ["['door']"]}
        ).to_csv(tmp_path / "EPIC_noun_classes.csv", index=False)
        classes = EpicClasses(str(tmp_path))
        with pytest.raises(AttributeError, match="class_key"):
            classes.verbs
        with pytest.raises(AttributeError, match="class_key"):
            classes.nouns
        # synonym lookup still works without class_key
        assert classes.verb_id("take") == 0

    def test_synonym_lookup(self, ann_dir):
        classes = EpicClasses(ann_dir)
        assert classes.verb_id("take") == 0
        assert classes.verb_id("grab") == 0  # synonym
        assert classes.verb_id("open") == 2
        assert classes.noun_id("mug") == 1
        assert classes.action_id_string("put", "door") == "1,0"


class TestFlowPickle:
    def test_dataset_reads_npz_stacks(self, tmp_path):
        videos = synthetic.generate(
            str(tmp_path), videos=["P01_01"], frames_per_video=60,
            num_verbs=5, num_nouns=5,
        )
        # build npz stacks from the generated x_/y_ jpgs
        from attention_based_tbn_tpu.preprocessing import create_flow_pickle

        create_flow_pickle.main(
            [
                "--in_dir", os.path.join(str(tmp_path), "links"),
                "--out_dir", os.path.join(str(tmp_path), "flow_pickle"),
                "--win_length", "5",
                "--workers", "1",
            ]
        )

        cfg = load_config(
            overrides=[
                f"data_dir={tmp_path}",
                "data.flow.read_flow_pickle=true",
                "data.flow.dir_prefix=flow_pickle",
                "model.attention.enable=False",
                "train.num_segments=2",
            ]
        )
        ds = VideoDataset(
            cfg, videos, "annotations/epic_train_val.csv", ["Flow"], mode="train"
        )
        sample = ds.sample(0, np.random.default_rng(0))
        assert sample["Flow"].shape == (2, 224, 224, 10)
        assert sample["Flow"].dtype == np.uint8

    def test_integrity_failure_raises_and_removes(self, tmp_path, monkeypatch):
        # persistent integrity failure must fail loudly AND not leave the
        # corrupt npz behind for the loader to trip over later
        import pytest

        from attention_based_tbn_tpu.preprocessing import create_flow_pickle

        synthetic.generate(
            str(tmp_path), videos=["P01_01"], frames_per_video=20,
            num_verbs=5, num_nouns=5,
        )
        video_dir = os.path.join(str(tmp_path), "links", "P01_01")
        out_dir = os.path.join(str(tmp_path), "flow_out")
        monkeypatch.setattr(
            create_flow_pickle, "integrity_check", lambda *a: False
        )
        with pytest.raises(IOError, match="integrity"):
            create_flow_pickle.process_video(
                video_dir, out_dir, win_length=5, ext="jpg", retries=2
            )
        assert not [f for f in os.listdir(out_dir) if f.endswith(".npz")]
