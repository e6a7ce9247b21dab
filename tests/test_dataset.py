"""End-to-end host pipeline tests over the synthetic fixture dataset."""

import numpy as np
import pytest

from attention_based_tbn_tpu.config import load_config
from attention_based_tbn_tpu.data import synthetic
from attention_based_tbn_tpu.data.dataset import VideoDataset
from attention_based_tbn_tpu.data.loader import DataLoader, collate


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("epic")
    videos = synthetic.generate(str(root), videos=["P01_01", "P02_03"])
    return str(root), videos


def make_cfg(root, **over):
    base = {
        "data_dir": root,
        "out_dir": root,
        "train.num_segments": 3,
        "val.num_segments": 5,
        "data.audio.audio_length": 1.279,
        "model.attention.enable": False,
        "num_workers": 2,
    }
    base.update(over)
    return load_config(overrides=[f"{k}={v}" for k, v in base.items()])


class TestVideoDataset:
    def test_train_sample_shapes(self, fixture_root):
        root, videos = fixture_root
        cfg = make_cfg(root)
        ds = VideoDataset(
            cfg, videos, "annotations/epic_train_val.csv",
            ["RGB", "Flow", "Audio"], mode="train",
        )
        assert len(ds) == 6
        s = ds.sample(0, np.random.default_rng(0))
        assert s["RGB"].shape == (3, 224, 224, 3) and s["RGB"].dtype == np.uint8
        assert s["Flow"].shape == (3, 224, 224, 10) and s["Flow"].dtype == np.uint8
        assert s["Audio"].shape == (3, int(1.279 * 24000))
        assert s["Audio"].dtype == np.float32
        assert set(s["labels"].keys()) == {"verb", "noun"}

    def test_eval_sample_deterministic(self, fixture_root):
        root, videos = fixture_root
        cfg = make_cfg(root)
        ds = VideoDataset(
            cfg, videos, "annotations/epic_train_val.csv", ["RGB"], mode="val"
        )
        a = ds.sample(1)
        b = ds.sample(1)
        np.testing.assert_array_equal(a["RGB"], b["RGB"])
        assert a["RGB"].shape == (5, 224, 224, 3)

    def test_vid_filtering(self, fixture_root):
        root, videos = fixture_root
        cfg = make_cfg(root)
        ds = VideoDataset(
            cfg, [videos[0]], "annotations/epic_train_val.csv", ["RGB"], mode="train"
        )
        assert len(ds) == 3

    def test_fixed_prior_weights(self, fixture_root):
        root, videos = fixture_root
        cfg = make_cfg(
            root,
            **{
                "model.attention.enable": True,
                "model.attention.use_fixed": True,
                "model.attention.prior_type": "gaussian",
            },
        )
        ds = VideoDataset(
            cfg, videos, "annotations/epic_train_val.csv", ["RGB", "Audio"],
            mode="train",
        )
        s = ds.sample(0, np.random.default_rng(0))
        assert s["weights"].shape == (3, 8, 1)  # attn win for 1.279 s = 8
        np.testing.assert_allclose(s["weights"].sum(axis=1), 1.0, rtol=1e-4)

    def test_loud_prior(self, fixture_root):
        root, videos = fixture_root
        cfg = make_cfg(
            root,
            **{
                "model.attention.enable": True,
                "model.attention.use_prior": True,
                "model.attention.prior_type": "loud",
            },
        )
        ds = VideoDataset(
            cfg, videos, "annotations/epic_train_val.csv", ["RGB", "Audio"],
            mode="train",
        )
        s = ds.sample(0, np.random.default_rng(0))
        assert s["target_weights"].shape == (3, 8, 1)

    def test_sync_vs_async(self, fixture_root):
        root, videos = fixture_root
        for sampling in ("sync", "async"):
            cfg = make_cfg(root, **{"data.sampling": sampling})
            ds = VideoDataset(
                cfg, videos, "annotations/epic_train_val.csv",
                ["RGB", "Audio"], mode="train",
            )
            s = ds.sample(0, np.random.default_rng(0))
            if sampling == "sync":
                np.testing.assert_array_equal(
                    s["indices"]["RGB"], s["indices"]["Audio"]
                )


class TestDataLoader:
    def test_iterates_batches(self, fixture_root):
        root, videos = fixture_root
        cfg = make_cfg(root)
        ds = VideoDataset(
            cfg, videos, "annotations/epic_train_val.csv",
            ["RGB", "Audio"], mode="train",
        )
        loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2, seed=0)
        batches = list(loader)
        assert len(batches) == 2  # 6 samples, batch 4 -> 4 + 2
        batch, targets, meta = batches[0]
        assert batch["RGB"].shape == (4, 3, 224, 224, 3)
        assert batch["Audio"].shape == (4, 3, int(1.279 * 24000))
        assert targets["class"]["verb"].shape == (4,)
        assert len(meta["uid"]) == 4

    def test_process_sharded_loaders_reassemble_global_batches(
        self, fixture_root
    ):
        # multi-host contract (data/loader.py shard): concatenating every
        # host's local batch rows reproduces the unsharded global batch,
        # row-for-row, with equal local sizes on every host
        root, videos = fixture_root
        cfg = make_cfg(root)

        def make(shard, pad_to=1):
            ds = VideoDataset(
                cfg, videos, "annotations/epic_train_val.csv",
                ["RGB", "Audio"], mode="train",
            )
            return DataLoader(
                ds, batch_size=4, shuffle=True, num_workers=1, seed=0,
                shard=shard, pad_to=pad_to,
            )

        global_batches = list(make(None))
        # pad_to=8 mimics a 2-host x 4-device mesh: every global batch pads
        # to 8 rows with ALL pad rows at the assembled TAIL (the metrics
        # mask trims trailing rows beyond meta["batch_size"])
        shard_batches = [list(make((i, 2), pad_to=8)) for i in range(2)]
        assert len(shard_batches[0]) == len(global_batches)
        for b_no, (gbatch, gtargets, gmeta) in enumerate(global_batches):
            locals_ = [shard_batches[i][b_no] for i in range(2)]
            assert all(
                lb["RGB"].shape[0] == 4 for lb, _, _ in locals_
            )  # equal local sizes even for the short last batch
            reassembled = np.concatenate(
                [lb["RGB"] for lb, _, _ in locals_]
            )
            true = gmeta["batch_size"]
            np.testing.assert_array_equal(
                reassembled[:true], np.asarray(gbatch["RGB"])[:true]
            )
            # every pad row sits AFTER the true rows and repeats sample 0
            for r in range(true, reassembled.shape[0]):
                np.testing.assert_array_equal(
                    reassembled[r], reassembled[0]
                )
            # global true size reported identically by every shard
            for _, _, lmeta in locals_:
                assert lmeta["batch_size"] == true
            lt = np.concatenate(
                [lt["class"]["verb"] for _, lt, _ in locals_]
            )
            np.testing.assert_array_equal(
                lt[:true], gtargets["class"]["verb"][:true]
            )

    def test_shuffle_changes_with_epoch(self, fixture_root):
        root, videos = fixture_root
        cfg = make_cfg(root)
        ds = VideoDataset(
            cfg, videos, "annotations/epic_train_val.csv", ["RGB"], mode="train"
        )
        loader = DataLoader(ds, batch_size=6, shuffle=True, num_workers=1, seed=0)
        loader.set_epoch(0)
        first = next(iter(loader))[2]["uid"]
        loader.set_epoch(1)
        second = next(iter(loader))[2]["uid"]
        assert first != second

    def test_determinism_same_epoch(self, fixture_root):
        root, videos = fixture_root
        cfg = make_cfg(root)
        ds = VideoDataset(
            cfg, videos, "annotations/epic_train_val.csv", ["RGB"], mode="train"
        )
        loader = DataLoader(ds, batch_size=3, shuffle=True, num_workers=2, seed=7)
        a = [b[0]["RGB"] for b in loader]
        b = [b[0]["RGB"] for b in loader]
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_drop_last(self, fixture_root):
        root, videos = fixture_root
        cfg = make_cfg(root)
        ds = VideoDataset(
            cfg, videos, "annotations/epic_train_val.csv", ["RGB"], mode="train"
        )
        loader = DataLoader(ds, batch_size=4, drop_last=True, num_workers=1)
        assert len(loader) == 1
        assert len(list(loader)) == 1


class TestMultihostResultSaving:
    def test_global_indices_reconstruct_uid_order(self, fixture_root):
        # tools/test.py multi-host save path: every host derives the SAME
        # global uid order from meta["global_indices"] even though its
        # meta["uid"] holds only the local shard's slice
        root, videos = fixture_root
        cfg = make_cfg(root)

        def make(shard, pad_to=1):
            ds = VideoDataset(
                cfg, videos, "annotations/epic_train_val.csv",
                ["RGB"], mode="train",
            )
            return ds, DataLoader(
                ds, batch_size=4, shuffle=False, num_workers=1, seed=0,
                shard=shard, pad_to=pad_to,
            )

        _, gloader = make(None)
        global_metas = [meta for _, _, meta in gloader]
        host_metas = []
        dss = []
        for host in range(2):
            ds, loader = make((host, 2), pad_to=8)
            dss.append(ds)
            host_metas.append([meta for _, _, meta in loader])

        for b_no, gmeta in enumerate(global_metas):
            true = gmeta["batch_size"]
            for host in range(2):
                meta = host_metas[host][b_no]
                # identical on every host, matching the unsharded order
                np.testing.assert_array_equal(
                    meta["global_indices"][:true], gmeta["global_indices"][:true]
                )
                uids = [
                    dss[host].record(int(i)).action_id
                    for i in meta["global_indices"][:true]
                ]
                assert uids == gmeta["uid"][:true]
                # local uid slice is NOT the global order in general
                assert len(meta["uid"]) == 4

    def test_challenge_json_rows_align(self, fixture_root, tmp_path):
        # simulate the full save path with a replicated "global" pred batch
        from attention_based_tbn_tpu.utils.misc import save_scores
        import json

        root, videos = fixture_root
        cfg = make_cfg(root)
        ds = VideoDataset(
            cfg, videos, "annotations/epic_train_val.csv", ["RGB"], mode="train"
        )
        loader = DataLoader(
            ds, batch_size=4, shuffle=False, num_workers=1, seed=0,
            shard=(1, 2), pad_to=8,  # host 1 of 2: local uid slice is wrong
        )
        output = {"action_id": [], "verb": []}
        row = 0
        expected = {}
        for batch, targets, meta in loader:
            true = meta["batch_size"]
            # "replicated global preds": row r scores r everywhere
            preds = np.arange(row, row + 8, dtype=np.float32)[:, None] * np.ones(
                (1, 5), np.float32
            )
            uids = [
                ds.record(int(i)).action_id for i in meta["global_indices"][:true]
            ]
            output["action_id"].append(np.asarray(uids))
            output["verb"].append(preds[:true])
            for k, uid in enumerate(uids):
                expected[str(int(uid))] = float(row + k)
            row += 8

        out_file = str(tmp_path / "results.json")
        save_scores(output, out_file)
        saved = json.load(open(out_file))["results"]
        assert set(saved.keys()) == set(expected.keys())
        for uid, scores in saved.items():
            assert scores["verb"]["0"] == expected[uid]


class TestPackVisualDtypeGate:
    """pack_visual only packs uint8 streams — the model-side packed-input
    detection (models/tbn.py) requires uint8, so packing a float stream
    would feed the stem an undetected (W/2, 2C) tensor."""

    class _FakeDS:
        def __init__(self, dtype):
            self.dtype = dtype

        def __len__(self):
            return 4

        def sample(self, index, rng):
            return {
                "uid": index,
                "vid_id": f"P01_{index:02d}",
                "start_time": 0.0,
                "stop_time": 1.0,
                "RGB": np.zeros((2, 8, 8, 3), self.dtype),
                "labels": {"verb": 0},
            }

    def _first_batch(self, dtype):
        loader = DataLoader(
            self._FakeDS(dtype), batch_size=4, num_workers=1, pack_visual=True
        )
        batch, _, _ = next(iter(loader))
        return batch

    def test_uint8_stream_packs(self):
        assert self._first_batch(np.uint8)["RGB"].shape == (4, 2, 8, 4, 6)

    def test_float_stream_stays_unpacked(self):
        assert self._first_batch(np.float32)["RGB"].shape == (4, 2, 8, 8, 3)


class TestWorkerCountInvariance:
    """Batches must be bit-identical regardless of num_workers: sampling
    rng is keyed (seed, epoch, index), never thread schedule."""

    def test_same_batches_1_vs_4_workers(self, fixture_root):
        root, videos = fixture_root
        cfg = make_cfg(root)
        ds = VideoDataset(
            cfg, videos, "annotations/epic_train_val.csv",
            ["RGB", "Audio"], mode="train",
        )

        def run(workers):
            loader = DataLoader(
                ds, batch_size=3, shuffle=True, num_workers=workers, seed=3
            )
            loader.set_epoch(1)
            return list(loader)

        for (b1, t1, m1), (b4, t4, m4) in zip(run(1), run(4)):
            assert m1["uid"] == m4["uid"]
            for key in b1:
                np.testing.assert_array_equal(b1[key], b4[key])
            np.testing.assert_array_equal(
                t1["class"]["verb"], t4["class"]["verb"]
            )
