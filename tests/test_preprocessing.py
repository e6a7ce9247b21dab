"""Preprocessing CLI tests over tiny synthetic trees."""

import os

import numpy as np
import pandas as pd
import pytest

from attention_based_tbn_tpu.preprocessing import (
    create_audio_pickle,
    create_flow_pickle,
    create_split,
    create_symlinks,
)


def test_symlinks(tmp_path):
    import cv2

    raw = tmp_path / "frames" / "P01" / "P01_01"
    (raw / "u").mkdir(parents=True)
    (raw / "v").mkdir(parents=True)
    img = np.zeros((8, 8, 3), np.uint8)
    for i in range(1, 4):  # 1-indexed raw frames
        cv2.imwrite(str(raw / f"frame_{i:010d}.jpg"), img)
        cv2.imwrite(str(raw / "u" / f"frame_{i:010d}.jpg"), img[..., 0])
        cv2.imwrite(str(raw / "v" / f"frame_{i:010d}.jpg"), img[..., 0])

    out = tmp_path / "links"
    create_symlinks.main(
        ["--in_dir", str(tmp_path / "frames"), "--out_dir", str(out)]
    )
    video_out = out / "P01_01"
    assert (video_out / "img_0000000000.jpg").is_symlink()
    assert (video_out / "x_0000000002.jpg").is_symlink()
    assert (video_out / "y_0000000000.jpg").is_symlink()


def test_audio_pickle(tmp_path):
    import wave

    in_dir = tmp_path / "audio"
    in_dir.mkdir()
    pcm = (np.sin(np.arange(48000) / 10) * 10000).astype("<i2")
    with wave.open(str(in_dir / "P01_01.wav"), "wb") as handle:
        handle.setnchannels(1)
        handle.setsampwidth(2)
        handle.setframerate(48000)
        handle.writeframes(pcm.tobytes())

    out_dir = tmp_path / "npy"
    create_audio_pickle.main(
        ["--in_dir", str(in_dir), "--out_dir", str(out_dir), "--sr", "24000",
         "--workers", "1"]
    )
    data = np.load(out_dir / "P01_01.npy")
    assert data.dtype == np.float32
    assert abs(len(data) - 24000) <= 1  # resampled 48k -> 24k


def test_flow_pickle(tmp_path):
    import cv2

    links = tmp_path / "links" / "P01_01"
    links.mkdir(parents=True)
    for i in range(12):
        cv2.imwrite(str(links / f"x_{i:010d}.jpg"), np.full((8, 8), i, np.uint8))
        cv2.imwrite(str(links / f"y_{i:010d}.jpg"), np.full((8, 8), i, np.uint8))

    out = tmp_path / "pickle"
    create_flow_pickle.main(
        ["--in_dir", str(tmp_path / "links"), "--out_dir", str(out),
         "--win_length", "5", "--workers", "1"]
    )
    with np.load(out / "P01_01" / "frame_0000000000.npz") as data:
        assert data["flow"].shape == (8, 8, 10)
    # last full window starts at index 7 (7..11)
    assert (out / "P01_01" / "frame_0000000007.npz").exists()
    assert not (out / "P01_01" / "frame_0000000008.npz").exists()


def test_split(tmp_path):
    rows = []
    for p in (1, 2, 25, 26):
        for v in range(2):
            rows.append({"video_id": f"P{p:02d}_{v:02d}", "uid": len(rows)})
    ann = tmp_path / "ann.csv"
    pd.DataFrame(rows).to_csv(ann, index=False)

    out = tmp_path / "splits"
    create_split.main(
        ["--annotation", str(ann), "--out_dir", str(out), "--unseen_start", "25"]
    )

    def read(name):
        return (out / name).read_text().split()

    seen_train, seen_val = read("train_split_seen.txt"), read("val_split_seen.txt")
    assert len(seen_val) == 4  # one held-out per participant
    assert not set(seen_train) & set(seen_val)

    unseen_train, unseen_val = (
        read("train_split_unseen.txt"),
        read("val_split_unseen.txt"),
    )
    assert all(int(v[1:3]) >= 25 for v in unseen_val)
    assert all(int(v[1:3]) < 25 for v in unseen_train)
    assert len(read("train_full.txt")) == 8
