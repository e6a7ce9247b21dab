"""Synthetic Epic-Kitchens-like fixture dataset.

Generates a directory tree matching the layout the loader expects — RGB
jpgs (img_##########.jpg), flow pairs (x_/y_##########.jpg), per-video WAV
files, the annotation CSV and split lists — so the full pipeline (decode,
sampling, transforms, spectrogram, training) can be exercised end-to-end
without the real 100+GB dataset. Used by tests and the benchmark harness.
"""

from __future__ import annotations

import os
import wave
from typing import List, Optional, Sequence

import numpy as np


def _write_wav(path: str, samples: np.ndarray, sr: int) -> None:
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as handle:
        handle.setnchannels(1)
        handle.setsampwidth(2)
        handle.setframerate(sr)
        handle.writeframes(pcm.tobytes())


def generate(
    root: str,
    videos: Optional[Sequence[str]] = None,
    frames_per_video: int = 120,
    actions_per_video: int = 3,
    image_hw=(256, 342),
    fps: int = 60,
    sampling_rate: int = 24000,
    num_verbs: int = 125,
    num_nouns: int = 352,
    seed: int = 0,
    rgb_prefix: str = "links",
    flow_prefix: str = "links",
    audio_prefix: str = "audio",
) -> List[str]:
    """Create the fixture tree under ``root``; returns the video id list."""
    import cv2

    rng = np.random.default_rng(seed)
    videos = list(videos or ["P01_01", "P01_02"])
    h, w = image_hw

    rows = []
    uid = 0
    for vid in videos:
        rgb_dir = os.path.join(root, rgb_prefix, vid)
        flow_dir = os.path.join(root, flow_prefix, vid)
        audio_dir = os.path.join(root, audio_prefix)
        os.makedirs(rgb_dir, exist_ok=True)
        os.makedirs(flow_dir, exist_ok=True)
        os.makedirs(audio_dir, exist_ok=True)

        base = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        for i in range(frames_per_video):
            shift = (i * 3) % w
            frame = np.roll(base, shift, axis=1)
            cv2.imwrite(os.path.join(rgb_dir, f"img_{i:010d}.jpg"), frame)
        gray = base.mean(axis=2).astype(np.uint8)
        for i in range(frames_per_video // 2 + 10):
            cv2.imwrite(
                os.path.join(flow_dir, f"x_{i:010d}.jpg"), np.roll(gray, i, axis=1)
            )
            cv2.imwrite(
                os.path.join(flow_dir, f"y_{i:010d}.jpg"), np.roll(gray, i, axis=0)
            )

        duration = frames_per_video / fps
        t = np.arange(int(duration * sampling_rate) + sampling_rate) / sampling_rate
        tone = 0.3 * np.sin(2 * np.pi * (220 + 50 * rng.integers(8)) * t)
        tone += 0.05 * rng.standard_normal(t.shape)
        _write_wav(os.path.join(audio_dir, f"{vid}.wav"), tone, sampling_rate)

        span = frames_per_video // actions_per_video
        for a in range(actions_per_video):
            start = a * span + 2
            stop = min((a + 1) * span, frames_per_video - 1)
            verb = int(rng.integers(num_verbs))
            noun = int(rng.integers(num_nouns))
            rows.append(
                {
                    "uid": uid,
                    "participant_id": vid.split("_")[0],
                    "video_id": vid,
                    "narration": f"action {uid}",
                    "start_timestamp": "00:00:00.00",
                    "stop_timestamp": "00:00:02.00",
                    "start_frame": start,
                    "stop_frame": stop,
                    "verb": f"verb{verb}",
                    "verb_class": verb,
                    "noun": f"noun{noun}",
                    "noun_class": noun,
                    "all_nouns": f"['noun{noun}']",
                    "all_noun_classes": f"[{noun}]",
                    "action": f"{verb},{noun}",
                    "action_class": uid % 17,
                }
            )
            uid += 1

    import pandas as pd

    ann_dir = os.path.join(root, "annotations")
    os.makedirs(ann_dir, exist_ok=True)
    pd.DataFrame(rows).to_csv(os.path.join(ann_dir, "epic_train_val.csv"), index=False)

    with open(os.path.join(root, "train_split.txt"), "w") as handle:
        handle.write("\n".join(videos) + "\n")

    return videos
