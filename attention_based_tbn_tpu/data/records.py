"""Annotation records for Epic-Kitchens trimmed action segments.

Pure, dependency-light record math. Frame-index conventions match the
reference exactly (reference core/dataset/epic_record.py:25-46):

* RGB/Audio frames are 1-indexed in the CSV -> subtract 1;
* Flow runs at half the visual frame rate -> indices are halved;
* the segment's usable end frame is ``stop_frame - 2`` (RGB/Audio).

Test CSVs (S1/S2) carry no labels -> a -1 sentinel label is used
(reference epic_record.py:49-59).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Union

import pandas as pd

MODALITIES = ("RGB", "Flow", "Audio")


@dataclass(frozen=True)
class EpicRecord:
    """One trimmed action segment of an untrimmed Epic-Kitchens video."""

    uid: int
    video_id: str
    start_timestamp: str
    stop_timestamp: str
    csv_start_frame: int
    csv_stop_frame: int
    verb_class: int = -1
    noun_class: int = -1
    action_class: int = -1
    has_labels: bool = False

    @property
    def action_id(self) -> int:
        return self.uid

    @property
    def untrimmed_video_name(self) -> str:
        return self.video_id

    @property
    def start_frame(self) -> Dict[str, int]:
        start = self.csv_start_frame - 1
        return {"RGB": start, "Flow": start // 2, "Audio": start}

    @property
    def end_frame(self) -> Dict[str, int]:
        end = self.csv_stop_frame - 2
        return {"RGB": end, "Flow": end // 2, "Audio": end}

    @property
    def num_frames(self) -> Dict[str, int]:
        start, end = self.start_frame, self.end_frame
        return {m: end[m] - start[m] for m in MODALITIES}

    @property
    def label(self) -> Union[Dict[str, int], int]:
        if not self.has_labels:
            return -1
        label = {"verb": self.verb_class, "noun": self.noun_class}
        if self.action_class >= 0:
            label["action"] = self.action_class
        return label


def load_annotations(
    path: str,
    vid_list: Optional[List[str]] = None,
    action_id_list: Optional[List[str]] = None,
) -> pd.DataFrame:
    """Load and filter the annotation table (csv or pkl).

    Mirrors reference core/dataset/dataset.py:86-112 (video-id filtering and
    optional (verb,noun) action filtering).
    """
    if path.endswith(".pkl"):
        table = pd.read_pickle(path)
    else:
        table = pd.read_csv(path)
    if vid_list:
        table = table[table["video_id"].isin(set(vid_list))]
    if action_id_list:
        table = table[table["action"].isin(set(action_id_list))]
    return table.reset_index(drop=True)


def record_from_row(row, include_action_class: bool = False) -> EpicRecord:
    keys = set(row.index) if hasattr(row, "index") else set(row.keys())
    # all three class columns required, like the reference (epic_record.py:
    # 49-59) — the S1/S2 challenge csvs lack them and get fake -1 labels
    has_labels = {"verb_class", "noun_class", "action_class"} <= keys
    return EpicRecord(
        uid=int(row["uid"]),
        video_id=str(row["video_id"]),
        start_timestamp=str(row["start_timestamp"]),
        stop_timestamp=str(row["stop_timestamp"]),
        csv_start_frame=int(row["start_frame"]),
        csv_stop_frame=int(row["stop_frame"]),
        verb_class=int(row["verb_class"]) if has_labels else -1,
        noun_class=int(row["noun_class"]) if has_labels else -1,
        action_class=(
            int(row["action_class"]) if has_labels and include_action_class else -1
        ),
        has_labels=has_labels,
    )


def read_vid_list(path: str) -> List[str]:
    with open(path) as handle:
        return [line.strip() for line in handle if line.strip()]


def resolve_vid_list_path(vid_list: str, repo_root: Optional[str] = None) -> str:
    """Resolve a split-list path; relative paths are anchored at the repo root
    like the reference does (reference core/utils/create_dataloader.py:103-108)."""
    if os.path.isabs(vid_list):
        return vid_list
    root = repo_root or os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    return os.path.join(root, vid_list)
