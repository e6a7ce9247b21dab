"""Verbatim-reference differentials for the offline preprocessing CLIs.

* Symlink trees: the reference's create_epic_symlinks.py (a __main__-only
  script, run via runpy) and our create_symlinks CLI, fed equivalent raw
  trees in their respective expected layouts, must produce identical
  link-name -> source-frame mappings (img_/x_/y_ 0-indexed ->
  frame_%010d 1-indexed, u -> x, v -> y).

* Unseen split: the reference's create_split (its dead ``ars`` typo at
  create_epic_split.py:68 unblocked by injecting the name — zero source
  change) vs our create_split CLI on the real 28k-row annotation CSV:
  byte-identical train/val video-id lists. (The "seen" mode draws from
  the global ``random`` stream — distribution-level only, not compared.)
"""

from __future__ import annotations

import importlib.util
import os
import runpy
import sys
from types import SimpleNamespace as NS

import pytest

REFERENCE = "/root/reference"
CSV = os.path.join(os.path.dirname(__file__), "..", "annotations",
                   "epic_train_val.csv")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "preprocessing")),
    reason="reference tree unavailable",
)


def _touch(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        fh.write("x")


def _mapping(links_root):
    """{video/link_name: resolved source basename} for every symlink."""
    out = {}
    for video in sorted(os.listdir(links_root)):
        vdir = os.path.join(links_root, video)
        for name in sorted(os.listdir(vdir)):
            target = os.readlink(os.path.join(vdir, name))
            out[f"{video}/{name}"] = os.path.basename(target)
    return out


def test_symlink_trees_match_reference(tmp_path):
    frames = [f"frame_{i:010d}.jpg" for i in range(1, 6)]
    flow_frames = [f"frame_{i:010d}.jpg" for i in range(1, 4)]

    # reference layout: data_dir/{rgb,flow}/{train,test}/P##/P##_##[/u|v]/
    ref_raw = tmp_path / "ref_raw"
    for f in frames:
        _touch(str(ref_raw / "rgb" / "train" / "P01" / "P01_01" / f))
    for axis in ("u", "v"):
        for f in flow_frames:
            _touch(str(ref_raw / "flow" / "train" / "P01" / "P01_01" / axis / f))

    ref_links = tmp_path / "ref_links"
    argv = sys.argv
    try:
        sys.argv = ["create_epic_symlinks.py", str(ref_raw), str(ref_links)]
        runpy.run_path(
            os.path.join(REFERENCE, "preprocessing", "create_epic_symlinks.py"),
            run_name="__main__",
        )
    finally:
        sys.argv = argv

    # our layout: in_dir/P##/P##_##/{frame_*.jpg, u/, v/}
    our_raw = tmp_path / "our_raw"
    for f in frames:
        _touch(str(our_raw / "P01" / "P01_01" / f))
    for axis in ("u", "v"):
        for f in flow_frames:
            _touch(str(our_raw / "P01" / "P01_01" / axis / f))

    from attention_based_tbn_tpu.preprocessing.create_symlinks import main

    our_links = tmp_path / "our_links"
    main(["--in_dir", str(our_raw), "--out_dir", str(our_links)])

    ref_map = _mapping(str(ref_links))
    our_map = _mapping(str(our_links))
    assert ref_map == our_map
    # spot-pin the indexing convention itself
    assert ref_map["P01_01/img_0000000000.jpg"] == "frame_0000000001.jpg"
    assert ref_map["P01_01/x_0000000002.jpg"] == "frame_0000000003.jpg"
    assert len(ref_map) == 5 + 3 + 3


def test_unseen_split_matches_reference(tmp_path):
    path = os.path.join(REFERENCE, "preprocessing", "create_epic_split.py")
    spec = importlib.util.spec_from_file_location("ref_split", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    ref_out = tmp_path / "ref"
    os.makedirs(ref_out)
    # the reference's mode guard reads an undefined name ``ars`` (its :68
    # typo) — inject it so the otherwise-dead code path runs unmodified
    mod.ars = NS(mode="unseen")
    mod.create_split(NS(annotation=CSV, out_dir=str(ref_out), mode="unseen"))

    from attention_based_tbn_tpu.preprocessing.create_split import main

    our_out = tmp_path / "ours"
    main(["--annotation", CSV, "--out_dir", str(our_out)])

    for ref_name, our_name in [
        ("train_split.txt", "train_split_unseen.txt"),
        ("val_split.txt", "val_split_unseen.txt"),
    ]:
        ref_bytes = (ref_out / ref_name).read_bytes()
        our_bytes = (our_out / our_name).read_bytes()
        assert our_bytes == ref_bytes, ref_name
    # sanity: the unseen holdout really is the >= P25 participants
    val = (our_out / "val_split_unseen.txt").read_text().split()
    assert val and all(int(v.split("_")[0][1:]) >= 25 for v in val)
