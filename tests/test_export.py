"""Serving export: StableHLO module + params checkpoint + manifest."""

import json
import os

from attention_based_tbn_tpu.config import load_config
from attention_based_tbn_tpu.tools.export import export_inference


def test_export_inference_bundle(tmp_path):
    cfg = load_config(
        overrides=[
            "model.attention.enable=False",
            "model.pretrained=False",
            "data.test_crop_size=64",
            "data.audio.audio_length=1.279",
            "model.num_classes={verb: 5, noun: 7}",
            f"out_dir={tmp_path}",
        ]
    )
    paths = export_inference(
        cfg, ["RGB", "Audio"], batch_size=1, num_segments=2
    )

    module = open(paths["module"]).read()
    assert "stablehlo" in module or "mhlo" in module
    # inputs appear with the export shapes
    assert "1x2x64x64x3" in module  # RGB uint8 batch

    manifest = json.load(open(paths["manifest"]))
    assert manifest["inputs"]["RGB"] == {
        "shape": [1, 2, 64, 64, 3],
        "dtype": "uint8",
    }
    assert manifest["outputs"] == ["noun", "verb"]
    assert manifest["num_segments"] == 2
    assert os.path.isdir(paths["params"])
    assert len(manifest["stablehlo_sha256"]) == 64
