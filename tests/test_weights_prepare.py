"""weights/prepare.sh — the testable half of the weight-fetch pipeline.

The real pretrained binaries cannot exist in this sandbox (no network), so
download.sh's fetch stays uncovered — but everything after it (presence
check, sha256 verification, .pth -> .npz conversion, load verification) is
factored into prepare.sh and exercised here on sandbox-generated
reference-format state dicts (the same pretrainedmodels naming the real
artifacts use; reference weights/download.sh, core/models/bn_inception.py:70).
"""

import hashlib
import os
import subprocess

import numpy as np
import pytest
import torch

from test_convert import synth_bninception_state_dict

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PREPARE = os.path.join(REPO_ROOT, "weights", "prepare.sh")


@pytest.fixture()
def weights_dir(tmp_path):
    """Reference-format .pth files with the real artifact names."""
    torch.manual_seed(0)
    rgb = synth_bninception_state_dict(in_channels=3)
    flow = synth_bninception_state_dict(in_channels=10)
    # the real kinetics flow net ships a classifier head our converter
    # must tolerate/ignore like the real load path does
    flow["last_linear.weight"] = torch.randn(400, 1024)
    flow["last_linear.bias"] = torch.randn(400)
    torch.save(rgb, tmp_path / "imagenet_bninception_rgb.pth")
    torch.save(flow, tmp_path / "kinetics_bninception_flow.pth")
    return tmp_path


def run_prepare(weights_dir):
    return subprocess.run(
        ["bash", PREPARE, str(weights_dir)],
        capture_output=True,
        text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )


def sha_file(path):
    return hashlib.sha256(open(path, "rb").read()).hexdigest()


class TestPrepare:
    def test_converts_and_verifies(self, weights_dir):
        proc = run_prepare(weights_dir)
        assert proc.returncode == 0, proc.stdout + proc.stderr
        assert "Converted + verified" in proc.stdout

        from attention_based_tbn_tpu.models.convert_cli import flatten, load_npz

        for stem in ("imagenet_bninception_rgb", "kinetics_bninception_flow"):
            npz = weights_dir / f"{stem}.npz"
            assert npz.exists(), proc.stdout
            params, stats = load_npz(str(npz))
            flat = flatten(params)
            assert len(flat) > 100  # full tower graph converted
            assert all(np.isfinite(v).all() for v in flat.values())
        # flow conv1 kept its 10 input channels (kernel is HWIO)
        params, _ = load_npz(str(weights_dir / "kinetics_bninception_flow.npz"))
        assert params["conv1_7x7_s2"]["conv"]["kernel"].shape[2] == 10

    def test_sha256_checked_when_manifest_present(self, weights_dir):
        sums = "\n".join(
            f"{sha_file(weights_dir / f)}  {f}"
            for f in (
                "imagenet_bninception_rgb.pth",
                "kinetics_bninception_flow.pth",
            )
        )
        (weights_dir / "sha256sums.txt").write_text(sums + "\n")
        proc = run_prepare(weights_dir)
        assert proc.returncode == 0, proc.stdout + proc.stderr
        assert "OK" in proc.stdout  # sha256sum -c ran

        # corrupt one artifact: prepare must fail BEFORE converting
        with open(weights_dir / "imagenet_bninception_rgb.pth", "ab") as fh:
            fh.write(b"corruption")
        os.remove(weights_dir / "imagenet_bninception_rgb.npz")
        proc = run_prepare(weights_dir)
        assert proc.returncode != 0
        assert not (weights_dir / "imagenet_bninception_rgb.npz").exists()

    def test_missing_artifact_fails_loudly(self, tmp_path):
        proc = run_prepare(tmp_path)
        assert proc.returncode != 0
        assert "expected imagenet_bninception_rgb.pth" in proc.stderr
