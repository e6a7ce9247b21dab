"""CLI surface: ``python main.py <dot overrides>`` driven as a subprocess.

The integration tests call run_trainer/run_tester directly; this locks in
the glue that only the CLI exercises — override parsing and group swaps
from argv, pre-jax platform overrides (tpu.platform/host_devices), hydra-
style run-dir + log-file creation (utils.logging.setup_log), tensorboard
Plotter wiring, and the train dispatch (reference main.py:17-46).
"""

import os
import subprocess
import sys

import pytest

from attention_based_tbn_tpu.data import synthetic

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("epic_cli")
    synthetic.generate(
        str(root),
        videos=["P01_01", "P02_03"],
        frames_per_video=90,
        num_verbs=11,
        num_nouns=13,
    )
    return str(root)


def _run_main(root, extra, timeout=540):
    args = [
        sys.executable,
        os.path.join(REPO, "main.py"),
        "tpu.platform=cpu",
        "tpu.host_devices=8",
        f"tpu.compile_cache={root}/xla_cache",
        f"data_dir={root}",
        f"out_dir={root}/out",
        "exp_name=cli",
        "num_workers=2",
        "data.flow.enable=False",
        "data.audio.enable=False",
        "data.rgb.enable=True",
        "data.train_scale_size=80",
        "data.train_crop_size=64",
        "model.attention.enable=False",
        "model.pretrained=False",
        "model.num_classes={verb: 11, noun: 13}",
        f"train.vid_list={root}/train_split.txt",
        "train.batch_size=4",
        "train.epochs=1",
        "train.num_segments=2",
        "val.enable=False",
        "test.enable=False",
    ] + extra
    return subprocess.run(
        args, cwd=REPO, capture_output=True, text=True, timeout=timeout
    )


@pytest.mark.slow
def test_cli_trains_and_writes_run_dir(fixture_root):
    root = fixture_root
    result = _run_main(root, [])
    assert result.returncode == 0, result.stderr[-2000:]

    # hydra-style run dir with the configured log file inside
    exp_dir = os.path.join(root, "out", "log", "cli")
    runs = sorted(os.listdir(exp_dir))
    assert runs, "no run dir created"
    run_dir = os.path.join(exp_dir, runs[-1])
    logs = [f for f in os.listdir(run_dir) if f.endswith(".log")]
    assert logs, f"no log file in {run_dir}"
    with open(os.path.join(run_dir, logs[0])) as f:
        text = f.read()
    assert "Training completed" in text
    # 8-device virtual mesh actually took effect (platform override path)
    assert "8 device" in text
    # checkpoint written
    ckpt_root = os.path.join(root, "out", "tbn_weights", "cli")
    assert os.path.isdir(ckpt_root) and os.listdir(ckpt_root)


@pytest.mark.slow
def test_cli_quantize_fails_fast(fixture_root):
    """tpu.quantize through the REAL driver hits the build_model guard
    before any compile and exits nonzero with the guidance message."""
    root = fixture_root
    result = _run_main(root, ["tpu.quantize=int8"], timeout=180)
    assert result.returncode != 0
    combined = result.stdout + result.stderr
    assert "calibrate_quantization" in combined


def test_compile_cache_is_host_keyed(tmp_path):
    """tpu.compile_cache must land in a host-fingerprinted subdir: XLA:CPU
    AOT entries from another host SIGILL instead of missing, so a cache
    root that survives a host change must never be served directly."""
    import jax

    from attention_based_tbn_tpu.utils.platform import (
        enable_compile_cache,
        host_fingerprint,
    )

    fp = host_fingerprint()
    assert fp == host_fingerprint()
    assert len(fp) == 10 and all(c in "0123456789abcdef" for c in fp)

    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        enable_compile_cache(str(tmp_path), min_compile_secs=2.0)
        assert jax.config.jax_compilation_cache_dir == os.path.join(
            str(tmp_path), fp
        )
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 2.0
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", old_min
        )
