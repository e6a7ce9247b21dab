"""Trainer helper coverage: batch padding and warmup with multiplier > 1."""

import numpy as np
import pytest

from attention_based_tbn_tpu.config import load_config
from attention_based_tbn_tpu.parallel.optim import lr_at_epoch
from attention_based_tbn_tpu.tools.train import _pad_batch


class TestPadBatch:
    def test_pads_by_repeating_first_row(self):
        batch = {"RGB": np.arange(12).reshape(3, 4)}
        targets = {"class": {"verb": np.asarray([5, 6, 7])}}
        b, t = _pad_batch(batch, targets, 8)
        assert b["RGB"].shape == (8, 4)
        np.testing.assert_array_equal(b["RGB"][3], b["RGB"][0])
        np.testing.assert_array_equal(t["class"]["verb"], [5, 6, 7, 5, 5, 5, 5, 5])

    def test_noop_when_already_divisible(self):
        batch = {"RGB": np.zeros((8, 2))}
        targets = {"class": {"verb": np.zeros(8, np.int32)}}
        b, t = _pad_batch(batch, targets, 8)
        assert b["RGB"].shape == (8, 2)


class TestWarmupMultiplier:
    def test_multiplier_two_ramp(self):
        cfg = load_config(
            overrides=[
                "train.optim.lr=0.01",
                "train.warmup.enable=True",
                "train.warmup.multiplier=2",
                "train.warmup.epochs=4",
                "train.scheduler.lr_steps=[]",
            ]
        )
        # GradualWarmupScheduler: lr = base * ((m-1) * (e+1)/T + 1)
        assert lr_at_epoch(cfg, 0) == pytest.approx(0.01 * 1.25)
        assert lr_at_epoch(cfg, 3) == pytest.approx(0.02)
        # post-warmup: wrapped schedule scaled by the multiplier
        assert lr_at_epoch(cfg, 10) == pytest.approx(0.02)

    def test_multiplier_with_decay_steps(self):
        cfg = load_config(
            overrides=[
                "train.optim.lr=0.01",
                "train.warmup.enable=True",
                "train.warmup.multiplier=2",
                "train.warmup.epochs=2",
                "train.scheduler.lr_steps=[5]",
                "train.scheduler.lr_decay=0.1",
            ]
        )
        assert lr_at_epoch(cfg, 6) == pytest.approx(0.01 * 0.1 * 2)
