"""Driver hooks (__graft_entry__): the round harness compile-checks
``entry()`` on the real chip and executes ``dryrun_multichip`` on a
virtual CPU mesh — a breakage there fails the round silently, so pin both
here. ``dryrun_multichip``'s body is the train step already covered by
test_train_step/test_integration; ``entry()`` has no other caller."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


@pytest.mark.slow
def test_entry_builds_and_lowers():
    import jax

    fn, args = graft.entry()
    params, batch_stats, batch = args
    assert {"RGB", "Flow", "Audio"} == set(batch.keys())
    # lowering traces the full flagship forward without compiling it
    lowered = jax.jit(fn).lower(*args)
    text = lowered.as_text()
    assert "stablehlo" in text or "module" in text


def test_dryrun_helpers_shape():
    cfg = graft._cfg(tiny=True)
    batch = graft._batch(cfg, batch_size=2, num_segments=2, crop=64)
    assert batch["RGB"].shape == (2, 2, 64, 64, 3)
    assert batch["Flow"].shape == (2, 2, 64, 64, 10)
    # 1.279 s at 24 kHz
    assert batch["Audio"].shape == (2, 2, int(1.279 * 24000))
    assert batch["RGB"].dtype.name == "uint8"
