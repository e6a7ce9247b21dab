"""Orbax checkpoint save/restore roundtrip."""

import os
import numpy as np

import jax
import jax.numpy as jnp
import optax

from attention_based_tbn_tpu.parallel.train_step import TrainState
from attention_based_tbn_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint


def make_state(value=1.0):
    params = {"w": jnp.full((3, 3), value), "b": jnp.zeros(3)}
    tx = optax.sgd(0.1, momentum=0.9)
    return TrainState(
        step=jnp.asarray(5, jnp.int32),
        params=params,
        batch_stats={"bn": {"mean": jnp.ones(3)}},
        opt_state=tx.init(params),
    )


def test_roundtrip(tmp_path):
    state = make_state(2.0)
    path = str(tmp_path / "ckpt")
    save_checkpoint(
        path,
        state,
        epoch=3,
        train_loss_hist=[{"total": 1.5}],
        val_loss_hist=[{"total": 2.0}],
        val_acc_hist={"verb": [[10.0, 20.0]]},
        conf_mat={"verb": np.eye(2)},
    )

    template = make_state(0.0)
    restored, history = restore_checkpoint(path, template)
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 2.0)
    assert int(restored.step) == 5
    np.testing.assert_allclose(np.asarray(restored.batch_stats["bn"]["mean"]), 1.0)
    assert history["epoch"] == 3
    assert history["train_loss"][0]["total"] == 1.5
    assert history["conf_mat"]["verb"] == [[1.0, 0.0], [0.0, 1.0]]


def test_overwrite(tmp_path):
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, make_state(1.0), epoch=0)
    save_checkpoint(path, make_state(7.0), epoch=1)
    restored, history = restore_checkpoint(path, make_state(0.0))
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 7.0)
    assert history["epoch"] == 1


def test_multihost_nonzero_process_skips_save(tmp_path, monkeypatch):
    # multi-host: replicated state is written by process 0 only — the
    # tmp->final renames are not multi-writer safe on shared storage
    from attention_based_tbn_tpu.utils import checkpoint as ckpt

    monkeypatch.setattr(ckpt, "_is_primary_host", lambda: False)
    path = str(tmp_path / "ck")
    ckpt.save_checkpoint(path, {"a": np.zeros(2)}, epoch=0, block=True)
    assert not os.path.exists(path)
    monkeypatch.setattr(ckpt, "_is_primary_host", lambda: True)
    ckpt.save_checkpoint(path, {"a": np.zeros(2)}, epoch=0, block=True)
    assert os.path.exists(path)


def test_preemption_mid_save_keeps_previous(tmp_path):
    """A save interrupted before durability must not destroy the previous
    checkpoint (the reference's in-place .pth overwrite did; misc.py:56-112).
    Simulated: epoch-0 checkpoint durable, epoch-1 save 'dies' leaving only
    a partial tmp dir — restore still returns epoch 0."""
    import os
    import shutil

    from attention_based_tbn_tpu.utils import checkpoint as C

    path = str(tmp_path / "ckpt")
    C.save_checkpoint(path, make_state(1.0), epoch=0)
    C.wait_until_finished()

    # fake a preempted epoch-1 save: partial tmp dir, never finalized
    tmp = f"{path}.tmp-1"
    os.makedirs(tmp)
    with open(os.path.join(tmp, "garbage"), "w") as fh:
        fh.write("partial write")

    restored, history = C.restore_checkpoint(path, make_state(0.0))
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 1.0)
    assert history["epoch"] == 0
    shutil.rmtree(tmp)


def test_async_save_overlaps_and_finalizes(tmp_path):
    """Back-to-back async saves: each save finalizes the previous one; the
    final wait makes the last durable; history tracks the checkpoint."""
    from attention_based_tbn_tpu.utils import checkpoint as C

    path = str(tmp_path / "ckpt")
    for epoch in range(3):
        C.save_checkpoint(path, make_state(float(epoch)), epoch=epoch)
    C.wait_until_finished()
    restored, history = C.restore_checkpoint(path, make_state(0.0))
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 2.0)
    assert history["epoch"] == 2


def test_multihost_save_materializes_numpy_before_gating(tmp_path, monkeypatch):
    """Multi-host: Orbax save of global jax.Arrays is a COLLECTIVE — if
    only process 0 called it the barriers would hang. save_checkpoint must
    hand Orbax a host-numpy tree (local replica read, no collectives) when
    process_count > 1, and must do the materialization on EVERY process so
    non-primary hosts never touch the collective path either."""
    import jax.numpy as jnp

    from attention_based_tbn_tpu.utils import checkpoint as ckpt

    captured = {}

    class FakeCheckpointer:
        def save(self, path, state):
            captured["state"] = state
            os.makedirs(path, exist_ok=True)

        def wait_until_finished(self):
            pass

    monkeypatch.setattr(ckpt, "_checkpointer", lambda: FakeCheckpointer())
    monkeypatch.setattr(ckpt, "_multihost", lambda: True)
    monkeypatch.setattr(ckpt, "_is_primary_host", lambda: True)

    state = {"w": jnp.ones((3,)), "step": 7}
    ckpt.save_checkpoint(str(tmp_path / "ck"), state, epoch=0, block=True)
    leaves = jax.tree_util.tree_leaves(captured["state"])
    assert all(isinstance(x, (np.ndarray, int)) for x in leaves), [
        type(x) for x in leaves
    ]
    np.testing.assert_allclose(captured["state"]["w"], 1.0)
