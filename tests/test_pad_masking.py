"""Pad rows must not influence training: the loader pads each batch to a
multiple of the mesh size by repeating sample 0 (data/loader.py pad_batch);
with ``true_bs`` threaded into the steps, the pad rows are excluded from
every loss mean (models/losses.py) and every live BatchNorm statistic
(models/layers.TorchBatchNorm.row_mask, bn_inception _train_bn). The
reference never pads (its DataLoader yields ragged last batches,
reference core/tools/train.py:69-104), so a padded batch here must produce
the same result an unpadded one would.

Acceptance check from round-2 review: batch 4 trained on the 8-device mesh
(4 pad rows) matches batch 4 on a 4-device mesh (no pads) — loss, gradient
updates and BN running stats alike.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from attention_based_tbn_tpu.config import load_config
from attention_based_tbn_tpu.data.loader import pad_batch
from attention_based_tbn_tpu.models.losses import (
    attention_entropy,
    contrast_loss,
    cross_entropy,
    prior_loss,
    tbn_loss,
)
from attention_based_tbn_tpu.models.layers import TorchBatchNorm
from attention_based_tbn_tpu.models.tbn import TBNModel, TBNSpec
from attention_based_tbn_tpu.parallel.mesh import make_mesh, shard_batch
from attention_based_tbn_tpu.parallel.optim import build_optimizer
from attention_based_tbn_tpu.parallel.train_step import (
    create_train_state,
    make_eval_step,
    make_train_step,
)


def _pad_rows(x, total):
    return np.concatenate([x, np.repeat(x[:1], total - x.shape[0], axis=0)])


class TestMaskedLosses:
    def test_cross_entropy_ignores_pad_rows(self, rng):
        logits = rng.standard_normal((4, 11)).astype(np.float32)
        labels = rng.integers(0, 11, 4).astype(np.int32)
        plain = cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
        padded = cross_entropy(
            jnp.asarray(_pad_rows(logits, 8)),
            jnp.asarray(_pad_rows(labels, 8)),
            mask=jnp.asarray(np.arange(8) < 4, jnp.float32),
        )
        np.testing.assert_allclose(float(plain), float(padded), rtol=1e-6)

    def test_aux_losses_ignore_pad_rows(self, rng):
        wts = rng.uniform(0.01, 1.0, (12, 8)).astype(np.float32)
        wts /= wts.sum(-1, keepdims=True)
        prior = rng.uniform(0.01, 1.0, (12, 8)).astype(np.float32)
        prior /= prior.sum(-1, keepdims=True)
        wts_p, prior_p = _pad_rows(wts, 24), _pad_rows(prior, 24)
        mask = jnp.asarray(np.arange(24) < 12, jnp.float32)

        for plain, padded in [
            (
                attention_entropy(jnp.asarray(wts)),
                attention_entropy(jnp.asarray(wts_p), row_mask=mask),
            ),
            (
                contrast_loss(jnp.asarray(wts)),
                contrast_loss(jnp.asarray(wts_p), row_mask=mask),
            ),
            (
                prior_loss(jnp.asarray(wts), jnp.asarray(prior)),
                prior_loss(jnp.asarray(wts_p), jnp.asarray(prior_p), row_mask=mask),
            ),
        ]:
            np.testing.assert_allclose(float(plain), float(padded), rtol=1e-5)

    def test_tbn_loss_true_batch(self, rng):
        cfg = load_config(
            overrides=[
                "model.num_classes={verb: 5, noun: 6}",
                "model.attention.enable=False",
            ]
        )
        preds = {
            "verb": jnp.asarray(rng.standard_normal((4, 5)), jnp.float32),
            "noun": jnp.asarray(rng.standard_normal((4, 6)), jnp.float32),
        }
        targets = {
            "class": {
                "verb": jnp.asarray(rng.integers(0, 5, 4), jnp.int32),
                "noun": jnp.asarray(rng.integers(0, 6, 4), jnp.int32),
            }
        }
        plain = tbn_loss(preds, targets, cfg)
        preds_p = jax.tree.map(lambda x: jnp.asarray(_pad_rows(np.asarray(x), 8)), preds)
        targets_p = jax.tree.map(
            lambda x: jnp.asarray(_pad_rows(np.asarray(x), 8)), targets
        )
        padded = tbn_loss(preds_p, targets_p, cfg, true_batch=jnp.asarray(4))
        for key in plain:
            np.testing.assert_allclose(
                float(plain[key]), float(padded[key]), rtol=1e-6, err_msg=key
            )


class TestMaskedBatchNorm:
    def test_masked_stats_match_unpadded(self, rng):
        x = rng.standard_normal((4, 5, 5, 3)).astype(np.float32)
        bn = TorchBatchNorm()
        variables = bn.init(jax.random.key(0), jnp.asarray(x), use_running_average=False)

        out_plain, upd_plain = bn.apply(
            variables, jnp.asarray(x), use_running_average=False,
            mutable=["batch_stats"],
        )
        xp = _pad_rows(x, 8)
        out_mask, upd_mask = bn.apply(
            variables,
            jnp.asarray(xp),
            use_running_average=False,
            row_mask=jnp.asarray(np.arange(8) < 4, jnp.float32),
            mutable=["batch_stats"],
        )
        np.testing.assert_allclose(
            np.asarray(out_mask)[:4], np.asarray(out_plain), rtol=1e-5, atol=1e-6
        )
        for key in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(upd_mask["batch_stats"][key]),
                np.asarray(upd_plain["batch_stats"][key]),
                rtol=1e-5,
                atol=1e-7,
            )


class TestPaddedStepEquivalence:
    """Batch 4 on the 8-device mesh == batch 4 on a 4-device mesh."""

    @pytest.mark.slow  # two SPMD train-step compiles (~2 min cold on CPU)
    def test_train_step_pad_invariant(self):
        cfg = load_config(
            overrides=[
                "model.attention.enable=False",
                "model.num_classes={verb: 7, noun: 9}",
                "tpu.compute_dtype=float32",
                "train.optim.lr=0.01",
            ]
        )
        rng = np.random.default_rng(3)
        b, n, hw = 4, 2, 32
        batch = {"RGB": rng.standard_normal((b, n, hw, hw, 3)).astype(np.float32)}
        targets = {
            "class": {
                "verb": rng.integers(0, 7, b).astype(np.int32),
                "noun": rng.integers(0, 9, b).astype(np.int32),
            }
        }
        batch_p, targets_p = pad_batch(dict(batch), targets, 8)

        spec = TBNSpec.from_config(cfg, ["RGB"])
        model = TBNModel(spec)
        init_batch = jax.tree.map(jnp.asarray, batch)
        tx, _ = build_optimizer(
            cfg,
            model.init(jax.random.key(0), init_batch, train=False)["params"],
            ["RGB"],
        )

        results = {}
        for name, mesh_devices, (bt, tg) in [
            ("mesh4", jax.devices()[:4], (batch, targets)),
            ("mesh8", jax.devices()[:8], (batch_p, targets_p)),
        ]:
            mesh = make_mesh(devices=mesh_devices)
            state = create_train_state(model, init_batch, tx, jax.random.key(0))
            step = make_train_step(model, tx, cfg, mesh)
            bt = shard_batch(jax.tree.map(jnp.asarray, bt), mesh)
            tg = shard_batch(jax.tree.map(jnp.asarray, tg), mesh)
            new_state, loss, _ = step(
                state, bt, tg, jax.random.key(1), jnp.asarray(0),
                jnp.asarray(b, jnp.int32),
            )
            results[name] = (
                jax.tree.map(np.asarray, new_state.params),
                jax.tree.map(np.asarray, new_state.batch_stats),
                {k: float(v) for k, v in loss.items()},
            )

        p4, s4, l4 = results["mesh4"]
        p8, s8, l8 = results["mesh8"]
        for key in l4:
            np.testing.assert_allclose(l4[key], l8[key], rtol=1e-5, err_msg=key)
        jax.tree.map(
            lambda a, b_: np.testing.assert_allclose(a, b_, rtol=1e-3, atol=2e-6),
            p4,
            p8,
        )
        jax.tree.map(
            lambda a, b_: np.testing.assert_allclose(a, b_, rtol=1e-3, atol=2e-6),
            s4,
            s8,
        )

    @pytest.mark.slow
    def test_eval_loss_pad_invariant(self):
        cfg = load_config(
            overrides=[
                "model.attention.enable=False",
                "model.num_classes={verb: 7, noun: 9}",
                "tpu.compute_dtype=float32",
            ]
        )
        rng = np.random.default_rng(5)
        b, n, hw = 4, 2, 32
        batch = {"RGB": rng.standard_normal((b, n, hw, hw, 3)).astype(np.float32)}
        targets = {
            "class": {
                "verb": rng.integers(0, 7, b).astype(np.int32),
                "noun": rng.integers(0, 9, b).astype(np.int32),
            }
        }
        batch_p, targets_p = pad_batch(dict(batch), targets, 8)

        spec = TBNSpec.from_config(cfg, ["RGB"])
        model = TBNModel(spec)
        init_batch = jax.tree.map(jnp.asarray, batch)
        import optax

        state = create_train_state(
            model, init_batch, optax.identity(), jax.random.key(0)
        )
        mesh = make_mesh(devices=jax.devices()[:8])
        eval_step = make_eval_step(model, cfg, mesh)
        loss_p, _ = eval_step(
            state,
            shard_batch(jax.tree.map(jnp.asarray, batch_p), mesh),
            shard_batch(jax.tree.map(jnp.asarray, targets_p), mesh),
            jnp.asarray(0),
            jnp.asarray(b, jnp.int32),
        )
        mesh4 = make_mesh(devices=jax.devices()[:4])
        eval_step4 = make_eval_step(model, cfg, mesh4)
        loss, _ = eval_step4(
            state,
            shard_batch(jax.tree.map(jnp.asarray, batch), mesh4),
            shard_batch(jax.tree.map(jnp.asarray, targets), mesh4),
            jnp.asarray(0),
            jnp.asarray(b, jnp.int32),
        )
        for key in loss:
            np.testing.assert_allclose(
                float(loss[key]), float(loss_p[key]), rtol=1e-5, err_msg=key
            )


def test_shard_batch_passes_meta_leaves_through():
    """Whole loader outputs map cleanly: python scalars, strings, lists and
    0-d arrays (meta dicts) pass through unchanged, while rank>=1 arrays
    take the leading-axis sharding. np.isscalar is True for str/int/float —
    a predicate built on it used to send meta leaves into a rank-1
    device_put, which raises."""
    import numpy as np

    mesh = make_mesh()
    meta = {
        "uid": ["vid_001", "vid_002"],
        "batch_size": 4,
        "start_time": 1.5,
        "flag": True,
        "zero_d": np.asarray(3),
        "rows": np.zeros((8, 2), np.float32),
    }
    out = shard_batch(meta, mesh)
    assert out["batch_size"] == 4 and out["start_time"] == 1.5
    assert out["uid"] == ["vid_001", "vid_002"] and out["flag"] is True
    assert isinstance(out["zero_d"], np.ndarray)  # untouched
    assert isinstance(out["rows"], jax.Array)
    assert out["rows"].sharding.spec == ("data",)
