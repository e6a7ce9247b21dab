"""SPMD train/eval step tests on the virtual 8-device CPU mesh, plus
optimizer schedule / freezing semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from attention_based_tbn_tpu.config import load_config
from attention_based_tbn_tpu.models.tbn import TBNModel, TBNSpec
from attention_based_tbn_tpu.parallel.mesh import make_mesh, shard_batch
from attention_based_tbn_tpu.parallel.optim import (
    build_optimizer,
    current_learning_rate,
    lr_at_epoch,
    set_learning_rate,
)
from attention_based_tbn_tpu.parallel.train_step import (
    create_train_state,
    make_eval_step,
    make_infer_step,
    make_multi_train_step,
    make_train_step,
)

B, N, H, W = 8, 3, 32, 32


def small_cfg(**over):
    base = {
        "model.attention.enable": False,
        "data.audio.audio_length": 1.279,
        "model.num_classes": "{verb: 7, noun: 9}",
        "train.optim.lr": 0.01,
    }
    base.update(over)
    return load_config(overrides=[f"{k}={v}" for k, v in base.items()])


def make_batch(modality=("RGB",), b=B):
    rng = np.random.default_rng(0)
    batch = {}
    if "RGB" in modality:
        batch["RGB"] = jnp.asarray(rng.standard_normal((b, N, H, W, 3)), jnp.float32)
    if "Audio" in modality:
        batch["Audio"] = jnp.asarray(
            rng.standard_normal((b, N, int(1.279 * 24000))) * 0.1, jnp.float32
        )
    targets = {
        "class": {
            "verb": jnp.asarray(rng.integers(0, 7, b)),
            "noun": jnp.asarray(rng.integers(0, 9, b)),
        }
    }
    return batch, targets


class TestLRSchedule:
    def test_multistep(self):
        cfg = small_cfg(**{"train.scheduler.lr_steps": "[2, 4]"})
        assert lr_at_epoch(cfg, 0) == pytest.approx(0.01)
        assert lr_at_epoch(cfg, 1) == pytest.approx(0.01)
        assert lr_at_epoch(cfg, 2) == pytest.approx(0.001)
        assert lr_at_epoch(cfg, 4) == pytest.approx(0.0001)

    def test_warmup_ramp(self):
        cfg = small_cfg(
            **{
                "train.warmup.enable": True,
                "train.warmup.epochs": 5,
                "train.warmup.multiplier": 1,
                "train.scheduler.lr_steps": "[]",
            }
        )
        # step(epoch + 1) at epoch END -> epoch e trains at ramp position e
        lrs = [lr_at_epoch(cfg, e) for e in range(7)]
        assert lrs[0] == pytest.approx(0.0)
        assert lrs[1] == pytest.approx(0.01 / 5)
        assert lrs[5] == pytest.approx(0.01)
        assert lrs[6] == pytest.approx(0.01)

    def test_adam_constant(self):
        cfg = small_cfg(**{"train.optim.type": "adam"})
        assert lr_at_epoch(cfg, 25) == pytest.approx(0.01)


class TestFreezing:
    def test_partialbn_labels(self):
        cfg = small_cfg()
        batch, _ = make_batch()
        spec = TBNSpec.from_config(cfg, ["RGB"])
        model = TBNModel(spec)
        variables = model.init(jax.random.key(0), batch, train=False)
        tx, labels = build_optimizer(cfg, variables["params"], ["RGB"])
        tower = labels["Base_RGB"]
        # stem BN trainable, deeper BNs frozen, convs trainable
        assert tower["conv1_7x7_s2"]["bn"]["scale"] == "train"
        assert tower["conv2_3x3"]["bn"]["scale"] == "freeze"
        assert tower["inception_3a"]["1x1"]["bn"]["scale"] == "freeze"
        assert tower["inception_3a"]["1x1"]["conv"]["kernel"] == "train"
        assert labels["classifier"]["verb"]["kernel"] == "train"

    def test_freeze_all(self):
        cfg = small_cfg(**{"model.freeze_mode": "all"})
        batch, _ = make_batch()
        spec = TBNSpec.from_config(cfg, ["RGB"])
        model = TBNModel(spec)
        variables = model.init(jax.random.key(0), batch, train=False)
        _, labels = build_optimizer(cfg, variables["params"], ["RGB"])
        leaves = jax.tree.leaves(labels["Base_RGB"])
        assert all(l == "freeze" for l in leaves)
        assert labels["classifier"]["verb"]["kernel"] == "train"


class TestTrainStep:
    @pytest.fixture(scope="class")
    def base(self):
        cfg = small_cfg()
        batch, targets = make_batch()
        spec = TBNSpec.from_config(cfg, ["RGB"])
        model = TBNModel(spec)
        mesh = make_mesh(cfg)
        tx, _ = build_optimizer(
            cfg,
            model.init(jax.random.key(0), batch, train=False)["params"],
            ["RGB"],
        )
        state = create_train_state(model, batch, tx, jax.random.key(0))
        return cfg, model, mesh, tx, state, batch, targets

    @pytest.fixture
    def setup(self, base):
        # train steps donate the state's buffers; give each test a fresh copy
        cfg, model, mesh, tx, state, batch, targets = base
        state = jax.tree.map(jnp.copy, state)
        return cfg, model, mesh, tx, state, batch, targets

    def test_mesh_has_8_devices(self, setup):
        _, _, mesh, *_ = setup
        assert mesh.shape["data"] == 8

    @pytest.mark.slow  # ~130 s of XLA CPU compiles (multi-step chain)
    def test_loss_decreases(self, setup):
        cfg, model, mesh, tx, state, batch, targets = setup
        step = make_train_step(model, tx, cfg, mesh)
        batch_s = shard_batch(batch, mesh)
        targets_s = shard_batch(targets, mesh)
        rng = jax.random.key(42)
        losses = []
        for _ in range(5):
            state, loss, _ = step(
                state, batch_s, targets_s, rng, jnp.asarray(0),
                jnp.asarray(B, jnp.int32),
            )
            losses.append(float(loss["total"]))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()

    def test_frozen_bn_params_unchanged(self, setup):
        cfg, model, mesh, tx, state, batch, targets = setup
        step = make_train_step(model, tx, cfg, mesh)
        before = np.asarray(
            state.params["Base_RGB"]["inception_3a"]["1x1"]["bn"]["scale"]
        )
        stem_before = np.asarray(
            state.params["Base_RGB"]["conv1_7x7_s2"]["bn"]["scale"]
        )
        new_state, _, _ = step(
            state,
            shard_batch(batch, mesh),
            shard_batch(targets, mesh),
            jax.random.key(0),
            jnp.asarray(0),
            jnp.asarray(B, jnp.int32),
        )
        after = np.asarray(
            new_state.params["Base_RGB"]["inception_3a"]["1x1"]["bn"]["scale"]
        )
        stem_after = np.asarray(
            new_state.params["Base_RGB"]["conv1_7x7_s2"]["bn"]["scale"]
        )
        np.testing.assert_array_equal(before, after)  # frozen
        assert not np.allclose(stem_before, stem_after)  # trainable

    def test_batch_stats_updated(self, setup):
        cfg, model, mesh, tx, state, batch, targets = setup
        step = make_train_step(model, tx, cfg, mesh)
        # snapshot before the step: the step donates state's buffers
        before = np.asarray(
            state.batch_stats["Base_RGB"]["conv1_7x7_s2"]["bn"]["mean"]
        )
        new_state, _, _ = step(
            state,
            shard_batch(batch, mesh),
            shard_batch(targets, mesh),
            jax.random.key(0),
            jnp.asarray(0),
            jnp.asarray(B, jnp.int32),
        )
        after = np.asarray(
            new_state.batch_stats["Base_RGB"]["conv1_7x7_s2"]["bn"]["mean"]
        )
        assert not np.allclose(before, after)

    @pytest.mark.slow  # compiles two scanned programs (~2 min CPU XLA)
    def test_multi_step_matches_sequential(self, setup):
        # K scanned steps (tpu.steps_per_call) must reproduce K sequential
        # per-batch steps: same rng folding (state.step), same optimizer/BN
        # threading through the scan carry. The scanned and per-batch
        # EXECUTABLES reassociate fp32 reductions differently, so the
        # gradients agree only to ~5e-3 abs and step-2 state amplifies
        # that through BN on random init — hence a tight 1-step
        # equivalence check plus loose 2-step threading checks.
        cfg, model, mesh, tx, state, batch, targets = setup
        state1 = jax.tree.map(jnp.copy, state)
        state2 = jax.tree.map(jnp.copy, state)
        rng = jax.random.key(3)
        batch_s = shard_batch(batch, mesh)
        targets_s = shard_batch(targets, mesh)

        step = make_train_step(model, tx, cfg, mesh)
        seq_losses = []
        seq_after1 = None
        for _ in range(2):
            state, loss, _ = step(
                state, batch_s, targets_s, rng, jnp.asarray(0),
                jnp.asarray(B, jnp.int32),
            )
            seq_losses.append(float(loss["total"]))
            if seq_after1 is None:
                seq_after1 = jax.tree.map(jnp.copy, state)

        # 1-step scan vs 1 plain step: tight
        multi1 = make_multi_train_step(model, tx, cfg, mesh, steps=1)
        m1state, m1losses, _ = multi1(
            state1,
            jax.tree.map(lambda x: jnp.stack([x]), batch_s),
            jax.tree.map(lambda x: jnp.stack([x]), targets_s),
            rng, jnp.asarray(0),
        )
        np.testing.assert_allclose(
            float(m1losses["total"][0]), seq_losses[0], rtol=1e-6
        )
        for a, b in zip(
            jax.tree.leaves(m1state.batch_stats),
            jax.tree.leaves(seq_after1.batch_stats),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        for a, b in zip(
            jax.tree.leaves(m1state.params), jax.tree.leaves(seq_after1.params)
        ):
            # params = init - lr*clip(grad); grads agree to ~5e-3 abs
            # between the two executables (fp32 reassociation)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

        # 2-step scan: threading (step counter, carry) + loose numerics
        multi2 = make_multi_train_step(model, tx, cfg, mesh, steps=2)
        mstate, mlosses, mpreds = multi2(
            state2,
            jax.tree.map(lambda x: jnp.stack([x, x]), batch_s),
            jax.tree.map(lambda x: jnp.stack([x, x]), targets_s),
            rng, jnp.asarray(0),
        )
        np.testing.assert_allclose(
            float(mlosses["total"][0]), seq_losses[0], rtol=1e-6
        )
        np.testing.assert_allclose(
            float(mlosses["total"][1]), seq_losses[1], rtol=1e-2
        )
        assert int(mstate.step) == int(state.step) == 2
        assert mpreds["verb"].shape[0] == 2
        assert np.isfinite(np.asarray(mlosses["total"])).all()

    def test_eval_and_infer_steps(self, setup):
        cfg, model, mesh, tx, state, batch, targets = setup
        eval_step = make_eval_step(model, cfg, mesh)
        loss, preds = eval_step(
            state, shard_batch(batch, mesh), shard_batch(targets, mesh),
            jnp.asarray(0), jnp.asarray(B, jnp.int32),
        )
        assert np.isfinite(float(loss["total"]))
        infer = make_infer_step(model, mesh)
        preds = infer(state, shard_batch(batch, mesh))
        assert preds["verb"].shape == (B, 7)

    def test_set_learning_rate(self, setup):
        cfg, model, mesh, tx, state, batch, targets = setup
        assert current_learning_rate(state.opt_state) == pytest.approx(0.01)
        set_learning_rate(state.opt_state, 0.005)
        assert current_learning_rate(state.opt_state) == pytest.approx(0.005)


class TestGradAccumulation:
    @pytest.mark.slow  # ~65 s: compiles a second accumulation program
    def test_multisteps_applies_every_k(self):
        cfg = small_cfg(**{"train.optim.accumulator_step": 2})
        batch, targets = make_batch(b=8)
        spec = TBNSpec.from_config(cfg, ["RGB"])
        model = TBNModel(spec)
        variables = model.init(jax.random.key(0), batch, train=False)
        tx, _ = build_optimizer(cfg, variables["params"], ["RGB"])
        state = create_train_state(model, batch, tx, jax.random.key(0))
        step = make_train_step(model, tx, cfg)

        p0 = np.asarray(state.params["classifier"]["verb"]["kernel"])
        state, _, _ = step(
            state, batch, targets, jax.random.key(0), jnp.asarray(0),
            jnp.asarray(8, jnp.int32),
        )
        p1 = np.asarray(state.params["classifier"]["verb"]["kernel"])
        np.testing.assert_array_equal(p0, p1)  # first micro-step: no update
        state, _, _ = step(
            state, batch, targets, jax.random.key(0), jnp.asarray(0),
            jnp.asarray(8, jnp.int32),
        )
        p2 = np.asarray(state.params["classifier"]["verb"]["kernel"])
        assert not np.allclose(p1, p2)  # second micro-step applies


class TestFusedAccum:
    """tpu.fuse_accum: one vmapped program per optimizer update must match
    the MultiSteps accumulate-then-step path (same math, different
    executables)."""

    def test_compose_group_ema_replays_sequential(self):
        from attention_based_tbn_tpu.parallel.train_step import (
            _compose_group_ema,
        )

        rng = np.random.default_rng(0)
        m = 0.1
        old = {"bn": {"mean": jnp.asarray(rng.standard_normal(5), jnp.float32)}}
        stats = rng.standard_normal((3, 5)).astype(np.float32)
        # what vmapped BN modules return: per-group (1-m)*old + m*s_i
        group_new = {
            "bn": {"mean": (1 - m) * old["bn"]["mean"][None] + m * stats}
        }
        got = _compose_group_ema(old, group_new, m, 3)["bn"]["mean"]
        want = np.asarray(old["bn"]["mean"])
        for i in range(3):
            want = (1 - m) * want + m * stats[i]
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)

    @pytest.mark.slow  # compiles the fused + sequential programs (~3 min CPU)
    def test_fused_matches_multisteps(self):
        from attention_based_tbn_tpu.parallel.train_step import (
            make_fused_accum_step,
        )

        cfg = small_cfg(**{
            "train.optim.accumulator_step": 2,
            # fp32: the fused (vmapped) and sequential executables differ
            # only by reassociation, so tolerances stay tight
            "tpu.compute_dtype": "float32",
        })
        spec = TBNSpec.from_config(cfg, ["RGB"])
        model = TBNModel(spec)
        mesh = make_mesh(cfg)

        b1, targets1 = make_batch(b=B)
        rng2 = np.random.default_rng(7)
        b2 = {"RGB": jnp.asarray(rng2.standard_normal((B, N, H, W, 3)), jnp.float32)}
        targets2 = {
            "class": {
                "verb": jnp.asarray(rng2.integers(0, 7, B)),
                "noun": jnp.asarray(rng2.integers(0, 9, B)),
            }
        }

        params = model.init(jax.random.key(0), b1, train=False)["params"]
        tx_ms, _ = build_optimizer(cfg, params, ["RGB"])  # MultiSteps wrap
        tx_raw, _ = build_optimizer(cfg, params, ["RGB"], accumulate=False)
        state_ms = create_train_state(model, b1, tx_ms, jax.random.key(0))
        state_f = create_train_state(model, b1, tx_raw, jax.random.key(0))

        # sequential: two accumulate micro-steps; update applies on the 2nd
        step = make_train_step(model, tx_ms, cfg, mesh)
        rng = jax.random.key(3)
        seq_losses = []
        for bb, tt in [(b1, targets1), (b2, targets2)]:
            state_ms, loss, _ = step(
                state_ms, shard_batch(bb, mesh), shard_batch(tt, mesh),
                rng, jnp.asarray(0), jnp.asarray(B, jnp.int32),
            )
            seq_losses.append(float(loss["total"]))

        # fused: ONE call on the stacked group
        fused = make_fused_accum_step(model, tx_raw, cfg, mesh)
        batches = jax.tree.map(
            lambda a, b: jnp.stack([a, b]),
            shard_batch(b1, mesh), shard_batch(b2, mesh),
        )
        targetss = jax.tree.map(
            lambda a, b: jnp.stack([a, b]),
            shard_batch(targets1, mesh), shard_batch(targets2, mesh),
        )
        state_f, losses, preds = fused(
            state_f, batches, targetss, rng, jnp.asarray(0), [B, B]
        )

        # per-group losses match the sequential micro-step losses (params
        # did not move during accumulation; no dropout in this config)
        np.testing.assert_allclose(
            np.asarray(losses["total"]), seq_losses, rtol=2e-5
        )
        # BN running stats: composed EMA == two sequential updates. Two
        # noise sources set the bound: the vmapped executable reassociates
        # the E[x^2]-mean^2 batch-moment reductions (~4e-5 relative), and
        # the compose step recovers s_i = (new_i - 0.9*old)/0.1, amplifying
        # rounding ~10x. A composition BUG (wrong order/momentum) would be
        # ~1e-2 here.
        for a, b in zip(
            jax.tree.leaves(state_f.batch_stats),
            jax.tree.leaves(state_ms.batch_stats),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-4
            )
        # params: one raw update on the mean grad == the MultiSteps k-th
        # step (different executables; fp32 reassociation ~1e-4)
        for a, b in zip(
            jax.tree.leaves(state_f.params), jax.tree.leaves(state_ms.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)

    @pytest.mark.slow  # compiles the masked fused program
    def test_fused_masked_group_matches_per_batch_loss(self):
        from attention_based_tbn_tpu.parallel.train_step import (
            make_fused_accum_step,
        )

        cfg = small_cfg(**{
            "train.optim.accumulator_step": 2,
            "tpu.compute_dtype": "float32",
        })
        spec = TBNSpec.from_config(cfg, ["RGB"])
        model = TBNModel(spec)
        mesh = make_mesh(cfg)
        b1, targets1 = make_batch(b=B)
        # group 2 is a padded batch: rows >= true_bs are garbage
        true2 = B - 2
        b2 = {
            "RGB": b1["RGB"].at[true2:].set(
                jnp.asarray(
                    np.random.default_rng(9).standard_normal(
                        (B - true2, N, H, W, 3)
                    ) * 50.0,
                    jnp.float32,
                )
            )
        }
        params = model.init(jax.random.key(0), b1, train=False)["params"]
        tx_raw, _ = build_optimizer(cfg, params, ["RGB"], accumulate=False)
        state = create_train_state(model, b1, tx_raw, jax.random.key(0))

        step = make_train_step(model, tx_raw, cfg, mesh)
        _, ref_loss, _ = step(
            jax.tree.map(jnp.copy, state),
            shard_batch(b2, mesh), shard_batch(targets1, mesh),
            jax.random.key(3), jnp.asarray(0), jnp.asarray(true2, jnp.int32),
        )

        fused = make_fused_accum_step(model, tx_raw, cfg, mesh)
        batches = jax.tree.map(
            lambda a, b: jnp.stack([a, b]),
            shard_batch(b1, mesh), shard_batch(b2, mesh),
        )
        targetss = jax.tree.map(
            lambda a, b: jnp.stack([a, b]),
            shard_batch(targets1, mesh), shard_batch(targets1, mesh),
        )
        _, losses, _ = fused(
            state, batches, targetss, jax.random.key(3), jnp.asarray(0),
            [B, true2],
        )
        # group 2's masked loss must ignore the garbage pad rows and equal
        # the per-batch masked step's loss on the same inputs
        np.testing.assert_allclose(
            float(losses["total"][1]), float(ref_loss["total"]), rtol=2e-5
        )


class TestMultiFusedStep:
    """make_multi_fused_step: K scanned fused-accumulation updates must
    reproduce K sequential make_fused_accum_step calls (the composition of
    the two tested paths; the trainer deliberately does not wire it —
    fuse_accum measured slower on v5e — but the benchmark drives it, so
    its semantics are pinned here)."""

    @pytest.mark.slow  # compiles the scanned + per-update fused programs
    def test_matches_sequential_fused_updates(self):
        from attention_based_tbn_tpu.parallel.train_step import (
            make_fused_accum_step,
            make_multi_fused_step,
        )

        cfg = small_cfg(**{
            "train.optim.accumulator_step": 2,
            "tpu.compute_dtype": "float32",
        })
        spec = TBNSpec.from_config(cfg, ["RGB"])
        model = TBNModel(spec)
        mesh = make_mesh(cfg)

        rng_np = np.random.default_rng(3)
        groups = []  # K=2 updates x G=2 micro-batches
        for _ in range(4):
            bb = {
                "RGB": jnp.asarray(
                    rng_np.standard_normal((B, N, H, W, 3)), jnp.float32
                )
            }
            tt = {
                "class": {
                    "verb": jnp.asarray(rng_np.integers(0, 7, B)),
                    "noun": jnp.asarray(rng_np.integers(0, 9, B)),
                }
            }
            groups.append((shard_batch(bb, mesh), shard_batch(tt, mesh)))

        params = model.init(jax.random.key(0), groups[0][0], train=False)[
            "params"
        ]
        tx_raw, _ = build_optimizer(cfg, params, ["RGB"], accumulate=False)
        state_seq = create_train_state(
            model, groups[0][0], tx_raw, jax.random.key(0)
        )
        state_multi = jax.tree.map(jnp.copy, state_seq)
        rng = jax.random.key(5)

        def stack(trees):
            return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)

        fused = make_fused_accum_step(model, tx_raw, cfg, mesh)
        seq_losses = []
        for k in range(2):
            bsk = stack([groups[2 * k][0], groups[2 * k + 1][0]])
            tsk = stack([groups[2 * k][1], groups[2 * k + 1][1]])
            state_seq, loss, _ = fused(
                state_seq, bsk, tsk, rng, jnp.asarray(0), [B, B]
            )
            seq_losses.append(np.asarray(loss["total"]))

        multi = make_multi_fused_step(model, tx_raw, cfg, mesh, steps=2)
        batches = stack([
            stack([groups[0][0], groups[1][0]]),
            stack([groups[2][0], groups[3][0]]),
        ])
        targetss = stack([
            stack([groups[0][1], groups[1][1]]),
            stack([groups[2][1], groups[3][1]]),
        ])
        state_multi, losses, _ = multi(
            state_multi, batches, targetss, rng, jnp.asarray(0)
        )

        # per-(update, group) losses: update 1 runs on identical params in
        # both paths -> tight; update 2 compounds the executables' fp32
        # reassociation through one optimizer step -> loose
        np.testing.assert_allclose(
            np.asarray(losses["total"][0]), seq_losses[0], rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(losses["total"][1]), seq_losses[1], rtol=5e-3
        )
        for a, b in zip(
            jax.tree.leaves(state_multi.params), jax.tree.leaves(state_seq.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
        for a, b in zip(
            jax.tree.leaves(state_multi.batch_stats),
            jax.tree.leaves(state_seq.batch_stats),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
