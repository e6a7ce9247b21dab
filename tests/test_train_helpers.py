"""Trainer helper coverage: batch padding and warmup with multiplier > 1."""

import numpy as np
import pytest

from attention_based_tbn_tpu.config import load_config
from attention_based_tbn_tpu.parallel.optim import lr_at_epoch
from attention_based_tbn_tpu.data.loader import pad_batch


class TestPadBatch:
    def test_pads_by_repeating_first_row(self):
        batch = {"RGB": np.arange(12).reshape(3, 4)}
        targets = {"class": {"verb": np.asarray([5, 6, 7])}}
        b, t = pad_batch(batch, targets, 8)
        assert b["RGB"].shape == (8, 4)
        np.testing.assert_array_equal(b["RGB"][3], b["RGB"][0])
        np.testing.assert_array_equal(t["class"]["verb"], [5, 6, 7, 5, 5, 5, 5, 5])

    def test_noop_when_already_divisible(self):
        batch = {"RGB": np.zeros((8, 2))}
        targets = {"class": {"verb": np.zeros(8, np.int32)}}
        b, t = pad_batch(batch, targets, 8)
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
        # GradualWarmupScheduler stepped with (epoch+1) at epoch END:
        # epoch e trains at lr = base * ((m-1) * e/T + 1)
        assert lr_at_epoch(cfg, 0) == pytest.approx(0.01)
        assert lr_at_epoch(cfg, 1) == pytest.approx(0.01 * 1.25)
        assert lr_at_epoch(cfg, 4) == pytest.approx(0.02)
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
        # milestones offset by the warmup length: the wrapped MultiStepLR
        # is stepped with (epoch - warmup_epochs), so the epoch-5 milestone
        # fires at wall epoch 7, not 5
        assert lr_at_epoch(cfg, 6) == pytest.approx(0.02)
        assert lr_at_epoch(cfg, 7) == pytest.approx(0.01 * 0.1 * 2)

    def test_multiplier_below_one_rejected(self):
        cfg = load_config(
            overrides=[
                "train.warmup.enable=True",
                "train.warmup.multiplier=0.5",
            ]
        )
        with pytest.raises(ValueError, match="multiplier"):
            lr_at_epoch(cfg, 0)


class TestTorchMultiStepLRDifferential:
    """lr_at_epoch (warmup off) vs a REAL torch MultiStepLR driven exactly
    like the reference loop (core/tools/train.py:195-199 builds it, :295
    calls ``lr_scheduler.step()`` at the END of each epoch — so epoch e
    trains at the lr in the optimizer after e steps)."""

    @pytest.mark.parametrize(
        "base,steps,gamma",
        [
            (0.01, [5, 10], 0.1),
            (0.1, [], 0.5),
            (0.02, [0, 3, 3, 7], 0.2),  # milestone at 0 and a repeat
            (0.003, [1], 0.7),
        ],
    )
    def test_matches_reference_stepping(self, base, steps, gamma):
        torch = pytest.importorskip("torch")

        cfg = load_config(
            overrides=[
                f"train.optim.lr={base}",
                "train.warmup.enable=False",
                "train.scheduler.lr_steps=[{}]".format(
                    ",".join(str(s) for s in steps)
                ),
                f"train.scheduler.lr_decay={gamma}",
            ]
        )
        param = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([param], lr=base)
        sched = torch.optim.lr_scheduler.MultiStepLR(
            opt, milestones=steps, gamma=gamma
        )
        for epoch in range(14):
            torch_lr = opt.param_groups[0]["lr"]  # what epoch trains at
            assert lr_at_epoch(cfg, epoch) == pytest.approx(
                torch_lr, rel=1e-12
            ), f"epoch {epoch}"
            sched.step()  # reference: step at epoch end


class TestGroupedDispatchSingleHostGuard:
    """tpu.steps_per_call>1 / tpu.fuse_accum stack batches eagerly on the
    host (flush_group), which multi-host global arrays cannot do — the
    trainer must reject the combination before any compile."""

    def _cfg(self, *extra):
        return load_config(overrides=list(extra))

    def test_rejects_steps_per_call_multihost(self, monkeypatch):
        import jax

        from attention_based_tbn_tpu.tools.train import (
            _check_grouped_dispatch_single_host,
        )

        monkeypatch.setattr(jax, "process_count", lambda: 2)
        with pytest.raises(ValueError, match="single-host"):
            _check_grouped_dispatch_single_host(self._cfg("tpu.steps_per_call=2"))

    def test_rejects_fuse_accum_multihost(self, monkeypatch):
        import jax

        from attention_based_tbn_tpu.tools.train import (
            _check_grouped_dispatch_single_host,
        )

        monkeypatch.setattr(jax, "process_count", lambda: 2)
        with pytest.raises(ValueError, match="single-host"):
            _check_grouped_dispatch_single_host(
                self._cfg("tpu.fuse_accum=True", "train.optim.accumulator_step=4")
            )

    def test_allows_defaults_multihost_and_grouped_single_host(self, monkeypatch):
        import jax

        from attention_based_tbn_tpu.tools.train import (
            _check_grouped_dispatch_single_host,
        )

        monkeypatch.setattr(jax, "process_count", lambda: 2)
        _check_grouped_dispatch_single_host(self._cfg())  # no grouping: fine
        monkeypatch.setattr(jax, "process_count", lambda: 1)
        _check_grouped_dispatch_single_host(
            self._cfg("tpu.steps_per_call=4")
        )  # single host: fine


class TestGroupedDispatchTailFlush:
    """tpu.steps_per_call groups only stack SAME-SHAPE batches: a final
    batch that is smaller but still mesh-aligned (batch %% mesh == 0, so
    the loader never pads it and bs == rows) must close the open group
    sequentially instead of joining the stack (jnp.stack would raise on
    the row mismatch, aborting the epoch)."""

    @staticmethod
    def _run_epoch(row_sizes, group_len):
        import logging

        import jax
        import jax.numpy as jnp

        from attention_based_tbn_tpu.tools.train import train_one_epoch

        class StubLoader:
            batch_size = row_sizes[0]
            dataset = list(range(sum(row_sizes)))

            def __len__(self):
                return len(row_sizes)

            def set_epoch(self, epoch):
                pass

            def __iter__(self):
                for r in row_sizes:
                    batch = {"RGB": np.zeros((r, 2), np.float32)}
                    targets = {"verb": np.zeros((r,), np.int32)}
                    yield batch, targets, {"batch_size": r}

        class StubMetric:
            def __init__(self):
                self.rows = []

            def update(self, preds, targets, loss, batch_size):
                self.rows.append(
                    (int(batch_size), int(preds["verb"].shape[0]))
                )

            def compute(self):
                return {}, None, None

        def step_fn(state, batch, targets, rng, epoch, bs):
            rows = batch["RGB"].shape[0]
            return (
                state + 1,
                {"total": jnp.zeros(())},
                {"verb": jnp.zeros((rows, 3))},
            )

        def multi_fn(state, batches, targetss, rng, epoch):
            k, rows = batches["RGB"].shape[:2]
            return (
                state + k,
                {"total": jnp.zeros((k,))},
                {"verb": jnp.zeros((k, rows, 3))},
            )

        cfg = load_config()
        metric = StubMetric()
        state, _ = train_one_epoch(
            cfg,
            jnp.zeros((), jnp.int32),
            step_fn,
            StubLoader(),
            metric,
            epoch=0,
            rng=jax.random.PRNGKey(0),
            logger=logging.getLogger("test"),
            multi_step=(multi_fn, group_len),
        )
        return int(state), metric.rows

    def test_unpadded_tail_drains_open_group(self):
        steps, rows = self._run_epoch([8, 8, 8, 4], group_len=4)
        assert steps == 4  # every batch trained exactly once
        assert rows == [(8, 8), (8, 8), (8, 8), (4, 4)]

    def test_full_groups_still_stack(self):
        steps, rows = self._run_epoch([8, 8, 8, 8], group_len=4)
        assert steps == 4
        assert rows == [(8, 8)] * 4


class TestTorchOptimizerChainDifferential:
    """The full optimizer chain (clip_by_global_norm -> +wd*p ->
    SGD-momentum / Adam, under the multi_transform freeze partition and
    inject_hyperparams lr plumbing, parallel/optim.build_optimizer) vs the
    REAL torch optimizers driven exactly like the reference loop
    (core/tools/train.py:84-94: clip_grad_norm_ over model.parameters()
    then opt.step()), on IDENTICAL synthetic gradients for 10 steps.

    The whole-model dynamics tests (test_whole_model_parity.py) can only
    compare Adam for a single step (its sign-quantized updates amplify
    backend noise); this chain-only differential pins the multi-step
    semantics exactly: moment/trace accumulation, bias correction over t,
    clip firing on some steps only, frozen leaves excluded from the global
    norm, and a mid-stream lr retune (the torch-scheduler pattern).
    """

    def _tree(self, gen, torch):
        def t(*shape):
            return torch.randn(*shape, generator=gen)

        return {
            "Base_RGB": {
                "conv1_7x7_s2": {"bn": {"scale": t(8), "bias": t(8)}},
                "conv2_3x3": {"bn": {"scale": t(8), "bias": t(8)}},
                "inception_3a": {"1x1": {"conv": {"kernel": t(3, 3, 4, 8)}}},
            },
            "fusion": {"kernel": t(16, 8), "bias": t(8)},
            "classifier": {"verb": {"kernel": t(8, 7), "bias": t(7)}},
        }

    @pytest.mark.parametrize("optim_type", ["sgd", "adam"])
    def test_matches_torch_updates(self, optim_type):
        torch = pytest.importorskip("torch")
        import jax
        import jax.numpy as jnp
        import optax

        from attention_based_tbn_tpu.parallel.optim import (
            build_optimizer,
            set_learning_rate,
        )

        lr, momentum, wd, clip, steps = 0.02, 0.9, 1e-3, 0.5, 10
        cfg = load_config(
            overrides=[
                "model.freeze_base=True",
                "model.freeze_mode=partialbn",
                f"train.optim.type={optim_type}",
                f"train.optim.lr={lr}",
                f"train.optim.momentum={momentum}",
                f"train.optim.weight_decay={wd}",
                "train.optim.accumulator_step=1",
                f"train.clip_grad={clip}",
            ]
        )

        gen = torch.Generator().manual_seed(7)
        torch_params = self._tree(gen, torch)
        flat_t, treedef = jax.tree_util.tree_flatten_with_path(torch_params)

        # partialbn on this tree freezes exactly the non-stem BN affine
        frozen_paths = {
            "['Base_RGB']['conv2_3x3']['bn']['scale']",
            "['Base_RGB']['conv2_3x3']['bn']['bias']",
        }

        leaves = []
        for path, value in flat_t:
            key = jax.tree_util.keystr(path)
            p = torch.nn.Parameter(
                value.clone(), requires_grad=key not in frozen_paths
            )
            leaves.append((key, p))
        # .numpy() SHARES memory with the torch tensor and jnp.asarray may
        # defer its device copy — torch's later in-place opt.step() would
        # then corrupt these leaves. Copy at the boundary.
        params = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(p.detach().numpy().copy()) for _, p in leaves]
        )

        if optim_type == "adam":
            opt = torch.optim.Adam(
                [p for _, p in leaves], lr, betas=(0.9, 0.999),
                weight_decay=wd,
            )
        else:
            opt = torch.optim.SGD(
                [p for _, p in leaves], lr, momentum=momentum,
                weight_decay=wd,
            )

        tx, labels = build_optimizer(cfg, params, ["RGB"])
        flat_labels = jax.tree_util.tree_flatten_with_path(labels)[0]
        assert {jax.tree_util.keystr(p) for p, l in flat_labels
                if l == "freeze"} == frozen_paths
        opt_state = tx.init(params)

        for step in range(steps):
            if step == 5:  # mid-stream retune, torch-scheduler style
                for group in opt.param_groups:
                    group["lr"] = lr * 0.1
                set_learning_rate(opt_state, lr * 0.1)

            # gradient scale varies so the clip fires on SOME steps only;
            # frozen leaves get a HUGE grad — if the chain wrongly fed
            # them into the global norm, every update would shift
            scale = (10.0, 0.01)[step % 2]
            grads_t = []
            for key, p in leaves:
                g = torch.randn(p.shape, generator=gen) * scale
                if key in frozen_paths:
                    g = g * 1e6
                grads_t.append(g)

            opt.zero_grad()
            for (_, p), g in zip(leaves, grads_t):
                if p.requires_grad:
                    p.grad = g.clone()
            norm = torch.nn.utils.clip_grad_norm_(
                [p for _, p in leaves], clip
            )
            opt.step()

            grads = jax.tree_util.tree_unflatten(
                treedef, [jnp.asarray(g.numpy().copy()) for g in grads_t]
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

            flat_ours = jax.tree_util.tree_flatten_with_path(params)[0]
            for (key, p), (path, ours) in zip(leaves, flat_ours):
                assert key == jax.tree_util.keystr(path)
                np.testing.assert_allclose(
                    np.asarray(ours), p.detach().numpy(),
                    rtol=1e-5, atol=1e-6,
                    err_msg=f"{optim_type} step {step} {key} "
                            f"(clip norm {float(norm):.3f})",
                )
