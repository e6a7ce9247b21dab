"""Post-training int8 quantized inference (tpu.quantize=int8).

Covers the calibrate -> quantize flow on the BN-Inception towers:
calibration records per-conv-site input amax into quant_stats (and is
bit-identical to the plain eval forward), quantized inference then runs
s8 x s8 -> s32 convs with the recorded scales (layers.conv2d_apply_q).
The reference has no quantization story — this is TPU serving surface
(v5e's int8 MXU path runs at 2x the bf16 rate).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attention_based_tbn_tpu.models.tbn import (
    TBNModel,
    TBNSpec,
    calibrate_quantization,
)


def _spec(**kw):
    base = dict(
        modality=("RGB",),
        attention_enable=False,
        num_classes=(("verb", 11), ("noun", 13)),
        compute_dtype="float32",
    )
    base.update(kw)
    return TBNSpec(**base)


def _batch(rng, b=2, n=2, crop=64):
    return {"RGB": jnp.asarray(rng.integers(0, 255, (b, n, crop, crop, 3)), jnp.uint8)}


@pytest.fixture(scope="module")
def calibrated():
    rng = np.random.default_rng(0)
    spec = _spec()
    model = TBNModel(spec)
    batch = _batch(rng)
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.key(0)}, batch
    )
    out_ref = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    variables_q = calibrate_quantization(spec, variables, [batch])
    return spec, variables_q, batch, out_ref


class TestCalibration:
    def test_quant_stats_tree(self, calibrated):
        _, variables, _, _ = calibrated
        stats = variables["quant_stats"]
        tower = stats["Base_RGB"]
        # 2 conv2 cells (one amax each) + 10 blocks x 4 sites
        leaves = jax.tree_util.tree_leaves(tower)
        assert len(leaves) == 42
        assert set(tower["inception_3a"].keys()) == {
            "in_amax",
            "r3_amax",
            "rd_amax",
            "d_amax",
        }
        assert all(float(v) > 0.0 for v in leaves)

    def test_amax_is_a_running_max(self, calibrated):
        spec, variables, batch, _ = calibrated
        observed = variables["quant_stats"]
        # re-calibrating from zeroed stats reproduces the observed maxima
        zeroed = {
            **variables,
            "quant_stats": jax.tree.map(jnp.zeros_like, observed),
        }
        redone = calibrate_quantization(spec, zeroed, [batch])
        for o, r in zip(
            jax.tree_util.tree_leaves(observed),
            jax.tree_util.tree_leaves(redone["quant_stats"]),
        ):
            np.testing.assert_allclose(float(r), float(o), rtol=1e-6)
        # pre-existing LARGER maxima survive (max-merge, not overwrite)
        huge = {
            **variables,
            "quant_stats": jax.tree.map(
                lambda x: jnp.full_like(x, 1e9), observed
            ),
        }
        kept = calibrate_quantization(spec, huge, [batch])
        assert all(
            float(v) == 1e9
            for v in jax.tree_util.tree_leaves(kept["quant_stats"])
        )

    def test_calibration_forward_matches_plain_eval(self, calibrated):
        spec, variables, batch, out_ref = calibrated
        cal_model = TBNModel(dataclasses.replace(spec, quantize="calibrate"))
        out_cal, _ = cal_model.apply(
            variables, batch, train=False, mutable=["quant_stats"]
        )
        for key in out_ref:
            # same math; the observer's extra amax reductions change XLA's
            # fusion choices, so only fusion-order rounding (~1e-7) differs
            np.testing.assert_allclose(
                np.asarray(out_ref[key]),
                np.asarray(out_cal[key]),
                atol=1e-5,
                rtol=1e-5,
            )


class TestQuantizedForward:
    def test_close_to_fp32_and_same_top1(self, calibrated):
        spec, variables, batch, out_ref = calibrated
        qmodel = TBNModel(dataclasses.replace(spec, quantize="int8"))
        out_q = jax.jit(lambda v, b: qmodel.apply(v, b, train=False))(
            variables, batch
        )
        for key in out_ref:
            a = np.asarray(out_ref[key], np.float32)
            b = np.asarray(out_q[key], np.float32)
            rel = np.sqrt(np.mean((a - b) ** 2)) / (np.sqrt(np.mean(a**2)) + 1e-12)
            # random-weight towers see ~2% logit rmse at 8-bit symmetric
            assert rel < 0.15, f"{key}: rel rmse {rel}"
            assert (a.argmax(-1) == b.argmax(-1)).all()

    def test_uncalibrated_int8_fails_loudly(self, calibrated):
        """Skipping calibration must be an ERROR, not silent garbage:
        init creates no quant_stats, so the int8 apply hits a missing
        collection instead of quantizing with amax=0."""
        spec, variables, batch, _ = calibrated
        qmodel = TBNModel(dataclasses.replace(spec, quantize="int8"))
        no_stats = {k: v for k, v in variables.items() if k != "quant_stats"}
        with pytest.raises(Exception, match="quant_stats"):
            qmodel.apply(no_stats, batch, train=False)

    def test_init_creates_no_quant_stats(self):
        rng = np.random.default_rng(1)
        qmodel = TBNModel(_spec(quantize="int8"))
        batch = _batch(rng)
        variables = jax.jit(lambda r, b: qmodel.init(r, b, train=False))(
            {"params": jax.random.key(0)}, batch
        )
        assert "quant_stats" not in variables

    def test_train_path_ignores_quantize(self, calibrated):
        spec, variables, batch, _ = calibrated
        qmodel = TBNModel(dataclasses.replace(spec, quantize="int8"))
        # train forward must not require quant_stats (quantize is eval-only)
        variables_no_stats = {
            k: v for k, v in variables.items() if k != "quant_stats"
        }
        out, _ = qmodel.apply(
            variables_no_stats,
            batch,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)},
        )
        assert np.isfinite(np.asarray(out["verb"], np.float32)).all()


class TestTriModal:
    def test_flagship_quantized_forward(self):
        """RGB+Flow+Audio MHA model: calibrate then quantize; the audio
        tower's freq-pool head and every block's pool-proj site run s8."""
        rng = np.random.default_rng(3)
        spec = _spec(
            modality=("RGB", "Flow", "Audio"),
            attention_enable=True,
            attention_type="mha",
            attn_win=8,  # audio_length 1.279 s anchor
        )
        model = TBNModel(spec)
        audio_len = int(1.279 * spec.sampling_rate)
        batch = {
            "RGB": jnp.asarray(
                rng.integers(0, 255, (2, 2, 64, 64, 3)), jnp.uint8
            ),
            "Flow": jnp.asarray(
                rng.integers(0, 255, (2, 2, 64, 64, 10)), jnp.uint8
            ),
            "Audio": jnp.asarray(
                rng.standard_normal((2, 2, audio_len)) * 0.1, jnp.float32
            ),
        }
        rngs = {"params": jax.random.key(0)}
        variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
            rngs, batch
        )
        out_ref = jax.jit(lambda v, b: model.apply(v, b, train=False))(
            variables, batch
        )
        variables = calibrate_quantization(spec, variables, [batch])
        # three towers x 42 sites
        assert (
            len(jax.tree_util.tree_leaves(variables["quant_stats"])) == 126
        )
        qmodel = TBNModel(dataclasses.replace(spec, quantize="int8"))
        out_q = jax.jit(lambda v, b: qmodel.apply(v, b, train=False))(
            variables, batch
        )
        for key in ("verb", "noun"):
            a = np.asarray(out_ref[key], np.float32)
            b = np.asarray(out_q[key], np.float32)
            rel = np.sqrt(np.mean((a - b) ** 2)) / (
                np.sqrt(np.mean(a**2)) + 1e-12
            )
            assert rel < 0.2, f"{key}: rel rmse {rel}"
            assert np.isfinite(b).all()


class TestValidation:
    def test_rejects_non_bninception(self):
        with pytest.raises(ValueError, match="bninception"):
            _spec(arch="resnet", quantize="int8").validate()

    def test_rejects_unmerged(self):
        with pytest.raises(ValueError, match="merge_inception"):
            _spec(quantize="int8", merge_inception=False).validate()

    def test_rejects_unknown_mode(self):
        with pytest.raises(ValueError, match="quantize"):
            _spec(quantize="fp4").validate()

    def test_config_key(self):
        from attention_based_tbn_tpu.config import load_config

        cfg = load_config(overrides=["tpu.quantize=int8"])
        spec = TBNSpec.from_config(cfg, ["RGB", "Flow", "Audio"])
        assert spec.quantize == "int8"

    def test_drivers_fail_fast(self):
        """build_model (trainer/tester/export path) rejects tpu.quantize:
        the SPMD step functions carry no quant_stats collection, so the
        mode is API-only (calibrate_quantization) — clear error beats a
        missing-collection crash mid-run."""
        from attention_based_tbn_tpu.config import load_config
        from attention_based_tbn_tpu.models.builder import build_model

        cfg = load_config(overrides=["tpu.quantize=int8"])
        with pytest.raises(ValueError, match="calibrate_quantization"):
            build_model(cfg, ["RGB", "Flow", "Audio"])
