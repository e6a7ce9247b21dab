"""Fused stem kernel (ops/fused_stem.py): normalize+conv7x7/2+BN-fold+
ReLU+ceil-pool in one Pallas pass — parity vs the jnp reference and vs
the production XLA stem lowering (TorchConv packed conv + ops/pooling)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from attention_based_tbn_tpu.ops.fused_stem import (
    _pack_kernel,
    fused_stem_pallas,
    fused_stem_reference,
)
from attention_based_tbn_tpu.ops.pooling import max_pool2d


def _setup(b=2, h=32, w=32, c=3, f=8, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 255, (b, h, w, c)).astype(np.uint8)
    kernel = (rng.standard_normal((7, 7, c, f)) * 0.05).astype(np.float32)
    bias = (rng.standard_normal(f) * 0.1).astype(np.float32)
    scale = np.full(c, 1 / 255.0, np.float32)
    offset = -rng.uniform(0.3, 0.6, c).astype(np.float32)
    return x, kernel, bias, scale, offset


def test_reference_matches_xla_production_lowering():
    """The jnp reference equals conv+pool built from the production ops
    (ops/pooling ceil max-pool) — anchors the reference itself."""
    x, kernel, bias, scale, offset = _setup()
    want = fused_stem_reference(
        jnp.asarray(x), jnp.asarray(kernel), jnp.asarray(bias),
        jnp.asarray(scale), jnp.asarray(offset),
    )
    xf = x.astype(np.float32) * scale + offset
    y = jax.lax.conv_general_dilated(
        jnp.asarray(xf), jnp.asarray(kernel), (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = jax.nn.relu(y + bias)
    got = max_pool2d(y, 3, 2, 0, ceil_mode=True)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("c,f", [(3, 8), (10, 8), (1, 8)])
def test_pallas_matches_reference_interpret(c, f):
    """Kernel parity in interpret mode (RGB / Flow / Audio channel
    counts), fp32 so the comparison is exact-tolerance."""
    x, kernel, bias, scale, offset = _setup(b=2, h=32, w=32, c=c, f=f, seed=c)
    want = fused_stem_reference(
        jnp.asarray(x), jnp.asarray(kernel), jnp.asarray(bias),
        jnp.asarray(scale), jnp.asarray(offset),
    )
    got = fused_stem_pallas(
        jnp.asarray(x),
        jnp.asarray(_pack_kernel(kernel)),
        jnp.asarray(bias),
        jnp.asarray(scale),
        jnp.asarray(offset),
        dtype=jnp.float32,
        interpret=True,
    )
    assert got.shape == (2, 8, 8, f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_pallas_bf16_close_to_fp32_reference():
    x, kernel, bias, scale, offset = _setup(b=1, h=32, w=32)
    want = fused_stem_reference(
        jnp.asarray(x), jnp.asarray(kernel), jnp.asarray(bias),
        jnp.asarray(scale), jnp.asarray(offset),
    )
    got = fused_stem_pallas(
        jnp.asarray(x),
        jnp.asarray(_pack_kernel(kernel)),
        jnp.asarray(bias),
        jnp.asarray(scale),
        jnp.asarray(offset),
        dtype=jnp.bfloat16,
        interpret=True,
    )
    rel = np.sqrt(np.mean((np.asarray(got, np.float32) - np.asarray(want)) ** 2))
    rel /= np.sqrt(np.mean(np.asarray(want) ** 2)) + 1e-12
    assert rel < 0.03, rel


def test_tower_fused_stem_matches_standard_eval():
    """BNInception with fused_stem=True (interpret mode) reproduces the
    standard eval path's features — same params, same input, pool1 fused
    into the stem kernel."""
    from attention_based_tbn_tpu.models.bn_inception import BNInception

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, 255, (2, 32, 32, 3)), jnp.uint8)
    scale = jnp.asarray(np.full(3, 1 / 255.0, np.float32))
    offset = jnp.asarray(-np.array([0.408, 0.459, 0.502], np.float32) / 1.0)

    base = BNInception()
    variables = base.init(
        {"params": jax.random.PRNGKey(0)},
        x,
        train=False,
        input_scale=scale,
        input_offset=offset,
    )
    want = base.apply(variables, x, train=False, input_scale=scale,
                      input_offset=offset)

    fused = BNInception(fused_stem=True, fused_stem_interpret=True)
    got = fused.apply(variables, x, train=False, input_scale=scale,
                      input_offset=offset)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_tower_fused_stem_ignored_in_train():
    """fused_stem must not change the training path (live BN needs the
    XLA stem): train-mode apply works and matches the standard tower."""
    from attention_based_tbn_tpu.models.bn_inception import BNInception

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 255, (2, 32, 32, 3)), jnp.uint8)
    scale = jnp.asarray(np.full(3, 1 / 255.0, np.float32))
    offset = jnp.asarray(np.full(3, -0.45, np.float32))

    base = BNInception()
    variables = base.init(
        {"params": jax.random.PRNGKey(1)}, x, train=False,
        input_scale=scale, input_offset=offset,
    )
    want, want_stats = base.apply(
        variables, x, train=True, input_scale=scale, input_offset=offset,
        mutable=["batch_stats"],
    )
    fused = BNInception(fused_stem=True, fused_stem_interpret=True)
    got, got_stats = fused.apply(
        variables, x, train=True, input_scale=scale, input_offset=offset,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
