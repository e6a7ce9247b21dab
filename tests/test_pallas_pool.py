"""Interpret-mode parity of the Pallas ceil-max-pool kernel vs XLA.

The kernel is bf16-only (selection matmul exactness) and dispatched only on
TPU for the shapes where it beats reduce_window (ops/pooling.py); these
tests pin its torch ceil-mode semantics on CPU via the interpreter.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from attention_based_tbn_tpu.ops.pallas_pool import (
    _xla_pool,
    ceil_max_pool2d_pallas,
    supported,
)
from attention_based_tbn_tpu.ops.pooling import max_pool2d


@pytest.mark.parametrize(
    "h,w,c",
    [(112, 112, 8), (64, 105, 16), (16, 26, 8), (28, 28, 16), (32, 53, 8)],
)
def test_matches_reduce_window(h, w, c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.bfloat16)
    got = np.asarray(ceil_max_pool2d_pallas(x, True), np.float32)
    want = np.asarray(_xla_pool(x), np.float32)
    np.testing.assert_array_equal(got, want)
    # and against the reference-semantics public pool
    want2 = np.asarray(
        max_pool2d(x, 3, 2, 0, ceil_mode=True), np.float32
    )
    np.testing.assert_array_equal(got, want2)


def test_gradient_routes_through_xla():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 8)), jnp.bfloat16)
    g = jax.grad(
        lambda v: ceil_max_pool2d_pallas(v, True).astype(jnp.float32).sum()
    )(x)
    gw = jax.grad(lambda v: _xla_pool(v).astype(jnp.float32).sum())(x)
    np.testing.assert_array_equal(
        np.asarray(g, np.float32), np.asarray(gw, np.float32)
    )


def test_supported_predicate():
    big = jnp.zeros((1, 112, 112, 64), jnp.bfloat16)
    assert supported(big, (3, 3), (2, 2), (0, 0), True)
    # floor mode, padding, stride-1, fp32, odd H, small maps, wide W: no
    assert not supported(big, (3, 3), (2, 2), (0, 0), False)
    assert not supported(big, (3, 3), (2, 2), (1, 1), True)
    assert not supported(big, (3, 3), (1, 1), (0, 0), True)
    assert not supported(
        jnp.zeros((1, 112, 112, 64), jnp.float32), (3, 3), (2, 2), (0, 0), True
    )
    assert not supported(
        jnp.zeros((1, 111, 112, 64), jnp.bfloat16), (3, 3), (2, 2), (0, 0), True
    )
    assert not supported(
        jnp.zeros((1, 56, 56, 192), jnp.bfloat16), (3, 3), (2, 2), (0, 0), True
    )
    assert not supported(
        jnp.zeros((1, 128, 210, 64), jnp.bfloat16), (3, 3), (2, 2), (0, 0), True
    )
