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


class TestFastMaxPoolVJP:
    """The masked-shifted-adds max-pool backward (ops/pooling
    _max_pool_fast_vjp) vs XLA's native select-and-scatter gradient."""

    def _grads(self, x, fast, k=3, s=2, p=0, ceil=True):
        import jax
        import jax.numpy as jnp

        from attention_based_tbn_tpu.ops.pooling import max_pool2d

        def loss(x_):
            y = max_pool2d(x_, k, s, p, ceil_mode=ceil, fast_vjp=fast)
            return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))

        return jax.grad(loss)(x)

    def test_matches_native_gradient_no_ties(self, rng):
        import jax.numpy as jnp
        import numpy as np

        # continuous random input: ties have probability ~0
        x = jnp.asarray(rng.standard_normal((2, 13, 13, 5)), jnp.float32)
        for k, s, p, ceil in [(3, 2, 0, True), (3, 1, 1, True), (2, 2, 0, False)]:
            import jax

            from attention_based_tbn_tpu.ops.pooling import max_pool2d

            def loss(x_, fast):
                y = max_pool2d(x_, k, s, p, ceil_mode=ceil, fast_vjp=fast)
                return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))

            g_fast = jax.grad(lambda x_: loss(x_, True))(x)
            g_native = jax.grad(lambda x_: loss(x_, False))(x)
            np.testing.assert_allclose(
                np.asarray(g_fast), np.asarray(g_native), rtol=1e-6, atol=1e-6,
                err_msg=f"k={k} s={s} p={p} ceil={ceil}",
            )

    def test_forward_identical(self, rng):
        import numpy as np
        import jax.numpy as jnp

        from attention_based_tbn_tpu.ops.pooling import max_pool2d

        x = jnp.asarray(rng.standard_normal((2, 14, 15, 3)), jnp.float32)
        a = max_pool2d(x, 3, 2, 0, ceil_mode=True, fast_vjp=True)
        b = max_pool2d(x, 3, 2, 0, ceil_mode=True, fast_vjp=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_tie_sends_gradient_to_all_maxima(self):
        """Documented divergence: ties receive the gradient at EVERY maximal
        position (torch routes it to one winner) — a valid subgradient."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from attention_based_tbn_tpu.ops.pooling import max_pool2d

        x = jnp.ones((1, 2, 2, 1), jnp.float32)
        g = jax.grad(
            lambda x_: jnp.sum(max_pool2d(x_, 2, 2, 0, fast_vjp=True))
        )(x)
        np.testing.assert_array_equal(np.asarray(g)[0, :, :, 0], np.ones((2, 2)))
