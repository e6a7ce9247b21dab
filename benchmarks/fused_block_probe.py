#!/usr/bin/env python
"""Probe: can a Pallas 3x3/s1/p1 conv (9 shifted VMEM matmuls) beat XLA?

Decides whether a fused inception-block kernel is worth building. Times are
measured by chaining K applications inside ONE jit (lax.fori_loop with a
data dependency) so the axon tunnel's dispatch latency cancels.

Usage: python benchmarks/fused_block_probe.py [H W Cin Cout]
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v, m):
    return (v + m - 1) // m * m


def conv3x3_kernel(x_ref, w_ref, b_ref, o_ref, *, h, w, c, n, wp):
    """One image: 3x3/s1/p1 conv via 9 matmuls on dj-shifted padded copies.

    Three zero-padded copies of the image, column-shifted by dj, make every
    tap a SUBLANE-ALIGNED flat slice (offset di*wp, wp % 16 == 0), so the
    inner loop is pure MXU work with no vector rotates.
    """

    def body(s0, s1, s2, acc):
        shifted = (s0, s1, s2)
        for dj in range(3):
            s = shifted[dj]
            s[...] = jnp.zeros_like(s)
            # scratch_dj[r, c] = padded[r, c + dj]; x lives at padded
            # rows/cols 1..h/1..w
            if dj == 0:
                s[1 : h + 1, 1 : w + 1, :] = x_ref[0]
            elif dj == 1:
                s[1 : h + 1, 0:w, :] = x_ref[0]
            else:
                s[1 : h + 1, 0 : w - 1, :] = x_ref[0, :, 1:, :]

        acc[...] = jnp.zeros_like(acc)
        for di in range(3):
            for dj in range(3):
                flat = shifted[dj].reshape((h + 2) * wp, c)
                tap = flat[pl.ds(di * wp, h * wp), :]
                acc[...] += jax.lax.dot_general(
                    tap,
                    w_ref[di, dj],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        y = jnp.maximum(acc[...] + b_ref[...].astype(jnp.float32), 0.0)
        o_ref[0] = y.reshape(h, wp, n)[:, :w, :].astype(o_ref.dtype)

    pl.run_scoped(
        body,
        pltpu.VMEM((h + 2, wp, c), x_ref.dtype),
        pltpu.VMEM((h + 2, wp, c), x_ref.dtype),
        pltpu.VMEM((h + 2, wp, c), x_ref.dtype),
        pltpu.VMEM((h * wp, n), jnp.float32),
    )


def conv3x3_pallas(x, kernel, bias):
    b, h, w, c = x.shape
    n = kernel.shape[-1]
    wp = _round_up(w + 2, 16)
    f = pl.pallas_call(
        functools.partial(conv3x3_kernel, h=h, w=w, c=c, n=n, wp=wp),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((3, 3, c, n), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((n,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, h, w, n), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, n), x.dtype),
    )
    return f(x, kernel, bias)


def conv3x3_xla(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jnp.maximum(y + bias.astype(y.dtype), 0.0)


def timed(f, x, kernel, bias, iters=50):
    @jax.jit
    def chain(x, kernel, bias):
        def body(_, carry):
            x, dep = carry
            y = f(x + dep, kernel, bias)
            return x, y[0, 0, 0, 0].astype(x.dtype) * jnp.asarray(
                1e-9, x.dtype
            )

        x, dep = jax.lax.fori_loop(
            0, iters, body, (x, jnp.asarray(0, x.dtype))
        )
        return dep

    r = chain(x, kernel, bias)
    float(r.astype(jnp.float32))  # compile + settle
    t0 = time.perf_counter()
    r = chain(x, kernel, bias)
    float(r.astype(jnp.float32))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    h, w, cin, cout = (
        [int(v) for v in sys.argv[1:5]] if len(sys.argv) > 4 else (28, 28, 96, 128)
    )
    b = 200
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.bfloat16)
    kern = jnp.asarray(
        rng.standard_normal((3, 3, cin, cout)) / np.sqrt(9 * cin), jnp.bfloat16
    )
    bias = jnp.asarray(rng.standard_normal(cout), jnp.bfloat16)

    got = np.asarray(conv3x3_pallas(x, kern, bias), np.float32)
    want = np.asarray(conv3x3_xla(x, kern, bias), np.float32)
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    print(f"rel err {err:.2e}")

    flops = 2 * b * h * w * 9 * cin * cout
    for name, f in [("xla", conv3x3_xla), ("pallas", conv3x3_pallas)]:
        ms = timed(f, x, kern, bias)
        print(
            f"{name:7s} ({b},{h},{w},{cin})->{cout}: {ms:7.3f} ms  "
            f"{flops / (ms / 1e3) / 1e12:6.1f} TF/s"
        )


if __name__ == "__main__":
    main()
