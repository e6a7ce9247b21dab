#!/usr/bin/env python
"""Probe: two same-shape convs (RGB + Flow tower siblings) as ONE grouped
conv (feature_group_count=2) / vmapped conv vs two sequential convs.

BN-Inception's 64-96-out 3x3 branches fill half the MXU's 128 output
lanes; the RGB and Flow towers run the identical layer graph, so pairing
their convs channel-wise with feature_group_count=2 doubles the lane fill
with zero wasted MACs — IF XLA-TPU lowers small-group convs as true
grouped convs rather than dense block-diagonal kernels. This measures that.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(fn, args, iters=24):
    import jax
    import jax.numpy as jnp

    def chain(*a):
        dep = jnp.zeros((), jnp.float32)
        x = a[0]
        for _ in range(iters):
            y = fn(x + dep.astype(x.dtype), *a[1:])
            dep = y.ravel()[0].astype(jnp.float32) * 1e-12
        return dep

    jfn = jax.jit(chain)
    float(jfn(*args))
    start = time.perf_counter()
    float(jfn(*args))
    return (time.perf_counter() - start) / iters


def main():
    import jax
    import jax.numpy as jnp

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    shapes = [
        ("3a_3x3", 200, 28, 28, 64, 64),
        ("3a_d3x3", 200, 28, 28, 64, 96),
        ("4d_d3x3", 200, 14, 14, 160, 192),
        ("conv2", 200, 56, 56, 64, 192),
        ("merged_1x1", 200, 28, 28, 256, 192),
    ]

    for name, n, h, w, ci, co in shapes:
        # honest in-model baseline: the two towers' convs read DIFFERENT
        # input tensors (same total bytes as the paired read)
        x2 = jnp.asarray(rng.standard_normal((n, h, w, 2 * ci)), dtype)
        k2 = jnp.asarray(rng.standard_normal((3, 3, ci, 2 * co)) * 0.05, dtype)
        xb = jnp.asarray(rng.standard_normal((n, h, w, ci)), dtype)
        k1 = k2[..., :co]

        def sequential(x_, xb_, ka, kb):
            a = jax.lax.conv_general_dilated(
                x_, ka, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            b = jax.lax.conv_general_dilated(
                xb_, kb, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return a + b  # join so both stay live

        def grouped(x_, k_):
            return jax.lax.conv_general_dilated(
                x_, k_, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=2,
            )

        t_two = measure(sequential, (x2[..., :ci], xb, k1, k2[..., co:]))
        t_grp = measure(grouped, (x2, k2))
        print(
            json.dumps(
                {
                    "shape": name,
                    "two_convs_ms": round(t_two * 1e3, 3),
                    "grouped_ms": round(t_grp * 1e3, 3),
                    "speedup": round(t_two / t_grp, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
