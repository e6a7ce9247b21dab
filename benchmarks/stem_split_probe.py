#!/usr/bin/env python
"""Probe: does H-splitting the stem conv into extra batch rows pay on TPU?

The train step folds batch 12 x 3 seg = 36 rows. The packed stem convs
(conv1_7x7_s2 as (7,4)/(2,1) over column-packed input, models/layers.py)
relayout their input to a batch-minor {0,3,2,1} layout - 36 rows pad to 128
lanes (28% occupancy). Splitting each image into S horizontal slices (with a
3-row halo for the 7-tap window) multiplies the folded row count by S:
S=3 -> 108 rows (84% of 128). This measures fwd and fwd+wgrad time of the
flow stem conv in both forms on the real chip.

MEASURED NEGATIVE (v5e, 600-iter chained exec, one readback): plain fwd
5.07 ms / wgrad 4.46 ms vs split3 fwd 5.29 / wgrad 5.45 — the halo
dynamic-slices and the output re-concat are relayout copies that cost
more than the lane-fill saves, the same failure mode as the jnp max-pool
backward rewrites (ops/pooling.py). An earlier revision of this probe
had a wrong out_h formula ((h+2*halo)//stride instead of
(h+2*halo-k)//stride+1), which misaligned slice 3 and invalidated both
its correctness check and its timings; numbers above are post-fix.

Usage: python benchmarks/stem_split_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, args, iters=600):
    """Time `iters` data-chained applications inside ONE executable.

    Each iteration perturbs the first argument with a scalar from the
    previous output, so the loop cannot be hoisted and the whole chain is
    one dispatch — per-call dispatch over the tunnel is ~9 ms, which would
    swamp a sub-ms conv if the iterations were dispatched individually
    (see tower_pair_probe.py)."""
    import jax
    import jax.numpy as jnp

    x, *rest = args

    def chain(x, *rest):
        def body(_, x):
            out = fn(x, *rest)
            leaf = out[0] if isinstance(out, (tuple, list)) else out
            eps = jnp.asarray(1e-12, x.dtype)
            return x + leaf.ravel()[0].astype(x.dtype) * eps

        return jax.lax.fori_loop(0, iters, body, x)

    jitted = jax.jit(chain)
    jax.block_until_ready(jitted(x, *rest))  # compile
    start = time.perf_counter()
    out = jitted(x, *rest)
    np.asarray(jax.device_get(out)).ravel()[:1]  # one readback syncs all
    return (time.perf_counter() - start) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from attention_based_tbn_tpu.utils.platform import enable_compile_cache

    enable_compile_cache(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache_tpu",
        )
    )

    rng = np.random.default_rng(0)
    B, H, WP, CIN, COUT = 36, 224, 112, 20, 64  # flow stem, column-packed
    x = jnp.asarray(rng.standard_normal((B, H, WP, CIN)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((7, 4, CIN, COUT)) * 0.05, jnp.bfloat16)

    dn = ("NHWC", "HWIO", "NHWC")

    def conv_plain(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 1), ((3, 3), (2, 1)), dimension_numbers=dn
        )

    def split_h(x, s, halo_t=3, halo_b=3, stride=2, k=7):
        # pad H so out rows split evenly; slice with halos; fold into batch
        b, h, wp, c = x.shape
        out_h = (h + halo_t + halo_b - k) // stride + 1  # 112 for 224/7/2
        per = -(-out_h // s)  # ceil
        xp = jnp.pad(
            x,
            (
                (0, 0),
                (halo_t, halo_b + (per * s - out_h) * stride),
                (0, 0),
                (0, 0),
            ),
        )
        rows = per * stride + (k - stride)  # input rows per slice
        slices = [
            jax.lax.dynamic_slice_in_dim(xp, i * per * stride, rows, axis=1)
            for i in range(s)
        ]
        return jnp.concatenate(slices, axis=0), per, out_h

    def conv_split(x, w, s=3):
        xs, per, out_h = split_h(x, s)
        y = jax.lax.conv_general_dilated(
            xs, w, (2, 1), ((0, 0), (2, 1)), dimension_numbers=dn
        )
        # y: (s*B, per, W, C) -> (B, s*per, W, C), trim the even-split pad
        b = x.shape[0]
        y = jnp.concatenate([y[i * b : (i + 1) * b] for i in range(s)], axis=1)
        return y[:, :out_h]

    p_plain = jax.jit(conv_plain)
    p_split3 = jax.jit(lambda x, w: conv_split(x, w, 3))

    # correctness
    ref = np.asarray(p_plain(x, w), np.float32)
    got = np.asarray(p_split3(x, w), np.float32)
    err = np.abs(ref - got).max()
    print(f"split-3 fwd max err vs plain: {err:.3e}  shapes {ref.shape} {got.shape}")

    def wgrad(conv):
        def f(x, w, g):
            _, vjp = jax.vjp(lambda w: conv(x, w), w)
            return vjp(g)[0]

        return f

    g = jnp.asarray(rng.standard_normal(ref.shape), jnp.bfloat16)

    for name, fwd in [
        ("plain", conv_plain),
        ("split3", lambda x, w: conv_split(x, w, 3)),
    ]:
        t_f = timeit(fwd, (x, w))
        t_w = timeit(wgrad(fwd), (x, w, g))
        print(f"{name:8s} fwd {t_f:7.3f} ms   fwd+wgrad {t_w:7.3f} ms")


if __name__ == "__main__":
    main()
