#!/usr/bin/env python
"""Probe: does H-splitting the stem conv into extra batch rows pay on TPU?

The train step folds batch 12 x 3 seg = 36 rows. The packed stem convs
(conv1_7x7_s2 as (7,4)/(2,1) over column-packed input, models/layers.py)
relayout their input to a batch-minor {0,3,2,1} layout - 36 rows pad to 128
lanes (28% occupancy). Splitting each image into S horizontal slices (with a
3-row halo for the 7-tap window) multiplies the folded row count by S:
S=3 -> 108 rows (84% of 128). This measures fwd and fwd+wgrad time of the
flow stem conv in both forms on the real chip.

Usage: python benchmarks/stem_split_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, iters=30):
    out = fn(*args)
    import jax

    jax.block_until_ready(out)
    # chained execs, one readback (PERF.md measurement methodology)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = out[0] if isinstance(out, tuple) else out
    np.asarray(jax.device_get(leaf)).ravel()[:1]
    return (time.perf_counter() - start) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache_tpu",
        ),
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

    def split_h(x, s, halo_t=3, halo_b=3, stride=2):
        # pad H so out rows split evenly; slice with halos; fold into batch
        b, h, wp, c = x.shape
        out_h = (h + 2 * halo_t) // stride  # 112 for h=224 halo 3 k 7
        per = -(-out_h // s)  # ceil
        xp = jnp.pad(x, ((0, 0), (halo_t, halo_b + (per * s - out_h) * stride), (0, 0), (0, 0)))
        rows = per * stride + 5  # input rows needed per slice for k=7,s=2
        slices = [
            jax.lax.dynamic_slice_in_dim(xp, i * per * stride, rows, axis=1)
            for i in range(s)
        ]
        return jnp.concatenate(slices, axis=0), per

    def conv_split(x, w, s=3):
        xs, per = split_h(x, s)
        y = jax.lax.conv_general_dilated(
            xs, w, (2, 1), ((0, 0), (2, 1)), dimension_numbers=dn
        )
        # y: (s*B, per, W, C) -> (B, s*per, W, C), trim to 112
        b = x.shape[0]
        y = jnp.concatenate([y[i * b : (i + 1) * b] for i in range(s)], axis=1)
        return y[:, :112]

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

        return jax.jit(f)

    g = jnp.asarray(rng.standard_normal(ref.shape), jnp.bfloat16)

    for name, fwd in [("plain", p_plain), ("split3", p_split3)]:
        t_f = timeit(fwd, x, w)
        t_w = timeit(wgrad(fwd._fun if hasattr(fwd, "_fun") else fwd), x, w, g)
        print(f"{name:8s} fwd {t_f:7.3f} ms   fwd+wgrad {t_w:7.3f} ms")


if __name__ == "__main__":
    main()
