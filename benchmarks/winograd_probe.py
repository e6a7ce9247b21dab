#!/usr/bin/env python
"""Probe: Winograd F(2x2, 3x3) via batched MXU matmuls vs XLA's direct conv.

The round-2 verdict's top perf lead: the 3x3 / double-3x3 branches carry
most of BN-Inception's conv FLOPs at 96-320 output lanes; Winograd cuts the
MACs 2.25x (16 multiplies per 2x2 output tile vs 36). The open question on
TPU is whether the input/output transforms (VPU work + 4x intermediate HBM
traffic) eat the MXU savings — this probe measures both lowerings on the
real block shapes (batch 200 = 8 clips x 25 segments) before any model
integration.

Numerics: transforms are exact in fp32; in bf16 the F(2,3) transform's
worst-case growth is small (coefficients 0.5/1), checked against the direct
conv per shape.

Usage: python benchmarks/winograd_probe.py [fp32]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# F(2x2, 3x3) transform matrices (Lavin & Gray, arXiv:1509.09308)
BT = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32
)
G = np.array(
    [[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32
)
AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)


def winograd_conv3x3(x, w, dtype):
    """3x3 conv, stride 1, SAME (pad 1), via F(2x2, 3x3).

    x (N, H, W, C) with even H, W; w (3, 3, C, K) -> (N, H, W, K).
    """
    import jax.numpy as jnp

    n, h, wd, c = x.shape
    k = w.shape[-1]
    th, tw = h // 2, wd // 2

    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 16 strided views: d[a, b] = xp[:, a::2, b::2] over th x tw tiles
    d = jnp.stack(
        [
            jnp.stack(
                [
                    jax.lax.slice(
                        xp,
                        (0, a, b, 0),
                        (n, a + 2 * th - 1, b + 2 * tw - 1, c),
                        (1, 2, 2, 1),
                    )
                    for b in range(4)
                ]
            )
            for a in range(4)
        ]
    )  # (4, 4, N, th, tw, C)

    bt = jnp.asarray(BT, dtype)
    g = jnp.asarray(G, dtype)
    at = jnp.asarray(AT, dtype)

    # V = B^T d B  over the two tile dims
    v = jnp.einsum("ia,jb,abnhwc->ijnhwc", bt, bt, d)
    # U = G w G^T
    u = jnp.einsum("ip,jq,pqck->ijck", g, g, w.astype(dtype))
    # M[i,j] = V[i,j] @ U[i,j]  — 16 batched (N*P, C) x (C, K) matmuls
    m = jnp.einsum(
        "ijnhwc,ijck->ijnhwk", v, u, preferred_element_type=jnp.float32
    ).astype(dtype)
    # Y = A^T M A -> (2, 2) outputs per tile
    y = jnp.einsum("mi,oj,ijnhwk->nhmwok", at, at, m)
    return y.reshape(n, h, wd, k)


def measure(fn, args, iters=24):
    """Chain ``iters`` applications inside ONE jitted program (each input
    perturbed by the previous output's [0,0,0,0] scalar so nothing folds),
    one dispatch + one readback — per-call dispatch over the tunneled TPU
    otherwise swamps single-conv timings (PERF.md methodology)."""
    import jax
    import jax.numpy as jnp

    def chain(x, k):
        dep = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            y = fn(x + dep.astype(x.dtype), k)
            dep = y[0, 0, 0, 0].astype(jnp.float32) * 1e-12
        return dep

    jfn = jax.jit(chain)
    float(jfn(*args))  # compile + settle
    start = time.perf_counter()
    float(jfn(*args))
    return (time.perf_counter() - start) / iters


def main():
    global jax
    import jax
    import jax.numpy as jnp

    dtype = jnp.float32 if "fp32" in sys.argv[1:] else jnp.bfloat16
    rngn = np.random.default_rng(0)

    # (name, N, H, W, C_in, C_out): the tri-modal 25-seg batch-8 block
    # shapes. RGB/Flow towers run 28/14/7 px; audio 32x52 -> 16x26 -> 8x13.
    shapes = [
        ("3a_3x3", 400, 28, 28, 64, 64),
        ("3a_d3x3", 400, 28, 28, 64, 96),
        ("3b_d3x3", 400, 28, 28, 96, 96),
        ("4a_3x3", 400, 14, 14, 64, 96),
        ("4d_d3x3", 400, 14, 14, 160, 192),
        ("5a_d3x3", 400, 7, 7, 160, 224),  # odd spatial -> padded to 8
        ("au_3a", 200, 32, 52, 64, 64),
        ("au_4d", 200, 16, 26, 160, 192),
        ("conv2", 400, 56, 56, 64, 192),  # the stem 3x3 (192 out)
    ]

    for name, n, h, w, ci, co in shapes:
        x = jnp.asarray(rngn.standard_normal((n, h, w, ci)), dtype)
        kern = jnp.asarray(rngn.standard_normal((3, 3, ci, co)) * 0.05, dtype)

        def direct(x_, k_):
            return jax.lax.conv_general_dilated(
                x_, k_, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def wino(x_, k_):
            hh, ww = x_.shape[1], x_.shape[2]
            if hh % 2 or ww % 2:
                x_ = jnp.pad(
                    x_, ((0, 0), (0, hh % 2), (0, ww % 2), (0, 0))
                )
            y = winograd_conv3x3(x_, k_, dtype)
            return y[:, :hh, :ww, :]

        t_direct = measure(direct, (x, kern))
        t_wino = measure(wino, (x, kern))

        err = float(
            jnp.max(
                jnp.abs(
                    direct(x, kern).astype(jnp.float32)
                    - wino(x, kern).astype(jnp.float32)
                )
            )
        )
        print(
            json.dumps(
                {
                    "shape": name,
                    "direct_ms": round(t_direct * 1e3, 3),
                    "winograd_ms": round(t_wino * 1e3, 3),
                    "speedup": round(t_direct / t_wino, 3),
                    "max_abs_err": err,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
