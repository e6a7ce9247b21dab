#!/usr/bin/env python
"""Probe: one full merged-eval inception block, plain vs channel-paired.

Pairing = fold the row dim into channel groups (N, H, W, C) ->
(N/2, H, W, 2C) and run every conv with feature_group_count=2. Exact math
(groups never mix); BN folds, relu, pools and the avg-pool add-tree are
per-channel so they pair trivially. Doubles the MXU's output-lane fill on
BN-Inception's 32-96-lane branches. Measures block 3a and 4d shapes, plus
the fold/unfold boundary copies.
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


def block(x, ws, g):
    """Merged-eval inception block: merged 1x1 head (proj first) ->
    relu/split -> 3x3 + double 3x3 + pool add-tree -> concat."""
    import jax
    import jax.numpy as jnp

    def conv(x_, k_, stride=1, pad=0):
        return jax.lax.conv_general_dilated(
            x_, k_, (stride, stride), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=g,
        )

    merged_k, k3, kd1, kd2, widths = ws
    proj_w, b1_w, r3_w, rd_w = widths
    head_w = proj_w + b1_w + r3_w + rd_w

    y = conv(x, merged_k)
    # group-major channel sections
    parts = {"proj": [], "b1": [], "r3": [], "rd": []}
    for gi in range(g):
        off = gi * head_w
        parts["proj"].append(y[..., off : off + proj_w])
        off += proj_w
        parts["b1"].append(y[..., off : off + b1_w])
        off += b1_w
        parts["r3"].append(y[..., off : off + r3_w])
        off += r3_w
        parts["rd"].append(y[..., off : off + rd_w])
    cat = lambda p: p[0] if g == 1 else jnp.concatenate(p, axis=-1)
    proj = cat(parts["proj"])
    b1 = jax.nn.relu(cat(parts["b1"]))
    r3 = jax.nn.relu(cat(parts["r3"]))
    rd = jax.nn.relu(cat(parts["rd"]))

    b3 = jax.nn.relu(conv(r3, k3, pad=1))
    d = jax.nn.relu(conv(rd, kd1, pad=1))
    d = jax.nn.relu(conv(d, kd2, pad=1))

    xp = jnp.pad(proj, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for di in range(3):
        for dj in range(3):
            part = xp[:, di : di + x.shape[1], dj : dj + x.shape[2], :]
            acc = part if acc is None else acc + part
    pool = jax.nn.relu(acc)

    return jnp.concatenate([b1, b3, d, pool], axis=-1)


def make_weights(rng, dtype, c_in, widths, d3, b3, g):
    import jax.numpy as jnp

    proj_w, b1_w, r3_w, rd_w = widths
    head_w = proj_w + b1_w + r3_w + rd_w
    mk = rng.standard_normal((1, 1, c_in, g * head_w)) * 0.05
    k3 = rng.standard_normal((3, 3, r3_w, g * b3)) * 0.05
    kd1 = rng.standard_normal((3, 3, rd_w, g * d3)) * 0.05
    kd2 = rng.standard_normal((3, 3, d3, g * d3)) * 0.05
    return (
        jnp.asarray(mk, dtype), jnp.asarray(k3, dtype),
        jnp.asarray(kd1, dtype), jnp.asarray(kd2, dtype), widths,
    )


def main():
    import jax
    import jax.numpy as jnp

    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    cases = [
        # name, rows, h, w, c_in, (proj, b1, r3, rd), b3, d3
        ("3a", 200, 28, 28, 192, (32, 64, 64, 64), 64, 96),
        ("4d", 200, 14, 14, 608, (128, 96, 128, 160), 192, 192),
        ("au3a", 200, 32, 52, 192, (32, 64, 64, 64), 64, 96),
        ("au4d", 200, 16, 26, 608, (128, 96, 128, 160), 192, 192),
    ]

    for name, n, h, w, ci, widths, b3, d3 in cases:
        for g in (1, 2, 4):
            x = jnp.asarray(
                rng.standard_normal((n // g, h, w, g * ci)), dtype
            )
            ws = make_weights(rng, dtype, ci, widths, d3, b3, g)
            t = measure(lambda x_, ws=ws, g=g: block(x_, ws, g), (x,))
            print(
                json.dumps(
                    {"block": name, "groups": g, "ms": round(t * 1e3, 3)}
                ),
                flush=True,
            )

    # boundary cost: fold (200,112,112,64) -> (100,112,112,128) and back
    x = jnp.asarray(rng.standard_normal((200, 112, 112, 64)), dtype)

    def fold(x_):
        n, h, w, c = x_.shape
        return jnp.moveaxis(x_.reshape(2, n // 2, h, w, c), 0, 3).reshape(
            n // 2, h, w, 2 * c
        )

    t = measure(fold, (x,))
    print(json.dumps({"block": "fold_copy_112px", "ms": round(t * 1e3, 3)}))


if __name__ == "__main__":
    main()
