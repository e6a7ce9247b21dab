#!/usr/bin/env python
"""Probe 2: can an int8-RESIDENT pipeline avoid probe 1's dequant cost?

Probe 1 (int8_probe.py) showed s8 x s8 -> s32 convs run 1.1-3.8x faster
than bf16 on the real shapes, but a bf16-in/bf16-out wrapper loses the win
to the input-quantize pass and the materialized int32 output. This probe
measures the remaining design options per shape:

* ``deq_only``     — input ALREADY int8 (resident), conv -> int32 ->
                     scale+bias+relu -> bf16 out. Isolates the output
                     epilogue cost from the input quantize.
* ``chain``        — input int8, conv -> epilogue -> REQUANTIZE to int8
                     out (the steady state of an int8-resident tower:
                     int8 in HBM on both sides, epilogue ideally fused).
* ``prefer_f32``   — s8 operands with preferred_element_type=f32: does
                     XLA emit the cast inside the conv (no int32 in HBM)?
* ``pool_int8``    — 3x3/2 ceil max pool on int8 vs bf16 (pools are pure
                     bandwidth; int8 halves the bytes).

Usage: python benchmarks/int8_probe2.py
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

    def chain(x, k):
        dep = jnp.zeros((), jnp.int32)
        for _ in range(iters):
            y = fn((x + dep.astype(x.dtype)).astype(x.dtype), k)
            dep = y.ravel()[0].astype(jnp.int32) % 2
        return dep

    jfn = jax.jit(chain)
    int(jfn(*args))
    start = time.perf_counter()
    int(jfn(*args))
    return (time.perf_counter() - start) / iters


def main():
    import jax
    import jax.numpy as jnp

    rngn = np.random.default_rng(0)

    shapes = [
        ("stem_audio_packed", 250, 256, 210, 2, 64, 7, 4, (2, 1), (3, 2)),
        ("conv2_3x3", 250, 56, 56, 64, 192, 3, 3, (1, 1), (1, 1)),
        ("au_conv2_3x3", 250, 64, 105, 64, 192, 3, 3, (1, 1), (1, 1)),
        ("3a_merged_1x1", 250, 28, 28, 192, 224, 1, 1, (1, 1), (0, 0)),
        ("3b_d3x3", 250, 28, 28, 96, 96, 3, 3, (1, 1), (1, 1)),
        ("4c_3x3", 250, 14, 14, 128, 160, 3, 3, (1, 1), (1, 1)),
        ("5b_merged_1x1", 250, 7, 7, 1056, 736, 1, 1, (1, 1), (0, 0)),
    ]
    dn = ("NHWC", "HWIO", "NHWC")

    for name, n, h, w, ci, co, kh, kw, stride, pad in shapes:
        xq = jnp.asarray(rngn.integers(-127, 128, (n, h, w, ci)), jnp.int8)
        kern_f = rngn.standard_normal((kh, kw, ci, co)).astype(np.float32) * 0.05
        s_k = np.abs(kern_f).max(axis=(0, 1, 2)) / 127.0
        kern_q = jnp.asarray(
            np.clip(np.round(kern_f / s_k), -127, 127), jnp.int8
        )
        deq = jnp.asarray(s_k * (6.0 / 127.0), jnp.float32)
        bias = jnp.asarray(rngn.standard_normal(co) * 0.01, jnp.float32)
        s_out = 6.0 / 127.0
        pads = ((pad[0], pad[0]), (pad[1], pad[1]))

        def deq_only(x_, k_):
            y = jax.lax.conv_general_dilated(
                x_, k_, stride, pads, dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )
            return jax.nn.relu(y.astype(jnp.float32) * deq + bias).astype(
                jnp.bfloat16
            )

        def chain_q(x_, k_):
            y = jax.lax.conv_general_dilated(
                x_, k_, stride, pads, dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )
            f = jax.nn.relu(y.astype(jnp.float32) * deq + bias)
            return jnp.clip(jnp.round(f / s_out), -127, 127).astype(jnp.int8)

        row = {"shape": name}
        row["deq_only_ms"] = round(measure(deq_only, (xq, kern_q)) * 1e3, 3)
        row["chain_ms"] = round(measure(chain_q, (xq, kern_q)) * 1e3, 3)
        try:
            def prefer_f32(x_, k_):
                y = jax.lax.conv_general_dilated(
                    x_, k_, stride, pads, dimension_numbers=dn,
                    preferred_element_type=jnp.float32,
                )
                return jax.nn.relu(y * deq + bias).astype(jnp.bfloat16)

            row["prefer_f32_ms"] = round(
                measure(prefer_f32, (xq, kern_q)) * 1e3, 3
            )
        except Exception as e:  # noqa: BLE001
            row["prefer_f32_error"] = f"{type(e).__name__}: {e}"[:160]
        print(json.dumps(row), flush=True)

    # int8 vs bf16 max pool (3x3/2 ceil -> via explicit pad like the model)
    for pname, (n, h, w, c) in (
        ("pool1_rgb", (250, 112, 112, 64)),
        ("pool2_rgb", (250, 56, 56, 192)),
        ("pool1_audio", (250, 128, 210, 64)),
    ):
        xf = jnp.asarray(rngn.standard_normal((n, h, w, c)), jnp.bfloat16)
        xq = jnp.asarray(rngn.integers(-127, 128, (n, h, w, c)), jnp.int8)

        def pool(x_, _k=None):
            return jax.lax.reduce_window(
                x_,
                jnp.asarray(-127, x_.dtype) if x_.dtype == jnp.int8
                else jnp.asarray(-jnp.inf, x_.dtype),
                jax.lax.max,
                (1, 3, 3, 1),
                (1, 2, 2, 1),
                ((0, 0), (0, 1), (0, 1), (0, 0)),
            )

        t_bf = measure(pool, (xf, jnp.zeros((), jnp.bfloat16)))
        t_q = measure(pool, (xq, jnp.zeros((), jnp.int8)))
        print(
            json.dumps(
                {
                    "shape": pname,
                    "pool_bf16_ms": round(t_bf * 1e3, 3),
                    "pool_int8_ms": round(t_q * 1e3, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
