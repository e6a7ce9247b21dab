#!/usr/bin/env python
"""Probe: s8 x s8 -> s32 convolutions on the real model shapes vs bf16.

The v5e MXU executes int8 matmuls/convs at ~2x the bf16 rate (394 vs 197
TOPS peak) and int8 activations halve the HBM traffic of the
bandwidth-bound stem passes. This probe answers, per representative
inference conv shape at the headline batch (10 clips x 25 segments = 250
folded rows):

  1. does XLA on this PJRT plugin lower s8 conv_general_dilated natively
     (no silent upcast)?  -> compare int8_pure vs bf16 time;
  2. what does the PRACTICAL pipeline pay — bf16 activations in, quantize
     (scale+round+clip+cast, fusable into the previous epilogue), s8 conv,
     int32 -> per-output-channel dequant scale + bias + relu -> bf16 out?

Only if (2) wins materially on the large shapes is a quantized serving
mode worth building into the model (tpu.quantize=int8).

Usage: python benchmarks/int8_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(fn, args, iters=24):
    """Chain ``iters`` applications in ONE jitted program, one readback
    (PERF.md methodology — per-call dispatch over the tunneled TPU swamps
    single-op timings)."""
    import jax
    import jax.numpy as jnp

    def chain(x, k):
        dep = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            y = fn(x + dep.astype(x.dtype), k)
            dep = y.ravel()[0].astype(jnp.float32) * 1e-12
        return dep

    jfn = jax.jit(chain)
    float(jfn(*args))  # compile + settle
    start = time.perf_counter()
    float(jfn(*args))
    return (time.perf_counter() - start) / iters


def main():
    import jax
    import jax.numpy as jnp

    rngn = np.random.default_rng(0)

    # (name, N, H, W, C_in, C_out, kh, kw, stride, pad): inference shapes at
    # the headline batch 10 (folded 250 rows; audio spectrogram 256x420).
    shapes = [
        ("stem_rgb_packed", 250, 224, 112, 6, 64, 7, 4, (2, 1), (3, 2)),
        ("stem_audio_packed", 250, 256, 210, 2, 64, 7, 4, (2, 1), (3, 2)),
        ("conv2_3x3", 250, 56, 56, 64, 192, 3, 3, (1, 1), (1, 1)),
        ("au_conv2_3x3", 250, 64, 105, 64, 192, 3, 3, (1, 1), (1, 1)),
        ("3a_merged_1x1", 250, 28, 28, 192, 224, 1, 1, (1, 1), (0, 0)),
        ("3b_d3x3", 250, 28, 28, 96, 96, 3, 3, (1, 1), (1, 1)),
        ("4c_3x3", 250, 14, 14, 128, 160, 3, 3, (1, 1), (1, 1)),
        ("4e_d3x3_s2", 250, 14, 14, 256, 256, 3, 3, (2, 2), (1, 1)),
        ("5b_merged_1x1", 250, 7, 7, 1056, 736, 1, 1, (1, 1), (0, 0)),
        ("au_3b_d3x3", 250, 32, 53, 96, 96, 3, 3, (1, 1), (1, 1)),
    ]

    for name, n, h, w, ci, co, kh, kw, stride, pad in shapes:
        x = jnp.asarray(
            np.abs(rngn.standard_normal((n, h, w, ci))) * 1.5, jnp.bfloat16
        )
        kern_f = rngn.standard_normal((kh, kw, ci, co)).astype(np.float32) * 0.05
        # per-output-channel symmetric weight quantization
        s_k = np.abs(kern_f).max(axis=(0, 1, 2)) / 127.0
        kern_q = jnp.asarray(
            np.clip(np.round(kern_f / s_k), -127, 127), jnp.int8
        )
        kern_bf = jnp.asarray(kern_f, jnp.bfloat16)
        s_x = 6.0 / 127.0  # static activation scale (calibrated in-model)
        deq = jnp.asarray(s_k * s_x, jnp.float32)
        bias = jnp.asarray(rngn.standard_normal(co) * 0.01, jnp.float32)
        pads = ((pad[0], pad[0]), (pad[1], pad[1]))
        dn = ("NHWC", "HWIO", "NHWC")

        def conv_bf16(x_, k_):
            y = jax.lax.conv_general_dilated(
                x_, k_, stride, pads, dimension_numbers=dn
            )
            return jax.nn.relu(y + bias.astype(y.dtype))

        def conv_int8_pure(x_, k_):
            return jax.lax.conv_general_dilated(
                x_, k_, stride, pads, dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )

        def conv_int8_e2e(x_, k_):
            q = jnp.clip(jnp.round(x_.astype(jnp.float32) / s_x), -127, 127)
            q = q.astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                q, k_, stride, pads, dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * deq + bias
            return jax.nn.relu(y).astype(jnp.bfloat16)

        row = {"shape": name}
        t_bf = measure(conv_bf16, (x, kern_bf))
        row["bf16_ms"] = round(t_bf * 1e3, 3)
        try:
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) / s_x), -127, 127
            ).astype(jnp.int8)
            t_pure = measure(conv_int8_pure, (xq, kern_q))
            row["int8_pure_ms"] = round(t_pure * 1e3, 3)
            t_e2e = measure(conv_int8_e2e, (x, kern_q))
            row["int8_e2e_ms"] = round(t_e2e * 1e3, 3)
            row["speedup_e2e"] = round(t_bf / t_e2e, 3)
            # numerics: relative error of the quantized pipeline vs fp32
            ref = jax.nn.relu(
                jax.lax.conv_general_dilated(
                    x.astype(jnp.float32), jnp.asarray(kern_f), stride, pads,
                    dimension_numbers=dn,
                )
                + bias
            )
            got = conv_int8_e2e(x, kern_q).astype(jnp.float32)
            num = float(jnp.sqrt(jnp.mean((got - ref) ** 2)))
            den = float(jnp.sqrt(jnp.mean(ref**2))) or 1.0
            row["rel_rmse"] = round(num / den, 5)
        except Exception as e:  # noqa: BLE001 — probe must report, not die
            row["int8_error"] = f"{type(e).__name__}: {e}"[:200]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
