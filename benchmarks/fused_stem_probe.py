#!/usr/bin/env python
"""A/B probe: fused Pallas stem vs the production XLA stem lowering.

VERDICT r4 item 3 — the last measured inference headroom: the XLA stem
runs at HBM bandwidth with the conv activation (B, 112, 112, 64) making a
full HBM round trip into the pool pass (~800 MB/headline batch across the
three stems), plus ~1.4 ms of input-affine relayout copies visible in the
round-3 trace. ``ops/fused_stem.fused_stem_pallas`` keeps the whole
normalize -> packed conv -> BN-fold -> ReLU -> ceil-pool chain VMEM-
resident per batch element and writes only the pooled (B, 56, 56, 64).

Per headline stem shape (batch 10 x 25 segments = 250 folded rows) this
measures, with the chained-program/one-readback methodology (PERF.md —
per-call dispatch over the tunneled TPU swamps single-op timings):

  A. production XLA chain: packed-column conv (the TorchConv lowering's
     geometry) + bias + ReLU + reduce_window ceil max-pool, bf16;
  B. the fused Pallas kernel, bf16.

Verdict and integration decision recorded in PERF.md round 5.

Usage: python benchmarks/fused_stem_probe.py [iters] [--shapes rgb,flow]
       [--paths xla,pallas]

(The filters exist because the tunnel's remote compile cache is
per-process — re-running everything re-pays ~3-8 min per chained
program; iterate the pallas side alone while developing.)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(fn, args, iters):
    """Chain ``iters`` applications in ONE jitted program, one readback."""
    import jax
    import jax.numpy as jnp

    def chain(x, *rest):
        dep = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            y = fn(x + dep.astype(x.dtype), *rest)
            dep = y.ravel()[0].astype(jnp.float32) * 1e-12
        return dep

    jfn = jax.jit(chain)
    float(jfn(*args))  # compile + settle
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        float(jfn(*args))
        best = min(best, (time.perf_counter() - start) / iters)
    return best


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("iters", nargs="?", type=int, default=12)
    parser.add_argument("--shapes", default="rgb,flow,audio")
    parser.add_argument("--paths", default="xla,pallas")
    cli = parser.parse_args()
    iters = cli.iters
    want_shapes = set(cli.shapes.split(","))
    want_paths = set(cli.paths.split(","))

    import jax
    import jax.numpy as jnp

    from attention_based_tbn_tpu.ops.fused_stem import (
        _pack_kernel,
        fused_stem_pallas,
        fused_stem_reference,
    )
    from attention_based_tbn_tpu.ops.pooling import max_pool2d

    rng = np.random.default_rng(0)
    # (name, H, W, C, input dtype): headline stems at folded batch 250
    shapes = [
        ("rgb", 224, 224, 3, np.uint8),
        ("flow", 224, 224, 10, np.uint8),
        ("audio", 256, 420, 1, np.float32),
    ]
    B, F = 250, 64
    results = {}

    for name, h, w, c, in_dtype in shapes:
        if name not in want_shapes:
            continue
        if in_dtype == np.uint8:
            x = rng.integers(0, 255, (B, h, w, c)).astype(np.uint8)
            scale = np.full(c, 1 / 255.0, np.float32)
            offset = np.full(c, -0.45, np.float32)
        else:
            x = (np.abs(rng.standard_normal((B, h, w, c))) * 2).astype(np.float32)
            scale = np.ones(c, np.float32)
            offset = np.zeros(c, np.float32)
        kernel = (rng.standard_normal((7, 7, c, F)) * 0.05).astype(np.float32)
        bias = (rng.standard_normal(F) * 0.1).astype(np.float32)

        xj = jnp.asarray(x)
        kp = jnp.asarray(_pack_kernel(kernel), jnp.bfloat16)
        bj = jnp.asarray(bias)
        sj, oj = jnp.asarray(np.tile(scale, 2)), jnp.asarray(np.tile(offset, 2))

        # --- A: production XLA chain on the packed layout, bf16 ---------
        def xla_stem(xin, kpk, b, s, o):
            b_, h_, w_, c_ = xin.shape
            xp = xin.reshape(b_, h_, w_ // 2, 2 * c_).astype(jnp.bfloat16)
            xp = xp * s.astype(jnp.bfloat16) + o.astype(jnp.bfloat16)
            wp = kpk.reshape(7, 4, 2 * c_, F)
            y = jax.lax.conv_general_dilated(
                xp, wp, (2, 1), ((3, 3), (2, 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = y[:, : h_ // 2, : w_ // 2]
            y = jax.nn.relu(y + b.astype(y.dtype))
            return max_pool2d(y, 3, 2, 0, ceil_mode=True)

        t_xla = None
        if "xla" in want_paths:
            t_xla = measure(xla_stem, (xj, kp, bj, sj, oj), iters)
            print(json.dumps({name: {"xla_ms": round(t_xla * 1e3, 3)}}), flush=True)

        # --- B: fused Pallas kernel, bf16 -------------------------------
        def pallas_stem(xin, kpk, b, s, o):
            return fused_stem_pallas(
                xin, kpk, b, s[: s.shape[0] // 2], o[: o.shape[0] // 2],
                dtype=jnp.bfloat16,
            )

        t_pal = None
        if "pallas" in want_paths:
            t_pal = measure(pallas_stem, (xj, kp, bj, sj, oj), iters)
            print(json.dumps({name: {"pallas_ms": round(t_pal * 1e3, 3)}}), flush=True)

        # correctness spot check on the chip (bf16 tolerance)
        if "pallas" not in want_paths:
            results[name] = {"xla_ms": round(t_xla * 1e3, 3)}
            continue
        want = np.asarray(
            fused_stem_reference(xj, jnp.asarray(kernel), bj,
                                 jnp.asarray(scale), jnp.asarray(offset),
                                 dtype=jnp.bfloat16),
            np.float32,
        )
        got = np.asarray(
            fused_stem_pallas(xj, kp, bj, jnp.asarray(scale),
                              jnp.asarray(offset), dtype=jnp.bfloat16),
            np.float32,
        )
        rel = float(
            np.sqrt(np.mean((got - want) ** 2))
            / (np.sqrt(np.mean(want**2)) + 1e-12)
        )

        results[name] = {
            "pallas_ms": round(t_pal * 1e3, 3),
            "rel_rmse_vs_ref": round(rel, 5),
        }
        if t_xla is not None:
            results[name]["xla_ms"] = round(t_xla * 1e3, 3)
            results[name]["speedup"] = round(t_xla / t_pal, 3)
        print(json.dumps({name: results[name]}), flush=True)

    summary = {
        "probe": "fused_stem",
        "batch": B,
        "iters": iters,
        "device": str(jax.devices()[0]),
        "results": results,
    }
    if all("xla_ms" in r and "pallas_ms" in r for r in results.values()) and results:
        total_xla = sum(r["xla_ms"] for r in results.values())
        total_pal = sum(r["pallas_ms"] for r in results.values())
        summary["total_xla_ms"] = round(total_xla, 3)
        summary["total_pallas_ms"] = round(total_pal, 3)
        summary["verdict"] = "pallas wins" if total_pal < total_xla else "xla wins"
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
