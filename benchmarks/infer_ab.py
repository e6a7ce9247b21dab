#!/usr/bin/env python
"""A/B throughput experiments for the flagship inference graph on real TPU.

Usage: python benchmarks/infer_ab.py [variant ...]
Variants: baseline, merged, merged_fastcons, ...

Measures the same chained-execution protocol as bench.py (K-long data-
dependent chain, ONE readback; see PERF.md "Measurement methodology") and
prints one JSON line per variant.
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(model, batch, iters=40):
    import jax
    import jax.numpy as jnp

    rngs = {
        "params": jax.random.key(0),
        "dropout": jax.random.key(1),
        "gumbel": jax.random.key(2),
        "audio_dropout": jax.random.key(3),
    }
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(rngs, batch)
    if getattr(model.spec, "quantize", "") == "int8":
        # populate quant_stats with the calibrated per-conv-site scales
        from attention_based_tbn_tpu.models.tbn import calibrate_quantization

        variables = calibrate_quantization(model.spec, variables, [batch])
    quant_stats = variables.get("quant_stats")
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        variables,
    )
    if quant_stats is not None:
        variables = {**variables, "quant_stats": quant_stats}  # keep fp32

    @jax.jit
    def forward(variables, batch, dep):
        batch = dict(batch)
        batch["Audio"] = batch["Audio"] + dep
        out = model.apply(variables, batch, train=False)
        return out, out["verb"][0, 0] * 1e-12

    t0 = time.perf_counter()
    out, dep = forward(variables, batch, jnp.float32(0.0))
    float(out["verb"].sum())
    compile_s = time.perf_counter() - t0

    start = time.perf_counter()
    for _ in range(iters):
        out, dep = forward(variables, batch, dep)
    float(out["verb"].sum())
    elapsed = time.perf_counter() - start
    return elapsed / iters, compile_s


def make_batch(cfg, batch_size=8):
    import jax.numpy as jnp

    n_segments = int(cfg.test.num_segments)
    crop = int(cfg.data.test_crop_size)
    audio_len = int(cfg.data.audio.audio_length * cfg.data.audio.sampling_rate)
    rng = np.random.default_rng(0)
    # host-column-paired visual streams, like the production loader
    return {
        "RGB": jnp.asarray(
            rng.integers(0, 255, (batch_size, n_segments, crop, crop, 3))
            .reshape(batch_size, n_segments, crop, crop // 2, 6),
            jnp.uint8,
        ),
        "Flow": jnp.asarray(
            rng.integers(0, 255, (batch_size, n_segments, crop, crop, 10))
            .reshape(batch_size, n_segments, crop, crop // 2, 20),
            jnp.uint8,
        ),
        "Audio": jnp.asarray(
            rng.standard_normal((batch_size, n_segments, audio_len)) * 0.1,
            jnp.float32,
        ),
    }


def build(variant, cfg):
    import dataclasses

    from attention_based_tbn_tpu.models.tbn import TBNModel, TBNSpec

    # Flag toggles (each variant names the flags it turns ON; the rest off)
    overrides = {
        "pool_proj_conv": "poolconv" in variant,
        "direct_stem": "directstem" in variant,
        "pool_impl": (
            "slices"
            if "slicepool" in variant
            else "pallas"
            if "pallaspool" in variant
            else "reduce_window"
        ),
    }
    if "fastcons" in variant:
        overrides["fast_consensus"] = True
    if "int8q" in variant:
        # post-training int8 compute quantization (tpu.quantize=int8);
        # calibration runs before the timed loop (see measure)
        overrides["quantize"] = "int8"
    if variant.startswith("baseline"):
        overrides["merge_inception"] = False
    spec = TBNSpec.from_config(cfg, ["RGB", "Flow", "Audio"])
    if overrides:
        spec = dataclasses.replace(spec, **overrides)
    return TBNModel(spec)


def main():
    from attention_based_tbn_tpu.config import load_config

    variants = sys.argv[1:] or ["merged"]
    cfg = load_config(
        overrides=[
            "model.attention.type=mha",
            "model.pretrained=False",
            "tpu.compute_dtype=bfloat16",
        ]
    )
    for variant in variants:
        # "_bN" suffix selects the batch size (folded rows = N x 25 segs;
        # the XLA batch-in-lanes layouts pad folded rows to a multiple of
        # 128, so sizes with bs*25 just under a multiple — 5->125, 10->250,
        # 20->500 — fill lanes better than the default 8->200->pad 256)
        bs = 8
        m = re.search(r"_b(\d+)$", variant)
        if m:
            bs = int(m.group(1))
        batch = make_batch(cfg, batch_size=bs)
        model = build(variant, cfg)
        sec, compile_s = measure(model, batch)
        print(
            json.dumps(
                {
                    "variant": variant,
                    "sec_per_batch": round(sec, 4),
                    "clips_per_sec": round(bs / sec, 1),
                    "compile_s": round(compile_s, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
