#!/usr/bin/env python
"""Probes for the last visible inference slack (PERF.md round 3):

1. ``tower_u8`` vs ``tower_pre``: one BN-Inception visual tower fed the
   production uint8 column-paired stream WITH the in-graph affine
   normalize, vs the same tower fed a PRE-normalized bf16 stream
   (input_scale=None). The delta bounds what eliminating the
   input-affine relayout copies (~1.4 ms/exec in the b10 trace) could
   ever buy — if XLA's copy were free the two would time identically.

2. ``scan4``: the full flagship forward executed as lax.scan(K=4)
   inside ONE jit, vs the per-exec dispatch chain bench.py uses. The
   delta is the per-execution launch/teardown overhead that batching
   dispatches could recover.

Usage: python benchmarks/prenorm_probe.py [tower|scan] ...
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROWS = 250  # batch 10 x 25 segments, the headline folded batch


def _bf16_vars(jax, jnp, variables):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        variables,
    )


def tower_probe(channels, label):
    import jax
    import jax.numpy as jnp

    from attention_based_tbn_tpu.models.bn_inception import BNInception

    tower = BNInception(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x_u8 = jnp.asarray(
        rng.integers(0, 255, (ROWS, 224, 112, 2 * channels)), jnp.uint8
    )
    scale = jnp.asarray(rng.uniform(0.8, 1.2, (2 * channels,)), jnp.float32)
    offset = jnp.asarray(rng.uniform(-0.5, 0.5, (2 * channels,)), jnp.float32)
    # the pre-normalized stream the loader WOULD deliver if normalization
    # moved to the host (same values the in-graph affine produces)
    x_pre = (
        x_u8.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16)
        + offset.astype(jnp.bfloat16)
    )
    x_pre = jax.device_put(x_pre)

    variables = jax.jit(
        lambda: tower.init(
            jax.random.key(0), x_u8, False, None, scale, offset, True
        ),
        static_argnums=(),
    )()
    variables = _bf16_vars(jax, jnp, variables)

    @jax.jit
    def fwd_u8(v, x, scale, offset, dep):
        y = tower.apply(v, x, False, None, scale + dep, offset, True)
        return y, (y[0, 0] * 1e-12).astype(jnp.float32)

    @jax.jit
    def fwd_pre(v, x, dep):
        y = tower.apply(v, x + dep.astype(x.dtype), False, None, None, None, True)
        return y, (y[0, 0] * 1e-12).astype(jnp.float32)

    for name, fn, args in (
        ("u8_affine", fwd_u8, (variables, x_u8, scale, offset)),
        ("prenorm_bf16", fwd_pre, (variables, x_pre)),
    ):
        y, dep = fn(*args, jnp.float32(0.0))
        float(y.sum())
        iters = 60
        start = time.perf_counter()
        for _ in range(iters):
            y, dep = fn(*args, dep)
        float(y.sum())
        sec = (time.perf_counter() - start) / iters
        print(
            json.dumps(
                {"probe": f"tower_{label}_{name}", "ms_per_exec": round(sec * 1e3, 3)}
            ),
            flush=True,
        )


def scan_probe():
    import jax
    import jax.numpy as jnp

    from attention_based_tbn_tpu.config import load_config
    from attention_based_tbn_tpu.models.tbn import TBNModel, TBNSpec
    from benchmarks.infer_ab import make_batch, measure

    cfg = load_config(
        overrides=[
            "model.attention.type=mha",
            "model.pretrained=False",
            "tpu.compute_dtype=bfloat16",
        ]
    )
    model = TBNModel(TBNSpec.from_config(cfg, ["RGB", "Flow", "Audio"]))
    batch = make_batch(cfg, batch_size=10)
    sec, _ = measure(model, batch, iters=40)
    print(
        json.dumps({"probe": "dispatch_chain", "ms_per_batch": round(sec * 1e3, 3)}),
        flush=True,
    )

    rngs = {
        "params": jax.random.key(0),
        "dropout": jax.random.key(1),
        "gumbel": jax.random.key(2),
        "audio_dropout": jax.random.key(3),
    }
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(rngs, batch)
    variables = _bf16_vars(jax, jnp, variables)

    K = 4
    # K DISTINCT batches stacked as scan xs — with one shared batch the
    # visual towers are loop-invariant (the dep chain only touches Audio)
    # and XLA hoists them out of the scan body, which fakes a ~30% win.
    rng = np.random.default_rng(1)
    batches = jax.tree.map(
        lambda x: jnp.stack(
            [
                x,
                *(
                    jnp.asarray(
                        rng.integers(0, 255, x.shape).astype(np.asarray(x).dtype)
                        if x.dtype == jnp.uint8
                        else rng.standard_normal(x.shape).astype(np.float32) * 0.1
                    )
                    for _ in range(K - 1)
                ),
            ]
        ),
        batch,
    )

    @jax.jit
    def fwd_scan(variables, batches, dep):
        def body(dep, b):
            b = dict(b)
            b["Audio"] = b["Audio"] + dep
            out = model.apply(variables, b, train=False)
            return out["verb"][0, 0] * 1e-12, out["verb"][0, 0]

        dep, ys = jax.lax.scan(body, dep, batches)
        return ys, dep

    ys, dep = fwd_scan(variables, batches, jnp.float32(0.0))
    float(ys.sum())
    iters = 15  # 15 x K=4 = 60 executions, matching the chain probe
    start = time.perf_counter()
    for _ in range(iters):
        ys, dep = fwd_scan(variables, batches, dep)
    float(ys.sum())
    sec = (time.perf_counter() - start) / (iters * K)
    print(
        json.dumps({"probe": f"scan{K}", "ms_per_batch": round(sec * 1e3, 3)}),
        flush=True,
    )


def main():
    which = sys.argv[1:] or ["tower", "scan"]
    if "tower" in which:
        tower_probe(3, "rgb")
        tower_probe(10, "flow")
    if "scan" in which:
        scan_probe()


if __name__ == "__main__":
    main()
