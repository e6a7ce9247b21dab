#!/usr/bin/env python
"""Probe: AUTO input layouts for the flagship inference graph.

The batch parameters arrive H2D in JAX's default layout; the stem convs
want a different tiled layout, so every exec pays relayout copies on the
raw input (copy.530 Flow 0.94 ms + copy.492 RGB 0.2 ms in the r3 trace).
Compiling with AUTO input layouts and device_put-ing the batch in the
compiler-chosen format moves that relayout into the (overlapped) H2D path.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Format, Layout

    from attention_based_tbn_tpu.config import load_config
    from attention_based_tbn_tpu.models.tbn import TBNModel, TBNSpec
    from benchmarks.infer_ab import make_batch

    cfg = load_config(
        overrides=[
            "model.attention.type=mha",
            "model.pretrained=False",
            "tpu.compute_dtype=bfloat16",
        ]
    )
    model = TBNModel(TBNSpec.from_config(cfg, ["RGB", "Flow", "Audio"]))
    batch = make_batch(cfg)

    rngs = {
        "params": jax.random.key(0),
        "dropout": jax.random.key(1),
        "gumbel": jax.random.key(2),
        "audio_dropout": jax.random.key(3),
    }
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(rngs, batch)
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        variables,
    )

    def forward(variables, batch, dep):
        b = dict(batch)
        b["Audio"] = b["Audio"] + dep
        out = model.apply(variables, b, train=False)
        return out, out["verb"][0, 0] * 1e-12

    auto = Format(Layout.AUTO)
    jfn = jax.jit(forward, in_shardings=(auto, auto, None))
    compiled = jfn.lower(variables, batch, jnp.float32(0.0)).compile()
    (var_fmts, batch_fmts, _), _kw = compiled.input_formats

    variables = jax.tree.map(jax.device_put, variables, var_fmts)
    batch = jax.tree.map(jax.device_put, batch, batch_fmts)

    out, dep = compiled(variables, batch, jnp.float32(0.0))
    float(out["verb"].sum())

    iters = 60
    start = time.perf_counter()
    for _ in range(iters):
        out, dep = compiled(variables, batch, dep)
    float(out["verb"].sum())
    sec = (time.perf_counter() - start) / iters
    print(
        json.dumps(
            {
                "variant": "auto_layouts",
                "sec_per_batch": round(sec, 4),
                "clips_per_sec": round(8 / sec, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
