#!/usr/bin/env python
"""Timing-only A/B of the audio BN-Inception tower geometry.

variants:
  ft   — input (B, 256, 420, 1): freq-major, the current layout
  tf   — input (B, 420, 256, 1): time-major (what an exact kernel-transpose
         rewrite would produce; FLOP-identical, shapes transposed)
  ft_flags / tf_flags — same under the latency-hiding scheduler flag

Random weights; only timing matters.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(variant):
    import jax
    import jax.numpy as jnp

    from attention_based_tbn_tpu.models.bn_inception import BNInception

    b = 200
    shape = (b, 256, 420, 1) if variant.startswith("ft") else (b, 420, 256, 1)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(shape), jnp.bfloat16)

    model = BNInception(freq_pool_only=True, dtype=jnp.bfloat16)
    variables = jax.jit(lambda r, v: model.init(r, v, train=False))(
        jax.random.key(0), x
    )
    variables = jax.tree.map(
        lambda t: t.astype(jnp.bfloat16)
        if hasattr(t, "dtype") and t.dtype == jnp.float32
        else t,
        variables,
    )

    @jax.jit
    def forward(v, x, dep):
        out = model.apply(v, x + dep, train=False)
        return out, out.reshape(-1)[0] * 1e-12

    out, dep = forward(variables, x, jnp.bfloat16(0))
    float(out.sum())
    iters = 40
    start = time.perf_counter()
    for _ in range(iters):
        out, dep = forward(variables, x, dep)
    float(out.sum())
    sec = (time.perf_counter() - start) / iters
    print(json.dumps({"variant": variant, "ms_per_batch": round(sec * 1e3, 2)}),
          flush=True)


if __name__ == "__main__":
    for variant in sys.argv[1:] or ["ft", "tf"]:
        run(variant)
