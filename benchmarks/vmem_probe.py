#!/usr/bin/env python
"""A/B: per-jit compiler_options on the headline inference graph.

Round-4 finding: jit(..., compiler_options=...) DOES reach the remote
compiler on the tunneled platform (timings respond to the option), which
opens per-program TPU-flag tuning without XLA_FLAGS (the local CPU jaxlib
rejects TPU flag names in the env var).

Measured on the 25-seg tri-modal b10 graph (baseline 46.8-46.9 ms):
  xla_tpu_scoped_vmem_limit_kib=32768 -> 46.5 ms (215.1 clips/s)  wash
  xla_tpu_scoped_vmem_limit_kib=65536 -> 47.7 ms (209.7 clips/s)  worse
Conclusion: the conv-fusion wall (PERF.md round 3) is not scoped-VMEM
bound; default stays.
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

    from attention_based_tbn_tpu.config import load_config
    from attention_based_tbn_tpu.models.tbn import TBNModel, TBNSpec

    cfg = load_config(overrides=[
        "model.attention.type=mha", "model.pretrained=False",
        "tpu.compute_dtype=bfloat16",
    ])
    modality = ["RGB", "Flow", "Audio"]
    model = TBNModel(TBNSpec.from_config(cfg, modality))
    n_seg, bs, crop = 25, 10, 224
    audio_len = int(cfg.data.audio.audio_length * cfg.data.audio.sampling_rate)
    rng = np.random.default_rng(0)
    batch = {
        "RGB": jnp.asarray(
            rng.integers(0, 255, (bs, n_seg, crop, crop, 3))
            .reshape(bs, n_seg, crop, crop // 2, 6), jnp.uint8),
        "Flow": jnp.asarray(
            rng.integers(0, 255, (bs, n_seg, crop, crop, 10))
            .reshape(bs, n_seg, crop, crop // 2, 20), jnp.uint8),
        "Audio": jnp.asarray(
            rng.standard_normal((bs, n_seg, audio_len)) * 0.1, jnp.float32),
    }
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2), "audio_dropout": jax.random.key(3)}
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(rngs, batch)
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, variables)

    def forward(variables, batch, dep):
        batch = dict(batch)
        batch["Audio"] = batch["Audio"] + dep
        out = model.apply(variables, batch, train=False)
        return out, out["verb"][0, 0] * 1e-12

    variants = [json.loads(a) for a in sys.argv[1:]] or [
        {"xla_tpu_scoped_vmem_limit_kib": "32768"},
        {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    ]
    for opts in variants:
        try:
            fn = jax.jit(forward, compiler_options=opts)
            out, dep = fn(variables, batch, jnp.float32(0.0))
            float(np.asarray(out["verb"], np.float32).sum())
            iters = 40
            start = time.perf_counter()
            for _ in range(iters):
                out, dep = fn(variables, batch, dep)
            float(np.asarray(out["verb"], np.float32).sum())
            dt = (time.perf_counter() - start) / iters
            print(json.dumps({"opts": opts, "sec_per_batch": round(dt, 4),
                              "clips_per_sec": round(bs / dt, 1)}))
        except Exception as exc:  # unknown flags fail per-variant, not fatally
            print(json.dumps({"opts": opts, "error": repr(exc)[:200]}))


if __name__ == "__main__":
    main()
