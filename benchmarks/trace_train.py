#!/usr/bin/env python
"""Capture + parse a device trace of the full SPMD training step.

Same workload as benchmarks/train_bench.py (batch 12 x 3 segments,
tri-modal MHA, one jitted step) and the same xplane parse as
benchmarks/trace_infer.py. Usage: python benchmarks/trace_train.py [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def capture(outdir: str):
    import jax

    from attention_based_tbn_tpu.utils.platform import enable_compile_cache

    enable_compile_cache(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
        min_compile_secs=10.0,
    )

    import jax.numpy as jnp
    import optax

    from attention_based_tbn_tpu.config import load_config
    from attention_based_tbn_tpu.models.tbn import TBNModel, TBNSpec
    from attention_based_tbn_tpu.parallel.optim import build_optimizer
    from attention_based_tbn_tpu.parallel.train_step import (
        create_train_state,
        make_train_step,
    )

    cfg = load_config(
        overrides=[
            "model.attention.type=mha",
            "model.pretrained=False",
            "tpu.compute_dtype=bfloat16",
        ]
    )
    modality = ["RGB", "Flow", "Audio"]
    model = TBNModel(TBNSpec.from_config(cfg, modality))

    batch_size = int(cfg.train.batch_size)
    n_seg = int(cfg.train.num_segments)
    crop = int(cfg.data.train_crop_size)
    audio_len = int(cfg.data.audio.audio_length * cfg.data.audio.sampling_rate)

    rng = np.random.default_rng(0)
    batch = {
        "RGB": jnp.asarray(
            rng.integers(0, 255, (batch_size, n_seg, crop, crop, 3))
            .reshape(batch_size, n_seg, crop, crop // 2, 6),
            jnp.uint8,
        ),
        "Flow": jnp.asarray(
            rng.integers(0, 255, (batch_size, n_seg, crop, crop, 10))
            .reshape(batch_size, n_seg, crop, crop // 2, 20),
            jnp.uint8,
        ),
        "Audio": jnp.asarray(
            rng.standard_normal((batch_size, n_seg, audio_len)) * 0.1, jnp.float32
        ),
    }
    targets = {
        "class": {
            "verb": jnp.asarray(rng.integers(0, 125, batch_size), jnp.int32),
            "noun": jnp.asarray(rng.integers(0, 352, batch_size), jnp.int32),
        }
    }

    state = create_train_state(model, batch, optax.identity(), jax.random.key(0))
    tx, _ = build_optimizer(cfg, state.params, modality)
    state = state.replace(opt_state=tx.init(state.params))
    step = make_train_step(model, tx, cfg, mesh=None)

    state, loss, _ = step(
        state, batch, targets, jax.random.key(1), jnp.asarray(0), batch_size
    )
    float(loss["total"])

    with jax.profiler.trace(outdir):
        for _ in range(3):
            state, loss, _ = step(
                state, batch, targets, jax.random.key(1), jnp.asarray(0),
                batch_size,
            )
        float(loss["total"])


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tbn_train_trace"
    capture(outdir)
    from benchmarks.trace_infer import parse

    parse(outdir)
