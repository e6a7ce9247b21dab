#!/usr/bin/env python
"""Training-step throughput on real hardware: the reference train recipe.

Batch 12 x 3 segments, tri-modal (RGB + flow stacks + 2.1 s audio) MHA TBN;
one jitted SPMD step (forward + spectrogram + loss + backward + clip + SGD +
BN stats). Prints one JSON line. Uses the same chained-execution protocol as
bench.py (see PERF.md "Measurement methodology").

The persistent compilation cache is enabled: the backward of the 224 px
tri-modal graph takes ~45 min to compile over the axon tunnel on a cold
cache, seconds warm.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from attention_based_tbn_tpu.utils.platform import enable_compile_cache

    enable_compile_cache(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache_tpu",
        ),
        min_compile_secs=10.0,
    )

    import jax.numpy as jnp

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
        + sys.argv[1:]  # e.g. tpu.pool_fast_vjp=True for A/B runs
    )
    modality = ["RGB", "Flow", "Audio"]
    spec = TBNSpec.from_config(cfg, modality)
    model = TBNModel(spec)

    batch_size = int(cfg.train.batch_size)  # 12, the reference recipe
    n_seg = int(cfg.train.num_segments)  # 3
    crop = int(cfg.data.train_crop_size)  # 224
    audio_len = int(cfg.data.audio.audio_length * cfg.data.audio.sampling_rate)

    rng = np.random.default_rng(0)
    # host-column-paired visual streams, like the production loader
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

    # build_optimizer needs the param tree: init with a placeholder
    # transformation, then swap in the configured optimizer
    import optax

    state = create_train_state(model, batch, optax.identity(), jax.random.key(0))
    tx, _ = build_optimizer(cfg, state.params, modality)
    state = state.replace(opt_state=tx.init(state.params))

    from attention_based_tbn_tpu.parallel.train_step import (
        make_multi_fused_step,
        make_multi_train_step,
    )

    # Steady-state protocol: K steps per dispatch via the production
    # scanned executable (tpu.steps_per_call / make_multi_train_step).
    # Per-call dispatch over the tunneled runtime costs ~9 ms of host time
    # that measured the tunnel, not the chip: one-dispatch-per-step
    # reported ~50 ms/step where the device trace shows 41 ms of
    # execution. The scan consumes K DISTINCT batches (stacked leading
    # axis), exactly like the trainer — nothing is loop-invariant, so XLA
    # cannot hoist input preprocessing (or anything else) out of the loop.
    #
    # With train.optim.accumulator_step=G > 1 + tpu.fuse_accum=True (A/B
    # opt-in; measured negative, PERF.md round 3) the scanned executable
    # is the FUSED one: each scan element is a (G, B, ...) group = one
    # optimizer update, vmapped over the G micro-batches. The reported
    # sec_per_step is per MICRO-batch (12 clips), comparable across modes;
    # the reference's headline MHA recipe uses accumulator_step=4
    # (README.md:113). tx must then be built with accumulate=False.
    accum_k = int(cfg.train.optim.accumulator_step)
    fused = accum_k > 1 and bool(cfg.get_path("tpu.fuse_accum", False))
    if fused:
        tx, _ = build_optimizer(cfg, state.params, modality, accumulate=False)
        state = state.replace(opt_state=tx.init(state.params))

    scan_len = 8 // accum_k if fused else 8
    scan_len = max(scan_len, 2)
    micro_per_call = scan_len * (accum_k if fused else 1)
    rng_key = jax.random.key(1)

    @jax.jit
    def gen_batches(key):
        ks = jax.random.split(key, 3)
        if fused:
            shp = lambda a: (scan_len, accum_k) + a.shape  # noqa: E731
        else:
            shp = lambda a: (scan_len,) + a.shape  # noqa: E731
        return {
            "RGB": jax.random.randint(ks[0], shp(batch["RGB"]), 0, 255, jnp.uint8),
            "Flow": jax.random.randint(ks[1], shp(batch["Flow"]), 0, 255, jnp.uint8),
            "Audio": jax.random.normal(ks[2], shp(batch["Audio"])) * 0.1,
        }

    batches = gen_batches(jax.random.key(7))
    lead = (scan_len, accum_k) if fused else (scan_len,)
    targetss = jax.tree.map(
        lambda x: jnp.broadcast_to(x, lead + x.shape), targets
    )

    if fused:
        multi_step = make_multi_fused_step(
            model, tx, cfg, mesh=None, steps=scan_len
        )
    else:
        multi_step = make_multi_train_step(
            model, tx, cfg, mesh=None, steps=scan_len
        )

    new_state, losses, _ = multi_step(
        state, batches, targetss, rng_key, jnp.asarray(0)
    )
    first = float(np.ravel(losses["total"])[0])  # force compile + settle

    outer = 6
    state = new_state
    start = time.perf_counter()
    for _ in range(outer):
        state, losses, _ = multi_step(
            state, batches, targetss, rng_key, jnp.asarray(0)
        )
    total = float(np.ravel(losses["total"])[-1])  # ONE readback ends the chain
    elapsed = time.perf_counter() - start

    sec_per_step = elapsed / (outer * micro_per_call)
    print(
        json.dumps(
            {
                "metric": "train_clips_per_sec_per_chip",
                "value": round(batch_size / sec_per_step, 2),
                "unit": "clips/s",
                "sec_per_step": round(sec_per_step, 4),
                "batch_size": batch_size,
                "segments": n_seg,
                "accumulator_step": accum_k,
                "fused_accum": fused,
                "loss_first": round(first, 4),
                "loss_last": round(total, 4),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
