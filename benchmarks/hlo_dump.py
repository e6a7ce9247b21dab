#!/usr/bin/env python
"""Dump the optimized HLO of the flagship inference graph and summarize the
named fusions a device trace points at.

Usage:
  python benchmarks/hlo_dump.py [variant] fusion.17 fusion.7 copy.530 ...
  python benchmarks/hlo_dump.py [variant] --all     # every fusion, one line

For each requested op, prints its full HLO definition block (computation
body for fusions) so trace hot spots can be attributed to model code via
the op_name metadata XLA carries from JAX.
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_compiled(variant: str):
    import jax
    import jax.numpy as jnp

    from attention_based_tbn_tpu.utils.platform import enable_compile_cache

    enable_compile_cache(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache_tpu",
        ),
        min_compile_secs=10.0,
    )

    from attention_based_tbn_tpu.config import load_config
    from benchmarks.infer_ab import build, make_batch

    cfg = load_config(
        overrides=[
            "model.attention.type=mha",
            "model.pretrained=False",
            "tpu.compute_dtype=bfloat16",
        ]
    )
    model = build(variant, cfg)
    # batch 10 = bench.py's lane-filling headline batch (matches
    # trace_infer.py so trace<->HLO op names line up)
    batch = make_batch(cfg, batch_size=10)
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
        batch = dict(batch)
        batch["Audio"] = batch["Audio"] + dep
        out = model.apply(variables, batch, train=False)
        return out, out["verb"][0, 0] * 1e-12

    import jax

    lowered = jax.jit(forward).lower(variables, batch, jnp.float32(0.0))
    return lowered.compile()


def build_compiled_train(extra_overrides=()):
    """Compile the full SPMD training step (same workload as
    benchmarks/train_bench.py) and return the compiled executable."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from attention_based_tbn_tpu.utils.platform import enable_compile_cache

    enable_compile_cache(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache_tpu",
        ),
        min_compile_secs=10.0,
    )

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
        + list(extra_overrides)
    )
    modality = ["RGB", "Flow", "Audio"]
    model = TBNModel(TBNSpec.from_config(cfg, modality))
    bs, n_seg = int(cfg.train.batch_size), int(cfg.train.num_segments)
    crop = int(cfg.data.train_crop_size)
    audio_len = int(cfg.data.audio.audio_length * cfg.data.audio.sampling_rate)
    rng = np.random.default_rng(0)
    batch = {
        "RGB": jnp.asarray(
            rng.integers(0, 255, (bs, n_seg, crop, crop, 3))
            .reshape(bs, n_seg, crop, crop // 2, 6),
            jnp.uint8,
        ),
        "Flow": jnp.asarray(
            rng.integers(0, 255, (bs, n_seg, crop, crop, 10))
            .reshape(bs, n_seg, crop, crop // 2, 20),
            jnp.uint8,
        ),
        "Audio": jnp.asarray(
            rng.standard_normal((bs, n_seg, audio_len)) * 0.1, jnp.float32
        ),
    }
    targets = {
        "class": {
            "verb": jnp.asarray(rng.integers(0, 125, bs), jnp.int32),
            "noun": jnp.asarray(rng.integers(0, 352, bs), jnp.int32),
        }
    }
    state = create_train_state(model, batch, optax.identity(), jax.random.key(0))
    tx, _ = build_optimizer(cfg, state.params, modality)
    state = state.replace(opt_state=tx.init(state.params))
    step = make_train_step(model, tx, cfg, mesh=None)
    lowered = step.fns[False].lower(
        state, batch, targets, jax.random.key(1), jnp.asarray(0), jnp.int32(bs)
    )
    return lowered.compile()


def main():
    args = sys.argv[1:]
    train = "--train" in args
    if train:
        args.remove("--train")
    variant = "merged"
    if args and not args[0].startswith("--") and "." not in args[0]:
        variant = args.pop(0)

    compiled = build_compiled_train() if train else build_compiled(variant)
    text = compiled.as_text()
    out_path = "/tmp/tbn_train_hlo.txt" if train else "/tmp/tbn_infer_hlo.txt"
    with open(out_path, "w") as fh:
        fh.write(text)
    print(f"optimized HLO written to {out_path} ({len(text)/1e6:.1f} MB)")

    if "--all" in args:
        for line in text.splitlines():
            m = re.match(r"\s*%?([\w.-]*fusion[\w.-]*) = (\S+) fusion\(", line)
            if m:
                meta = re.search(r'op_name="([^"]*)"', line)
                print(f"{m.group(1):28s} {m.group(2):28s} {meta.group(1) if meta else ''}")
        return

    names = [a for a in args if not a.startswith("--")]
    lines = text.splitlines()
    for want in names:
        pat = re.compile(rf"^\s*%?{re.escape(want)} = ")
        for i, line in enumerate(lines):
            if pat.search(line):
                print("=" * 100)
                # print the definition line plus its fused computation if any
                print(line.strip()[:3000])
                comp = re.search(r"calls=([\w.-]+)", line)
                meta = re.search(r'op_name="([^"]*)"', line)
                if meta:
                    print(f"  op_name: {meta.group(1)}")
                if comp:
                    body = extract_computation(lines, comp.group(1))
                    print(f"  --- fused computation {comp.group(1)} ---")
                    for b in body[:80]:
                        print("   ", b.strip()[:220])
                break
        else:
            print(f"{want}: NOT FOUND")


def extract_computation(lines, name):
    out = []
    inside = False
    for line in lines:
        if not inside and re.match(rf"%?{re.escape(name)} ", line.strip()):
            inside = True
        if inside:
            out.append(line)
            if line.strip() == "}":
                break
    return out


if __name__ == "__main__":
    main()
