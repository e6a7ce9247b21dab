#!/usr/bin/env python
"""Capture + parse a device trace of the flagship inference graph.

Usage: python benchmarks/trace_infer.py [variant] [outdir]

Prints a per-op-category device-time breakdown (XLA op fusions, pools,
copies) parsed from the xplane proto via tensorboard_plugin_profile.
"""

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(variant: str, outdir: str, batch_size: int = 10):
    import jax
    import jax.numpy as jnp

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
    # default 10 = bench.py's lane-filling headline batch
    batch = make_batch(cfg, batch_size=batch_size)

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

    @jax.jit
    def forward(variables, batch, dep):
        batch = dict(batch)
        batch["Audio"] = batch["Audio"] + dep
        out = model.apply(variables, batch, train=False)
        return out, out["verb"][0, 0] * 1e-12

    out, dep = forward(variables, batch, jnp.float32(0.0))
    float(out["verb"].sum())  # compile + settle

    with jax.profiler.trace(outdir):
        for _ in range(3):
            out, dep = forward(variables, batch, dep)
        float(out["verb"].sum())


def parse(outdir: str):
    """Parse the Chrome-trace export (vm.trace.json.gz) the profiler wrote."""
    import gzip
    import json

    traces = []
    for root, _, files in os.walk(outdir):
        for name in files:
            if name.endswith(".trace.json.gz"):
                traces.append(os.path.join(root, name))
    assert traces, f"no trace.json.gz under {outdir}"
    path = max(traces, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)

    events = data.get("traceEvents", [])
    # device op events live on TPU pids whose thread name contains "XLA Op"
    op_tids = set()
    tpu_pids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            if "TPU" in ev.get("args", {}).get("name", ""):
                tpu_pids.add(ev["pid"])
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            if ev.get("pid") in tpu_pids and "XLA Op" in ev.get("args", {}).get(
                "name", ""
            ):
                op_tids.add((ev["pid"], ev["tid"]))

    per_name = defaultdict(float)
    per_bucket = defaultdict(float)
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X":
            continue
        if (ev.get("pid"), ev.get("tid")) not in op_tids:
            continue
        ms = ev.get("dur", 0) / 1e3
        name = ev.get("name", "?")
        per_name[name] += ms
        bucket = name
        if "fusion" in name:
            bucket = "fusion"
        elif "convolution" in name or "conv" in name:
            bucket = "convolution"
        elif "reduce-window" in name:
            bucket = "reduce-window"
        elif "copy" in name or "transpose" in name:
            bucket = "copy/transpose"
        else:
            bucket = name.split(".")[0]
        per_bucket[bucket] += ms
        total += ms

    print(f"trace: {path}")
    print(f"total device op time: {total:.2f} ms (3 execs -> {total/3:.2f} ms/exec)")
    for key, ms in sorted(per_bucket.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {key:28s} {ms:8.2f} ms  ({100*ms/max(total,1e-9):4.1f}%)")
    print("top ops:")
    for name, ms in sorted(per_name.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {ms:8.2f} ms  {name[:110]}")


if __name__ == "__main__":
    variant = sys.argv[1] if len(sys.argv) > 1 else "merged"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/tbn_trace"
    capture(variant, outdir)
    parse(outdir)
