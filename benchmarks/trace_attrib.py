#!/usr/bin/env python
"""Join a captured device trace with the optimized-HLO op_name metadata.

Reads the newest vm.trace.json.gz under the trace dir (default
/tmp/tbn_trace) and the HLO text dump (default /tmp/tbn_infer_hlo.txt,
written by benchmarks/hlo_dump.py), then aggregates device op time by
model attribution: tower / layer / op kind.

Usage: python benchmarks/trace_attrib.py [tracedir] [hlopath] [n_execs]
"""

import gzip
import json
import os
import re
import sys
from collections import defaultdict


def hlo_opnames(path):
    names = {}
    pat = re.compile(r"^\s*%?([\w.-]+) = .*?op_name=\"([^\"]*)\"")
    with open(path) as fh:
        for line in fh:
            m = pat.match(line)
            if m:
                names[m.group(1)] = m.group(2)
    return names


def trace_events(tracedir):
    traces = []
    for root, _, files in os.walk(tracedir):
        for name in files:
            if name.endswith(".trace.json.gz"):
                traces.append(os.path.join(root, name))
    assert traces, f"no trace.json.gz under {tracedir}"
    path = max(traces, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    tpu_pids, op_tids = set(), set()
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
    for ev in events:
        if ev.get("ph") == "X" and (ev.get("pid"), ev.get("tid")) in op_tids:
            yield ev.get("name", "?"), ev.get("dur", 0) / 1e3


def main():
    tracedir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tbn_trace"
    hlopath = sys.argv[2] if len(sys.argv) > 2 else "/tmp/tbn_infer_hlo.txt"
    n_execs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    names = hlo_opnames(hlopath)

    per_tower = defaultdict(float)
    per_layer = defaultdict(float)
    unattributed = defaultdict(float)
    total = 0.0
    for name, ms in trace_events(tracedir):
        total += ms
        op = names.get(name)
        if op is None:
            unattributed[name] += ms
            continue
        # paths look like jit(fwd)/TBNModel/Base_X/... or, in the train
        # step, jit(step_fn)/jvp(TBNModel)/Base_X/... and
        # transpose(jvp(TBNModel))/Base_X/... (backward ops)
        m = re.search(r"(Base_\w+)/([\w.]+?)(?:/|$)", op)
        if m:
            tower, layer = m.group(1), f"{m.group(1)}/{m.group(2)}"
        else:
            seg = re.search(r"TBNModel\)*/(\w+)", op)
            tower = seg.group(1) if seg else op.split("/")[-1][:30]
            layer = tower
        if "transpose(" in op:
            tower += " (bwd)"
            layer += " (bwd)"
        per_tower[tower] += ms
        per_layer[layer] += ms

    print(f"total {total:.2f} ms over {n_execs} execs -> {total/n_execs:.2f} ms/exec")
    print("\nby tower (ms/exec):")
    for k, v in sorted(per_tower.items(), key=lambda kv: -kv[1]):
        print(f"  {k:24s} {v/n_execs:7.2f}")
    un = sum(unattributed.values())
    print(f"  {'(unattributed)':24s} {un/n_execs:7.2f}")
    print("\nby layer (ms/exec, top 40):")
    for k, v in sorted(per_layer.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {k:44s} {v/n_execs:7.2f}")
    if un:
        print("\nunattributed top 10:")
        for k, v in sorted(unattributed.items(), key=lambda kv: -kv[1])[:10]:
            print(f"  {k:44s} {v/n_execs:7.2f}")


if __name__ == "__main__":
    main()
