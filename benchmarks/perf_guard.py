#!/usr/bin/env python
"""Performance regression guard: run the headline benchmarks, append the
results to a checked-in ledger, and FAIL if any metric dropped >5% from
its best recorded value (VERDICT r3 item 8 — changes must not silently
regress the 5.33x).

Usage (on the real chip; each benchmark is a subprocess so the two JAX
programs never share a backend):

    python benchmarks/perf_guard.py               # run, record, enforce
    python benchmarks/perf_guard.py --record-only # run, record, no gate
    python benchmarks/perf_guard.py --check-only  # re-verify the ledger's
                                                  # last entries vs best

Ledger: benchmarks/perf_ledger.jsonl — one JSON object per benchmark run
{ts, git, metric, value, ...benchmark fields}. The gate compares against
the historical best PER metric.
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(ROOT, "benchmarks", "perf_ledger.jsonl")
TOLERANCE = 0.95  # fail below 95% of the best recorded value

BENCHMARKS = [
    [sys.executable, os.path.join(ROOT, "bench.py")],
    [sys.executable, os.path.join(ROOT, "benchmarks", "train_bench.py")],
    # serving latency (device-only execution metric — tunnel-stable; the
    # JSON also carries the e2e + micro-batch A/B receipt fields)
    [sys.executable, os.path.join(ROOT, "benchmarks", "serve_bench.py")],
]


def git_rev():
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=ROOT,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.strip()
    except Exception:
        return "unknown"


def read_ledger():
    entries = []
    if os.path.exists(LEDGER):
        with open(LEDGER) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    entries.append(json.loads(line))
    return entries


def best_values(entries):
    best = {}
    for e in entries:
        m = e.get("metric")
        if m and isinstance(e.get("value"), (int, float)):
            best[m] = max(best.get(m, float("-inf")), e["value"])
    return best


def last_values(entries):
    last = {}
    for e in entries:
        if e.get("metric"):
            last[e["metric"]] = e["value"]
    return last


def run_benchmarks():
    results = []
    for cmd in BENCHMARKS:
        print(f"[perf_guard] running: {' '.join(cmd)}", flush=True)
        proc = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT)
        if proc.returncode != 0:
            sys.stderr.write(proc.stdout + proc.stderr)
            raise SystemExit(f"benchmark failed: {' '.join(cmd)}")
        # the benchmark's contract: the LAST line of stdout is the JSON
        line = [l for l in proc.stdout.strip().splitlines() if l.strip()][-1]
        results.append(json.loads(line))
        print(f"[perf_guard] {line}", flush=True)
    return results


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--record-only", action="store_true")
    parser.add_argument("--check-only", action="store_true")
    args = parser.parse_args()

    entries = read_ledger()
    best = best_values(entries)

    if args.check_only:
        fresh = last_values(entries)
    else:
        fresh = {}
        rev = git_rev()
        ts = time.strftime("%Y-%m-%dT%H:%M:%S")
        with open(LEDGER, "a") as fh:
            for result in run_benchmarks():
                entry = {"ts": ts, "git": rev, **result}
                fh.write(json.dumps(entry) + "\n")
                fresh[result["metric"]] = result["value"]

    failures = []
    for metric, value in fresh.items():
        floor = best.get(metric, float("-inf")) * TOLERANCE
        status = "OK" if value >= floor else "REGRESSION"
        print(
            f"[perf_guard] {metric}: {value:.2f} "
            f"(best {best.get(metric, value):.2f}, floor {floor:.2f}) {status}"
        )
        if value < floor:
            failures.append(metric)

    if failures and not args.record_only:
        raise SystemExit(
            f"PERF REGRESSION >5% vs best recorded: {', '.join(failures)} "
            f"(ledger: {LEDGER})"
        )
    print("[perf_guard] all metrics within 5% of best recorded")


if __name__ == "__main__":
    main()
