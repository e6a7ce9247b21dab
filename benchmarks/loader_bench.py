#!/usr/bin/env python
"""Host input-pipeline throughput: decode+transform clips/s of DataLoader.

Measures the threaded loader (JPEG/flow/wav decode, crops, collate) on a
synthetic fixture — the host-side counterpart of bench.py's device number.
The device consumes `bench.py` clips at ~140/s per chip; the host pipeline
must sustain that per chip x num_hosts' worth of decode or training becomes
input-bound (on this single-CPU dev host it will not; production hosts have
dozens of cores and the loader threads scale with them).

Usage: python benchmarks/loader_bench.py [num_workers] [batches]
       python benchmarks/loader_bench.py --sweep [batches]

``--sweep`` measures thread-count SCALING (1, 2, 4, ... up to 2x cores):
the ready-to-run receipt for the production-host sizing quoted in PERF.md.
That sizing ("~11 decode threads/chip train, ~60 eval") is a LINEAR
extrapolation from a 1-thread measurement on this 1-core dev host — run
the sweep on the first multi-core host to replace the projection with a
measured curve (decode is cv2/libjpeg-bound and releases the GIL in the
native decoder, so near-linear scaling is expected but unproven here).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--sweep":
        batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        cores = os.cpu_count() or 1
        sweep = []
        w = 1
        while w <= 2 * cores:
            sweep.append(w)
            w *= 2
        for workers in sweep:
            run_once(workers, batches)
        return
    num_workers = int(sys.argv[1]) if len(sys.argv) > 1 else os.cpu_count() or 4
    max_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    run_once(num_workers, max_batches)


def run_once(num_workers: int, max_batches: int):

    import json

    from attention_based_tbn_tpu.config import load_config
    from attention_based_tbn_tpu.data import synthetic
    from attention_based_tbn_tpu.data.dataset import VideoDataset
    from attention_based_tbn_tpu.data.loader import DataLoader
    from attention_based_tbn_tpu.data.records import read_vid_list

    root = "/tmp/tbn_loader_bench_fixture"
    if not os.path.exists(os.path.join(root, "train_split.txt")):
        synthetic.generate(
            root,
            videos=["P01_01", "P02_03", "P03_05"],
            frames_per_video=300,
            num_verbs=11,
            num_nouns=13,
        )

    cfg = load_config(
        overrides=[
            f"data_dir={root}",
            "data.flow.enable=True",
            "train.num_segments=3",
            "train.batch_size=8",
            f"num_workers={num_workers}",
        ]
    )
    videos = read_vid_list(os.path.join(root, "train_split.txt"))
    dataset = VideoDataset(
        cfg, videos, "annotations/epic_train_val.csv",
        ["RGB", "Flow", "Audio"], mode="train",
    )
    # Constructed by hand rather than via data.loader.create_dataloader so
    # this benchmark stays jax-free (create_dataloader queries
    # jax.process_count() for multi-host sharding, which would initialize
    # the accelerator backend inside a host-only measurement). The
    # arguments below MUST mirror create_dataloader's production values —
    # in particular pack_visual, whose per-batch packing work is part of
    # the host cost this benchmark exists to measure.
    from attention_based_tbn_tpu.data.loader import visual_packing_enabled

    loader = DataLoader(
        dataset,
        batch_size=int(cfg.train.batch_size),
        shuffle=True,
        num_workers=num_workers,
        seed=int(cfg.data.manual_seed),
        prefetch=int(cfg.get_path("tpu.prefetch", 2) or 2),
        pack_visual=visual_packing_enabled(cfg),
    )

    # warm one epoch-start (thread pool spin-up, file cache)
    it = iter(loader)
    next(it)

    start = time.perf_counter()
    clips = 0
    for i, (batch, targets, meta) in enumerate(it):
        clips += meta["batch_size"]
        if i + 1 >= max_batches:
            break
    elapsed = time.perf_counter() - start

    print(
        json.dumps(
            {
                "metric": "host_decode_clips_per_sec",
                "value": round(clips / elapsed, 2),
                "unit": "clips/s",
                "num_workers": num_workers,
                "segments": int(cfg.train.num_segments),
                "modalities": ["RGB", "Flow", "Audio"],
                "native_io": dataset.native is not None,
                "cpus": os.cpu_count(),
            }
        )
    )


if __name__ == "__main__":
    main()
