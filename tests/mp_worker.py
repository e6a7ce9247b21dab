"""Subprocess worker for the TRUE multi-process SPMD tests.

Runs the PRODUCTION drivers (tools/train.run_trainer + tools/test.run_tester)
under real ``jax.distributed`` — N OS processes x 4 virtual CPU devices each,
cross-process collectives over Gloo — the same code path a TPU pod takes
(reference scope: the reference is single-process ``nn.DataParallel``,
core/models/model_builder.py:73-75; multi-host is beyond-reference surface).

With ``--nprocs 1`` the same script runs the identical recipe single-process
on an 8-device mesh, giving the cross-topology differential baseline.
``--resume`` restores from the out dir's checkpoint before training
(reference resume-extends-epochs semantics) and ``--skip-test`` skips the
tester pass — together they drive the multi-process preemption-recovery
test.

Not a pytest module (no ``test_`` prefix): launched by
tests/test_multiprocess.py via subprocess.
"""

import argparse
import json
import logging
import os
import sys


def make_cfg(load_config, root: str, out: str, exp: str, extra=None):
    """The integration-test recipe (tests/test_integration.py) verbatim:
    RGB+Audio BN-Inception at 64x64 crops, batch 4, 1 epoch — small enough
    for CPU, shaped exactly like the single-process integration programs so
    the persistent compile cache is shared."""
    base = {
        "data_dir": root,
        "out_dir": out,
        "exp_name": exp,
        "num_workers": 2,
        "data.flow.enable": False,
        "data.audio.audio_length": 1.279,
        "data.train_scale_size": 80,
        "data.train_crop_size": 64,
        "data.test_scale_size": 80,
        "data.test_crop_size": 64,
        "model.attention.enable": False,
        "model.pretrained": False,
        "model.num_classes": "{verb: 11, noun: 13}",
        "train.vid_list": os.path.join(root, "train_split.txt"),
        "train.batch_size": 4,
        "train.epochs": 1,
        "train.num_segments": 2,
        "val.vid_list": os.path.join(root, "train_split.txt"),
        "val.batch_size": 4,
        "val.num_segments": 3,
        "test.batch_size": 4,
        "test.num_segments": 3,
    }
    base.update(extra or {})
    return load_config(overrides=[f"{k}={v}" for k, v in base.items()])


def phase_barrier(name: str) -> None:
    """Cross-process phase sync via the coordination service (10-minute
    timeout) — deliberately NOT a Gloo collective: host-side skew at phase
    edges can exceed Gloo's hardcoded ~30 s context deadline (e.g. process
    0 alone flushes + swaps the async checkpoint while the other ranks
    already idle at the barrier)."""
    from jax._src import distributed

    distributed.global_state.client.wait_at_barrier(name, 600_000)


def param_fingerprint(tree):
    import jax
    import numpy as np

    total = 0.0
    for leaf in jax.tree.leaves(tree):
        total += float(np.sum(np.abs(np.asarray(leaf, dtype=np.float64))))
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--root", required=True, help="synthetic fixture root")
    ap.add_argument("--out", required=True, help="out_dir for this run")
    ap.add_argument("--exp", default="mp")
    ap.add_argument(
        "--resume",
        action="store_true",
        help="resume from this out dir's checkpoint (reference semantics: "
        "extends total epochs by the restored epoch count)",
    )
    ap.add_argument(
        "--skip-test",
        action="store_true",
        help="train only: skip the run_tester pass (faster phase-1 runs "
        "for resume tests)",
    )
    args = ap.parse_args()

    # Device topology BEFORE importing jax: nprocs x local = 8 global
    local_devices = 8 // args.nprocs
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.nprocs,
            process_id=args.pid,
        )
        # Establish the cross-process Gloo clique NOW with a trivial
        # all-reduce: Gloo context rendezvous has a hardcoded ~30 s
        # key-value deadline, and on a small host the processes reach
        # their first real collective minutes apart (each is busy
        # compiling the train step on the same core). This warmup
        # compiles in seconds, so both processes rendezvous well inside
        # the window; the clique is cached and reused by every later
        # collective regardless of compile skew.
        import jax.numpy as jnp
        import numpy as np_

        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        mesh = Mesh(np_.array(jax.devices()), ("data",))
        sharded = jax.make_array_from_process_local_data(
            NamedSharding(mesh, PartitionSpec("data")),
            np_.ones(local_devices, np_.float32),
        )
        assert float(jnp.sum(sharded)) == float(len(jax.devices()))
        # ... and the one-device-per-process allgather clique used by
        # jax.experimental.multihost_utils (which orbax's internal
        # barriers route through) — a separate Gloo context with its own
        # 30 s rendezvous window.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mp_worker_gloo_warmup")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from attention_based_tbn_tpu.utils.platform import enable_compile_cache

    enable_compile_cache(os.path.join(repo, ".jax_cache"), min_compile_secs=1.0)

    from attention_based_tbn_tpu.config import load_config
    from attention_based_tbn_tpu.tools.test import run_tester
    from attention_based_tbn_tpu.tools.train import run_trainer

    logging.basicConfig(
        level=logging.INFO, format=f"p{args.pid} %(levelname)s %(message)s"
    )
    logger = logging.getLogger(f"mp{args.pid}")

    modality = ["RGB", "Audio"]
    ckpt_name = os.path.join(
        args.out, "tbn_weights", args.exp, "epic_tbn_bninception_RGB_Audio"
    )
    extra = {"train.pre_trained": ckpt_name} if args.resume else None
    cfg = make_cfg(load_config, args.root, args.out, args.exp, extra=extra)
    state = run_trainer(cfg, logger, modality, writer=None)
    fp = param_fingerprint(state.params)
    stats_fp = param_fingerprint(state.batch_stats)

    if args.nprocs > 1:
        # run_trainer's wait_until_finished makes the checkpoint durable on
        # process 0 only; the others must not race it to the restore below
        phase_barrier("checkpoint_durable")

    # Save-path integrity: the restored tree must BE the live train state
    # (catches silent corruption between the replicated device arrays and
    # the serialized checkpoint — comparable across ranks and topologies).
    import numpy as np

    from attention_based_tbn_tpu.utils.checkpoint import restore_for_eval

    r_params, r_stats, hist = restore_for_eval(ckpt_name)

    def _max_leaf_diff(live, restored):
        diffs = [
            float(
                np.max(
                    np.abs(
                        np.asarray(a, dtype=np.float64)
                        - np.asarray(b, dtype=np.float64)
                    )
                )
            )
            for a, b in zip(jax.tree.leaves(live), jax.tree.leaves(restored))
        ]
        return max(diffs) if diffs else 0.0

    save_params_diff = _max_leaf_diff(state.params, r_params)
    save_stats_diff = _max_leaf_diff(state.batch_stats, r_stats)

    loss, acc = {"total": float("nan")}, {}
    if not args.skip_test:
        cfg_test = make_cfg(
            load_config,
            args.root,
            args.out,
            args.exp,
            extra={
                "test.enable": True,
                "test.annotation_file": "['annotations/epic_train_val.csv']",
                "test.vid_list": os.path.join(args.root, "train_split.txt"),
                "test.save_results": True,
                "test.results_file": f"['{args.exp}.json']",
                "test.pre_trained": ckpt_name,
            },
        )
        results = run_tester(cfg_test, logger, modality)
        loss, acc, _ = results[0]

    if args.nprocs > 1:
        # keep every process alive until process 0 has written the results
        # file (collective teardown mid-write would abort it)
        phase_barrier("results_written")

    # Machine-readable line the parent test parses (one per rank).
    print(
        "MPWORKER "
        + json.dumps(
            {
                "pid": args.pid,
                "nprocs": args.nprocs,
                "param_fingerprint": fp,
                "stats_fingerprint": stats_fp,
                "save_params_diff": save_params_diff,
                "save_stats_diff": save_stats_diff,
                "epoch": int(hist.get("epoch", -1)),
                "train_loss_epochs": len(hist.get("train_loss", [])),
                "test_loss_total": float(loss["total"]),
                "test_acc": {k: [float(x) for x in v] for k, v in acc.items()},
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
