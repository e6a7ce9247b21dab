"""Driver for the convergence-differential harness outside pytest.

Used to calibrate the agreement bounds asserted in
tests/test_convergence_differential.py (measure first, assert with
headroom) and to smoke the harness cheaply. Runs the same code path the
collected test runs.

    python benchmarks/convergence_driver.py --type mha --seed 0 [--epochs 1]
"""

import argparse
import json
import os
import sys
import tempfile
import time

# The environment pins JAX_PLATFORMS=axon (real TPU) and the tunneled
# plugin IGNORES the env override — only the jax.config update takes
# (same dance as tests/conftest.py / main.py's tpu.platform). Calibration
# must run where the collected test runs: CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
from attention_based_tbn_tpu.utils.platform import (  # noqa: E402
    enable_compile_cache,
)

enable_compile_cache(os.path.join(_REPO, ".jax_cache"), min_compile_secs=1.0)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--type", default="mha", choices=["mha", "unimodal", "proto"])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--fixture", default=None, help="reuse a fixture dir")
    parser.add_argument(
        "--save", default=None,
        help="dump the full {curves, final} dict to this JSON path "
        "(combinable into the results/ archive format)",
    )
    args = parser.parse_args()

    import test_convergence_differential as conv

    if args.lr is not None:
        conv.LR = args.lr

    run = dict(conv.RUNS[args.type])
    if args.epochs is not None:
        run["epochs"] = args.epochs
        run["lr_steps"] = [max(1, int(args.epochs * 0.75))]

    root = args.fixture or tempfile.mkdtemp(prefix="convfix_")
    marker = os.path.join(root, ".fixture_done")
    if not os.path.exists(marker):
        t0 = time.time()
        train_vids, val_vids = conv.generate_fixture(root)
        open(marker, "w").write("ok")
        print(f"fixture generated in {time.time()-t0:.0f}s at {root}", flush=True)
    train_vids, val_vids = conv.fixture_video_lists()

    t0 = time.time()
    curves, final = conv.run_convergence(
        (root, train_vids, val_vids), args.seed, args.type, run
    )
    wall = time.time() - t0
    if args.save:
        with open(args.save, "w") as fh:
            json.dump({"curves": curves, "final": final, "type": args.type,
                       "seed": args.seed, "wall_sec": round(wall, 1)}, fh)
    out = {
        "type": args.type,
        "seed": args.seed,
        "run": {k: list(v) if isinstance(v, tuple) else v for k, v in run.items()},
        "wall_sec": round(wall, 1),
        "final": final,
        "train_loss_torch": curves["torch"]["train_loss"],
        "train_loss_ours": curves["ours"]["train_loss"],
        "train_verb_torch": curves["torch"]["train_verb"],
        "train_verb_ours": curves["ours"]["train_verb"],
        "train_noun_torch": curves["torch"]["train_noun"],
        "train_noun_ours": curves["ours"]["train_noun"],
    }
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
