"""TRUE multi-process SPMD validation: the production train/test drivers
under real ``jax.distributed`` (2 OS processes x 4 virtual CPU devices,
cross-process Gloo collectives) — the code path a real TPU pod takes.

Everything multi-host in the package was previously validated only inside
ONE process (8-device CPU mesh); this tier runs the actual multi-process
topology: per-process loader sharding (data/loader.py shard),
``jax.make_array_from_process_local_data`` assembly (parallel/mesh.py
shard_batch), process-contiguity mesh check, primary-host-gated Orbax
checkpointing (utils/checkpoint.py) and challenge-JSON saving
(tools/test.py), and the cross-process barrier between train and restore.

The differential: the SAME recipe (fixture, seed, global batch order) run
single-process on an 8-device mesh must produce the same training result —
losses, parameters, and saved artifacts agree across topologies up to
collective reduction order. Each topology is itself fully DETERMINISTIC
(re-runs reproduce fingerprints bitwise); the cross-topology gap is the
gradient-psum reduction order (~1e-8 relative after step 1) amplified
~2-3x per conv-BN block by the untrained towers' chaos — O(1e-3) absolute
on params, up to ~30% relative on the deepest BN running stats' batch
moments (hence the per-kind tolerances below). The EXACT assertions are
cross-rank state equality and live-state-vs-restored-checkpoint
integrity, which each worker measures on itself (bitwise, incl. the
multihost local-replica numpy save path).

Reference scope: the reference is single-process ``nn.DataParallel``
(core/models/model_builder.py:73-75); multi-host SPMD is beyond-reference
surface, tested here at production fidelity.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from attention_based_tbn_tpu.data import synthetic

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("epic_mp")
    synthetic.generate(
        str(root),
        videos=["P01_01", "P02_03"],
        frames_per_video=90,
        num_verbs=11,
        num_nouns=13,
    )
    return str(root)


def _free_port() -> int:
    with socket.socket() as sock:
        sock.bind(("localhost", 0))
        return sock.getsockname()[1]


def _worker_env():
    env = dict(os.environ)
    # the worker picks its own device count; drop the parent suite's 8-dev
    # forcing so it does not double up
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _parse_result(stdout: str) -> dict:
    for line in stdout.splitlines():
        if line.startswith("MPWORKER "):
            return json.loads(line[len("MPWORKER "):])
    raise AssertionError(f"no MPWORKER line in worker stdout:\n{stdout[-2000:]}")


def _launch(pid, nprocs, port, root, out, exp, extra=()):
    return subprocess.Popen(
        [
            sys.executable, WORKER,
            "--pid", str(pid), "--nprocs", str(nprocs), "--port", str(port),
            "--root", root, "--out", out, "--exp", exp, *extra,
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        env=_worker_env(),
        cwd=REPO,
    )


def _run_topology(nprocs, root, out, exp, timeout=2400, extra=()):
    port = _free_port()
    procs = [
        _launch(p, nprocs, port, root, out, exp, extra) for p in range(nprocs)
    ]
    outs = []
    for proc in procs:
        try:
            stdout, stderr = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for other in procs:
                other.kill()
            raise
        assert proc.returncode == 0, (
            f"worker exited {proc.returncode}\n--- stdout ---\n{stdout[-3000:]}"
            f"\n--- stderr ---\n{stderr[-6000:]}"
        )
        outs.append(_parse_result(stdout))
    return outs


def _load_history(out, exp):
    path = os.path.join(
        out, "tbn_weights", exp, "epic_tbn_bninception_RGB_Audio.history.json"
    )
    assert os.path.exists(path), f"missing checkpoint history {path}"
    with open(path) as handle:
        return path, json.load(handle)


@pytest.fixture(scope="module")
def single_result(fixture_root, tmp_path_factory):
    """The single-process 8-device baseline, shared by the 2- and 4-process
    cross-topology differentials."""
    out_single = str(tmp_path_factory.mktemp("mp_single"))
    (single,) = _run_topology(1, fixture_root, out_single, "mp")
    return single, out_single


@pytest.mark.slow
def test_two_process_spmd_matches_single_process(
    fixture_root, single_result, tmp_path
):
    root = fixture_root
    single, out_single = single_result
    out_multi = str(tmp_path / "multi")

    rank0, rank1 = _run_topology(2, root, out_multi, "mp")

    # --- cross-RANK: both processes hold the same replicated state
    assert rank0["nprocs"] == 2 and rank1["nprocs"] == 2
    np.testing.assert_allclose(
        rank0["param_fingerprint"], rank1["param_fingerprint"], rtol=1e-9
    )
    np.testing.assert_allclose(
        rank0["stats_fingerprint"], rank1["stats_fingerprint"], rtol=1e-9
    )
    np.testing.assert_allclose(
        rank0["test_loss_total"], rank1["test_loss_total"], rtol=1e-6
    )
    assert rank0["test_acc"] == rank1["test_acc"]

    # --- save-path integrity (EXACT): what each worker restored from its
    # own checkpoint is bitwise the live train state — incl. the multihost
    # local-replica numpy path in utils/checkpoint.save_checkpoint
    for res in (single, rank0, rank1):
        assert res["save_params_diff"] < 1e-12, res
        assert res["save_stats_diff"] < 1e-12, res

    # --- cross-TOPOLOGY: 2x4 multi-process == 1x8 single-process up to
    # collective reduction order (amplified by training chaos over the
    # epoch's 2 optimizer steps). Each topology is fully deterministic
    # (re-runs reproduce fingerprints bitwise); the gap between them is the
    # gradient-psum reduction order, ~1e-8 relative at step 1, amplified
    # ~2-3x per conv-BN block through the untrained towers.
    np.testing.assert_allclose(
        single["param_fingerprint"], rank0["param_fingerprint"], rtol=1e-3
    )
    np.testing.assert_allclose(
        single["stats_fingerprint"], rank0["stats_fingerprint"], rtol=1e-3
    )
    np.testing.assert_allclose(
        single["test_loss_total"], rank0["test_loss_total"], rtol=2e-2
    )

    # --- checkpoint artifacts: written once (by the primary), same content
    hist_path_s, hist_s = _load_history(out_single, "mp")
    hist_path_m, hist_m = _load_history(out_multi, "mp")
    assert hist_m["epoch"] == hist_s["epoch"] == 0
    for key in hist_s["train_loss"][0]:
        np.testing.assert_allclose(
            hist_m["train_loss"][0][key],
            hist_s["train_loss"][0][key],
            rtol=2e-2,
            atol=1e-4,
            err_msg=f"train loss term {key} diverges across topologies",
        )
    for key in hist_s["validation_loss"][0]:
        np.testing.assert_allclose(
            hist_m["validation_loss"][0][key],
            hist_s["validation_loss"][0][key],
            rtol=2e-2,
            atol=1e-4,
            err_msg=f"val loss term {key} diverges across topologies",
        )

    # --- restored parameter trees agree leaf-wise across topologies
    from attention_based_tbn_tpu.utils.checkpoint import restore_for_eval

    ckpt_s = hist_path_s[: -len(".history.json")]
    ckpt_m = hist_path_m[: -len(".history.json")]
    params_s, stats_s, _ = restore_for_eval(ckpt_s)
    params_m, stats_m, _ = restore_for_eval(ckpt_m)
    import jax

    # Leaf-wise checks pin structure and coarse values; the TIGHT value
    # assertions are the fingerprints (rtol 1e-3/1e-9) and the EXACT
    # save-integrity diffs above. Params: lr x grad keeps the chaos at
    # O(1e-3) absolute. BN running stats: the deepest layers' batch
    # moments see the full ~2-3x/layer amplification of the step-1
    # reduction-order noise — measured up to ~30% relative on
    # inception_5b vars (means/vars of UNTRAINED activations; the param
    # fingerprint above proves the models themselves agree to 1e-3).
    leaves_s, treedef_s = jax.tree.flatten(params_s)
    leaves_m, treedef_m = jax.tree.flatten(params_m)
    assert treedef_s == treedef_m
    for ls, lm in zip(leaves_s, leaves_m):
        np.testing.assert_allclose(
            np.asarray(ls), np.asarray(lm), rtol=2e-2, atol=5e-3
        )
    stats_s_flat, stats_tree_s = jax.tree.flatten(stats_s)
    stats_m_flat, stats_tree_m = jax.tree.flatten(stats_m)
    assert stats_tree_s == stats_tree_m
    for ls, lm in zip(stats_s_flat, stats_m_flat):
        np.testing.assert_allclose(
            np.asarray(ls), np.asarray(lm), rtol=0.5, atol=0.1
        )

    # --- challenge JSON: complete (all 6 fixture segments), written by the
    # primary only, and score-equivalent across topologies
    res_s = os.path.join(out_single, "inferences", "mp.json")
    res_m = os.path.join(out_multi, "inferences", "mp.json")
    with open(res_s) as handle:
        payload_s = json.load(handle)
    with open(res_m) as handle:
        payload_m = json.load(handle)
    assert payload_m["challenge"] == "action_recognition"
    assert set(payload_m["results"]) == set(payload_s["results"])
    assert len(payload_m["results"]) == 6
    for uid, heads_s in payload_s["results"].items():
        heads_m = payload_m["results"][uid]
        assert set(heads_m) == set(heads_s) == {"verb", "noun"}
        for head, scores_s in heads_s.items():
            scores_m = heads_m[head]
            assert set(scores_m) == set(scores_s)
            for cls, val_s in scores_s.items():
                # coarse agreement only — the O(1e-3) cross-topology param
                # noise (see the leaf comment above) propagates to logits;
                # bitwise/tight score numerics are pinned by the
                # single-process differential tiers
                np.testing.assert_allclose(
                    scores_m[cls], val_s, rtol=5e-2, atol=2e-2,
                    err_msg=f"uid {uid} head {head} class {cls}",
                )


@pytest.mark.slow
def test_four_process_spmd_matches_single_process(
    fixture_root, single_result, tmp_path
):
    """4 OS processes x 2 devices (VERDICT r3 item 5): the widest process
    fan-out 8 virtual devices allow. All four ranks must hold identical
    replicated state, each rank's checkpoint save must be bitwise its live
    state, and the result must match the single-process topology within
    the same reduction-order envelope as the 2-process differential."""
    single, _ = single_result
    out_multi = str(tmp_path / "multi4")

    ranks = _run_topology(4, fixture_root, out_multi, "mp4", timeout=3600)
    assert all(r["nprocs"] == 4 for r in ranks)

    rank0 = ranks[0]
    for other in ranks[1:]:
        np.testing.assert_allclose(
            rank0["param_fingerprint"], other["param_fingerprint"], rtol=1e-9
        )
        np.testing.assert_allclose(
            rank0["stats_fingerprint"], other["stats_fingerprint"], rtol=1e-9
        )
        np.testing.assert_allclose(
            rank0["test_loss_total"], other["test_loss_total"], rtol=1e-6
        )
        assert rank0["test_acc"] == other["test_acc"]

    for res in ranks:
        assert res["save_params_diff"] < 1e-12, res
        assert res["save_stats_diff"] < 1e-12, res

    # cross-topology: 4x2 == 1x8 up to collective reduction order (same
    # envelope as the 2x4 differential above)
    np.testing.assert_allclose(
        single["param_fingerprint"], rank0["param_fingerprint"], rtol=1e-3
    )
    np.testing.assert_allclose(
        single["stats_fingerprint"], rank0["stats_fingerprint"], rtol=1e-3
    )
    np.testing.assert_allclose(
        single["test_loss_total"], rank0["test_loss_total"], rtol=2e-2
    )

    # the primary alone wrote the artifacts; content within the envelope
    _, hist_m = _load_history(out_multi, "mp4")
    assert hist_m["epoch"] == 0
    res_m = os.path.join(out_multi, "inferences", "mp4.json")
    with open(res_m) as handle:
        payload = json.load(handle)
    assert len(payload["results"]) == 6


@pytest.mark.slow
def test_two_process_resume_extends_epochs(fixture_root, tmp_path):
    """Preemption recovery at production fidelity: train one epoch under
    2-process jax.distributed, then RELAUNCH the same 2-process topology
    resuming from the checkpoint (``train.pre_trained``). The resume must
    restore on every rank (orbax restore barriers align across processes),
    extend total epochs by the restored count (reference semantics,
    core/tools/train.py:219-236), train the second epoch with cross-process
    collectives, and save a durable epoch-1 checkpoint whose restored tree
    is bitwise the live post-resume state on both ranks."""
    out = str(tmp_path / "resume")

    first = _run_topology(
        2, fixture_root, out, "mpr", extra=("--skip-test",)
    )
    for res in first:
        assert res["epoch"] == 0 and res["train_loss_epochs"] == 1, res

    resumed = _run_topology(2, fixture_root, out, "mpr", extra=("--resume",))
    rank0, rank1 = resumed

    # resume extended the run by the restored epoch: history now holds two
    # epochs and the checkpoint is epoch 1
    for res in resumed:
        assert res["epoch"] == 1, res
        assert res["train_loss_epochs"] == 2, res
        # live-vs-restored checkpoint integrity stays bitwise post-resume
        assert res["save_params_diff"] < 1e-12, res
        assert res["save_stats_diff"] < 1e-12, res

    # both ranks hold the same replicated state after the resumed epoch
    np.testing.assert_allclose(
        rank0["param_fingerprint"], rank1["param_fingerprint"], rtol=1e-9
    )
    np.testing.assert_allclose(
        rank0["stats_fingerprint"], rank1["stats_fingerprint"], rtol=1e-9
    )
    np.testing.assert_allclose(
        rank0["test_loss_total"], rank1["test_loss_total"], rtol=1e-6
    )

    # the resumed run actually trained: parameters moved from the phase-1
    # checkpoint's state
    assert rank0["param_fingerprint"] != first[0]["param_fingerprint"]

    # history sidecar agrees with what the workers reported
    _, hist = _load_history(out, "mpr")
    assert hist["epoch"] == 1
    assert len(hist["train_loss"]) == 2
    assert len(hist["validation_loss"]) == 2
