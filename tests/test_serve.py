"""tools/serve.py: module-direct serving of an export bundle.

The executor must reproduce the source model's logits exactly (same
compiled graph, same params) and round-trip over the stdlib HTTP server.
"""

import json
import threading
import time

import numpy as np
import pytest

from attention_based_tbn_tpu.config import load_config


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    """A tiny exported bundle + the live model/variables that produced it."""
    import jax
    import jax.numpy as jnp

    from attention_based_tbn_tpu.models.tbn import TBNModel, TBNSpec
    from attention_based_tbn_tpu.tools.export import export_inference

    tmp = tmp_path_factory.mktemp("serve_bundle")
    cfg = load_config(
        overrides=[
            "model.attention.enable=False",
            "model.pretrained=False",
            "data.test_crop_size=64",
            "data.audio.audio_length=1.279",
            "model.num_classes={verb: 5, noun: 7}",
            "tpu.compute_dtype=float32",
            f"out_dir={tmp}",
        ]
    )
    paths = export_inference(cfg, ["RGB"], batch_size=2, num_segments=2)
    spec = TBNSpec.from_config(cfg, ["RGB"])
    model = TBNModel(spec)
    batch = {
        "RGB": jnp.asarray(
            np.random.default_rng(3).integers(0, 255, (2, 2, 64, 64, 3)),
            jnp.uint8,
        )
    }
    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        {"params": jax.random.key(0)}, batch
    )
    return paths, cfg, model, variables


def test_serving_model_matches_source_logits(bundle):
    import os

    from attention_based_tbn_tpu.tools.serve import ServingModel

    paths, cfg, model, variables = bundle
    sm = ServingModel(os.path.dirname(paths["manifest"]))
    batch = sm.example_batch(seed=11)
    got = sm.predict(batch)

    # the exported params come from a fresh init inside export_inference
    # with the same seed/config as `variables`, so model.apply IS the
    # ground truth for the module-direct executor
    want = model.apply(variables, batch, train=False)
    for head in ("verb", "noun"):
        np.testing.assert_allclose(
            got[head], np.asarray(want[head]), rtol=1e-5, atol=1e-5
        )


def test_serving_model_validates_inputs(bundle):
    import os

    from attention_based_tbn_tpu.tools.serve import ServingModel

    paths, *_ = bundle
    sm = ServingModel(os.path.dirname(paths["manifest"]))
    batch = sm.example_batch()
    with pytest.raises(ValueError, match="compiled for"):
        bad = {"RGB": batch["RGB"][:, :, :32]}  # wrong spatial shape
        sm.predict(bad)
    with pytest.raises(ValueError, match="compiled for"):
        bad = {"RGB": batch["RGB"].astype(np.float32)}  # wrong dtype
        sm.predict(bad)
    with pytest.raises(ValueError, match="manifest"):
        sm.predict({"Flow": batch["RGB"]})


def test_serving_model_rejects_output_count_mismatch(bundle):
    import os

    from attention_based_tbn_tpu.tools.serve import ServingModel

    paths, *_ = bundle
    sm = ServingModel(os.path.dirname(paths["manifest"]))
    batch = sm.example_batch()
    # a manifest naming MORE outputs than the module returns must raise,
    # not silently truncate the response dict (mixed-version bundle)
    sm._output_names = list(sm._output_names) + ["ghost_head"]
    with pytest.raises(RuntimeError, match="manifest"):
        sm.predict(batch)


def test_http_round_trip(bundle):
    import io
    import os
    import urllib.request

    from attention_based_tbn_tpu.tools.serve import (
        ServingModel,
        _npz_bytes,
        make_server,
    )

    paths, *_ = bundle
    sm = ServingModel(os.path.dirname(paths["manifest"]))
    server = make_server(sm, 0)  # ephemeral port
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert set(health["inputs"]) == {"RGB"}

        batch = sm.example_batch(seed=4)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=_npz_bytes(batch),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            payload = resp.read()
        with np.load(io.BytesIO(payload)) as data:
            preds = {k: data[k] for k in data.files}
        want = sm.predict(batch)
        for key, value in want.items():
            np.testing.assert_array_equal(preds[key], value)

        # malformed request -> 400, server stays up
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b"junk", method="POST"
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as err:
            assert err.code == 400
    finally:
        server.shutdown()


def test_ragged_batch_pads_and_trims(bundle):
    """Requests smaller than the compiled batch are padded by repeating the
    first row (loader convention) and the outputs trimmed back — row 0 of a
    b=1 request must equal row 0 of the full-batch run, and every output's
    leading dim must scale with the true batch."""
    import os

    from attention_based_tbn_tpu.tools.serve import ServingModel

    paths, _, _, _ = bundle
    sm = ServingModel(os.path.dirname(paths["manifest"]))
    full = sm.example_batch(seed=7)
    want = sm.predict(full)

    ragged = {k: v[:1] for k, v in full.items()}
    got = sm.predict(ragged)
    compiled_bs = next(iter(full.values())).shape[0]
    for name, arr in got.items():
        lead_full = want[name].shape[0]
        assert arr.shape[0] == lead_full // compiled_bs  # k*1 rows
        np.testing.assert_allclose(
            arr, want[name][: arr.shape[0]], rtol=1e-6, atol=1e-6,
            err_msg=name,
        )

    # oversize batches are rejected (cross-input mismatch is covered by
    # the multi-input test_ragged_batch_trims_folded_weights below)
    over = {k: np.concatenate([v, v]) for k, v in full.items()}
    with pytest.raises(ValueError, match="outside"):
        sm.predict(over)


def test_http_adversarial_requests(bundle):
    """Malformed clients get 4xx, never a crash or a hung server: garbage
    body, truncated npz, missing input, wrong dtype, oversize request,
    missing Content-Length (VERDICT r3 item 4)."""
    import http.client
    import os
    import urllib.error
    import urllib.request

    from attention_based_tbn_tpu.tools.serve import (
        ServingModel,
        _npz_bytes,
        make_server,
    )

    paths, *_ = bundle
    sm = ServingModel(os.path.dirname(paths["manifest"]))
    server = make_server(sm, 0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()

    def post(body, headers=None):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=body, method="POST"
        )
        for k, v in (headers or {}).items():
            req.add_header(k, v)
        try:
            with urllib.request.urlopen(req, timeout=60) as resp:
                return resp.status
        except urllib.error.HTTPError as err:
            err.read()
            return err.code

    try:
        good = _npz_bytes(sm.example_batch(seed=1))

        assert post(b"\x00\x01 not an npz at all") == 400
        assert post(good[: len(good) // 2]) == 400  # truncated archive
        assert post(_npz_bytes({"Flow": np.zeros((1, 2, 64, 64, 3), np.uint8)})) == 400
        wrong_dtype = {
            k: v.astype(np.float64) for k, v in sm.example_batch().items()
        }
        assert post(_npz_bytes(wrong_dtype)) == 400
        wrong_rank = {k: v[0] for k, v in sm.example_batch().items()}
        assert post(_npz_bytes(wrong_rank)) == 400

        # oversize requests are rejected from the header, body never read
        assert sm.max_request_bytes < 10 * (1 << 20)
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.putrequest("POST", "/predict")
        conn.putheader("Content-Length", str(sm.max_request_bytes + 1))
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 413
        resp.read()
        conn.close()

        # missing Content-Length -> 411
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.putrequest("POST", "/predict", skip_accept_encoding=True)
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 411
        resp.read()
        conn.close()

        # the server survived all of it
        assert post(good) == 200
    finally:
        server.shutdown()


def test_concurrent_requests_serialize_on_device(bundle):
    """Parallel clients both get correct answers; device execution is
    serialized by the ServingModel lock (the documented concurrency
    decision), so results are identical to sequential ones."""
    import os

    from attention_based_tbn_tpu.tools.serve import ServingModel

    paths, *_ = bundle
    sm = ServingModel(os.path.dirname(paths["manifest"]))
    batches = [sm.example_batch(seed=s) for s in range(4)]
    want = [sm.predict(b) for b in batches]

    results = [None] * len(batches)
    errors = []

    def worker(i):
        try:
            results[i] = sm.predict(batches[i])
        except Exception as exc:  # pragma: no cover - assertion below
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(batches))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    for got, exp in zip(results, want):
        for key in exp:
            np.testing.assert_array_equal(got[key], exp[key])


class TestBatchingFront:
    """Request micro-batching (tools/serve.BatchingFront)."""

    @pytest.fixture()
    def sm(self, bundle):
        import os

        from attention_based_tbn_tpu.tools.serve import ServingModel

        paths, *_ = bundle
        return ServingModel(os.path.dirname(paths["manifest"]))

    def test_single_request_passes_through(self, sm):
        from attention_based_tbn_tpu.tools.serve import BatchingFront

        front = BatchingFront(sm, window_ms=1.0)
        batch = {k: v[:1] for k, v in sm.example_batch(seed=2).items()}
        want = sm.predict(batch)
        got = front.submit(batch)
        for key in want:
            np.testing.assert_array_equal(got[key], want[key])

    def test_concurrent_requests_coalesce_and_match(self, sm):
        """Four concurrent b=1 requests (compiled batch 2): every client
        gets exactly what a solo predict would return — row independence
        holds because eval BatchNorm uses running statistics, so the
        combined execution computes the same per-row math."""
        from attention_based_tbn_tpu.tools.serve import BatchingFront

        front = BatchingFront(sm, window_ms=50.0)
        batches = [
            {k: v[:1] for k, v in sm.example_batch(seed=s).items()}
            for s in range(4)
        ]
        want = [sm.predict(b) for b in batches]

        results = [None] * 4
        errors = []

        def worker(i):
            try:
                results[i] = front.submit(batches[i])
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors
        for got, exp in zip(results, want):
            assert got is not None
            for key in exp:
                assert got[key].shape == exp[key].shape
                np.testing.assert_array_equal(got[key], exp[key])

    def test_mixed_sizes_split_correctly(self, sm):
        """Deterministic coverage of the output-splitting math: dispatch a
        hand-built group (b=1 then b=1, offset > 0 for the second) and
        check each waiter's slice against solo predicts."""
        from attention_based_tbn_tpu.tools.serve import BatchingFront

        front = BatchingFront(sm, window_ms=1.0)
        reqs = []
        for s in (21, 22):
            batch = {k: v[:1] for k, v in sm.example_batch(seed=s).items()}
            arrays, bs = sm._validate(batch)
            reqs.append(
                {
                    "arrays": arrays,
                    "bs": bs,
                    "event": threading.Event(),
                    "result": None,
                    "error": None,
                    "batch": batch,
                }
            )
        front._dispatch(reqs, rows=2)
        for req in reqs:
            assert req["event"].is_set() and req["error"] is None
            want = sm.predict(req["batch"])
            for key in want:
                np.testing.assert_array_equal(req["result"][key], want[key])

    def test_overflow_carries_to_next_cycle(self, sm):
        """A b=2 request arriving while a b=1 group is open overflows the
        compiled batch (2) and must carry to the next cycle — both clients
        still get solo-identical answers in every interleaving."""
        from attention_based_tbn_tpu.tools.serve import BatchingFront

        front = BatchingFront(sm, window_ms=40.0)
        small = {k: v[:1] for k, v in sm.example_batch(seed=31).items()}
        big = sm.example_batch(seed=32)  # full compiled batch (2)
        want_small, want_big = sm.predict(small), sm.predict(big)

        results = {}

        def run(name, batch):
            results[name] = front.submit(batch)

        t1 = threading.Thread(target=run, args=("small", small))
        t2 = threading.Thread(target=run, args=("big", big))
        t1.start()
        time.sleep(0.005)  # land inside the open window
        t2.start()
        t1.join(timeout=120)
        t2.join(timeout=120)
        for key in want_small:
            np.testing.assert_array_equal(results["small"][key], want_small[key])
            np.testing.assert_array_equal(results["big"][key], want_big[key])

    def test_malformed_request_fails_only_itself(self, sm):
        from attention_based_tbn_tpu.tools.serve import BatchingFront

        front = BatchingFront(sm, window_ms=1.0)
        good = {k: v[:1] for k, v in sm.example_batch(seed=5).items()}
        with pytest.raises(ValueError, match="manifest"):
            front.submit({"Bogus": np.zeros((1, 2))})
        got = front.submit(good)  # the dispatcher is still alive
        np.testing.assert_array_equal(got["verb"], sm.predict(good)["verb"])


def test_http_micro_batched_round_trip(bundle):
    """The HTTP server with --batch-window: concurrent clients all get
    correct responses through the coalescing path."""
    import io
    import os
    import urllib.request

    from attention_based_tbn_tpu.tools.serve import (
        ServingModel,
        _npz_bytes,
        make_server,
    )

    paths, *_ = bundle
    sm = ServingModel(os.path.dirname(paths["manifest"]))
    server = make_server(sm, 0, batch_window_ms=20.0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as resp:
            assert json.loads(resp.read())["batch_window_ms"] == 20.0

        batches = [
            {k: v[:1] for k, v in sm.example_batch(seed=s).items()}
            for s in range(3)
        ]
        want = [sm.predict(b) for b in batches]
        results = [None] * 3

        def post(i):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict",
                data=_npz_bytes(batches[i]),
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=120) as resp:
                with np.load(io.BytesIO(resp.read())) as data:
                    results[i] = {k: data[k] for k in data.files}

        threads = [threading.Thread(target=post, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for got, exp in zip(results, want):
            assert got is not None
            for key in exp:
                np.testing.assert_array_equal(got[key], exp[key])
    finally:
        server.shutdown()


@pytest.fixture(scope="module")
def bundle_buckets(tmp_path_factory):
    """Bundle compiled at batch 4 with an extra b=1 bucket module."""
    from attention_based_tbn_tpu.tools.export import export_inference

    tmp = tmp_path_factory.mktemp("serve_bundle_buckets")
    cfg = load_config(
        overrides=[
            "model.attention.enable=False",
            "model.pretrained=False",
            "data.test_crop_size=64",
            "data.audio.audio_length=1.279",
            "model.num_classes={verb: 5, noun: 7}",
            "tpu.compute_dtype=float32",
            f"out_dir={tmp}",
        ]
    )
    return export_inference(
        cfg, ["RGB"], batch_size=4, num_segments=2, batch_buckets=[1]
    )


def test_batch_buckets_route_and_match(bundle_buckets):
    """A b=1 request runs on the b=1 executable (no pad to 4) and returns
    the same logits the full-batch module computes for that row; requests
    between buckets (b=2,3) fall up to the b=4 module."""
    import os

    from attention_based_tbn_tpu.tools.serve import ServingModel

    sm = ServingModel(os.path.dirname(bundle_buckets["manifest"]))
    assert sorted(sm._executables) == [1, 4]
    assert sm.manifest["batch_buckets"]["1"] == "module.b1.stablehlo.mlir"

    full = sm.example_batch(seed=13)
    want = sm.predict(full)
    assert sm.last_bucket == 4

    one = sm.predict({k: v[:1] for k, v in full.items()})
    assert sm.last_bucket == 1
    for head in ("verb", "noun"):
        assert one[head].shape[0] == 1
        np.testing.assert_allclose(
            one[head], want[head][:1], rtol=1e-5, atol=1e-5, err_msg=head
        )

    two = sm.predict({k: v[:2] for k, v in full.items()})
    assert sm.last_bucket == 4  # no b=2 bucket: smallest fitting is 4
    np.testing.assert_allclose(
        two["verb"], want["verb"][:2], rtol=1e-5, atol=1e-5
    )


def test_export_rejects_bad_bucket(bundle):
    """Buckets outside [1, batch_size) are a loud export-time error."""
    from attention_based_tbn_tpu.tools.export import export_inference

    _, cfg, *_ = bundle
    with pytest.raises(ValueError, match="bucket"):
        export_inference(cfg, ["RGB"], batch_size=2, num_segments=2,
                         batch_buckets=[3])


@pytest.fixture(scope="module")
def bundle_mha(tmp_path_factory):
    """Multi-input bundle (RGB+Audio, MHA attention): the weights output is
    folded (B*N, 1, S), exercising the k=segments trim and the cross-input
    batch validation that the single-input fixture cannot reach."""
    from attention_based_tbn_tpu.tools.export import export_inference

    tmp = tmp_path_factory.mktemp("serve_bundle_mha")
    cfg = load_config(
        overrides=[
            "model.attention.enable=True",
            "model.attention.type=mha",
            "model.pretrained=False",
            "data.test_crop_size=64",
            "data.audio.audio_length=1.279",
            "model.num_classes={verb: 5, noun: 7}",
            "tpu.compute_dtype=float32",
            f"out_dir={tmp}",
        ]
    )
    return export_inference(cfg, ["RGB", "Audio"], batch_size=2, num_segments=3)


def test_ragged_batch_trims_folded_weights(bundle_mha):
    """Per-segment attention weights (B*N rows) keep true_bs*N rows on a
    ragged request, per the manifest's export-time row multipliers."""
    import os

    from attention_based_tbn_tpu.tools.serve import ServingModel

    sm = ServingModel(os.path.dirname(bundle_mha["manifest"]))
    mult = sm.manifest["output_row_multipliers"]
    assert mult["verb"] == 1 and mult["noun"] == 1
    assert mult["weights"] == 3  # num_segments

    full = sm.example_batch(seed=9)
    want = sm.predict(full)
    assert want["weights"].shape[0] == 2 * 3

    got = sm.predict({k: v[:1] for k, v in full.items()})
    assert got["verb"].shape[0] == 1 and got["noun"].shape[0] == 1
    assert got["weights"].shape[0] == 3
    for name in ("verb", "noun", "weights"):
        np.testing.assert_allclose(
            got[name], want[name][: got[name].shape[0]],
            rtol=1e-5, atol=1e-6, err_msg=name,
        )

    # inputs disagreeing on the true batch are rejected
    bad = dict(full)
    bad["Audio"] = bad["Audio"][:1]
    with pytest.raises(ValueError, match="!= 1 of the other inputs|batch"):
        sm.predict(bad)


class TestServeHardening:
    """Round-5 advisor items: error taxonomy (4xx client / 5xx server),
    dispatcher timeout + shutdown, and the null-multiplier coalescing
    refusal (tools/serve.py ServerFault/DispatcherTimeout/close)."""

    @pytest.fixture()
    def sm(self, bundle):
        import os

        from attention_based_tbn_tpu.tools.serve import ServingModel

        paths, *_ = bundle
        return ServingModel(os.path.dirname(paths["manifest"]))

    def test_close_stops_dispatcher_and_is_idempotent(self, sm):
        from attention_based_tbn_tpu.tools.serve import BatchingFront, ServerFault

        front = BatchingFront(sm, window_ms=1.0)
        assert front._thread.is_alive()
        front.close()
        front._thread.join(timeout=10)
        assert not front._thread.is_alive()
        front.close()  # idempotent
        good = {k: v[:1] for k, v in sm.example_batch(seed=1).items()}
        with pytest.raises(ServerFault, match="closed"):
            front.submit(good)

    def test_submit_timeout_raises_dispatcher_timeout(self, sm):
        from attention_based_tbn_tpu.tools.serve import (
            BatchingFront,
            DispatcherTimeout,
        )

        front = BatchingFront(sm, window_ms=1.0, submit_timeout_s=0.3)
        orig = sm.predict
        release = threading.Event()

        def wedged(batch):
            release.wait(20)  # simulate a stuck device call
            return orig(batch)

        sm.predict = wedged
        try:
            good = {k: v[:1] for k, v in sm.example_batch(seed=2).items()}
            with pytest.raises(DispatcherTimeout, match="within"):
                front.submit(good)
        finally:
            release.set()
            sm.predict = orig
            front.close()

    def test_refuses_bundle_with_null_multiplier(self, sm):
        from attention_based_tbn_tpu.tools.serve import BatchingFront

        mults = dict(sm._row_mult)
        first = sorted(mults)[0]
        sm._row_mult = {**mults, first: None}
        with pytest.raises(ValueError, match="coalescable"):
            BatchingFront(sm, window_ms=1.0)
        sm._row_mult = None  # legacy manifest without the field
        with pytest.raises(ValueError, match="coalescable"):
            BatchingFront(sm, window_ms=1.0)
        sm._row_mult = mults

    def test_group_fault_is_server_fault_not_value_error(self, sm):
        """An execution failure inside a coalesced group must surface as
        ServerFault (-> 5xx) to every waiter, never as the 4xx taxonomy."""
        from attention_based_tbn_tpu.tools.serve import BatchingFront, ServerFault

        front = BatchingFront(sm, window_ms=1.0)
        orig = sm.predict

        def boom(batch):
            raise RuntimeError("device fell over")

        sm.predict = boom
        try:
            reqs = []
            for s in (41, 42):
                batch = {k: v[:1] for k, v in sm.example_batch(seed=s).items()}
                arrays, bs = sm._validate(batch)
                reqs.append(
                    {
                        "arrays": arrays,
                        "bs": bs,
                        "event": threading.Event(),
                        "result": None,
                        "error": None,
                    }
                )
            front._dispatch(reqs, rows=2)
            for req in reqs:
                assert req["event"].is_set()
                assert isinstance(req["error"], ServerFault)
                assert not isinstance(req["error"], ValueError)
                assert "device fell over" in str(req["error"])
        finally:
            sm.predict = orig
            front.close()

    def test_http_server_fault_maps_to_500(self, sm):
        import urllib.error
        import urllib.request

        from attention_based_tbn_tpu.tools.serve import _npz_bytes, make_server

        orig = sm.predict

        def boom(batch):
            raise RuntimeError("internal execution failure")

        # patch BEFORE make_server: the handler binds model.predict at
        # server construction
        sm.predict = boom
        server = make_server(sm, 0)
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict",
                data=_npz_bytes(sm.example_batch(seed=3)),
                method="POST",
            )
            with pytest.raises(urllib.error.HTTPError) as err:
                urllib.request.urlopen(req, timeout=60)
            assert err.value.code == 500
            assert "internal execution failure" in err.value.read().decode()
        finally:
            sm.predict = orig
            server.shutdown()
            server.server_close()

    def test_server_close_stops_batching_front(self, sm):
        from attention_based_tbn_tpu.tools.serve import make_server

        server = make_server(sm, 0, batch_window_ms=5.0)
        front = server.batching_front
        assert front is not None and front._thread.is_alive()
        server.server_close()
        front._thread.join(timeout=10)
        assert not front._thread.is_alive()
