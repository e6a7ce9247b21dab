"""tools/serve.py: module-direct serving of an export bundle.

The executor must reproduce the source model's logits exactly (same
compiled graph, same params) and round-trip over the stdlib HTTP server.
"""

import json
import threading

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
