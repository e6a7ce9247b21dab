"""Serving export: StableHLO module + params checkpoint + manifest."""

import json
import os

from attention_based_tbn_tpu.config import load_config
from attention_based_tbn_tpu.tools.export import export_inference


def test_export_from_restored_checkpoint(tmp_path):
    # save a train state with orbax, restore via the tester's load_state,
    # export — the bundle must reflect the restored variables
    import logging

    import jax
    import numpy as np

    from attention_based_tbn_tpu.models.tbn import TBNModel, TBNSpec
    from attention_based_tbn_tpu.parallel.train_step import TrainState
    from attention_based_tbn_tpu.tools.test import load_state
    from attention_based_tbn_tpu.utils.checkpoint import save_checkpoint

    cfg = load_config(
        overrides=[
            "model.attention.enable=False",
            "model.pretrained=False",
            "data.test_crop_size=64",
            "data.audio.audio_length=1.279",
            "model.num_classes={verb: 5, noun: 7}",
            f"out_dir={tmp_path}",
            f"test.pre_trained={tmp_path}/ck",
        ]
    )
    spec = TBNSpec.from_config(cfg, ["RGB"])
    model = TBNModel(spec)
    batch = {"RGB": jax.numpy.zeros((1, 2, 64, 64, 3), jax.numpy.uint8)}
    variables = model.init(jax.random.key(0), batch, train=False)
    state = TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=(),
    )
    save_checkpoint(str(tmp_path / "ck"), {
        "params": state.params, "batch_stats": state.batch_stats,
    }, epoch=0, block=True)

    restored = load_state(cfg, logging.getLogger("t"))
    leaf = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(
        np.asarray(leaf), np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    )

    paths = export_inference(
        cfg, ["RGB"], state=restored, batch_size=1, num_segments=2
    )
    assert os.path.exists(paths["module"])
    manifest = json.load(open(paths["manifest"]))
    assert manifest["modality"] == ["RGB"]


def test_export_inference_bundle(tmp_path):
    cfg = load_config(
        overrides=[
            "model.attention.enable=False",
            "model.pretrained=False",
            "data.test_crop_size=64",
            "data.audio.audio_length=1.279",
            "model.num_classes={verb: 5, noun: 7}",
            f"out_dir={tmp_path}",
        ]
    )
    paths = export_inference(
        cfg, ["RGB", "Audio"], batch_size=1, num_segments=2
    )

    module = open(paths["module"]).read()
    assert "stablehlo" in module or "mhlo" in module
    # inputs appear with the export shapes
    assert "1x2x64x64x3" in module  # RGB uint8 batch

    manifest = json.load(open(paths["manifest"]))
    assert manifest["inputs"]["RGB"] == {
        "shape": [1, 2, 64, 64, 3],
        "dtype": "uint8",
    }
    assert manifest["outputs"] == ["noun", "verb"]
    assert manifest["num_segments"] == 2
    assert os.path.isdir(paths["params"])
    assert len(manifest["stablehlo_sha256"]) == 64


def test_export_int8_serving_mode(tmp_path):
    """serving_dtype=int8: kernels stored int8+scale, dequantize in-graph,
    logits within weight-only-quantization drift of the fp32 model."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from attention_based_tbn_tpu.models.tbn import TBNModel, TBNSpec
    from attention_based_tbn_tpu.tools.export import (
        dequantize,
        export_inference,
        quantize_int8,
    )

    cfg = load_config(
        overrides=[
            "model.attention.enable=False",
            "model.pretrained=False",
            "data.test_crop_size=64",
            "data.audio.audio_length=1.279",
            "model.num_classes={verb: 5, noun: 7}",
            "tpu.compute_dtype=float32",
            f"out_dir={tmp_path}",
        ]
    )
    paths = export_inference(
        cfg, ["RGB"], batch_size=1, num_segments=2, serving_dtype="int8"
    )
    manifest = json.load(open(paths["manifest"]))
    assert manifest["serving_dtype"] == "int8"
    assert manifest["quantization"]["bits"] == 8

    # the module's parameter inputs are the quantized tree: int8 kernels
    # appear as i8 tensor types in the StableHLO text
    module = open(paths["module"]).read()
    assert "i8" in module

    # round-trip numerics: quantize -> dequantize -> apply stays close to
    # the fp32 model (per-channel symmetric int8 keeps |dw| <= scale/2 =
    # max|w|/254 per weight)
    spec = TBNSpec.from_config(cfg, ["RGB"])
    model = TBNModel(spec)
    batch = {
        "RGB": jnp.asarray(
            np.random.default_rng(0).integers(0, 255, (2, 2, 64, 64, 3)),
            jnp.uint8,
        )
    }
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False)
    )({"params": jax.random.key(0)}, batch)
    ref = model.apply(variables, batch, train=False)
    qvars = quantize_int8(variables)
    # int8 kernels + fp32 scales actually present
    kinds = {
        np.dtype(x.dtype)
        for x in jax.tree_util.tree_leaves(qvars)
        if hasattr(x, "dtype")
    }
    assert np.dtype(np.int8) in kinds
    got = model.apply(dequantize(qvars), batch, train=False)
    for head in ("verb", "noun"):
        r, g = np.asarray(ref[head]), np.asarray(got[head])
        # drift bounded well below the logit spread; ranking preserved
        assert np.max(np.abs(r - g)) < 0.05 * (np.std(r) + 1e-6) + 0.05
        np.testing.assert_array_equal(r.argmax(-1), g.argmax(-1))


def test_output_row_multipliers_verified_batch_invariant(tmp_path):
    """Advisor r4: a global output whose leading dim is coincidentally a
    multiple of the batch (ALWAYS true at batch_size=1) must be declared
    null, not per-row — the manifest is the serving source of truth for
    trimming/splitting. _output_row_multipliers verifies linear scaling
    with a second abstract trace instead of guessing from divisibility."""
    import jax
    import jax.numpy as jnp

    from attention_based_tbn_tpu.tools.export import (
        _example_batch,
        _output_row_multipliers,
    )

    cfg = load_config(
        overrides=[
            "model.pretrained=False",
            "data.test_crop_size=64",
            "data.audio.audio_length=1.279",
        ]
    )
    batch_size, n_seg = 1, 2

    def forward(variables, batch):
        b = batch["RGB"].shape[0]
        return {
            "verb": jnp.zeros((b, 5)),  # per-row, k=1
            "weights": jnp.zeros((b * n_seg, 4)),  # per-row, k=n_seg
            "global_stat": jnp.zeros((1, 3)),  # lead 1 divides b=1!
            "scalar": jnp.zeros(()),  # no leading dim at all
        }

    batch = _example_batch(cfg, ["RGB"], batch_size, n_seg)
    out_struct = jax.eval_shape(forward, {}, batch)
    names = [
        "/".join(str(getattr(k, "key", k)) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(out_struct)[0]
    ]
    mults = _output_row_multipliers(
        forward, {}, cfg, ["RGB"], batch_size, n_seg, names, out_struct
    )
    assert mults == {
        "global_stat": None,  # the divisibility heuristic would say 1
        "scalar": None,
        "verb": 1,
        "weights": n_seg,
    }


def test_exported_manifest_multipliers_all_per_row(tmp_path):
    """The flagship export's outputs are all per-row, so the verified
    multipliers enable serving-side trimming AND micro-batch coalescing
    (tools/serve.BatchingFront requires no nulls)."""
    cfg = load_config(
        overrides=[
            "model.attention.enable=False",
            "model.pretrained=False",
            "data.test_crop_size=64",
            "data.audio.audio_length=1.279",
            "model.num_classes={verb: 3, noun: 4}",
            f"out_dir={tmp_path}",
        ]
    )
    paths = export_inference(cfg, ["RGB"], batch_size=2, num_segments=2)
    manifest = json.load(open(paths["manifest"]))
    mults = manifest["output_row_multipliers"]
    assert mults and all(v is not None for v in mults.values())
