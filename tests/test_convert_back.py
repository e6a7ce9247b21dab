"""Reverse converter: Flax variables -> reference PyTorch state dicts.

Round-trips every tower family and the full TBN checkpoint through
``convert.py`` -> ``convert_back.py`` bitwise, and proves the emitted
mapping drives the reference's *verbatim* torch ``TBNModel``: a state dict
exported from this framework loads into the reference model (reference
core/models/model.py:52-101 naming; the only keys we don't emit are the
dead ``last_linear`` heads the reference factory itself deletes,
bn_inception.py:82) and reproduces the source model's logits.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from attention_based_tbn_tpu.models.convert import (
    convert_bninception,
    convert_resnet,
    convert_tbn_checkpoint,
    convert_vgg,
    load_torch_file,
)
from attention_based_tbn_tpu.models.convert_back import (
    export_bninception,
    export_resnet,
    export_tbn_state_dict,
    export_vgg,
    save_reference_checkpoint,
)
from attention_based_tbn_tpu.models.resnet import ResNet
from attention_based_tbn_tpu.models.tbn import TBNSpec
from attention_based_tbn_tpu.models.vgg import VGG

from test_convert import synth_bninception_state_dict
from test_whole_model_parity import (
    ATTN_WIN,
    make_oracle,
    torch_batch,
)

SKIPPED_SUFFIXES = (".num_batches_tracked",)
REGENERATED = ("pe.0.pe", "attention_layer.prototype_wts")


def assert_round_trip(original, exported, skip_prefixes=("last_linear",)):
    """Every original float tensor reappears bitwise; no stray keys beyond
    the int64 num_batches_tracked buffers we add for strict torch loads."""
    orig = {
        k: v
        for k, v in original.items()
        if not k.startswith(skip_prefixes) and not k.endswith(SKIPPED_SUFFIXES)
    }
    extra = {
        k
        for k in set(exported) - set(orig)
        if not k.endswith(SKIPPED_SUFFIXES)
    }
    missing = set(orig) - set(exported)
    assert not extra, f"unexpected exported keys: {sorted(extra)[:5]}"
    assert not missing, f"missing exported keys: {sorted(missing)[:5]}"
    for key, value in orig.items():
        want = value.detach().numpy() if hasattr(value, "detach") else value
        got = exported[key]
        if key in REGENERATED:
            np.testing.assert_allclose(
                got, want, rtol=1e-5, atol=1e-6, err_msg=key
            )
        else:
            np.testing.assert_array_equal(got, want, err_msg=key)


class TestTowerRoundTrips:
    def test_bninception(self):
        sd = synth_bninception_state_dict(3)
        params, stats = convert_bninception(sd)
        assert_round_trip(sd, export_bninception(params, stats))

    @pytest.mark.parametrize("depth", [18, 50])
    def test_resnet(self, depth):
        from test_convert import TestResNetConvert, tree_shapes

        model = ResNet(depth=depth)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        sd = {}
        for path, shape in tree_shapes(variables["params"]).items():
            name = TestResNetConvert._torch_name(path)
            if path[-1] == "kernel":
                h, w, i, o = shape
                sd[name] = torch.randn(o, i, h, w)
            else:
                sd[name] = torch.randn(*shape)
        for path, shape in tree_shapes(variables["batch_stats"]).items():
            sd[TestResNetConvert._torch_name(path)] = torch.randn(*shape)

        params, stats = convert_resnet(sd)
        assert_round_trip(sd, export_resnet(params, stats))

    def test_vgg16(self):
        from test_convert import tree_shapes

        model = VGG(vgg_type="16")
        variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
        feat_indices = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        sd = {}
        for conv_i, feat_i in enumerate(feat_indices):
            h, w, i, o = tree_shapes(variables["params"])[(f"conv{conv_i}", "kernel")]
            sd[f"features.{feat_i}.weight"] = torch.randn(o, i, h, w)
            sd[f"features.{feat_i}.bias"] = torch.randn(o)
        sd["classifier.0.weight"] = torch.randn(4096, 25088)
        sd["classifier.0.bias"] = torch.randn(4096)
        sd["classifier.3.weight"] = torch.randn(4096, 4096)
        sd["classifier.3.bias"] = torch.randn(4096)

        params, stats = convert_vgg(sd, "16")
        assert_round_trip(sd, export_vgg(params, stats, vgg_type="16"))


def make_spec(attention_type, modality=("RGB", "Audio")):
    return TBNSpec(
        modality=tuple(modality),
        arch="bninception",
        num_classes=(("verb", 7), ("noun", 9)),
        attention_enable=True,
        attention_type=attention_type,
        use_pe=True,
        attn_heads=4,
        attn_win=ATTN_WIN,
        audio_stem=tuple(modality),
        audio_from_waveform=False,
        compute_dtype="float32",
    )


class TestTBNRoundTrip:
    """Oracle torch TBNModel -> convert -> export -> identical state dict,
    and the exported dict drives a second reference model to the same
    logits (the strict-load proof)."""

    @pytest.mark.parametrize("attention_type", ["mha", "unimodal", "proto"])
    def test_oracle_round_trip(self, attention_type):
        oracle = make_oracle(("RGB", "Audio"), attention_type=attention_type, seed=0)
        sd = {k: v for k, v in oracle.state_dict().items()}

        params, stats = convert_tbn_checkpoint(sd, arch="bninception")
        variables = {"params": params, "batch_stats": stats}
        back = export_tbn_state_dict(variables, make_spec(attention_type))

        # the self-contained oracle towers keep the dead 1000-way
        # last_linear head (reference bn_inception_audio.py:405, forward
        # never calls it, :1023); real pretrainedmodels towers have it
        # deleted (reference bn_inception.py:82) so we never emit it
        assert_round_trip(
            sd, back, skip_prefixes=("Base_RGB.last_linear", "Base_Audio.last_linear")
        )

    def test_loads_into_reference_model_and_matches_logits(self):
        oracle_src = make_oracle(("RGB", "Audio"), attention_type="mha", seed=0)
        sd = {k: v for k, v in oracle_src.state_dict().items()}
        params, stats = convert_tbn_checkpoint(sd, arch="bninception")
        back = export_tbn_state_dict(
            {"params": params, "batch_stats": stats}, make_spec("mha")
        )

        # differently-seeded reference model: everything must be overwritten
        oracle_dst = make_oracle(("RGB", "Audio"), attention_type="mha", seed=7)
        result = oracle_dst.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in back.items()},
            strict=False,
        )
        assert not result.unexpected_keys, result.unexpected_keys
        assert all(
            ".last_linear." in k for k in result.missing_keys
        ), result.missing_keys

        batch = torch_batch(("RGB", "Audio"), b=2, n=2, seed=3)
        with torch.no_grad():
            out_src = oracle_src(batch)
            out_dst = oracle_dst(batch)
        for key in ("verb", "noun"):
            np.testing.assert_allclose(
                out_dst[key].numpy(), out_src[key].numpy(), rtol=1e-5, atol=1e-5
            )


class TestCLI:
    def test_orbax_to_pth_cli(self, tmp_path, monkeypatch):
        """End-to-end user flow: Orbax checkpoint -> CLI -> reference .pth
        -> re-imported by the tester's own .pth loader."""
        import logging

        from attention_based_tbn_tpu.config import load_config
        from attention_based_tbn_tpu.models import convert_back
        from attention_based_tbn_tpu.models.tbn import TBNModel
        from attention_based_tbn_tpu.tools.test import load_state
        from attention_based_tbn_tpu.utils.checkpoint import save_checkpoint

        overrides = [
            "model.attention.enable=False",
            "model.pretrained=False",
            "data.flow.enable=False",
            "data.audio.enable=False",
            "data.test_crop_size=64",
            "model.num_classes={verb: 5, noun: 7}",
            f"out_dir={tmp_path}",
            f"test.pre_trained={tmp_path}/ck",
        ]
        cfg = load_config(overrides=overrides)
        spec = TBNSpec.from_config(cfg, ["RGB"])
        model = TBNModel(spec)
        batch = {"RGB": jnp.zeros((1, 2, 64, 64, 3), jnp.uint8)}
        variables = model.init(jax.random.key(0), batch, train=False)
        save_checkpoint(
            str(tmp_path / "ck"),
            {
                "params": variables["params"],
                "batch_stats": variables.get("batch_stats", {}),
            },
            epoch=3,
            train_loss_hist=[2.0, 1.0],
            block=True,
        )

        pth = str(tmp_path / "back.pth")
        monkeypatch.setattr(
            "sys.argv", ["convert_back", "--output", pth] + overrides
        )
        convert_back.main()

        data = torch.load(pth, map_location="cpu", weights_only=False)
        assert data["epoch"] == 3 and data["train_loss"] == [2.0, 1.0]
        assert any(k.startswith("Base_RGB.") for k in data["model"])

        cfg2 = load_config(overrides=overrides[:-1] + [f"test.pre_trained={pth}"])
        state = load_state(cfg2, logging.getLogger("t"))
        want = jax.tree_util.tree_leaves(variables["params"])
        got = jax.tree_util.tree_leaves(state.params)
        assert len(want) == len(got)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


class TestReferenceCheckpointFile:
    def test_save_and_reimport(self, tmp_path):
        """torch.save round trip: the written .pth re-imports through this
        framework's own reference-checkpoint loader bitwise."""
        oracle = make_oracle(("RGB", "Audio"), attention_type="mha", seed=2)
        sd = {k: v for k, v in oracle.state_dict().items()}
        params, stats = convert_tbn_checkpoint(sd, arch="bninception")
        variables = {"params": params, "batch_stats": stats}

        path = str(tmp_path / "export.pth")
        data = save_reference_checkpoint(
            path, variables, make_spec("mha"), epoch=4, train_loss_hist=[1.0, 0.5]
        )
        assert data["epoch"] == 4 and data["train_loss"] == [1.0, 0.5]

        reloaded = load_torch_file(path)  # unwraps ["model"]
        params2, stats2 = convert_tbn_checkpoint(reloaded, arch="bninception")

        flat1 = jax.tree_util.tree_leaves_with_path(params)
        flat2 = dict(jax.tree_util.tree_leaves_with_path(params2))
        assert len(flat1) == len(flat2)
        for keypath, leaf in flat1:
            np.testing.assert_array_equal(
                np.asarray(flat2[keypath]), np.asarray(leaf), err_msg=str(keypath)
            )
        flat1 = jax.tree_util.tree_leaves_with_path(stats)
        flat2 = dict(jax.tree_util.tree_leaves_with_path(stats2))
        assert len(flat1) == len(flat2)
        for keypath, leaf in flat1:
            np.testing.assert_array_equal(
                np.asarray(flat2[keypath]), np.asarray(leaf), err_msg=str(keypath)
            )
