"""Gated parity tests on the REAL pretrained weights.

These activate automatically once ``weights/download.sh`` has fetched the
reference's pretrained bundle (imagenet_bninception_rgb.pth /
kinetics_bninception_flow.pth — reference weights/download.sh,
core/models/bn_inception.py:60-80); without the files every test skips.
They validate the full converter -> tower chain on actual artifacts, which
the random-weight parity tests (test_whole_model_parity.py) cannot:

* structural match: the converted tree drops into the Flax tower's init
  tree exactly (same paths, same shapes);
* .pth -> .npz round trip (convert_cli) is bit-exact;
* the tower forward on real weights produces sane, finite features;
* when ``pretrainedmodels`` is importable (the reference's own dependency),
  full fp32 logit parity of our tower against the torch original.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

WEIGHTS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "weights")
RGB_PTH = os.path.join(WEIGHTS_DIR, "imagenet_bninception_rgb.pth")
FLOW_PTH = os.path.join(WEIGHTS_DIR, "kinetics_bninception_flow.pth")

needs_rgb = pytest.mark.skipif(
    not os.path.exists(RGB_PTH),
    reason="pretrained weights absent (run weights/download.sh)",
)
needs_flow = pytest.mark.skipif(
    not os.path.exists(FLOW_PTH),
    reason="pretrained weights absent (run weights/download.sh)",
)


def _tree_paths(tree, prefix=()):
    out = {}
    for key, value in tree.items():
        if isinstance(value, dict):
            out.update(_tree_paths(value, prefix + (key,)))
        else:
            out[prefix + (key,)] = np.asarray(value).shape
    return out


@needs_rgb
class TestImagenetRGB:
    @pytest.fixture(scope="class")
    def converted(self):
        from attention_based_tbn_tpu.models.convert import (
            convert_bninception,
            load_torch_file,
        )

        return convert_bninception(load_torch_file(RGB_PTH))

    def test_structural_match_with_init_tree(self, converted):
        from attention_based_tbn_tpu.models.bn_inception import BNInception

        params, stats = converted
        model = BNInception()
        variables = jax.jit(
            lambda: model.init(
                jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
            )
        )()
        np.testing.assert_equal(
            sorted(_tree_paths(variables["params"]).items()),
            sorted(_tree_paths(params).items()),
        )
        np.testing.assert_equal(
            sorted(_tree_paths(variables["batch_stats"]).items()),
            sorted(_tree_paths(stats).items()),
        )

    def test_npz_round_trip(self, converted, tmp_path):
        from attention_based_tbn_tpu.models.convert_cli import (
            load_npz,
            main as cli_main,
        )

        out = str(tmp_path / "rgb.npz")
        cli_main(
            ["--input", RGB_PTH, "--kind", "bninception", "--output", out]
        )
        params, stats = load_npz(out)
        ref_params, ref_stats = converted
        for a, b in ((params, ref_params), (stats, ref_stats)):
            jax.tree.map(
                lambda x, y: np.testing.assert_array_equal(
                    np.asarray(x), np.asarray(y)
                ),
                a,
                b,
            )

    def test_forward_features_sane(self, converted):
        from attention_based_tbn_tpu.models.bn_inception import BNInception

        params, stats = converted
        model = BNInception()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 224, 224, 3)), jnp.float32)
        feats = jax.jit(
            lambda v, x_: model.apply(v, x_, train=False)
        )({"params": params, "batch_stats": stats}, x)
        feats = np.asarray(feats)
        assert feats.shape == (2, 1024)
        assert np.isfinite(feats).all()
        # relu'd, globally pooled real features: non-negative, non-trivial
        assert (feats >= 0).all() and feats.std() > 1e-3

    def test_fp32_parity_vs_pretrainedmodels(self, converted):
        torch = pytest.importorskip("torch")
        pm = pytest.importorskip("pretrainedmodels")

        net = pm.bninception(pretrained=None)
        net.load_state_dict(torch.load(RGB_PTH, map_location="cpu"), strict=False)
        net.eval()

        from attention_based_tbn_tpu.models.bn_inception import BNInception

        params, stats = converted
        model = BNInception()
        rng = np.random.default_rng(1)
        x = rng.uniform(-1, 1, (2, 224, 224, 3)).astype(np.float32)

        ours = np.asarray(
            model.apply(
                {"params": params, "batch_stats": stats},
                jnp.asarray(x),
                train=False,
            )
        )
        with torch.no_grad():
            xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
            theirs = net.features(xt)
            theirs = torch.nn.functional.avg_pool2d(
                theirs, theirs.shape[-1]
            ).flatten(1).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@needs_flow
class TestKineticsFlow:
    def test_flow_tower_loads_with_channel_adaptation(self):
        from attention_based_tbn_tpu.config import load_config
        from attention_based_tbn_tpu.models.builder import (
            build_model,
            load_pretrained_towers,
        )

        cfg = load_config(
            overrides=[
                "data.rgb.enable=False",
                "data.audio.enable=False",
                "data.flow.enable=True",
                f"data_dir={os.path.dirname(WEIGHTS_DIR)}",
                "model.attention.enable=False",
            ]
        )
        model, spec = build_model(cfg, ["Flow"])
        rng = np.random.default_rng(0)
        batch = {
            "Flow": jnp.asarray(
                rng.integers(0, 255, (1, 2, 64, 64, 10)), jnp.uint8
            )
        }
        variables = jax.jit(
            lambda: model.init(
                {"params": jax.random.key(0)}, batch, train=False
            )
        )()
        params, stats = load_pretrained_towers(
            cfg, ["Flow"], variables["params"], variables["batch_stats"]
        )
        kernel = params["Base_Flow"]["conv1_7x7_s2"]["conv"]["kernel"]
        assert kernel.shape[2] == 10  # channel-meaned + tiled to the stack
        out = model.apply(
            {"params": params, "batch_stats": stats}, batch, train=False
        )
        assert np.isfinite(np.asarray(out["verb"])).all()
