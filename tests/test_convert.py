"""Weight-converter tests: synthetic torch-style state dicts must convert to
trees that exactly match the Flax models' init shapes (all leaves consumed)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from attention_based_tbn_tpu.models.bn_inception import (
    BN_INCEPTION_BLOCKS,
    BNInception,
)
from attention_based_tbn_tpu.models.convert import (
    adapt_first_conv,
    convert_bninception,
    convert_resnet,
    convert_tbn_checkpoint,
    convert_vgg,
)
from attention_based_tbn_tpu.models.resnet import ResNet
from attention_based_tbn_tpu.models.vgg import VGG


def tree_shapes(tree, prefix=()):
    out = {}
    for key, value in tree.items():
        if isinstance(value, dict):
            out.update(tree_shapes(value, prefix + (key,)))
        else:
            out[prefix + (key,)] = tuple(value.shape)
    return out


def synth_bninception_state_dict(in_channels=3):
    """Build a state dict with pretrainedmodels BN-Inception naming, derived
    from our spec table (checks our channel table against the torch names)."""
    sd = {}

    def conv(name, cin, cout, k):
        sd[f"{name}.weight"] = torch.randn(cout, cin, k, k)
        sd[f"{name}.bias"] = torch.randn(cout)
        sd[f"{name}_bn.weight"] = torch.randn(cout)
        sd[f"{name}_bn.bias"] = torch.randn(cout)
        sd[f"{name}_bn.running_mean"] = torch.randn(cout)
        sd[f"{name}_bn.running_var"] = torch.rand(cout) + 0.5

    conv("conv1_7x7_s2", in_channels, 64, 7)
    conv("conv2_3x3_reduce", 64, 64, 1)
    conv("conv2_3x3", 64, 192, 3)

    in_ch = 192
    for name, s in BN_INCEPTION_BLOCKS:
        if s.b1x1:
            conv(f"{name}_1x1", in_ch, s.b1x1, 1)
        conv(f"{name}_3x3_reduce", in_ch, s.r3x3, 1)
        conv(f"{name}_3x3", s.r3x3, s.b3x3, 3)
        conv(f"{name}_double_3x3_reduce", in_ch, s.rd3x3, 1)
        conv(f"{name}_double_3x3_1", s.rd3x3, s.d3x3, 3)
        conv(f"{name}_double_3x3_2", s.d3x3, s.d3x3, 3)
        if s.proj:
            conv(f"{name}_pool_proj", in_ch, s.proj, 1)
            in_ch = s.b1x1 + s.b3x3 + s.d3x3 + s.proj
        else:
            in_ch = s.b3x3 + s.d3x3 + in_ch

    sd["last_linear.weight"] = torch.randn(1000, 1024)
    sd["last_linear.bias"] = torch.randn(1000)
    return sd


class TestBNInceptionConvert:
    def test_shapes_match_model_init(self):
        sd = synth_bninception_state_dict()
        params, stats = convert_bninception(sd)

        model = BNInception()
        variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        expect_p = tree_shapes(variables["params"])
        expect_s = tree_shapes(variables["batch_stats"])
        assert tree_shapes(params) == expect_p
        assert tree_shapes(stats) == expect_s

    def test_values_transposed(self):
        sd = synth_bninception_state_dict()
        params, stats = convert_bninception(sd)
        np.testing.assert_allclose(
            params["conv1_7x7_s2"]["conv"]["kernel"],
            sd["conv1_7x7_s2.weight"].numpy().transpose(2, 3, 1, 0),
        )
        np.testing.assert_allclose(
            params["inception_3a"]["double_3x3_1"]["bn"]["scale"],
            sd["inception_3a_double_3x3_1_bn.weight"].numpy(),
        )
        np.testing.assert_allclose(
            stats["inception_5b"]["pool_proj"]["bn"]["var"],
            sd["inception_5b_pool_proj_bn.running_var"].numpy(),
        )

    def test_adapt_first_conv(self):
        sd = synth_bninception_state_dict()
        params, _ = convert_bninception(sd)
        orig = params["conv1_7x7_s2"]["conv"]["kernel"].copy()
        adapt_first_conv(params, in_channels=1)
        np.testing.assert_allclose(
            params["conv1_7x7_s2"]["conv"]["kernel"][..., 0, :],
            orig.mean(axis=2),
            rtol=1e-6,
        )
        adapt_first_conv(params, in_channels=10)
        assert params["conv1_7x7_s2"]["conv"]["kernel"].shape == (7, 7, 10, 64)

    def test_functional_parity_spot(self):
        """Converted weights drive the flax tower; spot-check the stem output
        against a torch recomputation of conv1+bn1+relu+maxpool."""
        sd = synth_bninception_state_dict()
        params, stats = convert_bninception(sd)
        model = BNInception()
        x = torch.randn(1, 3, 64, 64)

        conv = torch.nn.Conv2d(3, 64, 7, 2, 3)
        conv.weight.data = sd["conv1_7x7_s2.weight"]
        conv.bias.data = sd["conv1_7x7_s2.bias"]
        bn = torch.nn.BatchNorm2d(64)
        bn.weight.data = sd["conv1_7x7_s2_bn.weight"]
        bn.bias.data = sd["conv1_7x7_s2_bn.bias"]
        bn.running_mean.data = sd["conv1_7x7_s2_bn.running_mean"]
        bn.running_var.data = sd["conv1_7x7_s2_bn.running_var"]
        bn.eval()
        ref = torch.relu(bn(conv(x)))

        from attention_based_tbn_tpu.models.layers import ConvBN

        ours = ConvBN(64, 7, 2, 3).apply(
            {
                "params": params["conv1_7x7_s2"],
                "batch_stats": stats["conv1_7x7_s2"],
            },
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
            train=False,
        )
        np.testing.assert_allclose(
            np.asarray(ours),
            ref.detach().numpy().transpose(0, 2, 3, 1),
            rtol=1e-3,
            atol=1e-3,
        )


class TestResNetConvert:
    @pytest.mark.parametrize("depth", [18, 50])
    def test_state_dict_roundtrip(self, depth):
        # Build a torch resnet architecture without torchvision: reuse shapes
        # from our model init and emit a synthetic torchvision-style dict.
        model = ResNet(depth=depth)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        expect_p = tree_shapes(variables["params"])
        expect_s = tree_shapes(variables["batch_stats"])

        sd = {}
        for path, shape in expect_p.items():
            name = self._torch_name(path)
            if path[-1] == "kernel":
                h, w, i, o = shape
                sd[name] = torch.randn(o, i, h, w)
            elif path[-1] == "scale" or path[-1] == "bias":
                sd[name] = torch.randn(*shape)
        for path, shape in expect_s.items():
            name = self._torch_name(path)
            sd[name] = torch.randn(*shape)

        params, stats = convert_resnet(sd)
        assert tree_shapes(params) == expect_p
        assert tree_shapes(stats) == expect_s

    @staticmethod
    def _torch_name(path):
        # ('layer1_0', 'conv1', 'kernel') -> 'layer1.0.conv1.weight'
        leaf_map = {
            "kernel": "weight",
            "scale": "weight",
            "bias": "bias",
            "mean": "running_mean",
            "var": "running_var",
        }
        parts = list(path[:-1])
        leaf = leaf_map[path[-1]]
        if parts[0].startswith("layer"):
            stage, block = parts[0].split("_")
            sub = parts[1]
            if sub == "downsample_conv":
                return f"{stage}.{block}.downsample.0.{leaf}"
            if sub == "downsample_bn":
                return f"{stage}.{block}.downsample.1.{leaf}"
            return f"{stage}.{block}.{sub}.{leaf}"
        return f"{parts[0]}.{leaf}"


class TestVGGConvert:
    def test_vgg16_roundtrip(self):
        model = VGG(vgg_type="16")
        variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
        expect_p = tree_shapes(variables["params"])

        # torchvision feature indices for vgg16 convs
        feat_indices = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        sd = {}
        for conv_i, feat_i in enumerate(feat_indices):
            h, w, i, o = expect_p[(f"conv{conv_i}", "kernel")]
            sd[f"features.{feat_i}.weight"] = torch.randn(o, i, h, w)
            sd[f"features.{feat_i}.bias"] = torch.randn(o)
        sd["classifier.0.weight"] = torch.randn(4096, 25088)
        sd["classifier.0.bias"] = torch.randn(4096)
        sd["classifier.3.weight"] = torch.randn(4096, 4096)
        sd["classifier.3.bias"] = torch.randn(4096)
        sd["classifier.6.weight"] = torch.randn(1000, 4096)
        sd["classifier.6.bias"] = torch.randn(1000)

        params, stats = convert_vgg(sd, "16")
        assert tree_shapes(params) == expect_p
        assert stats == {}


class TestTBNCheckpointConvert:
    def test_mha_checkpoint(self):
        """Full reference-style checkpoint with towers + pe + mha + heads."""
        e = 1024
        sd = {}
        for tower in ("Base_RGB", "Base_Audio"):
            for key, value in synth_bninception_state_dict(
                1 if tower == "Base_Audio" else 3
            ).items():
                if key.startswith("last_linear"):
                    continue
                sd[f"{tower}.{key}"] = value
        sd["pe.0.pe"] = torch.randn(1, 10, 13)
        sd["pe.1.weight"] = torch.randn(1024, 1034, 1)
        sd["pe.1.bias"] = torch.randn(1024)
        sd["pe.2.weight"] = torch.randn(1024)
        sd["pe.2.bias"] = torch.randn(1024)
        sd["attention_layer.attention_layer.in_proj_weight"] = torch.randn(3 * e, e)
        sd["attention_layer.attention_layer.in_proj_bias"] = torch.randn(3 * e)
        sd["attention_layer.attention_layer.out_proj.weight"] = torch.randn(e, e)
        sd["attention_layer.attention_layer.out_proj.bias"] = torch.randn(e)
        sd["fusion.fusion_layer.0.weight"] = torch.randn(512, 2048)
        sd["fusion.fusion_layer.0.bias"] = torch.randn(512)
        sd["classifier.verb.weight"] = torch.randn(125, 512)
        sd["classifier.verb.bias"] = torch.randn(125)
        sd["classifier.noun.weight"] = torch.randn(352, 512)
        sd["classifier.noun.bias"] = torch.randn(352)

        params, stats = convert_tbn_checkpoint(sd, arch="bninception")
        assert params["pe"]["conv"]["kernel"].shape == (1034, 1024)
        assert params["attention_layer"]["q_proj"]["kernel"].shape == (e, e)
        assert params["fusion"]["fc"]["kernel"].shape == (2048, 512)
        assert params["classifier"]["noun"]["kernel"].shape == (512, 352)
        assert "Base_RGB" in params and "Base_Audio" in stats
        # q/k/v split: q slice of in_proj
        w = sd["attention_layer.attention_layer.in_proj_weight"].numpy()
        np.testing.assert_allclose(
            params["attention_layer"]["k_proj"]["kernel"], w[e : 2 * e].T
        )
