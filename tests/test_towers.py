"""Tower shape/behavior tests: BN-Inception (visual + audio), ResNet, VGG."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from attention_based_tbn_tpu.models.bn_inception import (
    BN_INCEPTION_BLOCKS,
    BNInception,
)
from attention_based_tbn_tpu.models.resnet import ResNet
from attention_based_tbn_tpu.models.vgg import VGG


@pytest.fixture(scope="module")
def key():
    return jax.random.key(0)


class TestBNInception:
    def test_block_output_channels(self):
        # standard Inception-BN widths
        outs = {}
        for name, s in BN_INCEPTION_BLOCKS:
            if s.proj:
                outs[name] = s.b1x1 + s.b3x3 + s.d3x3 + s.proj
        assert outs["inception_3a"] == 256
        assert outs["inception_3b"] == 320
        assert outs["inception_4a"] == 576
        assert outs["inception_4c"] == 608
        assert outs["inception_5a"] == 1024
        assert outs["inception_5b"] == 1024

    def test_visual_feature_shape(self, key):
        model = BNInception()
        x = jnp.zeros((2, 224, 224, 3))
        variables = model.init(key, x)
        out = model.apply(variables, x)
        assert out.shape == (2, 1024)

    def test_flow_input_channels(self, key):
        model = BNInception()
        x = jnp.zeros((1, 224, 224, 10))
        variables = model.init(key, x)
        assert model.apply(variables, x).shape == (1, 1024)

    def test_audio_freq_pool_shape(self, key):
        # 2.1 s spectrogram: 256 x 420 -> features 8 x 13 -> (B, 13, 1024)
        model = BNInception(freq_pool_only=True)
        x = jnp.zeros((1, 256, 420, 1))
        variables = model.init(key, x)
        out = model.apply(variables, x)
        assert out.shape == (1, 13, 1024)

    def test_audio_4s_window(self, key):
        # 4.0 s: 256 x 800 -> 8 x 25 (the reference's documented anchor)
        model = BNInception(freq_pool_only=True)
        x = jnp.zeros((1, 256, 800, 1))
        variables = model.init(key, x)
        assert model.apply(variables, x).shape == (1, 25, 1024)

    def test_audio_stem_variant(self, key):
        model = BNInception(freq_pool_only=True, audio_stem=True)
        x = jnp.zeros((1, 256, 420, 1))
        variables = model.init(key, x)
        assert model.apply(variables, x).shape == (1, 13, 1024)

    def test_param_count(self, key):
        # Inception-BN has ~11.3M params (incl. BN affine, excl. classifier)
        model = BNInception()
        variables = model.init(key, jnp.zeros((1, 224, 224, 3)))
        n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
        assert 10_000_000 < n_params < 12_000_000

    @pytest.mark.parametrize("block", ["inception_3a", "inception_3c"])
    def test_merged_train_heads_match_per_branch(self, key, block):
        # The merged train-time conv+BN (models/bn_inception.py
        # _merged_train_heads) must reproduce the per-branch ConvBN cells
        # exactly: same outputs AND same running-stat updates, from the
        # same parameter tree.
        from attention_based_tbn_tpu.models.bn_inception import InceptionBlock

        spec = dict(BN_INCEPTION_BLOCKS)[block]
        x = jax.random.normal(jax.random.key(3), (2, 8, 8, 192), jnp.float32)

        merged = InceptionBlock(spec, merge_1x1=True)
        plain = InceptionBlock(spec, merge_1x1=False)
        variables = merged.init(key, x, train=True)
        out_m, mut_m = merged.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        out_p, mut_p = plain.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        np.testing.assert_allclose(
            np.asarray(out_m), np.asarray(out_p), rtol=1e-5, atol=1e-5
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            ),
            mut_m["batch_stats"],
            mut_p["batch_stats"],
        )
        # frozen-stats path too (partial-BN training)
        out_mf = merged.apply(variables, x, train=True, frozen_stats=True)
        out_pf = plain.apply(variables, x, train=True, frozen_stats=True)
        np.testing.assert_allclose(
            np.asarray(out_mf), np.asarray(out_pf), rtol=1e-5, atol=1e-5
        )
        # gradients agree through the merged formulation
        def loss(fn, params):
            out, _ = fn.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x,
                train=True,
                mutable=["batch_stats"],
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g_m = jax.grad(lambda p: loss(merged, p))(variables["params"])
        g_p = jax.grad(lambda p: loss(plain, p))(variables["params"])
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
            ),
            g_m,
            g_p,
        )

    def test_batch_stats_update_in_train(self, key):
        model = BNInception()
        x = jnp.ones((2, 64, 64, 3)) * 3.0
        variables = model.init(key, x)
        _, mutated = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        before = variables["batch_stats"]["conv1_7x7_s2"]["bn"]["mean"]
        after = mutated["batch_stats"]["conv1_7x7_s2"]["bn"]["mean"]
        assert not np.allclose(np.asarray(before), np.asarray(after))


class TestResNet:
    @pytest.mark.parametrize("depth,feat", [(18, 512), (50, 2048)])
    def test_feature_shapes(self, key, depth, feat):
        model = ResNet(depth=depth)
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(key, x)
        assert model.apply(variables, x).shape == (1, feat)
        assert model.feature_size == feat

    def test_non_rgb_input(self, key):
        model = ResNet(depth=18)
        x = jnp.zeros((1, 64, 64, 10))
        variables = model.init(key, x)
        assert model.apply(variables, x).shape == (1, 512)


class TestVGG:
    def test_feature_shape(self, key):
        model = VGG(vgg_type="11")
        x = jnp.zeros((1, 224, 224, 3))
        variables = model.init(key, x)
        out = model.apply(variables, x)
        assert out.shape == (1, 4096)

    def test_bn_variant(self, key):
        model = VGG(vgg_type="11bn")
        x = jnp.zeros((1, 224, 224, 3))
        variables = model.init(key, x)
        assert "bn0" in variables["params"]
        assert model.apply(variables, x).shape == (1, 4096)


class TestAdaptiveAvgPool:
    def test_matches_torch_semantics(self):
        """adaptive_avg_pool2d vs torch.nn.AdaptiveAvgPool2d across down-,
        up- and mixed-sampling geometries (incl. the VGG non-224 cases the
        reference reaches through torchvision's fixed avgpool-to-7x7)."""
        torch = pytest.importorskip("torch")
        import numpy as np

        from attention_based_tbn_tpu.ops.pooling import adaptive_avg_pool2d

        gen = torch.Generator().manual_seed(0)
        for (h, w), out in [
            ((13, 8), (7, 7)),   # audio-spectrogram-ish map: downsample
            ((2, 2), (7, 7)),    # 64-px crops: upsample
            ((7, 7), (7, 7)),    # identity (224-px path)
            ((10, 21), (7, 7)),
            ((5, 9), (3, 4)),
        ]:
            x = torch.randn(2, 16, h, w, generator=gen)
            want = torch.nn.AdaptiveAvgPool2d(out)(x).numpy()
            got = adaptive_avg_pool2d(
                jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), out
            )
            np.testing.assert_allclose(
                np.asarray(got).transpose(0, 3, 1, 2), want,
                rtol=1e-5, atol=1e-6, err_msg=f"{(h, w)} -> {out}",
            )

    def test_vgg_non_224_keeps_torchvision_classifier_shape(self, key):
        """Any input size must flatten to 512*7*7 = 25088 (torchvision runs
        AdaptiveAvgPool2d((7,7)) before the classifier for every size)."""
        model = VGG(vgg_type="11")
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(key, x)
        assert variables["params"]["fc1"]["kernel"].shape == (25088, 4096)
        assert model.apply(variables, x).shape == (1, 4096)
