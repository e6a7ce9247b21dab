"""Numerical parity of the Flax building blocks against PyTorch (CPU).

These tests pin the op-level semantics (conv padding, ceil-mode pooling,
batch-norm statistics, group-norm, linear) that the tower and attention
modules compose. If each cell matches torch exactly, converted reference
weights produce matching logits.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from attention_based_tbn_tpu.models.layers import (
    ConvBN,
    TorchBatchNorm,
    TorchConv,
    TorchGroupNorm,
    TorchLinear,
)
from attention_based_tbn_tpu.ops.pooling import avg_pool2d, global_avg_pool, max_pool2d

TOL = dict(rtol=1e-4, atol=1e-5)


def to_nhwc(x_torch):
    return np.transpose(x_torch.detach().numpy(), (0, 2, 3, 1))


def t2j(tensor):
    """torch -> jnp with a forced copy (jnp.asarray zero-copies numpy views,
    which would alias torch buffers mutated in place, e.g. BN running stats)."""
    return jnp.asarray(np.array(tensor.detach().numpy()))


class TestPooling:
    @pytest.mark.parametrize("h,w", [(211, 420), (105, 52), (56, 56), (7, 13), (8, 14)])
    @pytest.mark.parametrize(
        "k,s,p,ceil",
        [
            (3, 2, 0, True),   # stem / reduction pools
            (3, 1, 1, True),   # 5b max pool
            (2, 2, 0, False),  # vgg pools
            (3, 2, 1, False),  # resnet stem pool
        ],
    )
    def test_max_pool(self, h, w, k, s, p, ceil):
        x = torch.randn(2, 3, h, w)
        ref = torch.nn.functional.max_pool2d(x, k, s, p, ceil_mode=ceil)
        ours = max_pool2d(jnp.asarray(to_nhwc(x)), k, s, p, ceil_mode=ceil)
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(ref), **TOL)

    @pytest.mark.parametrize("h,w", [(28, 28), (7, 13), (14, 13), (8, 25)])
    @pytest.mark.parametrize(
        "k,s,p,ceil,cip",
        [
            (3, 1, 1, True, True),   # inception avg-pool branch
            (2, 2, 0, False, True),  # generic
            (3, 2, 0, True, True),   # ceil-extra windows
        ],
    )
    def test_avg_pool(self, h, w, k, s, p, ceil, cip):
        x = torch.randn(2, 4, h, w)
        ref = torch.nn.functional.avg_pool2d(
            x, k, s, p, ceil_mode=ceil, count_include_pad=cip
        )
        ours = avg_pool2d(
            jnp.asarray(to_nhwc(x)), k, s, p, ceil_mode=ceil, count_include_pad=cip
        )
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(ref), **TOL)

    def test_global_avg_pool(self):
        x = torch.randn(3, 1024, 7, 7)
        ref = F.avg_pool2d(x, kernel_size=(7, 7)).flatten(1)
        ours = global_avg_pool(jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), **TOL)

    def test_freq_only_pool(self):
        # audio+attend: pool frequency axis only (reference bn_inception.py:22-30)
        x = torch.randn(3, 1024, 8, 13)
        ref = F.avg_pool2d(x, kernel_size=(8, 1), stride=(8, 1))  # (3,1024,1,13)
        ours = global_avg_pool(jnp.asarray(to_nhwc(x)), freq_only=True)  # (3,13,1024)
        np.testing.assert_allclose(
            np.asarray(ours), ref.squeeze(2).permute(0, 2, 1).numpy(), **TOL
        )


class TestConv:
    @pytest.mark.parametrize(
        "cin,cout,k,s,p,h,w",
        [
            (3, 64, 7, 2, 3, 224, 224),
            (10, 64, 7, 2, 3, 224, 224),
            (1, 64, 7, 2, 3, 256, 420),
            (192, 64, 1, 1, 0, 28, 28),
            (64, 96, 3, 2, 1, 28, 28),
            (1, 32, (3, 1), 2, (1, 0), 64, 90),
        ],
    )
    def test_conv_matches_torch(self, cin, cout, k, s, p, h, w):
        torch.manual_seed(0)
        conv = torch.nn.Conv2d(cin, cout, k, stride=s, padding=p, bias=True)
        x = torch.randn(2, cin, h, w)
        ref = conv(x)

        model = TorchConv(cout, k, s, p)
        params = {
            "kernel": jnp.asarray(
                conv.weight.detach().numpy().transpose(2, 3, 1, 0)
            ),
            "bias": jnp.asarray(conv.bias.detach().numpy()),
        }
        ours = model.apply({"params": params}, jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(ref), rtol=2e-4, atol=2e-4)


class TestSpaceToDepthConv:
    @pytest.mark.parametrize(
        "cin,h,w",
        [(3, 224, 224), (1, 256, 420), (10, 224, 224), (3, 64, 64)],
    )
    def test_s2d_stem_matches_torch(self, cin, h, w):
        torch.manual_seed(7)
        conv = torch.nn.Conv2d(cin, 64, 7, stride=2, padding=3, bias=True)
        x = torch.randn(2, cin, h, w)
        ref = conv(x)
        params = {
            "kernel": t2j(conv.weight.permute(2, 3, 1, 0)),
            "bias": t2j(conv.bias),
        }
        ours = TorchConv(64, 7, 2, 3, space_to_depth=True).apply(
            {"params": params}, jnp.asarray(to_nhwc(x))
        )
        assert ours.shape == to_nhwc(ref).shape
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(ref), rtol=2e-4, atol=2e-4)

    def test_odd_input_falls_back(self):
        torch.manual_seed(8)
        conv = torch.nn.Conv2d(3, 8, 7, stride=2, padding=3)
        x = torch.randn(1, 3, 57, 63)  # odd dims -> plain conv path
        ref = conv(x)
        params = {
            "kernel": t2j(conv.weight.permute(2, 3, 1, 0)),
            "bias": t2j(conv.bias),
        }
        ours = TorchConv(8, 7, 2, 3, space_to_depth=True).apply(
            {"params": params}, jnp.asarray(to_nhwc(x))
        )
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(ref), rtol=2e-4, atol=2e-4)


class TestBatchNorm:
    def _setup(self):
        torch.manual_seed(1)
        bn = torch.nn.BatchNorm2d(8)
        with torch.no_grad():
            bn.weight.copy_(torch.rand(8) + 0.5)
            bn.bias.copy_(torch.randn(8))
            bn.running_mean.copy_(torch.randn(8))
            bn.running_var.copy_(torch.rand(8) + 0.5)
        params = {"scale": t2j(bn.weight), "bias": t2j(bn.bias)}
        stats = {"mean": t2j(bn.running_mean), "var": t2j(bn.running_var)}
        return bn, params, stats

    def test_eval_mode(self):
        bn, params, stats = self._setup()
        bn.eval()
        x = torch.randn(4, 8, 5, 6)
        ref = bn(x)
        ours = TorchBatchNorm().apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(to_nhwc(x)),
            use_running_average=True,
        )
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(ref), **TOL)

    def test_train_mode_and_stat_update(self):
        bn, params, stats = self._setup()
        bn.train()
        x = torch.randn(4, 8, 5, 6)
        ref = bn(x)
        ours, mutated = TorchBatchNorm().apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(to_nhwc(x)),
            use_running_average=False,
            mutable=["batch_stats"],
        )
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(ref), **TOL)
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["mean"]),
            bn.running_mean.numpy(),
            **TOL,
        )
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["var"]),
            bn.running_var.numpy(),
            **TOL,
        )

    def test_frozen_stats_in_train(self):
        bn, params, stats = self._setup()
        bn.eval()  # frozen stats == eval-mode statistics
        x = torch.randn(4, 8, 5, 6)
        ref = bn(x)
        ours, mutated = TorchBatchNorm().apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(to_nhwc(x)),
            use_running_average=False,
            frozen_stats=True,
            mutable=["batch_stats"],
        )
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(ref), **TOL)
        # stats untouched
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["mean"]), bn.running_mean.numpy(), **TOL
        )


class TestGroupNorm:
    def test_matches_torch(self):
        torch.manual_seed(2)
        gn = torch.nn.GroupNorm(64, 1024)
        with torch.no_grad():
            gn.weight.copy_(torch.rand(1024) + 0.5)
            gn.bias.copy_(torch.randn(1024))
        x = torch.randn(3, 1024, 13)  # (B, C, S) conv1d-style
        ref = gn(x)
        params = {
            "scale": jnp.asarray(gn.weight.detach().numpy()),
            "bias": jnp.asarray(gn.bias.detach().numpy()),
        }
        # ours: (B, S, C)
        ours = TorchGroupNorm(num_groups=64).apply(
            {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 1))
        )
        np.testing.assert_allclose(
            np.asarray(ours), ref.detach().numpy().transpose(0, 2, 1), rtol=1e-4, atol=1e-4
        )


class TestLinear:
    def test_matches_torch(self):
        torch.manual_seed(3)
        lin = torch.nn.Linear(2048, 512)
        x = torch.randn(5, 2048)
        ref = lin(x)
        params = {
            "kernel": jnp.asarray(lin.weight.detach().numpy().T),
            "bias": jnp.asarray(lin.bias.detach().numpy()),
        }
        ours = TorchLinear(512).apply({"params": params}, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(), rtol=2e-4, atol=2e-4)


class TestConvBN:
    def test_composition(self):
        torch.manual_seed(4)
        conv = torch.nn.Conv2d(16, 32, 3, stride=1, padding=1)
        bn = torch.nn.BatchNorm2d(32)
        bn.eval()
        x = torch.randn(2, 16, 9, 9)
        ref = torch.relu(bn(conv(x)))

        params = {
            "conv": {
                "kernel": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(conv.bias.detach().numpy()),
            },
            "bn": {
                "scale": jnp.asarray(bn.weight.detach().numpy()),
                "bias": jnp.asarray(bn.bias.detach().numpy()),
            },
        }
        stats = {
            "bn": {
                "mean": jnp.asarray(bn.running_mean.numpy()),
                "var": jnp.asarray(bn.running_var.numpy()),
            }
        }
        ours = ConvBN(32, 3, 1, 1).apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(to_nhwc(x)),
            train=False,
        )
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(ref), rtol=2e-4, atol=2e-4)
