"""Whole-tower fp32 parity for ResNet / VGG against hand-built torch oracles.

The BN-Inception flagship already has whole-model parity against the
reference's verbatim torch modules (test_whole_model_parity.py). The
ResNet/VGG towers were only covered at the op / converter-key level because
torchvision is absent in this environment. These oracles close that gap:
they reproduce torchvision's resnet18 / resnet50 / vgg11[_bn] module graphs
verbatim from the public architecture (same state_dict key layout the
reference consumes via torchvision, reference core/models/resnet.py:7-44,
core/models/vgg.py:7-41), randomize their weights AND running stats, and
the converters map those state dicts onto our Flax towers.

Covers end-to-end: converter key mapping (incl. downsample/bottleneck and
the vgg bn feature-index arithmetic), the space-to-depth ResNet stem, torch
conv/BN train+eval semantics, floor-mode pooling, adaptive avg pooling
(both the identity and the upsampling geometry), NCHW flatten order ahead
of the VGG classifier, and train-mode running-stat updates.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from torch import nn as tnn  # noqa: E402

from attention_based_tbn_tpu.models.convert import (  # noqa: E402
    convert_resnet,
    convert_vgg,
)
from attention_based_tbn_tpu.models.resnet import ResNet  # noqa: E402
from attention_based_tbn_tpu.models.vgg import VGG  # noqa: E402


# ---------------------------------------------------------------------------
# torch oracles (torchvision-identical graphs + state_dict key layout)
# ---------------------------------------------------------------------------


class _BasicBlock(tnn.Module):
    expansion = 1

    def __init__(self, cin, width, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, width, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(width, width, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.downsample = None
        if stride != 1 or cin != width:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, width, 1, stride, bias=False),
                tnn.BatchNorm2d(width),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + identity)


class _Bottleneck(tnn.Module):
    expansion = 4

    def __init__(self, cin, width, stride):
        super().__init__()
        out = width * self.expansion
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, out, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or cin != out:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, out, 1, stride, bias=False),
                tnn.BatchNorm2d(out),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + identity)


class _TorchResNet(tnn.Module):
    """torchvision-resnet graph: identical state_dict keys & forward."""

    def __init__(self, block, layers, in_channels=3):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_channels, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin = 64
        for stage, (width, n) in enumerate(zip((64, 128, 256, 512), layers), 1):
            blocks = []
            for i in range(n):
                stride = 2 if (stage > 1 and i == 0) else 1
                blocks.append(block(cin, width, stride))
                cin = width * block.expansion
            setattr(self, f"layer{stage}", tnn.Sequential(*blocks))
        self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))

    def forward(self, x):
        y = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for stage in (self.layer1, self.layer2, self.layer3, self.layer4):
            y = stage(y)
        return torch.flatten(self.avgpool(y), 1)


_VGG_CFGS = {"11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M")}


class _TorchVGG(tnn.Module):
    """torchvision-vgg graph with the reference's classifier strip
    (last Linear removed, reference core/models/vgg.py:34-36)."""

    def __init__(self, vgg_type="11", batch_norm=False):
        super().__init__()
        layers = []
        cin = 3
        for item in _VGG_CFGS[vgg_type]:
            if item == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers.append(tnn.Conv2d(cin, item, 3, padding=1))
                if batch_norm:
                    layers.append(tnn.BatchNorm2d(item))
                layers.append(tnn.ReLU(inplace=True))
                cin = item
        self.features = tnn.Sequential(*layers)
        self.avgpool = tnn.AdaptiveAvgPool2d((7, 7))
        self.classifier = tnn.Sequential(
            tnn.Linear(512 * 7 * 7, 4096),
            tnn.ReLU(inplace=True),
            tnn.Dropout(),
            tnn.Linear(4096, 4096),
            tnn.ReLU(inplace=True),
            tnn.Dropout(),
        )

    def forward(self, x):
        y = torch.flatten(self.avgpool(self.features(x)), 1)
        return self.classifier(y)


def _randomize(module, seed):
    """Random weights AND random (non-identity) BN running stats.

    Weights use fan-in-scaled std (He) so activations stay O(1) through the
    BN-free VGG stack — a flat std compounds ~3.4x per conv layer and the
    blown-up activations amplify fp32 summation-order noise past any
    meaningful tolerance."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, (tnn.Conv2d, tnn.Linear)):
                std = (2.0 / m.weight[0].numel()) ** 0.5
                m.weight.copy_(torch.randn(m.weight.shape, generator=gen) * std)
                if m.bias is not None:
                    m.bias.copy_(torch.randn(m.bias.shape, generator=gen) * 0.05)
            elif isinstance(m, tnn.BatchNorm2d):
                m.weight.copy_(1 + torch.randn(m.weight.shape, generator=gen) * 0.1)
                m.bias.copy_(torch.randn(m.bias.shape, generator=gen) * 0.1)
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=gen) * 0.1
                )
                m.running_var.copy_(
                    1 + torch.rand(m.running_var.shape, generator=gen)
                )


def _nhwc(x_torch):
    return jnp.asarray(x_torch.numpy().transpose(0, 2, 3, 1))


# ---------------------------------------------------------------------------
# ResNet
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "depth,block,layers",
    [(18, _BasicBlock, (2, 2, 2, 2)), (50, _Bottleneck, (3, 4, 6, 3))],
)
def test_resnet_eval_parity(depth, block, layers):
    oracle = _TorchResNet(block, layers).eval()
    _randomize(oracle, seed=depth)
    params, stats = convert_resnet(oracle.state_dict())

    gen = torch.Generator().manual_seed(1)
    x = torch.randn(2, 3, 64, 64, generator=gen)
    with torch.no_grad():
        want = oracle(x).numpy()

    model = ResNet(depth=depth)
    got = model.apply(
        {"params": params, "batch_stats": stats}, _nhwc(x), train=False
    )
    assert got.shape == (2, model.feature_size)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_resnet_train_parity_and_stats():
    """Train mode: batch-stat normalization + running-stat EMA both match."""
    oracle = _TorchResNet(_BasicBlock, (2, 2, 2, 2)).train()
    _randomize(oracle, seed=7)
    params, stats = convert_resnet(oracle.state_dict())

    gen = torch.Generator().manual_seed(2)
    x = torch.randn(4, 3, 64, 64, generator=gen)
    with torch.no_grad():
        want = oracle(x).numpy()

    model = ResNet(depth=18)
    got, mutated = model.apply(
        {"params": params, "batch_stats": stats},
        _nhwc(x),
        train=True,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=3e-5)

    # updated running stats match torch's EMA (momentum 0.1, unbiased var)
    new_stats = mutated["batch_stats"]
    sd = oracle.state_dict()
    np.testing.assert_allclose(
        np.asarray(new_stats["bn1"]["mean"]),
        sd["bn1.running_mean"].numpy(),
        rtol=1e-4,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(new_stats["layer4_1"]["bn2"]["var"]),
        sd["layer4.1.bn2.running_var"].numpy(),
        rtol=1e-4,
        atol=1e-6,
    )


# ---------------------------------------------------------------------------
# VGG
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("batch_norm", [False, True])
def test_vgg11_eval_parity(batch_norm):
    vgg_type = "11bn" if batch_norm else "11"
    oracle = _TorchVGG("11", batch_norm=batch_norm).eval()
    _randomize(oracle, seed=11)
    params, stats = convert_vgg(oracle.state_dict(), vgg_type)

    gen = torch.Generator().manual_seed(3)
    # 64-px input: the post-features map is 2x2, so AdaptiveAvgPool2d((7,7))
    # runs its UPSAMPLING geometry in-graph before the NCHW flatten.
    x = torch.randn(2, 3, 64, 64, generator=gen)
    with torch.no_grad():
        want = oracle(x).numpy()

    variables = {"params": params}
    if batch_norm:
        variables["batch_stats"] = stats
    got = VGG(vgg_type=vgg_type).apply(variables, _nhwc(x), train=False)
    assert got.shape == (2, 4096)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_vgg11_224_identity_pool_parity():
    """224-px path: the adaptive pool is the identity (7x7 -> 7x7)."""
    oracle = _TorchVGG("11").eval()
    _randomize(oracle, seed=13)
    params, _ = convert_vgg(oracle.state_dict(), "11")

    gen = torch.Generator().manual_seed(4)
    x = torch.randn(1, 3, 224, 224, generator=gen)
    with torch.no_grad():
        want = oracle(x).numpy()

    got = VGG(vgg_type="11").apply({"params": params}, _nhwc(x), train=False)
    # atol 1e-4: the 25088-wide fc1 dot products accumulate in different
    # orders; near-cancelling rows see a few 1e-5 of absolute noise.
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-4)
