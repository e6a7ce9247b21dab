"""Hand-built torch oracle of the DEFAULT BN-Inception graph.

The reference consumes this graph from the ``pretrainedmodels`` package
(reference core/models/bn_inception.py:5-6, 38-107), which is absent in
this environment — the same gap test_tower_oracles.py closes for
torchvision's ResNet/VGG. This oracle reconstructs the public graph from
our declarative spec table (attention_based_tbn_tpu/models/bn_inception.py
BN_INCEPTION_BLOCKS), whose block structure is itself differentially
pinned against the reference's verbatim in-repo copy of the same graph
(core/models/bn_inception_audio.py — identical blocks, only the stem
differs; the commented-out default stem is visible at lines 35-58).

State-dict key layout follows the pretrainedmodels flat-name convention
the converters consume (``conv1_7x7_s2``, ``inception_3a_1x1``,
``..._bn`` BatchNorms; convs carry biases), so
``models/convert.convert_bninception`` maps this oracle's weights onto
our Flax tower and ``models/convert_back`` round-trips them.

Head behavior matches the reference's overloaded ``logits``
(core/models/bn_inception.py:16-35): global average pool by default,
frequency-only pooling for the audio tower under attention. The module
registration order puts the stem's BN at child index 1 so the reference's
partialbn freeze rule (core/models/model.py:170-176, effectively
``mod_no > 1``) keeps exactly ``conv1_7x7_s2_bn`` trainable.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

from attention_based_tbn_tpu.models.bn_inception import BN_INCEPTION_BLOCKS


class TorchBNInceptionDefault(nn.Module):
    """Default 7x7-stem BN-Inception tower (pretrainedmodels graph)."""

    def __init__(self, in_channels=3, is_audio=False, attend=False):
        super().__init__()
        self.is_audio = is_audio
        self.attend = attend
        self.feature_size = 1024

        self.conv1_7x7_s2 = nn.Conv2d(
            in_channels, 64, kernel_size=(7, 7), stride=(2, 2), padding=(3, 3)
        )
        self.conv1_7x7_s2_bn = nn.BatchNorm2d(64, affine=True)
        self.conv1_relu_7x7 = nn.ReLU(True)
        self.pool1_3x3_s2 = nn.MaxPool2d((3, 3), stride=(2, 2), ceil_mode=True)
        self.conv2_3x3_reduce = nn.Conv2d(64, 64, kernel_size=(1, 1))
        self.conv2_3x3_reduce_bn = nn.BatchNorm2d(64, affine=True)
        self.conv2_relu_3x3_reduce = nn.ReLU(True)
        self.conv2_3x3 = nn.Conv2d(64, 192, kernel_size=(3, 3), padding=(1, 1))
        self.conv2_3x3_bn = nn.BatchNorm2d(192, affine=True)
        self.conv2_relu_3x3 = nn.ReLU(True)
        self.pool2_3x3_s2 = nn.MaxPool2d((3, 3), stride=(2, 2), ceil_mode=True)

        cin = 192
        self._block_specs = []
        for name, spec in BN_INCEPTION_BLOCKS:
            self._add_block(name, spec, cin)
            cout = spec.b1x1 + spec.b3x3 + spec.d3x3 + (
                spec.proj if spec.proj else cin
            )
            self._block_specs.append((name, spec))
            cin = cout

    def _add_block(self, name, s, cin):
        def conv_bn(suffix, cin, cout, k, stride=1, pad=0):
            setattr(
                self,
                f"{name}_{suffix}",
                nn.Conv2d(cin, cout, kernel_size=k, stride=stride, padding=pad),
            )
            setattr(self, f"{name}_{suffix}_bn", nn.BatchNorm2d(cout, affine=True))
            setattr(self, f"{name}_relu_{suffix}", nn.ReLU(True))

        if s.b1x1:
            conv_bn("1x1", cin, s.b1x1, 1)
        conv_bn("3x3_reduce", cin, s.r3x3, 1)
        conv_bn("3x3", s.r3x3, s.b3x3, 3, stride=s.stride, pad=1)
        conv_bn("double_3x3_reduce", cin, s.rd3x3, 1)
        conv_bn("double_3x3_1", s.rd3x3, s.d3x3, 3, pad=1)
        conv_bn("double_3x3_2", s.d3x3, s.d3x3, 3, stride=s.stride, pad=1)
        if s.proj:
            if s.pool == "avg":
                pool = nn.AvgPool2d(
                    3, stride=1, padding=1, ceil_mode=True, count_include_pad=True
                )
            else:
                pool = nn.MaxPool2d((3, 3), stride=(1, 1), padding=(1, 1), ceil_mode=True)
            setattr(self, f"{name}_pool", pool)
            conv_bn("pool_proj", cin, s.proj, 1)
        else:
            setattr(
                self,
                f"{name}_pool",
                nn.MaxPool2d((3, 3), stride=(s.stride, s.stride), ceil_mode=True),
            )

    def _run_block(self, name, s, x):
        def cbr(suffix, y):
            y = getattr(self, f"{name}_{suffix}")(y)
            y = getattr(self, f"{name}_{suffix}_bn")(y)
            return getattr(self, f"{name}_relu_{suffix}")(y)

        branches = []
        if s.b1x1:
            branches.append(cbr("1x1", x))
        branches.append(cbr("3x3", cbr("3x3_reduce", x)))
        branches.append(
            cbr("double_3x3_2", cbr("double_3x3_1", cbr("double_3x3_reduce", x)))
        )
        pooled = getattr(self, f"{name}_pool")(x)
        if s.proj:
            branches.append(cbr("pool_proj", pooled))
        else:
            branches.append(pooled)
        return torch.cat(branches, 1)

    def features(self, x):
        y = self.conv1_relu_7x7(self.conv1_7x7_s2_bn(self.conv1_7x7_s2(x)))
        y = self.pool1_3x3_s2(y)
        y = self.conv2_relu_3x3_reduce(self.conv2_3x3_reduce_bn(self.conv2_3x3_reduce(y)))
        y = self.conv2_relu_3x3(self.conv2_3x3_bn(self.conv2_3x3(y)))
        y = self.pool2_3x3_s2(y)
        for name, spec in self._block_specs:
            y = self._run_block(name, spec, y)
        return y

    def logits(self, features):
        # reference core/models/bn_inception.py:16-35
        hw = features.shape[2:]
        if self.is_audio and self.attend:
            return F.avg_pool2d(features, kernel_size=(hw[0], 1), stride=(hw[0], 1))
        x = F.avg_pool2d(features, kernel_size=hw)
        return x.view(x.size(0), -1)

    def forward(self, x):
        return self.logits(self.features(x))
