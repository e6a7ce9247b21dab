"""torchvision-compatible ResNet feature towers in Flax (NHWC).

The reference wraps torchvision resnet{18,34,50,101,152}, swaps conv1 for
non-RGB modalities (weights channel-meaned) and strips the classifier,
exposing ``feature_size = fc.in_features`` (reference core/models/resnet.py).
Parameter naming mirrors torchvision's so converted weights map 1:1.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.pooling import global_avg_pool, max_pool2d
from .layers import TorchBatchNorm, TorchConv

Dtype = Any

# depth -> (block type, layer sizes, expansion)
RESNET_CONFIGS = {
    18: ("basic", (2, 2, 2, 2), 1),
    34: ("basic", (3, 4, 6, 3), 1),
    50: ("bottleneck", (3, 4, 6, 3), 4),
    101: ("bottleneck", (3, 4, 23, 3), 4),
    152: ("bottleneck", (3, 8, 36, 3), 4),
}


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False, row_mask=None):
        kw = dict(dtype=self.dtype)
        bn = dict(use_running_average=not train, row_mask=row_mask)
        y = TorchConv(self.features, 3, self.stride, 1, use_bias=False, name="conv1", **kw)(x)
        y = TorchBatchNorm(name="bn1", **kw)(y, **bn)
        y = nn.relu(y)
        y = TorchConv(self.features, 3, 1, 1, use_bias=False, name="conv2", **kw)(y)
        y = TorchBatchNorm(name="bn2", **kw)(y, **bn)
        if self.downsample:
            x = TorchConv(
                self.features, 1, self.stride, 0, use_bias=False, name="downsample_conv", **kw
            )(x)
            x = TorchBatchNorm(name="downsample_bn", **kw)(x, **bn)
        return nn.relu(y + x)


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False, row_mask=None):
        kw = dict(dtype=self.dtype)
        bn = dict(use_running_average=not train, row_mask=row_mask)
        out = self.features * self.expansion
        y = TorchConv(self.features, 1, 1, 0, use_bias=False, name="conv1", **kw)(x)
        y = TorchBatchNorm(name="bn1", **kw)(y, **bn)
        y = nn.relu(y)
        y = TorchConv(self.features, 3, self.stride, 1, use_bias=False, name="conv2", **kw)(y)
        y = TorchBatchNorm(name="bn2", **kw)(y, **bn)
        y = nn.relu(y)
        y = TorchConv(out, 1, 1, 0, use_bias=False, name="conv3", **kw)(y)
        y = TorchBatchNorm(name="bn3", **kw)(y, **bn)
        if self.downsample:
            x = TorchConv(out, 1, self.stride, 0, use_bias=False, name="downsample_conv", **kw)(x)
            x = TorchBatchNorm(name="downsample_bn", **kw)(x, **bn)
        return nn.relu(y + x)


class ResNet(nn.Module):
    """ResNet feature tower: input NHWC image -> (B, feature_size)."""

    depth: int = 101
    dtype: Dtype = jnp.float32

    @property
    def feature_size(self) -> int:
        _, _, expansion = RESNET_CONFIGS[self.depth]
        return 512 * expansion

    @nn.compact
    def __call__(self, x, train: bool = False, row_mask=None):
        block_type, layer_sizes, expansion = RESNET_CONFIGS[self.depth]
        kw = dict(dtype=self.dtype)
        bn = dict(use_running_average=not train, row_mask=row_mask)

        y = TorchConv(
            64, 7, 2, 3, use_bias=False, space_to_depth=True, name="conv1", **kw
        )(x)
        y = TorchBatchNorm(name="bn1", **kw)(y, **bn)
        y = nn.relu(y)
        y = max_pool2d(y, 3, 2, 1)

        widths = (64, 128, 256, 512)
        for stage, (width, n_blocks) in enumerate(zip(widths, layer_sizes), start=1):
            for block_idx in range(n_blocks):
                stride = 2 if (stage > 1 and block_idx == 0) else 1
                in_ch = y.shape[-1]
                out_ch = width * (expansion if block_type == "bottleneck" else 1)
                needs_down = block_idx == 0 and (stride != 1 or in_ch != out_ch)
                name = f"layer{stage}_{block_idx}"
                if block_type == "basic":
                    y = BasicBlock(width, stride, needs_down, name=name, **kw)(
                        y, train, row_mask
                    )
                else:
                    y = Bottleneck(width, stride, needs_down, expansion, name=name, **kw)(
                        y, train, row_mask
                    )

        return global_avg_pool(y)
