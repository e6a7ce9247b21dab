"""torchvision-compatible VGG feature towers in Flax (NHWC).

The reference wraps torchvision vgg{11,16}[_bn], swaps the first conv for
non-RGB modalities and strips the classifier's last linear, exposing a
4096-d feature (reference core/models/vgg.py). The classifier's two
Linear+ReLU+Dropout stages are kept, like the reference.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.pooling import adaptive_avg_pool2d, max_pool2d
from .layers import TorchBatchNorm, TorchConv, TorchLinear

Dtype = Any

# torchvision cfgs: number = conv out-channels, "M" = 2x2/2 max pool
VGG_CONFIGS = {
    "11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "16": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
           512, 512, 512, "M"),
}

FEATURE_SIZE = 4096


def vgg_base_type(vgg_type: str) -> str:
    """Normalize a vgg type string ("16", "16bn", "11_bn", ...) to its
    VGG_CONFIGS key. The single source of truth — the converters must
    accept exactly the spellings the model accepts."""
    return vgg_type.rstrip("bn").rstrip("_") or vgg_type


class VGG(nn.Module):
    """VGG feature tower: NHWC image -> (B, 4096)."""

    vgg_type: str = "16"
    batch_norm: bool = False
    dropout_rate: float = 0.5
    dtype: Dtype = jnp.float32

    feature_size: int = FEATURE_SIZE

    @nn.compact
    def __call__(self, x, train: bool = False, row_mask=None):
        base = vgg_base_type(self.vgg_type)
        use_bn = self.batch_norm or self.vgg_type.endswith("bn")
        cfg = VGG_CONFIGS[base]
        kw = dict(dtype=self.dtype)

        conv_idx = 0
        y = x
        for item in cfg:
            if item == "M":
                y = max_pool2d(y, 2, 2, 0)
            else:
                y = TorchConv(int(item), 3, 1, 1, name=f"conv{conv_idx}", **kw)(y)
                if use_bn:
                    y = TorchBatchNorm(name=f"bn{conv_idx}", **kw)(
                        y, use_running_average=not train, row_mask=row_mask
                    )
                y = nn.relu(y)
                conv_idx += 1

        # torchvision's forward pools features to 7x7 BEFORE flatten
        # (AdaptiveAvgPool2d((7, 7)) — identity for 224-px crops, but the
        # reference runs it for every input size, keeping the classifier
        # input fixed at 512*7*7 regardless of resolution)
        y = adaptive_avg_pool2d(y, (7, 7))
        # torchvision flattens NCHW order: transpose before reshape so
        # converted fc weights line up.
        b = y.shape[0]
        y = jnp.transpose(y, (0, 3, 1, 2)).reshape(b, -1)

        y = TorchLinear(4096, name="fc1", **kw)(y)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        y = TorchLinear(4096, name="fc2", **kw)(y)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        return y
