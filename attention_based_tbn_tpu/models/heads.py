"""Fusion and multi-head classifier (reference core/models/model.py:337-387).

* Fusion: Linear(sum of tower features -> 512) + ReLU + Dropout, weights
  initialized N(0, 1e-3), zero bias;
* Classifier: one Linear head per class type (verb/noun[/action]), same init.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
from flax import linen as nn

from .layers import TorchLinear, normal_init

Dtype = Any


class Fusion(nn.Module):
    out_size: int = 512
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = TorchLinear(
            self.out_size,
            kernel_init=normal_init(1e-3),
            dtype=self.dtype,
            name="fc",
        )(x)
        y = nn.relu(y)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return y


class Classifier(nn.Module):
    num_classes: Mapping[str, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        out = {}
        for cls_name, n_cls in self.num_classes.items():
            out[cls_name] = TorchLinear(
                n_cls,
                kernel_init=normal_init(1e-3),
                dtype=self.dtype,
                name=cls_name,
            )(x)
        return out
