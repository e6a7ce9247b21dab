"""Pooling ops with PyTorch semantics on NHWC tensors.

BN-Inception depends on torch's ``ceil_mode=True`` pooling (reference
core/models/bn_inception_audio.py:21-33 and the pretrainedmodels tower used
in core/models/bn_inception.py): output size ``ceil((H + 2p - k)/s) + 1``,
with the extra torch rule that a window starting entirely inside the right
padding is dropped. XLA's reduce_window expresses this exactly once the right
amount of asymmetric padding is computed — which is what this module does.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

IntPair = Union[int, Tuple[int, int]]


def _pair(v: IntPair) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else (int(v[0]), int(v[1]))


def _out_size(size: int, k: int, s: int, p: int, ceil_mode: bool) -> int:
    if ceil_mode:
        out = -(-(size + 2 * p - k) // s) + 1  # ceil div
        # torch drops the last window if it starts in the right padding
        if (out - 1) * s >= size + p:
            out -= 1
    else:
        out = (size + 2 * p - k) // s + 1
    return out


def _pool_padding(
    size: Tuple[int, int], k: Tuple[int, int], s: Tuple[int, int], p: Tuple[int, int],
    ceil_mode: bool,
) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    pads = []
    for dim in range(2):
        out = _out_size(size[dim], k[dim], s[dim], p[dim], ceil_mode)
        right = (out - 1) * s[dim] + k[dim] - size[dim] - p[dim]
        pads.append((p[dim], max(right, 0)))
    return pads[0], pads[1]


# Pool lowering strategies, selected per call via ``impl`` (threaded from
# TBNSpec / the tpu.* config keys — no module-global state):
#   "reduce_window"  lax.reduce_window (default; XLA's tuned pooling kernel,
#                    fused into producer conv epilogues)
#   "slices"         shifted strided slices + an elementwise max/add tree.
#                    Measured on v5e: 63.6 -> 110.9 ms/batch — markedly
#                    WORSE (the 9 strided-slice reads defeat the tuned
#                    kernel). Kept for A/B benchmarking
#                    (benchmarks/infer_ab.py "slicepool" variants).
#   "pallas"         the ops/pallas_pool.py kernel for the big stride-2 ceil
#                    max pools. Standalone 1.5-1.8x reduce_window on the
#                    lane-sparse stem maps, but IN-MODEL 57.3 -> 70.8 ms:
#                    the pallas_call boundary forces the pre-pool tensor to
#                    materialize instead of fusing. Kept for A/B.
POOL_IMPLS = ("reduce_window", "slices", "pallas")


def _pool_via_slices(xp: jnp.ndarray, k, s, op) -> jnp.ndarray:
    """Combine the k[0]*k[1] shifted strided views of the padded input."""
    h, w = xp.shape[1], xp.shape[2]
    out_h = (h - k[0]) // s[0] + 1
    out_w = (w - k[1]) // s[1] + 1
    acc = None
    for di in range(k[0]):
        for dj in range(k[1]):
            part = xp[
                :,
                di : di + (out_h - 1) * s[0] + 1 : s[0],
                dj : dj + (out_w - 1) * s[1] + 1 : s[1],
                :,
            ]
            acc = part if acc is None else op(acc, part)
    return acc


def max_pool2d(
    x: jnp.ndarray,
    kernel_size: IntPair,
    stride: IntPair,
    padding: IntPair = 0,
    ceil_mode: bool = False,
    impl: str = "reduce_window",
) -> jnp.ndarray:
    """torch.nn.MaxPool2d on NHWC input."""
    k, s, p = _pair(kernel_size), _pair(stride), _pair(padding)
    if impl == "pallas" and jax.default_backend() not in ("cpu",):
        from . import pallas_pool

        if pallas_pool.supported(x, k, s, p, ceil_mode):
            return pallas_pool.ceil_max_pool2d_pallas(x)
    (pt, pb), (pl, pr) = _pool_padding(x.shape[1:3], k, s, p, ceil_mode)
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    # (Measured, round 3: lowering the small late-stage pools — 7x7/8x13
    # maps — to shifted-max trees was ~1 ms WORSE end-to-end despite their
    # low standalone bandwidth; reduce_window stays for every size.)
    if impl == "slices":
        xp = jnp.pad(
            x, ((0, 0), (pt, pb), (pl, pr), (0, 0)), constant_values=init
        )
        return _pool_via_slices(xp, k, s, jnp.maximum)
    return jax.lax.reduce_window(
        x,
        init,
        jax.lax.max,
        window_dimensions=(1, k[0], k[1], 1),
        window_strides=(1, s[0], s[1], 1),
        padding=((0, 0), (pt, pb), (pl, pr), (0, 0)),
    )


def avg_pool2d(
    x: jnp.ndarray,
    kernel_size: IntPair,
    stride: IntPair,
    padding: IntPair = 0,
    ceil_mode: bool = False,
    count_include_pad: bool = True,
    impl: str = "reduce_window",
) -> jnp.ndarray:
    """torch.nn.AvgPool2d on NHWC input.

    With count_include_pad=True the divisor counts the *explicit* zero
    padding but never the extra ceil-mode padding (torch behavior).
    """
    k, s, p = _pair(kernel_size), _pair(stride), _pair(padding)
    (pt, pb), (pl, pr) = _pool_padding(x.shape[1:3], k, s, p, ceil_mode)

    # NOTE: init must be a Python scalar — a traced jnp scalar defeats the
    # add-monoid recognition and breaks reverse-mode AD under jit.
    # bf16 inputs sum in bf16: the 9-element windows lose ~nothing and the
    # fp32 upcast doubled pool HBM traffic (visible in device traces).
    if impl == "slices":
        xp = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
        summed = _pool_via_slices(xp, k, s, jnp.add)
    else:
        summed = jax.lax.reduce_window(
            x,
            0.0,
            jax.lax.add,
            window_dimensions=(1, k[0], k[1], 1),
            window_strides=(1, s[0], s[1], 1),
            padding=((0, 0), (pt, pb), (pl, pr), (0, 0)),
        )

    if count_include_pad and not ceil_mode:
        out = summed / (k[0] * k[1])
    else:
        # Per-window divisor: number of positions inside [0, size + 2p) when
        # counting explicit pad (count_include_pad) or inside [0, size) when
        # not. Computed via the same reduce_window over an indicator plane.
        h, w = x.shape[1], x.shape[2]
        if count_include_pad:
            ones = jnp.ones((1, h + pt + pb - max(pb - p[0], 0), 1, 1), dtype=jnp.float32)
            # indicator covers the explicitly-padded extent only
            ind = jnp.zeros((1, h + pt + pb, w + pl + pr, 1), dtype=jnp.float32)
            ind = ind.at[:, : h + pt + p[0], : w + pl + p[1], :].set(1.0)
        else:
            ind = jnp.zeros((1, h + pt + pb, w + pl + pr, 1), dtype=jnp.float32)
            ind = ind.at[:, pt : pt + h, pl : pl + w, :].set(1.0)
        counts = jax.lax.reduce_window(
            ind,
            0.0,
            jax.lax.add,
            window_dimensions=(1, k[0], k[1], 1),
            window_strides=(1, s[0], s[1], 1),
            padding=((0, 0), (0, 0), (0, 0), (0, 0)),
        )
        out = summed / counts
    return out.astype(x.dtype)


def global_avg_pool(x: jnp.ndarray, freq_only: bool = False) -> jnp.ndarray:
    """Adaptive average pooling used at the tower output.

    freq_only pools the H (frequency) axis only, keeping the temporal axis
    for attention (reference core/models/bn_inception.py:22-30): NHWC
    (B, F, T, C) -> (B, T, C). Otherwise the full spatial mean -> (B, C).
    Means accumulate in fp32 regardless of compute dtype.
    """
    xf = x.astype(jnp.float32)
    if freq_only:
        return jnp.mean(xf, axis=1).astype(x.dtype)  # (B, T, C)
    return jnp.mean(xf, axis=(1, 2)).astype(x.dtype)  # (B, C)
