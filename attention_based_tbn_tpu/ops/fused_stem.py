"""Fused inference stem: normalize -> 7x7/2 conv (BN-folded) -> ReLU ->
3x3/2 ceil max-pool in ONE Pallas kernel.

The XLA lowering (models/layers.TorchConv._packed_w_conv + ops/pooling)
runs the stem at HBM bandwidth (PERF.md round 3) — the conv writes its
(B, 112, 112, 64) activation to HBM and the pool reads it straight back:
~800 MB of round-trip traffic per headline batch that a fused kernel can
keep in VMEM. This module is the round-5 probe for that last measured
headroom (VERDICT r4 item 3): the kernel computes, per batch element,

    x (H, W, C) uint8 --normalize--> conv 7x7/2/p3 (+folded-BN bias)
      --ReLU--> max-pool 3x3/2 ceil --> (H/4, W/4, 64)

entirely in VMEM, emitting only the pooled activation (4x less output
traffic). The contraction is the column-packed form the XLA path uses
(7x4 taps on (W/2, 2C) packed columns -> K = 56C), built from
parity-reshape slices (no strided VMEM access), so the matmul runs on the
MXU with K = 168 (RGB) / 560 (Flow) / 112 (Audio).

Eval-only by design: training needs live batch statistics across the
whole device batch, which a per-image kernel cannot see (the train stem
stays in XLA). Usage is gated exactly like the other Pallas kernels:
``tpu.fused_stem`` (off by default; see benchmarks/fused_stem_probe.py
for the A/B receipt that set the default).

Geometry contract: H, W even, H/2 and W/2 even (headline 224x224, flow
224x224, audio spectrogram 256xT with T % 4 == 0), stride 2, kernel 7,
padding 3 — the BN-Inception stem (reference core/models/
bn_inception_audio.py:35-39 commented default stem; pretrainedmodels
graph, our models/bn_inception.py:554-568).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.0e38  # below any ReLU output; fp32/bf16 representable


def fused_stem_reference(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    input_scale: jnp.ndarray,
    input_offset: jnp.ndarray,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """jnp reference (used on CPU and in parity tests).

    x: (B, H, W, C) uint8 (or float); kernel: (7, 7, C, F) with the BN
    scale already folded in; bias: (F,) = conv_bias*scale + offset;
    input_scale/offset: (C,) uint8 normalization.
    """
    xf = x.astype(dtype) * input_scale.astype(dtype) + input_offset.astype(dtype)
    y = jax.lax.conv_general_dilated(
        xf,
        kernel.astype(dtype),
        window_strides=(2, 2),
        padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = jax.nn.relu(y + bias.astype(jnp.float32))
    # ceil-mode 3x3/2 max pool, pad 0 (ops/pooling semantics: windows may
    # start in-bounds and clip at the end)
    h, w = y.shape[1], y.shape[2]
    oh, ow = (h - 3 + 1) // 2 + 1, (w - 3 + 1) // 2 + 1  # ceil for even h,w
    yp = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)), constant_values=NEG_INF)
    out = jax.lax.reduce_window(
        yp,
        NEG_INF,
        jax.lax.max,
        (1, 3, 3, 1),
        (1, 2, 2, 1),
        "valid",
    )
    return out[:, :oh, :ow].astype(dtype)


def _pack_kernel(kernel: np.ndarray) -> np.ndarray:
    """(7, 7, C, F) -> column-packed (7, 4, 2C, F) -> (7*4*2C, F).

    Output col j covers original cols 2j-3..2j+3 = packed col pairs
    p = j-2..j+1 with parity v; original kernel col = 2q + v - 1 for tap
    q = p - (j - 2) (zero outside 0..6) — the same packing
    models/layers.TorchConv._packed_w_conv uses.
    """
    k = np.asarray(kernel)
    c, f = k.shape[2], k.shape[3]
    idx = 2 * np.arange(4)[None, :] + np.arange(2)[:, None] - 1  # (v, q)
    valid = ((idx >= 0) & (idx < 7)).astype(k.dtype)
    clipped = np.clip(idx, 0, 6)
    w_sel = k[:, clipped.reshape(-1)].reshape(7, 2, 4, c, f)
    w_sel = w_sel * valid.reshape(1, 2, 4, 1, 1)
    wp = w_sel.transpose(0, 2, 1, 3, 4).reshape(7, 4, 2 * c, f)
    return wp.reshape(7 * 4 * 2 * c, f)


def _stem_kernel(x_ref, w_ref, b_ref, aff_ref, out_ref, *, geom, dtype):
    """One batch element: VMEM-resident normalize+conv+ReLU+pool."""
    h, w2, c2, f, oh2, ow2 = geom  # input rows, packed cols, 2C, F, H/4, W/4
    ch = h // 2  # conv output rows
    cw = w2  # conv output cols (== packed cols)

    x = x_ref[0]  # (h, w2, c2) uint8 (or float for audio spectrograms)
    scale = aff_ref[0]  # (c2,)
    offset = aff_ref[1]
    # Mosaic cannot cast unsigned ints to float (lowering.py
    # _convert_helper); route uint8 -> int32 -> fp32, normalize exactly in
    # fp32, then cast once to the compute dtype
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.int32)
    xf = (
        x.astype(jnp.float32) * scale.astype(jnp.float32)
        + offset.astype(jnp.float32)
    ).astype(dtype)

    # pad: rows +3 top (+3 bottom covered by +4 to keep parity), packed
    # cols +2 left / +2 right — zeros, matching conv zero-padding of the
    # NORMALIZED input
    xp = jnp.pad(xf, ((3, 3), (2, 2), (0, 0)))  # (h+6, w2+4, c2)
    # parity-split rows so tap slices are contiguous: (h+6) even -> pairs
    xr = xp.reshape((h + 6) // 2, 2, w2 + 4, c2)

    taps = []
    for a in range(7):  # conv row tap: input row 2i + a (padded indexing)
        v = a & 1
        u0 = a >> 1
        rows = xr[u0 : u0 + ch, v]  # (ch, w2+4, c2)
        for q in range(4):  # packed column tap: packed col j + q
            taps.append(rows[:, q : q + cw])  # (ch, cw, c2)
    patches = jnp.concatenate(taps, axis=-1)  # (ch, cw, 28*c2)

    k_dim = 28 * c2
    p2 = patches.reshape(ch * cw, k_dim)
    y = jnp.dot(p2, w_ref[...], preferred_element_type=jnp.float32)
    y = jax.nn.relu(y + b_ref[0].astype(jnp.float32)).astype(dtype)
    y = y.reshape(ch, cw, f)

    # 3x3/2 ceil max pool. Rows: out i reads conv rows 2i, 2i+1, 2i+2
    # (last window clips at the boundary -> pad one NEG_INF row/col).
    yr = y.reshape(oh2, 2, cw, f)
    r0 = yr[:, 0]
    r1 = yr[:, 1]
    r2 = jnp.concatenate(
        [r0[1:], jnp.full((1, cw, f), NEG_INF, dtype)], axis=0
    )
    rows_max = jnp.maximum(jnp.maximum(r0, r1), r2)  # (oh2, cw, f)

    yc = rows_max.reshape(oh2, ow2, 2, f)
    c0 = yc[:, :, 0]
    c1 = yc[:, :, 1]
    c2_ = jnp.concatenate(
        [c0[:, 1:], jnp.full((oh2, 1, f), NEG_INF, dtype)], axis=1
    )
    out_ref[0] = jnp.maximum(jnp.maximum(c0, c1), c2_)


@functools.partial(
    jax.jit, static_argnames=("dtype", "interpret")
)
def fused_stem_pallas(
    x: jnp.ndarray,
    packed_kernel: jnp.ndarray,
    bias: jnp.ndarray,
    input_scale: jnp.ndarray,
    input_offset: jnp.ndarray,
    dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: (B, H, W, C) uint8; packed_kernel: (56C, F) from _pack_kernel
    (BN scale folded); bias: (F,); input_scale/offset: (C,).

    Returns (B, H//4, W//4, F) pooled stem activations, dtype ``dtype``.
    """
    b, h, w, c = x.shape
    assert h % 4 == 0 and w % 4 == 0, (h, w)
    f = packed_kernel.shape[-1]
    w2, c2 = w // 2, 2 * c
    oh2, ow2 = h // 4, w // 4

    # free reshape: pair columns into channels (contiguous in NHWC)
    xp = x.reshape(b, h, w2, c2)
    # packed affine covers the paired channels
    aff = jnp.stack(
        [jnp.tile(input_scale, 2), jnp.tile(input_offset, 2)]
    ).astype(jnp.float32)

    geom = (h, w2, c2, f, oh2, ow2)
    out = pl.pallas_call(
        functools.partial(_stem_kernel, geom=geom, dtype=dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w2, c2), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((packed_kernel.shape[0], f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((2, c2), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, oh2, ow2, f), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, oh2, ow2, f), dtype),
        interpret=interpret,
    )(
        xp,
        packed_kernel.astype(dtype),
        bias.reshape(1, f).astype(jnp.float32),
        aff,
    )
    return out
