"""Fused inference stem: normalize -> 7x7/2 conv (BN-folded) -> ReLU ->
3x3/2 ceil max-pool in ONE Pallas kernel.

ROUND-5 PROBE VERDICT: **measured LOSING on v5e** — RGB stem at the
headline batch: 34.2 ms (this kernel) vs 8.8 ms (the XLA chain), receipts
in benchmarks/fused_stem_probe.py + PERF.md round 5. The kernel is
CORRECT (rel-RMSE 8e-3 vs the fp32 reference at bf16) but the few-channel
im2col is un-lowerable efficiently in Mosaic today: every tap store moves
(rows, cols, 6)-shaped pieces whose 6-channel lane dim is padded to 128
lanes (6/128 = 5 % lane efficiency), and the two supported alternatives
are worse (K=6 matmuls: ~3 % MXU utilization; lane-strided gathers:
unsupported). XLA's conv emitter owns exactly this relayout problem.
Kept as a tested opt-in (``tpu.fused_stem``, default false) with
interpret-mode parity tests — the A/B convention of this repo
(pool_proj_conv, fuse_accum, int8).

Design (for the record): the kernel computes, per batch element,

    x (H, W, C) uint8 --normalize--> conv 7x7/2/p3 (+folded-BN bias)
      --ReLU--> max-pool 3x3/2 ceil --> (H/4, W/4, 64)

entirely in VMEM, emitting only the pooled activation (4x less output
traffic). The contraction is the column-packed form the XLA path uses
(7x4 taps on (W/2, 2C) packed columns -> K = 56C), built from
parity-reshape slices (no strided VMEM access), so the matmul runs on the
MXU with K = 168 (RGB) / 560 (Flow) / 112 (Audio). Conv rows are chunked
to fit the 16 MiB scoped-VMEM budget.

Eval-only by design: training needs live batch statistics across the
whole device batch, which a per-image kernel cannot see (the train stem
stays in XLA).

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


def pack_kernel_jnp(kernel: jnp.ndarray) -> jnp.ndarray:
    """Traced version of :func:`_pack_kernel` for use inside model apply
    (the folded stem kernel is a computed value, not a host constant)."""
    c, f = kernel.shape[2], kernel.shape[3]
    idx = 2 * np.arange(4)[None, :] + np.arange(2)[:, None] - 1  # (v, q)
    valid = jnp.asarray(((idx >= 0) & (idx < 7)).astype(np.float32))
    clipped = np.clip(idx, 0, 6)
    w_sel = kernel[:, clipped.reshape(-1)].reshape(7, 2, 4, c, f)
    w_sel = w_sel * valid[None, :, :, None, None].astype(kernel.dtype)
    wp = jnp.transpose(w_sel, (0, 2, 1, 3, 4)).reshape(7, 4, 2 * c, f)
    return wp.reshape(7 * 4 * 2 * c, f)


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


def _stem_kernel(x_ref, w_ref, b_ref, aff_ref, out_ref, patch_ref, *, geom,
                 dtype, n_chunks):
    """One batch element: VMEM-resident normalize+conv+ReLU+pool.

    The conv rows are processed in ``n_chunks`` chunks (a static Python
    loop) so the lane-padded few-channel intermediates never hold the
    whole image at once — a (rows, cols, 6)-shaped fp32 buffer is tiled
    to 128 lanes (21x memory amplification), and the un-chunked form
    blows the 16 MiB scoped-VMEM budget (62 MiB measured on the first
    probe compile). Only the uint8 input block stays full-size.
    """
    h, w2, c2, f, oh2, ow2 = geom  # input rows, packed cols, 2C, F, H/4, W/4
    cw = w2  # conv output cols (== packed cols)
    pr = oh2 // n_chunks  # pooled rows per chunk
    cr = 2 * pr + 1  # conv rows built per chunk (uniform; see below)

    scale = aff_ref[0].astype(jnp.float32)  # (c2,)
    offset = aff_ref[1].astype(jnp.float32)
    k_dim = 28 * c2
    w_mat = w_ref[...]
    bias = b_ref[0].astype(jnp.float32)
    neg_row = jnp.full((1, cw, f), NEG_INF, dtype)

    for k in range(n_chunks):
        last = k == n_chunks - 1
        # conv rows r in [2*pr*k, 2*pr*k + cr) need padded-input rows
        # m = 2r + a (a in 0..6): [M0, M0 + 4*pr + 6], M0 = 4*pr*k.
        # Build the chunk's normalized, zero-padded input slab. +1 bottom
        # row keeps the parity reshape even; for the LAST chunk the extra
        # conv row it produces is the ceil-clipped row 2*oh2 and is
        # replaced by NEG_INF before pooling.
        m_lo = 4 * pr * k - 3  # unpadded row index of the slab start
        rows_n = 4 * pr + 8
        lo = max(m_lo, 0)
        hi = min(m_lo + rows_n, h)
        pad_top = lo - m_lo
        pad_bot = rows_n - (hi - lo) - pad_top

        xin = x_ref[0, lo:hi]  # (rows, w2, c2) uint8 / float
        # Mosaic cannot cast unsigned ints to float (_convert_helper);
        # route uint8 -> int32 -> fp32, normalize exactly in fp32, cast
        # once. Conv zero-padding applies to the NORMALIZED input, so the
        # affine runs before the pad.
        if xin.dtype == jnp.uint8:
            xin = xin.astype(jnp.int32)
        xn = (xin.astype(jnp.float32) * scale + offset).astype(dtype)
        xn = jnp.pad(xn, ((pad_top, pad_bot), (2, 2), (0, 0)))
        xr = xn.reshape(rows_n // 2, 2, w2 + 4, c2)

        # Tap slices go through the scratch buffer, NOT jnp.concatenate:
        # the row-tap slices start at different SUBLANE offsets (a >> 1)
        # and Mosaic's concatenate requires matching offsets on
        # non-concat dims; a store to the offset-0 scratch normalizes
        # each piece's layout.
        for a in range(7):  # conv row tap: padded row 2i' + a
            v = a & 1
            u0 = a >> 1
            rows = xr[u0 : u0 + cr, v]  # (cr, w2+4, c2)
            for q in range(4):  # packed column tap: packed col j + q
                slot = (a * 4 + q) * c2
                patch_ref[:, :, slot : slot + c2] = rows[:, q : q + cw]

        p2 = patch_ref[...].reshape(cr * cw, k_dim)
        y = jnp.dot(p2, w_mat, preferred_element_type=jnp.float32)
        y = jax.nn.relu(y + bias).astype(dtype)
        y = y.reshape(cr, cw, f)

        # 3x3/2 ceil max pool over this chunk's rows: pooled row i' reads
        # conv rows 2i', 2i'+1, 2i'+2 — all inside [0, cr). The final
        # global window is clipped (ceil mode): the last chunk's row
        # 2*pr is the out-of-range conv row, masked to NEG_INF.
        ypairs = y[: 2 * pr].reshape(pr, 2, cw, f)
        r0 = ypairs[:, 0]
        r1 = ypairs[:, 1]
        tail = neg_row if last else y[2 * pr : 2 * pr + 1]
        r2 = jnp.concatenate([r0[1:], tail], axis=0)
        rows_max = jnp.maximum(jnp.maximum(r0, r1), r2)  # (pr, cw, f)

        yc = rows_max.reshape(pr, ow2, 2, f)
        c0 = yc[:, :, 0]
        c1 = yc[:, :, 1]
        c2_ = jnp.concatenate(
            [c0[:, 1:], jnp.full((pr, 1, f), NEG_INF, dtype)], axis=1
        )
        out_ref[0, pr * k : pr * (k + 1)] = jnp.maximum(
            jnp.maximum(c0, c1), c2_
        )


@functools.partial(
    jax.jit, static_argnames=("dtype", "interpret", "input_packed")
)
def fused_stem_pallas(
    x: jnp.ndarray,
    packed_kernel: jnp.ndarray,
    bias: jnp.ndarray,
    input_scale: jnp.ndarray,
    input_offset: jnp.ndarray,
    dtype=jnp.bfloat16,
    interpret: bool = False,
    input_packed: bool = False,
) -> jnp.ndarray:
    """x: (B, H, W, C) uint8 — or, with ``input_packed``, the host
    loader's column-paired (B, H, W/2, 2C) layout (data/loader.py).
    packed_kernel: (56C, F) from _pack_kernel/pack_kernel_jnp (BN scale
    folded); bias: (F,); input_scale/offset: (C,) or already-packed (2C,).

    Returns (B, H//4, W//4, F) pooled stem activations, dtype ``dtype``.
    """
    if input_packed:
        b, h, w2, c2 = x.shape
        c = c2 // 2
        w = 2 * w2
        xp = x
    else:
        b, h, w, c = x.shape
        w2, c2 = w // 2, 2 * c
        # free reshape: pair columns into channels (contiguous in NHWC)
        xp = x.reshape(b, h, w2, c2)
    assert h % 4 == 0 and w % 4 == 0, (h, w)
    f = packed_kernel.shape[-1]
    oh2, ow2 = h // 4, w // 4

    # packed affine covers the paired channels (tile if given per-C)
    if input_scale.shape[0] == c:
        input_scale = jnp.tile(input_scale, 2)
        input_offset = jnp.tile(input_offset, 2)
    aff = jnp.stack([input_scale, input_offset]).astype(jnp.float32)

    # conv-row chunking bounds the lane-padded VMEM intermediates (see
    # _stem_kernel); largest chunk count that divides the pooled rows
    # (14 chunks keep even the 20-channel Flow stem inside the 16 MiB
    # scoped-VMEM budget with the pipeline's double-buffered I/O blocks —
    # the 8-chunk Flow build missed the limit by 660 KB)
    n_chunks = next(n for n in (14, 8, 4, 2, 1) if oh2 % n == 0)
    pr = oh2 // n_chunks

    geom = (h, w2, c2, f, oh2, ow2)
    out = pl.pallas_call(
        functools.partial(
            _stem_kernel, geom=geom, dtype=dtype, n_chunks=n_chunks
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w2, c2), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((packed_kernel.shape[0], f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((2, c2), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, oh2, ow2, f), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, oh2, ow2, f), dtype),
        scratch_shapes=[pltpu.VMEM((2 * pr + 1, w2, 28 * c2), dtype)],
        interpret=interpret,
    )(
        xp,
        packed_kernel.astype(dtype),
        bias.reshape(1, f).astype(jnp.float32),
        aff,
    )
    return out
