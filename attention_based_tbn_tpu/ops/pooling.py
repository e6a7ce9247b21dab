"""Pooling ops with PyTorch semantics on NHWC tensors.

BN-Inception depends on torch's ``ceil_mode=True`` pooling (reference
core/models/bn_inception_audio.py:21-33 and the pretrainedmodels tower used
in core/models/bn_inception.py): output size ``ceil((H + 2p - k)/s) + 1``,
with the extra torch rule that a window starting entirely inside the right
padding is dropped. XLA's reduce_window expresses this exactly once the right
amount of asymmetric padding is computed — which is what this module does.
"""

from __future__ import annotations

import functools
from typing import Tuple, Union

import jax
import jax.numpy as jnp

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


def _rw_max(x, k, s, pads):
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x,
        init,
        jax.lax.max,
        window_dimensions=(1, k[0], k[1], 1),
        window_strides=(1, s[0], s[1], 1),
        padding=((0, 0),) + tuple(pads) + ((0, 0),),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _max_pool_fast_vjp(x, k, s, pads):
    """Max pool with a phase-decomposed gather backward.

    XLA's native max-pool gradient is a select-and-scatter pass (~4.3 ms of
    the 44 ms training step on v5e traces). This backward instead GATHERS:
    for each stride-phase of the input grid, the ≤⌈k/s⌉² windows covering
    that phase are aligned output-sized slices of (y, g), so
    dx = Σ_taps where(x == y_tap, g_tap) runs on output-sized arrays and the
    phases interleave back with one reshape. (A first attempt scattered via
    interior-dilated ``lax.pad`` of k² full-input-size fp32 arrays — the
    stem pool alone materialized ~1.9 GB per tap and the step regressed
    44 → 148 ms. The gather form touches each input element once.)

    MEASURED NEGATIVE on v5e, all formulations (train bench, 42.0 ms/step
    select-and-scatter baseline): this gather form 58.4 ms (the s strided
    phase slices and the final interleave are tiled-layout relayout
    copies); a 6-D broadcast-phase form (``x.reshape(N, H/s, s, W/s, s,
    C)`` + broadcast-compare, no slicing) 77.1 ms — the size-s dims land
    in the 8-deep sublane tile and blow memory up ~8x; a 4-D
    shift-then-``jnp.repeat`` upsample form 89.6 ms — the repeats
    materialize full-input fp32 arrays per tap instead of fusing. XLA's
    select-and-scatter keeps the default; the flag stays an A/B hook.

    DOCUMENTED DIVERGENCE from torch / select-and-scatter tie-breaking: on
    an exact tie every maximal position receives the window's gradient
    (torch routes it to one winner). Both are valid subgradients of max;
    ties only arise between bit-equal activations.
    """
    return _rw_max(x, k, s, pads)


def _max_pool_fwd(x, k, s, pads):
    y = _rw_max(x, k, s, pads)
    return y, (x, y)


def _max_pool_bwd(k, s, pads, res, g):
    x, y = res
    (pt, pb), (pl, pr) = pads
    # -inf padding can never equal a window max (ceil-mode windows always
    # overlap real data), so pad positions receive zero gradient.
    xp = jnp.pad(
        x, ((0, 0), (pt, pb), (pl, pr), (0, 0)), constant_values=-jnp.inf
    )
    hp, wp = xp.shape[1], xp.shape[2]
    sh, sw = s
    gf = g.astype(jnp.float32)

    def aligned(arr, t, u, a_len, b_len, fill):
        """arr[a - t, b - u] on the (a_len, b_len) phase grid; out-of-range
        positions (no covering window) filled so they cannot match/add."""
        end_a = max(a_len - t - arr.shape[1], 0)
        end_b = max(b_len - u - arr.shape[2], 0)
        out = jnp.pad(
            arr,
            ((0, 0), (t, end_a), (u, end_b), (0, 0)),
            constant_values=fill,
        )
        return out[:, :a_len, :b_len, :]

    # Input position i = s·a + p is covered by windows o = a − t for
    # t ∈ [0, (k−1−p)//s]; per phase p the taps are plain shifted slices.
    a_max = (hp + sh - 1) // sh
    b_max = (wp + sw - 1) // sw
    phase_rows = []
    for p in range(sh):
        row = []
        for q in range(sw):
            a_len = (hp - p + sh - 1) // sh
            b_len = (wp - q + sw - 1) // sw
            xph = xp[:, p::sh, q::sw, :]
            acc = jnp.zeros(xph.shape, jnp.float32)
            for t in range((k[0] - 1 - p) // sh + 1):
                for u in range((k[1] - 1 - q) // sw + 1):
                    y_al = aligned(y, t, u, a_len, b_len, jnp.nan)
                    g_al = aligned(gf, t, u, a_len, b_len, 0.0)
                    acc = acc + jnp.where(xph == y_al, g_al, 0.0)
            acc = jnp.pad(
                acc,
                ((0, 0), (0, a_max - a_len), (0, b_max - b_len), (0, 0)),
            )
            row.append(acc)
        phase_rows.append(jnp.stack(row, axis=3))  # (N, A, B, sw, C)
    ph = jnp.stack(phase_rows, axis=2)  # (N, A, sh, B, sw, C)
    dxp = ph.reshape(x.shape[0], a_max * sh, b_max * sw, x.shape[-1])
    dx = dxp[:, pt : pt + x.shape[1], pl : pl + x.shape[2], :]
    return (dx.astype(x.dtype),)


_max_pool_fast_vjp.defvjp(_max_pool_fwd, _max_pool_bwd)


def max_pool2d(
    x: jnp.ndarray,
    kernel_size: IntPair,
    stride: IntPair,
    padding: IntPair = 0,
    ceil_mode: bool = False,
    impl: str = "reduce_window",
    fast_vjp: bool = False,
) -> jnp.ndarray:
    """torch.nn.MaxPool2d on NHWC input."""
    k, s, p = _pair(kernel_size), _pair(stride), _pair(padding)
    if impl == "pallas" and jax.default_backend() not in ("cpu",):
        from . import pallas_pool

        if pallas_pool.supported(x, k, s, p, ceil_mode):
            return pallas_pool.ceil_max_pool2d_pallas(x)
    pads = _pool_padding(x.shape[1:3], k, s, p, ceil_mode)
    # (Measured, round 3: lowering the small late-stage pools — 7x7/8x13
    # maps — to shifted-max trees was ~1 ms WORSE end-to-end despite their
    # low standalone bandwidth; reduce_window stays for every size.)
    if impl == "slices":
        init = (
            -jnp.inf
            if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.iinfo(x.dtype).min
        )
        (pt, pb), (pl, pr) = pads
        xp = jnp.pad(
            x, ((0, 0), (pt, pb), (pl, pr), (0, 0)), constant_values=init
        )
        return _pool_via_slices(xp, k, s, jnp.maximum)
    if fast_vjp and jnp.issubdtype(x.dtype, jnp.floating):
        return _max_pool_fast_vjp(x, k, s, tuple(pads))
    return _rw_max(x, k, s, pads)


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


def adaptive_avg_pool2d(x: jnp.ndarray, out_hw: IntPair) -> jnp.ndarray:
    """torch.nn.AdaptiveAvgPool2d on NHWC: output cell (i, j) averages the
    input window [floor(i*H/oh), ceil((i+1)*H/oh)) x [floor(j*W/ow),
    ceil((j+1)*W/ow)) — exact torch semantics incl. the upsampling case
    (input smaller than output repeats cells). Identity when the input
    already has the target size (the 224-px VGG path). Static shapes: the
    oh+ow slice loops unroll at trace time. Means accumulate in fp32."""
    oh, ow = _pair(out_hw)
    h, w = x.shape[1], x.shape[2]
    if (h, w) == (oh, ow):
        return x

    def pool_axis(arr, size, out, axis):
        cells = []
        for i in range(out):
            start = (i * size) // out
            end = -((-(i + 1) * size) // out)  # ceil((i+1)*size/out)
            window = jax.lax.slice_in_dim(arr, start, end, axis=axis)
            cells.append(window.mean(axis=axis, keepdims=True))
        return jnp.concatenate(cells, axis=axis)

    xf = x.astype(jnp.float32)
    return pool_axis(pool_axis(xf, h, oh, 1), w, ow, 2).astype(x.dtype)
