"""Pallas TPU kernel for the stem / reduction ceil-mode max pools.

The 3x3/stride-2/pad-0 ceil max pools (stem + inception 3c/4e passthrough;
reference pooling semantics core/models/bn_inception_audio.py:21-33) are the
framework's costliest non-matmul ops: XLA's reduce_window moves them at
~400 GB/s, half of that lane padding on the 64-channel stem maps.

Mosaic forbids stride-2 vector slices, so the kernel strides differently:

* rows: the whole image is one block; output row t reads input rows
  2t, 2t+1, 2t+2 by STATIC indexing (t is a Python loop index);
* columns: a stride-1 three-tap max gives every window start, and the
  even-start selection is a tiny constant 0/1 matmul on the MXU
  (S[j, 2j] = 1), which Mosaic handles natively.

Backward routes through XLA's reduce_window gradient via custom_vjp (the
kernel is forward-only; training recomputes the small stem pools).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _ceil_out(size: int, k: int, s: int) -> int:
    """torch MaxPool2d output size for pad=0, ceil_mode=True (last window
    may be partial but never starts past the input)."""
    out = -(-(size - k) // s) + 1
    if (out - 1) * s >= size:
        out -= 1
    return out


def _pool_kernel(x_ref, s_ref, o_ref, *, h: int, w: int, oh: int, ow: int):
    owf = (w - 3) // 2 + 1  # full-window output columns

    def emit(t, rowmax):
        colmax = jnp.maximum(
            jnp.maximum(rowmax[0 : w - 2, :], rowmax[1 : w - 1, :]),
            rowmax[2:w, :],
        )
        # even-start selection as a 0/1 matmul (no stride-2 vector ops).
        # Default MXU precision truncates operands to bf16, so the kernel
        # is bf16-only (see ``supported``); for bf16 values the selection
        # is EXACT — one 1.0 per row, all other products are 0.
        # (Precision.HIGHEST would keep fp32 exact but crashes Mosaic.)
        sel = jax.lax.dot_general(
            s_ref[...],
            colmax,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)
        o_ref[0, pl.ds(t, 1), 0:owf, :] = sel[None]
        if ow > owf:  # ceil-extra right column: 2-tap window
            o_ref[0, pl.ds(t, 1), owf:ow, :] = jnp.maximum(
                rowmax[w - 2 : w - 1, :], rowmax[w - 1 : w, :]
            )[None]

    # fori_loop + dynamic ref slicing: a fully unrolled row loop (64 rows
    # on the audio stem) crashes the Mosaic compiler
    n_full = oh if 2 * (oh - 1) + 2 < h else oh - 1

    def body(t, carry):
        win = x_ref[0, pl.ds(2 * t, 3)]  # (3, W, C)
        emit(t, jnp.maximum(jnp.maximum(win[0], win[1]), win[2]))
        return carry

    jax.lax.fori_loop(0, n_full, body, 0)
    if n_full < oh:  # ceil-extra bottom row: 2-tap window
        win = x_ref[0, pl.ds(h - 2, 2)]
        emit(oh - 1, jnp.maximum(win[0], win[1]))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pool_fwd(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    b, h, w, c = x.shape
    oh, ow = _ceil_out(h, 3, 2), _ceil_out(w, 3, 2)
    owf = (w - 3) // 2 + 1
    sel = np.zeros((owf, w - 2), np.float32)
    sel[np.arange(owf), 2 * np.arange(owf)] = 1.0
    sel = jnp.asarray(sel, x.dtype)
    kernel = functools.partial(_pool_kernel, h=h, w=w, oh=oh, ow=ow)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((owf, w - 2), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, oh, ow, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, c), x.dtype),
        interpret=interpret,
    )(x, sel)


def _xla_pool(x: jnp.ndarray) -> jnp.ndarray:
    """reduce_window equivalent (backward pass + fallback)."""
    h, w = x.shape[1], x.shape[2]
    oh, ow = _ceil_out(h, 3, 2), _ceil_out(w, 3, 2)
    pb = max((oh - 1) * 2 + 3 - h, 0)
    pr = max((ow - 1) * 2 + 3 - w, 0)
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (0, pb), (0, pr), (0, 0)),
    )


def supported(x: jnp.ndarray, k, s, p, ceil_mode: bool) -> bool:
    return (
        ceil_mode
        and k == (3, 3)
        and s == (2, 2)
        and p == (0, 0)
        and x.ndim == 4
        and x.shape[1] % 2 == 0  # whole image as one block needs even H
        and x.dtype == jnp.bfloat16  # selection matmul exactness; see kernel
        # dispatch only where measured faster than reduce_window: the big
        # lane-sparse stem maps (1.5-1.8x). Small wide-channel maps (56^2
        # x192 and below) favor XLA (0.6-0.9x) — per-row work is too small.
        and x.shape[1] * x.shape[2] >= 6000
        # W=210 (audio stem) crashes the Mosaic compiler; falls back to XLA
        and x.shape[2] <= 128
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ceil_max_pool2d_pallas(x: jnp.ndarray, interpret: bool = False):
    """MaxPool2d(3, 2, pad=0, ceil_mode=True) on NHWC input."""
    return _pool_fwd(x, interpret)


def _vjp_fwd(x, interpret):
    return _pool_fwd(x, interpret), x


def _vjp_bwd(interpret, x, g):
    _, vjp = jax.vjp(_xla_pool, x)
    return vjp(g)


ceil_max_pool2d_pallas.defvjp(_vjp_fwd, _vjp_bwd)
