"""Pallas TPU kernels for the TBN attention hot path.

Two fused kernels plus a consensus/classifier kernel (each with a jnp
reference used on CPU and in parity tests):

* ``pe_block_pallas`` — the attention preamble (PE concat -> 1x1 conv ->
  GroupNorm) fused into one VMEM-resident pass (the reference runs three
  separate torch modules, model.py:62-67);
* ``mha_pallas`` — single-query multi-head attention over the audio window
  (q/k/v projections, scaled dot-product softmax, output projection,
  head-averaged weights) in one kernel; the whole attention state for a
  batch tile lives in VMEM (reference model.py:229-237);
* ``consensus_heads_pallas`` — segment-mean + classifier heads fused.

Layout rules honored: every BlockSpec's trailing dims are either full array
dims or (8, 128)-aligned; batch is processed in 8-row tiles (inputs are
padded to a multiple of 8 by the wrappers). Projection weights stay
resident in VMEM across grid steps (constant index maps).

The audio window spectrogram intentionally stays in XLA (ops/spectrogram.py)
— the windowed-DFT matmul already runs on the MXU, and framing requires
hop-sized (120-sample) lane slices Mosaic cannot index efficiently.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BATCH_TILE = 8


def _pad_batch(x: jnp.ndarray, tile: int = BATCH_TILE) -> Tuple[jnp.ndarray, int]:
    b = x.shape[0]
    padded = ((b + tile - 1) // tile) * tile
    if padded != b:
        pad_width = [(0, padded - b)] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, pad_width)
    return x, b


# ----------------------------------------------------------------- PE block


def pe_block_reference(x, pe_table, conv_kernel, conv_bias, gn_scale, gn_bias,
                       num_groups: int = 64, eps: float = 1e-5):
    """jnp reference: concat PE -> 1x1 conv -> GroupNorm on (B, S, C)."""
    b, s, c = x.shape
    pe = jnp.broadcast_to(pe_table[None], (b, s, pe_table.shape[1]))
    h = jnp.concatenate([x, pe.astype(x.dtype)], axis=-1)
    h = jnp.einsum("bsi,io->bso", h, conv_kernel) + conv_bias
    cg = h.shape[-1] // num_groups
    grouped = h.reshape(b, s, num_groups, cg)
    mean = grouped.mean(axis=(1, 3), keepdims=True)
    var = jnp.square(grouped - mean).mean(axis=(1, 3), keepdims=True)
    normed = ((grouped - mean) * jax.lax.rsqrt(var + eps)).reshape(b, s, -1)
    return normed * gn_scale + gn_bias


def pe_block_pallas(
    x: jnp.ndarray,  # (B, S, C_in)
    pe_table: jnp.ndarray,  # (S, D)
    conv_kernel: jnp.ndarray,  # (C_in + D, C_out)
    conv_bias: jnp.ndarray,
    gn_scale: jnp.ndarray,
    gn_bias: jnp.ndarray,
    num_groups: int = 64,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    x, true_b = _pad_batch(x)
    b, s, c_in = x.shape
    c_out = conv_kernel.shape[1]
    cg = c_out // num_groups
    tile = BATCH_TILE

    # The PE concat + conv splits exactly: [x | pe] @ W == x @ W_x + pe @ W_pe,
    # and pe @ W_pe (+ bias) is batch-invariant — precompute it once outside
    # and pass it as an (S, C_out) additive term. This removes the lane-dim
    # concat Mosaic can't lower and saves the 10 extra channels of matmul.
    w_x = conv_kernel[:c_in].astype(jnp.float32)
    pe_bias = (
        pe_table.astype(jnp.float32) @ conv_kernel[c_in:].astype(jnp.float32)
        + conv_bias.astype(jnp.float32)
    )  # (S, C_out)

    def kernel(x_ref, w_ref, peb_ref, scale_ref, bias_ref, out_ref):
        f32 = jnp.float32
        x2 = x_ref[:, :, :].astype(f32).reshape(tile * s, c_in)
        h = jnp.dot(x2, w_ref[:, :], preferred_element_type=f32)
        h3 = h.reshape(tile, s, c_out) + peb_ref[:, :][None]

        # GroupNorm without lane reshapes: group stats via an indicator
        # matmul (C_out, G), broadcast back via its transpose.
        cidx = jax.lax.broadcasted_iota(jnp.int32, (c_out, num_groups), 0)
        gidx = jax.lax.broadcasted_iota(jnp.int32, (c_out, num_groups), 1)
        ind = (cidx // cg == gidx).astype(f32)  # (C_out, G)

        hs = jnp.sum(h3, axis=1)  # (tile, C_out)
        sq = jnp.sum(h3 * h3, axis=1)
        denom = 1.0 / (s * cg)
        mean_g = jnp.dot(hs, ind, preferred_element_type=f32) * denom  # (tile, G)
        msq_g = jnp.dot(sq, ind, preferred_element_type=f32) * denom
        # clamp the single-pass variance: fp32 E[x^2]-mean^2 cancellation
        # can go slightly negative for near-constant groups, and
        # rsqrt(negative + eps) would NaN (same guard as TorchBatchNorm)
        var_g = jnp.maximum(msq_g - mean_g * mean_g, 0.0)
        mean_c = jnp.dot(mean_g, ind.T, preferred_element_type=f32)  # (tile, C_out)
        inv_c = jnp.dot(
            jax.lax.rsqrt(var_g + eps), ind.T, preferred_element_type=f32
        )
        normed = (h3 - mean_c[:, None, :]) * inv_c[:, None, :]
        out_ref[:, :, :] = (
            normed * scale_ref[:].astype(f32) + bias_ref[:].astype(f32)
        ).astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b // tile,),
        in_specs=[
            pl.BlockSpec((tile, s, c_in), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w_x.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(pe_bias.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(gn_scale.shape, lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(gn_bias.shape, lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, s, c_out), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, s, c_out), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * c_in * c_out,
            bytes_accessed=4 * (b * s * (c_in + c_out) + c_in * c_out),
            transcendentals=0,
        ),
    )(x, w_x, pe_bias, gn_scale, gn_bias)
    return out[:true_b]


# ---------------------------------------------------------------------- MHA


def mha_reference(query, keyval, wq, bq, wk, bk, wv, bv, wo, bo, num_heads: int):
    """jnp reference: single-query MHA, (B, E) x (B, S, E) ->
    ((B, E), (B, S) head-averaged weights)."""
    b, s, e = keyval.shape
    hd = e // num_heads
    q = (query @ wq + bq).reshape(b, num_heads, hd)
    k = (keyval @ wk + bk).reshape(b, s, num_heads, hd)
    v = (keyval @ wv + bv).reshape(b, s, num_heads, hd)
    logits = jnp.einsum("bhd,bshd->bhs", q / np.sqrt(hd), k)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(query.dtype)
    out = jnp.einsum("bhs,bshd->bhd", probs, v).reshape(b, e)
    out = out @ wo + bo
    return out, probs.mean(axis=1)


def mha_pallas(
    query: jnp.ndarray,  # (B, E)
    keyval: jnp.ndarray,  # (B, S, E)
    wq, bq, wk, bk, wv, bv, wo, bo,
    num_heads: int = 4,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    query, true_b = _pad_batch(query)
    keyval, _ = _pad_batch(keyval)
    b, s, e = keyval.shape
    hd = e // num_heads
    scale = 1.0 / float(np.sqrt(hd))
    tile = BATCH_TILE

    def kernel(q_ref, kv_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
               wo_ref, bo_ref, out_ref, wts_ref):
        f32 = jnp.float32
        qrows = q_ref[:, :].astype(f32)  # (tile, E)
        kv = kv_ref[:, :, :].astype(f32).reshape(tile * s, e)

        q = (
            jnp.dot(qrows, wq_ref[:, :].astype(f32), preferred_element_type=f32)
            + bq_ref[:].astype(f32)
        )  # (tile, E)
        k = (
            jnp.dot(kv, wk_ref[:, :].astype(f32), preferred_element_type=f32)
            + bk_ref[:].astype(f32)
        ).reshape(tile, s, e)
        v = (
            jnp.dot(kv, wv_ref[:, :].astype(f32), preferred_element_type=f32)
            + bv_ref[:].astype(f32)
        ).reshape(tile, s, e)

        # Heads without channel slicing: the (E, H) head-indicator matrix
        # contracts channels onto heads in one MXU pass (per-head slices +
        # concat compile pathologically in Mosaic).
        cidx = jax.lax.broadcasted_iota(jnp.int32, (e, num_heads), 0)
        hidx = jax.lax.broadcasted_iota(jnp.int32, (e, num_heads), 1)
        head_ind = (cidx // hd == hidx).astype(f32)  # (E, H)

        prod = (k * q[:, None, :]).reshape(tile * s, e)  # q·k per channel
        logits = (
            jnp.dot(prod, head_ind, preferred_element_type=f32).reshape(
                tile, s, num_heads
            )
            * scale
        )
        logits = logits - jnp.max(logits, axis=1, keepdims=True)
        expl = jnp.exp(logits)
        probs = expl / jnp.sum(expl, axis=1, keepdims=True)  # (tile, s, H)

        # broadcast head probs back to channels and reduce over s
        probs_c = jnp.dot(
            probs.reshape(tile * s, num_heads), head_ind.T,
            preferred_element_type=f32,
        ).reshape(tile, s, e)
        outh = jnp.sum(v * probs_c, axis=1)  # (tile, E)
        out = (
            jnp.dot(outh, wo_ref[:, :].astype(f32), preferred_element_type=f32)
            + bo_ref[:].astype(f32)
        )
        out_ref[:, :] = out.astype(out_ref.dtype)
        wts_ref[:, :] = jnp.mean(probs, axis=2).astype(wts_ref.dtype)

    weight_spec = lambda arr: pl.BlockSpec(
        arr.shape, (lambda i: (0, 0)) if arr.ndim == 2 else (lambda i: (0,)),
        memory_space=pltpu.VMEM,
    )
    out, wts = pl.pallas_call(
        kernel,
        grid=(b // tile,),
        in_specs=[
            pl.BlockSpec((tile, e), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, s, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            weight_spec(wq), weight_spec(bq),
            weight_spec(wk), weight_spec(bk),
            weight_spec(wv), weight_spec(bv),
            weight_spec(wo), weight_spec(bo),
        ],
        out_specs=(
            pl.BlockSpec((tile, e), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, e), query.dtype),
            jax.ShapeDtypeStruct((b, s), query.dtype),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * e * e * 4 + 4 * b * s * e,
            bytes_accessed=4 * (b * (s + 1) * e + 4 * e * e),
            transcendentals=b * num_heads * s,
        ),
    )(query, keyval, wq, bq, wk, bk, wv, bv, wo, bo)
    return out[:true_b], wts[:true_b]


# ------------------------------------------------- consensus + classifier


def consensus_heads_reference(features, head_kernels, head_biases):
    """jnp reference: (B, N, F) features -> per-head consensus logits.

    Segment consensus commutes with the linear heads (mean(xW) == mean(x)W),
    so features are averaged first — N x fewer head FLOPs than the
    reference's logits-mean (model.py:178-203), identical in exact
    arithmetic.
    """
    pooled = features.mean(axis=1)
    return [pooled @ w + b for w, b in zip(head_kernels, head_biases)]


def consensus_heads_pallas(
    features: jnp.ndarray,  # (B, N, F)
    head_kernels: Sequence[jnp.ndarray],  # [(F, C_i)]
    head_biases: Sequence[jnp.ndarray],
    interpret: bool = False,
) -> List[jnp.ndarray]:
    features, true_b = _pad_batch(features)
    b, n, f = features.shape
    tile = BATCH_TILE
    outs = []

    for w, bias in zip(head_kernels, head_biases):
        c = w.shape[1]

        def kernel(x_ref, w_ref, b_ref, out_ref):
            pooled = jnp.mean(x_ref[:, :, :].astype(jnp.float32), axis=1)  # (tile, F)
            logits = (
                jnp.dot(pooled, w_ref[:, :].astype(jnp.float32),
                        preferred_element_type=jnp.float32)
                + b_ref[:].astype(jnp.float32)
            )
            out_ref[:, :] = logits.astype(out_ref.dtype)

        out = pl.pallas_call(
            kernel,
            grid=(b // tile,),
            in_specs=[
                pl.BlockSpec((tile, n, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(bias.shape, lambda i: (0,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, c), jnp.float32),
            interpret=interpret,
        )(features, w, bias)
        outs.append(out[:true_b])
    return outs
