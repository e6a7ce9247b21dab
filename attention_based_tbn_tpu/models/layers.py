"""Torch-semantics building-block layers in Flax (NHWC, TPU layouts).

These provide exact PyTorch numerical behavior (needed for fp32 logit parity
with the reference and for consuming converted .pth weights) while keeping
TPU-native data layout: NHWC activations, HWIO kernels, bf16 compute with
fp32 parameters and statistics.
"""

from __future__ import annotations

from typing import Any, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

IntPair = Union[int, Tuple[int, int]]
Dtype = Any

# torch nn.BatchNorm2d defaults, shared by TorchBatchNorm, the folded
# inference cells and the merged train-time BN (models/bn_inception.py)
BN_MOMENTUM = 0.1
BN_EPSILON = 1e-5


def _pair(v: IntPair) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else (int(v[0]), int(v[1]))


def conv2d_apply(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray = None,
    stride: IntPair = 1,
    padding: IntPair = 0,
    dtype: Dtype = jnp.float32,
) -> jnp.ndarray:
    """Functional nn.Conv2d on NHWC input with an HWIO kernel: explicit
    symmetric padding, floor output size. Compute runs in ``dtype``."""
    s, p = _pair(stride), _pair(padding)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        kernel.astype(dtype),
        window_strides=s,
        padding=((p[0], p[0]), (p[1], p[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if dtype == jnp.float32 else None,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(dtype)


def conv2d_apply_q(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    stride: IntPair,
    padding: IntPair,
    dtype: Dtype,
    x_scale: jnp.ndarray,
) -> jnp.ndarray:
    """int8 x int8 -> int32 convolution with in-graph quantization.

    Post-training quantized sibling of :func:`conv2d_apply` for the
    inference path (``tpu.quantize=int8``): the activation is quantized
    with the CALIBRATED per-tensor scale ``x_scale`` (amax/127, recorded by
    a calibration pass into the ``quant_stats`` collection), the folded
    fp32 kernel symmetrically per output channel, and the s8 conv
    accumulates in int32 on the MXU's double-rate int8 path (v5e: 394 vs
    197 bf16 TOPS). The dequantize (int32 * (s_x * s_k[o]) + bias) is
    written to fuse into a conv epilogue, but whether it DOES is
    backend-dependent: on the current v5e XLA stack NO epilogue fuses
    into an s8 convolution — the int32 output materializes in HBM and
    the mode measured NEGATIVE in-model (128.3 vs 211.0 clips/s; PERF.md
    round 3, benchmarks/int8_probe2.py). Opt-in for backends that fuse.

    Quantizing the KERNEL in-graph costs only parameter-sized work (the
    folded kernels are already recomputed per call from fp32 masters) and
    keeps checkpoints/export unchanged — no separate quantized tree.
    """
    s, p = _pair(stride), _pair(padding)
    s_k = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0, 1e-12)
    kq = jnp.clip(jnp.round(kernel / s_k), -127, 127).astype(jnp.int8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale), -127, 127).astype(
        jnp.int8
    )
    y = jax.lax.conv_general_dilated(
        q,
        kq,
        window_strides=s,
        padding=((p[0], p[0]), (p[1], p[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (s_k * x_scale)
    if bias is not None:
        y = y + bias
    return y.astype(dtype)


def route_qconv(
    mode: str,
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    stride: IntPair,
    padding: IntPair,
    dtype: Dtype,
    amax_var,
) -> jnp.ndarray:
    """One quantized conv site: record or quantize, then convolve.

    The single source of truth for the calibrate/int8 dispatch shared by
    ConvBN and InceptionBlock: ``calibrate`` records amax(|x|) into
    ``amax_var`` (running max across batches) and runs the exact conv;
    ``int8`` runs :func:`conv2d_apply_q` with the recorded scale
    (max(amax, 1e-6)/127). Callers own the variable declaration (flax
    scoping) and must NOT declare it during init — quant_stats exists
    only after a calibration pass, so an uncalibrated int8 apply fails
    with a clear missing-collection error instead of computing garbage
    with amax=0.
    """
    if mode == "int8":
        x_scale = jnp.maximum(amax_var.value, 1e-6) / 127.0
        return conv2d_apply_q(x, kernel, bias, stride, padding, dtype, x_scale)
    assert mode == "calibrate", mode
    amax_var.value = jnp.maximum(
        amax_var.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
    )
    return conv2d_apply(x, kernel, bias, stride, padding, dtype)


class TorchConv(nn.Module):
    """nn.Conv2d equivalent: explicit symmetric padding, floor output size.

    Kernel is HWIO; converted torch weights (OIHW) are transposed by
    models/convert.py. Parameters stay fp32; compute runs in ``dtype``.

    ``space_to_depth=True`` rewrites a 7x7/2/p3 stem conv as an exactly
    equivalent (7,4)-kernel stride-(2,1) conv over the column-paired input
    (W pairs folded into channels — a pure reshape, no transpose; see
    ``_packed_w_conv``). Few-channel stems (1/3/10 inputs) otherwise run
    the MXU at a fraction of peak. Same parameters, same result; requires
    an even input width (odd widths fall back to the direct conv).
    """

    features: int
    kernel_size: IntPair
    stride: IntPair = 1
    padding: IntPair = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    space_to_depth: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        fold_scale: jnp.ndarray = None,
        fold_offset: jnp.ndarray = None,
        input_scale: jnp.ndarray = None,
        input_offset: jnp.ndarray = None,
        skip_bias_add: bool = False,
        input_packed: bool = False,
    ) -> jnp.ndarray:
        """Optional BN folding: with (fold_scale, fold_offset) the conv
        computes ``conv(x, W*scale) + (b*scale + offset)`` — algebraically
        BN(conv(x)+b) for inference, removing the separate normalization
        pass over the activations.

        (input_scale, input_offset): per-input-channel affine applied to x
        right before the conv — the uint8->float normalization of the stem.
        Applying it HERE, after the pure batch-fold/column-pack reshapes,
        keeps those reshapes bitcast-free; normalizing before them makes
        XLA materialize layout copies around every reshape (measured
        ~3 ms/batch for the 10-channel Flow stack).

        ``input_packed``: x arrives ALREADY column-paired, (B, H, W/2, 2C)
        — the host loader does the pairing as a free numpy reshape
        (data/loader.py), so the device graph never reshapes the raw
        input at all (the on-device reshape costs ~3 ms/batch of layout
        copies for the 25-segment Flow stream). Requires the 7x7/2 stem
        geometry (same as space_to_depth)."""
        k = _pair(self.kernel_size)
        s = _pair(self.stride)
        p = _pair(self.padding)
        if input_packed:
            assert k == (7, 7) and s == (2, 2) and p == (3, 3), (
                "input_packed requires the 7x7/2/p3 stem geometry"
            )
            in_features = x.shape[-1] // 2
        else:
            in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (k[0], k[1], in_features, self.features),
            jnp.float32,
        )
        if fold_scale is not None:
            kernel = kernel * fold_scale  # per-output-channel, fp32

        if input_packed or (
            self.space_to_depth
            and k == (7, 7)
            and s == (2, 2)
            and p == (3, 3)
            and x.shape[2] % 2 == 0
        ):
            y = self._packed_w_conv(
                x, kernel, input_scale, input_offset, input_packed
            )
        else:
            if input_scale is not None:
                x = x.astype(self.dtype) * input_scale.astype(
                    self.dtype
                ) + input_offset.astype(self.dtype)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=s,
                padding=((p[0], p[0]), (p[1], p[1])),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32
                if self.dtype == jnp.float32
                else None,
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if skip_bias_add:
                # caller folds the bias into its BatchNorm's running-mean
                # update instead (BN(y+b) == BN(y) under live statistics)
                return y.astype(self.dtype), bias
            if fold_scale is not None:
                bias = bias * fold_scale
            if fold_offset is not None:
                bias = bias + fold_offset
            y = y + bias.astype(y.dtype)
        elif fold_offset is not None:
            y = y + fold_offset.astype(y.dtype)
        return y.astype(self.dtype)

    def _packed_w_conv(
        self,
        x: jnp.ndarray,
        kernel: jnp.ndarray,
        input_scale: jnp.ndarray = None,
        input_offset: jnp.ndarray = None,
        input_packed: bool = False,
    ) -> jnp.ndarray:
        """7x7/2/p3 conv == (7,4)/(2,1) conv on the column-paired input.

        Folding W pairs into channels, (B,H,W,C) -> (B,H,W/2,2C), is a PURE
        RESHAPE (contiguous in NHWC) — unlike full 2x2 space-to-depth there
        is no transpose, so the stem costs no relayout copy while still
        widening the contraction to 7*4*2C for the MXU (few-channel stems
        otherwise run it at a fraction of peak).

        Output col i covers original cols 2i-3..2i+3 = packed cols p =
        i-2..i+1 (4 taps) with parity v, original kernel col = 2q+v-1
        (q = p-(i-2)); so w'[a, q, v*C+c, o] = w[a, 2q+v-1, c, o] (zero out
        of range), packed padding (2, 2), H handled by the conv's own (3, 3)
        padding, and the one ceil-extra output column sliced off.
        """
        if input_packed:
            # host already paired the columns: x is (B, H, W/2, 2C) and
            # input_scale/offset (when given) already cover the 2C packed
            # channels — no device reshape at all
            b, h, w2, c2 = x.shape
            c = c2 // 2
            w = 2 * w2
            xw = x.astype(self.dtype)
            if input_scale is not None:
                xw = xw * input_scale.astype(self.dtype) + input_offset.astype(
                    self.dtype
                )
        else:
            b, h, w, c = x.shape
            # reshape FIRST (pure, any dtype incl. uint8), normalize after
            # — see __call__ docstring
            xw = x.reshape(b, h, w // 2, 2 * c).astype(self.dtype)
            if input_scale is not None:
                xw = xw * jnp.tile(input_scale, 2).astype(
                    self.dtype
                ) + jnp.tile(input_offset, 2).astype(self.dtype)
        out_h = (h + 6 - 7) // 2 + 1
        out_w = (w + 6 - 7) // 2 + 1
        o = kernel.shape[-1]

        # packed kernel (7, 4, 2C, O); channel packing (v, c)
        import numpy as _np

        idx = 2 * _np.arange(4)[None, :] + _np.arange(2)[:, None] - 1  # (v, q)
        valid = jnp.asarray(((idx >= 0) & (idx < 7)).astype(_np.float32))
        clipped = _np.clip(idx, 0, 6)
        # (7, v, q, C, O) gather on the kernel's column axis
        w_sel = kernel[:, clipped.reshape(-1)].reshape(7, 2, 4, c, o)
        w_sel = w_sel * valid[None, :, :, None, None]
        wp = w_sel.transpose(0, 2, 1, 3, 4).reshape(7, 4, 2 * c, o)

        y = jax.lax.conv_general_dilated(
            xw,
            wp.astype(self.dtype),
            window_strides=(2, 1),
            padding=((3, 3), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32
            if self.dtype == jnp.float32
            else None,
        )
        return y[:, :out_h, :out_w, :]


class TorchBatchNorm(nn.Module):
    """nn.BatchNorm2d-equivalent over the channel (last) axis.

    Matches torch exactly:
    * train: normalize with biased batch variance; running stats updated as
      ``(1-m)*running + m*batch`` with the *unbiased* batch variance;
    * eval: normalize with running stats.

    ``frozen_stats=True`` keeps using running statistics even in training
    (torch modules put in ``.eval()``). Statistics and affine parameters are
    fp32; the normalized output is cast back to ``dtype``.
    """

    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPSILON
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        use_running_average: bool = True,
        frozen_stats: bool = False,
        mean_offset: jnp.ndarray = None,
        row_mask: jnp.ndarray = None,
    ) -> jnp.ndarray:
        """``mean_offset``: per-channel constant the caller ADDED-BY-PROXY
        to x — BN(x + c) == BN(x) under live statistics (the mean shift
        cancels), except the running mean must record mean + c. Passing the
        preceding conv's bias here lets the caller skip the full-activation
        bias add (a per-channel scalar op replaces it); the conv bias then
        gets an exactly-zero gradient, matching its mathematically-zero
        gradient through live BN. Only valid with live statistics.

        ``row_mask``: 0/1 weight per leading-axis row. Live batch statistics
        are computed over the unmasked rows only, so the loader's pad rows
        (batch padded to the mesh size, data/loader.py) influence neither
        the normalization of real rows nor the running-stat updates — the
        reference never pads (its DataLoader yields ragged last batches)."""
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(features, jnp.float32)
        )

        if use_running_average or frozen_stats:
            assert mean_offset is None, "mean_offset requires live statistics"
            # Inference fast path: fold stats+affine into one per-channel
            # scale/offset (computed in fp32, applied in the compute dtype).
            # With bf16 activations this halves the elementwise traffic vs
            # normalizing in fp32; with fp32 it is exact.
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon) * scale
            offset = bias - ra_mean.value * inv
            y = x.astype(self.dtype) * inv.astype(self.dtype) + offset.astype(
                self.dtype
            )
            return y

        xf = x.astype(jnp.float32)
        reduce_axes = tuple(range(x.ndim - 1))
        # Single-pass moments: var = E[x^2] - mean^2 (fp32 accumulation).
        # The two-pass form needs a second full read of the activations for
        # sum((x - mean)^2) — on v5e traces that is a separate ~0.4 ms
        # reduction per stem BN; the E[x^2] sums have no data dependency so
        # XLA fuses both into ONE pass. fp32 accumulators keep the
        # cancellation error ~1e-7 relative on activation-scale data (same
        # formulation torch's CUDA kernels and flax.linen.BatchNorm use).
        if row_mask is None:
            mean = jnp.mean(xf, axis=reduce_axes)
            sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
            var = jnp.maximum(sq - jnp.square(mean), 0.0)
            n = 1
            for axis in reduce_axes:
                n *= x.shape[axis]
            unbiased = var * (n / max(n - 1, 1))
        else:
            w = row_mask.astype(jnp.float32).reshape(
                (-1,) + (1,) * (x.ndim - 1)
            )
            per_row = 1
            for axis in reduce_axes[1:]:
                per_row *= x.shape[axis]
            count = jnp.maximum(jnp.sum(row_mask.astype(jnp.float32)), 1.0) * per_row
            mean = jnp.sum(xf * w, axis=reduce_axes) / count
            sq = jnp.sum(jnp.square(xf) * w, axis=reduce_axes) / count
            var = jnp.maximum(sq - jnp.square(mean), 0.0)
            unbiased = var * (count / jnp.maximum(count - 1.0, 1.0))
        if not self.is_initializing():
            recorded = mean if mean_offset is None else mean + mean_offset
            ra_mean.value = (
                (1 - self.momentum) * ra_mean.value + self.momentum * recorded
            )
            ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(self.dtype)


class BNParams(nn.Module):
    """Declares BatchNorm parameters + running stats without applying —
    identical tree paths to TorchBatchNorm so checkpoints interchange.
    Returns the stat VARIABLES (not values) so merged-BN callers can also
    write updates; read ``.value`` for the folded inference path."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features, jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features, jnp.float32)
        )
        return scale, bias, mean, var


class ConvParams(nn.Module):
    """Declares a TorchConv's (kernel, bias) without applying the conv —
    identical tree paths so checkpoints interchange with TorchConv."""

    features: int
    kernel_size: IntPair

    @nn.compact
    def __call__(self, in_features: int):
        k = _pair(self.kernel_size)
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (k[0], k[1], in_features, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


class ConvBNParams(nn.Module):
    """Declares a ConvBN cell's raw (kernel, bias) + BN params/stat
    variables without applying anything — same tree (children "conv",
    "bn") as ConvBN/FoldedConvBN, for merged-at-train application."""

    features: int
    kernel_size: IntPair

    @nn.compact
    def __call__(self, in_features: int):
        kernel, bias = ConvParams(self.features, self.kernel_size, name="conv")(
            in_features
        )
        scale, bn_bias, mean, var = BNParams(self.features, name="bn")()
        return (kernel, bias), (scale, bn_bias, mean, var)


class FoldedConvBN(nn.Module):
    """Conv+BN parameter pair folded to a single (kernel, bias) for
    inference: BN(conv(x, W) + b) == conv(x, W*s) + (b*s + o) with
    s = scale/sqrt(var+eps), o = bias - mean*s. Declares the exact same
    parameter/stat tree as ConvBN (children "conv" and "bn"), so the two
    interchange per call-site based on the train flag.

    Folding kernels (rather than activations) lets callers merge several
    sibling convs that read the same input into one wider conv — the
    inception-block 1x1 fan-out — which is exact (concat along the matmul N
    dimension) and keeps the MXU's 128-lane output dimension full.
    """

    features: int
    kernel_size: IntPair
    bn_epsilon: float = BN_EPSILON

    @nn.compact
    def __call__(self, in_features: int):
        kernel, bias = ConvParams(self.features, self.kernel_size, name="conv")(
            in_features
        )
        scale, bn_bias, mean, var = BNParams(self.features, name="bn")()
        fold = jax.lax.rsqrt(var.value + self.bn_epsilon) * scale
        return kernel * fold, bias * fold + (bn_bias - mean.value * fold)


class ConvBN(nn.Module):
    """Conv + BN + optional ReLU — the BN-Inception unit cell.

    At inference the BN folds into the convolution (per-output-channel
    kernel scaling + a single bias), eliminating the separate normalization
    pass over the activations; training keeps the live-statistics path.
    """

    features: int
    kernel_size: IntPair
    stride: IntPair = 1
    padding: IntPair = 0
    relu: bool = True
    dtype: Dtype = jnp.float32
    space_to_depth: bool = False
    bn_epsilon: float = BN_EPSILON
    # Post-training int8 inference ("" off, "calibrate" records the input
    # amax into quant_stats, "int8" runs the s8 conv with the recorded
    # scale — see conv2d_apply_q). Ignored on training paths and on stem
    # cells that normalize raw uint8 inputs (those are bandwidth-bound;
    # int8 compute buys nothing there).
    quantize: str = ""

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        frozen_stats: bool = False,
        input_scale: jnp.ndarray = None,
        input_offset: jnp.ndarray = None,
        row_mask: jnp.ndarray = None,
        input_packed: bool = False,
    ) -> jnp.ndarray:
        in_kw = dict(
            input_scale=input_scale,
            input_offset=input_offset,
            input_packed=input_packed,
        )

        quantize = self.quantize if (
            not train
            and input_scale is None
            and not input_packed
            and not self.space_to_depth
            # no quant_stats at init: calibration creates the collection,
            # so an uncalibrated int8 apply fails loudly (route_qconv)
            and not self.is_initializing()
        ) else ""
        if not quantize:
            # the quantized path declares the same "conv" tree via
            # ConvParams instead (a submodule name may only be used once)
            conv = TorchConv(
                self.features,
                self.kernel_size,
                self.stride,
                self.padding,
                use_bias=True,
                dtype=self.dtype,
                space_to_depth=self.space_to_depth,
                name="conv",
            )

        if not train and quantize:
            # identical parameter tree to the TorchConv/BNParams pair; the
            # conv applies functionally on the BN-folded kernel
            kernel, conv_bias = ConvParams(
                self.features, self.kernel_size, name="conv"
            )(x.shape[-1])
            scale, bn_bias, mean, var = BNParams(self.features, name="bn")()
            fold_scale = jax.lax.rsqrt(var.value + self.bn_epsilon) * scale
            kf = kernel * fold_scale
            bf = conv_bias * fold_scale + (bn_bias - mean.value * fold_scale)
            amax = self.variable(
                "quant_stats", "amax", lambda: jnp.zeros((), jnp.float32)
            )
            y = route_qconv(
                quantize, x, kf, bf, self.stride, self.padding, self.dtype, amax
            )
        elif not train:
            scale, bias, mean, var = BNParams(self.features, name="bn")()
            fold_scale = jax.lax.rsqrt(var.value + self.bn_epsilon) * scale
            fold_offset = bias - mean.value * fold_scale
            y = conv(x, fold_scale=fold_scale, fold_offset=fold_offset, **in_kw)
        elif frozen_stats:
            y = conv(x, **in_kw)
            y = TorchBatchNorm(dtype=self.dtype, name="bn")(
                y, use_running_average=False, frozen_stats=True
            )
        else:
            # live BN: the conv bias cancels through the normalization —
            # skip the full-activation add and record it in the running
            # mean instead (see TorchBatchNorm.mean_offset)
            y, conv_bias = conv(x, skip_bias_add=True, **in_kw)
            y = TorchBatchNorm(dtype=self.dtype, name="bn")(
                y,
                use_running_average=False,
                frozen_stats=False,
                mean_offset=conv_bias,
                row_mask=row_mask,
            )
        if self.relu:
            y = nn.relu(y)
        return y


class TorchLinear(nn.Module):
    """nn.Linear equivalent; kernel (in, out) — torch (out, in) transposed on
    conversion. Supports the reference's normal(0, std) init for heads."""

    features: int
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features), jnp.float32
        )
        bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        return (y + bias.astype(y.dtype)).astype(self.dtype)


class TorchGroupNorm(nn.Module):
    """nn.GroupNorm over the channel (last) axis of (B, T, C) or (B, C)."""

    num_groups: int
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        features = x.shape[-1]
        assert features % self.num_groups == 0
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)

        xf = x.astype(jnp.float32)
        # Normalize per (batch, group) over every spatial position and the
        # group's channels, like torch GroupNorm on (B, C, *spatial).
        b = x.shape[0]
        flat = xf.reshape(b, -1, self.num_groups, features // self.num_groups)
        flat = jnp.moveaxis(flat, 2, 1)  # (B, G, S, C/G)
        mean = jnp.mean(flat, axis=(2, 3), keepdims=True)
        var = jnp.mean(jnp.square(flat - mean), axis=(2, 3), keepdims=True)
        normed = (flat - mean) * jax.lax.rsqrt(var + self.epsilon)
        normed = jnp.moveaxis(normed, 1, 2).reshape(xf.shape)
        return (normed * scale + bias).astype(self.dtype)


def normal_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std

    return init
