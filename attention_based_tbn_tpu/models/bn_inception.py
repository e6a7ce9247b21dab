"""BN-Inception (Inception-v2 / "Batch Normalization" paper) tower in Flax.

The standard public Inception-BN layer graph (the same one the reference
consumes from the ``pretrainedmodels`` package; cf. reference
core/models/bn_inception.py:38-107 and the per-layer spec visible in
core/models/bn_inception_audio.py):

    stem: 7x7/2 conv(64) -> maxpool/2 -> 1x1 conv(64) -> 3x3 conv(192) -> maxpool/2
    inception 3a 3b | 3c(/2) | 4a 4b 4c 4d | 4e(/2) | 5a 5b -> global avg pool

Each block concatenates four branches (1x1; 1x1->3x3; 1x1->3x3->3x3;
pool->1x1 projection); reduction blocks (3c, 4e) drop the 1x1 branch and use
a stride-2 max-pool passthrough. All pools are torch ``ceil_mode`` pools
(ops/pooling.py).

TPU-native: NHWC activations, fp32 params with configurable compute dtype
(bfloat16 on TPU), and torch-exact conv/BN/pool semantics so converted
reference ``.pth`` weights reproduce reference logits at fp32.

Feature head variants (reference bn_inception.py:16-35):
* default: global average pool -> (B, 1024);
* ``freq_pool_only`` (audio + attention): pool the frequency axis only,
  keeping time -> (B, T, 1024).

The alternative audio stem (reference bn_inception_audio.py:11-23) replaces
the 7x7 with two parallel (3,1)/(1,3) stride-2 convs concatenated to 64ch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.fused_stem import fused_stem_pallas, pack_kernel_jnp
from ..ops.pooling import (
    _pool_via_slices,
    avg_pool2d,
    global_avg_pool,
    max_pool2d,
)
from .layers import (
    BN_EPSILON,
    BN_MOMENTUM,
    ConvBN,
    ConvBNParams,
    FoldedConvBN,
    conv2d_apply,
    route_qconv,
)

Dtype = Any


@dataclass(frozen=True)
class InceptionSpec:
    """Channel widths of one Inception-BN block."""

    b1x1: int  # 1x1 branch (0 = reduction block, branch absent)
    r3x3: int  # 3x3 branch reduce
    b3x3: int  # 3x3 branch out
    rd3x3: int  # double-3x3 branch reduce
    d3x3: int  # double-3x3 branch out (both convs)
    proj: int  # pool-projection out (0 = passthrough max pool)
    pool: str  # "avg" or "max" pool branch
    stride: int = 1


# Standard Inception-BN configuration. Output channels:
# 3a 256, 3b 320, 3c 576, 4a-4b 576, 4c-4d 608, 4e 1056, 5a-5b 1024.
BN_INCEPTION_BLOCKS: Tuple[Tuple[str, InceptionSpec], ...] = (
    ("inception_3a", InceptionSpec(64, 64, 64, 64, 96, 32, "avg")),
    ("inception_3b", InceptionSpec(64, 64, 96, 64, 96, 64, "avg")),
    ("inception_3c", InceptionSpec(0, 128, 160, 64, 96, 0, "max", stride=2)),
    ("inception_4a", InceptionSpec(224, 64, 96, 96, 128, 128, "avg")),
    ("inception_4b", InceptionSpec(192, 96, 128, 96, 128, 128, "avg")),
    ("inception_4c", InceptionSpec(160, 128, 160, 128, 160, 128, "avg")),
    ("inception_4d", InceptionSpec(96, 128, 192, 160, 192, 128, "avg")),
    ("inception_4e", InceptionSpec(0, 128, 192, 192, 256, 0, "max", stride=2)),
    ("inception_5a", InceptionSpec(352, 192, 320, 160, 224, 128, "avg")),
    ("inception_5b", InceptionSpec(352, 192, 320, 192, 224, 128, "max")),
)

FEATURE_SIZE = 1024


class InceptionBlock(nn.Module):
    """One Inception-BN block.

    Training applies the live-statistics ConvBN cells branch by branch. At
    inference every Conv+BN folds to a single (kernel, bias)
    (layers.FoldedConvBN, exact), and the 1x1 convolutions that read the
    block input — the 1x1 branch and the two reduce layers — merge into ONE
    wider 1x1 conv (exact: concatenation along the matmul output dimension).
    BN-Inception's 64-128-channel reduces otherwise leave the MXU's 128-wide
    output lanes half empty; merged they fill it (192-352 channels).
    """

    spec: InceptionSpec
    dtype: Dtype = jnp.float32
    merge_1x1: bool = True
    # A/B: rewrite the inference avg-pool+1x1-proj branch as one exact 3x3
    # conv (see _fused_eval): removes a fusion-blocking pooling pass at the
    # price of 9x the proj FLOPs (~+33% model FLOPs). Off by default —
    # measured slower on v5e (the conv pipeline is the bottleneck, pools are
    # not); toggle via tpu.pool_proj_conv / benchmarks/infer_ab.py.
    pool_proj_conv: bool = False
    # Pool lowering strategy (ops/pooling.POOL_IMPLS).
    pool_impl: str = "reduce_window"
    # Phase-gather max-pool backward (ops/pooling._max_pool_fast_vjp).
    pool_fast_vjp: bool = False
    # Post-training int8 inference ("" | "calibrate" | "int8"); see
    # layers.conv2d_apply_q. Each conv site owns a calibrated per-tensor
    # input amax in the quant_stats collection. Requires merge_1x1 (the
    # default lowering; enforced in TBNSpec.validate).
    quantize: str = ""

    def _qconv(self, x, kernel, bias, stride, padding, amax_var):
        """One conv site through the active quantization mode
        (layers.route_qconv: calibrate records, int8 quantizes)."""
        return route_qconv(
            self.quantize, x, kernel, bias, stride, padding, self.dtype, amax_var
        )

    def _amax(self, name: str):
        return self.variable(
            "quant_stats", name, lambda: jnp.zeros((), jnp.float32)
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        frozen_stats: bool = False,
        row_mask: jnp.ndarray = None,
    ) -> jnp.ndarray:
        if not train:
            return self._fused_eval(x)

        s = self.spec
        kw = dict(dtype=self.dtype)
        bn_kw = dict(train=train, frozen_stats=frozen_stats, row_mask=row_mask)
        branches = []

        proj_out = None
        if self.merge_1x1:
            # The input-reading 1x1 cells merge at TRAIN time too: the conv
            # concat is exact (matmul output columns) and BatchNorm is
            # per-channel, so one merged BN computes the identical batch
            # statistics and running-stat updates as the per-branch BNs —
            # one conv + one reduction pass instead of three of each.
            b1, r3, rd, proj_out = self._merged_train_heads(x, frozen_stats, row_mask)
        else:
            b1 = (
                ConvBN(s.b1x1, 1, name="1x1", **kw)(x, **bn_kw)
                if s.b1x1
                else None
            )
            r3 = ConvBN(s.r3x3, 1, name="3x3_reduce", **kw)(x, **bn_kw)
            rd = ConvBN(s.rd3x3, 1, name="double_3x3_reduce", **kw)(x, **bn_kw)

        if b1 is not None:
            branches.append(b1)

        branches.append(
            ConvBN(s.b3x3, 3, stride=s.stride, padding=1, name="3x3", **kw)(
                r3, **bn_kw
            )
        )

        y = ConvBN(s.d3x3, 3, padding=1, name="double_3x3_1", **kw)(rd, **bn_kw)
        branches.append(
            ConvBN(s.d3x3, 3, stride=s.stride, padding=1, name="double_3x3_2", **kw)(
                y, **bn_kw
            )
        )

        if proj_out is not None:
            # avg-pool branch already computed by the merged path (pool
            # commuted with the bias-free proj conv — exact, see
            # _merged_train_heads)
            branches.append(proj_out)
        elif s.proj:
            if s.pool == "avg":
                pooled = avg_pool2d(
                    x, 3, 1, 1, ceil_mode=True, count_include_pad=True,
                    impl=self.pool_impl,
                )
            else:
                pooled = max_pool2d(x, 3, 1, 1, ceil_mode=True, impl=self.pool_impl, fast_vjp=self.pool_fast_vjp)
            branches.append(ConvBN(s.proj, 1, name="pool_proj", **kw)(pooled, **bn_kw))
        else:
            branches.append(
                max_pool2d(x, 3, s.stride, 0, ceil_mode=True, impl=self.pool_impl, fast_vjp=self.pool_fast_vjp)
            )

        return jnp.concatenate(branches, axis=-1)

    def _train_bn(
        self, yf, scale, bias, stat_cells, frozen_stats: bool, mean_offset=None,
        row_mask=None,
    ):
        """torch-exact BatchNorm on fp32 input over one or several cells'
        concatenated channels (BN is per-channel, so the merged statistics
        equal the per-branch ones): biased batch variance to normalize,
        unbiased in the running update, per-cell running-stat writes.

        stat_cells: list of (mean_var, var_var, size) channel sections.
        """
        eps = BN_EPSILON
        if frozen_stats:
            r_mean = jnp.concatenate([m.value for m, _, _ in stat_cells])
            r_var = jnp.concatenate([v.value for _, v, _ in stat_cells])
            inv = jax.lax.rsqrt(r_var + eps) * scale
            return yf * inv + (bias - r_mean * inv)
        # single-pass moments (var = E[x^2] - mean^2): both sums fuse into
        # one read of the activations — see layers.TorchBatchNorm
        if row_mask is None:
            mean = jnp.mean(yf, axis=(0, 1, 2))
            sq = jnp.mean(jnp.square(yf), axis=(0, 1, 2))
            var = jnp.maximum(sq - jnp.square(mean), 0.0)
            n = yf.shape[0] * yf.shape[1] * yf.shape[2]
        else:
            # pad rows carry zero weight (see layers.TorchBatchNorm.row_mask)
            w = row_mask.astype(jnp.float32).reshape(-1, 1, 1, 1)
            n = jnp.maximum(jnp.sum(row_mask.astype(jnp.float32)), 1.0) * (
                yf.shape[1] * yf.shape[2]
            )
            mean = jnp.sum(yf * w, axis=(0, 1, 2)) / n
            sq = jnp.sum(jnp.square(yf) * w, axis=(0, 1, 2)) / n
            var = jnp.maximum(sq - jnp.square(mean), 0.0)
        if not self.is_initializing():
            momentum = BN_MOMENTUM
            if row_mask is None:
                unbiased = var * (n / max(n - 1, 1))
            else:
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
            # conv biases cancel through live BN; they are recorded in the
            # running mean only (TorchBatchNorm.mean_offset semantics)
            recorded = mean if mean_offset is None else mean + mean_offset
            off = 0
            for m_var, v_var, size in stat_cells:
                m_var.value = (1 - momentum) * m_var.value + momentum * recorded[
                    off : off + size
                ]
                v_var.value = (1 - momentum) * v_var.value + momentum * unbiased[
                    off : off + size
                ]
                off += size
        return (yf - mean) * (jax.lax.rsqrt(var + eps) * scale) + bias

    def _merged_train_heads(
        self, x: jnp.ndarray, frozen_stats: bool, row_mask: jnp.ndarray = None
    ):
        """Train-time merged application of the input-reading 1x1 cells
        (1x1 branch + both reduces + the avg-pool branch's proj): one conv,
        one merged BatchNorm for the relu'd cells, and the pool branch
        commuted exactly as at inference — pool(W.x) == W.pool(x) for the
        bias-free /9-scaled proj columns, bias added post-pool, then the
        proj BN sees the identical values (and therefore identical batch
        statistics) the reference computes on conv(pool(x)). Parameter tree
        is identical to the per-branch ConvBN cells."""
        s = self.spec
        dtype = self.dtype
        in_ch = x.shape[-1]

        cells = []
        if s.b1x1:
            cells.append(("1x1", s.b1x1))
        cells += [("3x3_reduce", s.r3x3), ("double_3x3_reduce", s.rd3x3)]
        pool_in_merge = bool(s.proj) and s.pool == "avg"
        decls = [
            ConvBNParams(feat, 1, name=name)(in_ch) for name, feat in cells
        ]
        proj_decl = (
            ConvBNParams(s.proj, 1, name="pool_proj")(in_ch)
            if pool_in_merge
            else None
        )

        kernels = [k for (k, _), _ in decls]
        biases = [b for (_, b), _ in decls]
        if pool_in_merge:
            (pk, pb), _ = proj_decl
            kernels.append(pk / 9.0)  # /9 pool divisor folded; bias-free
            biases.append(jnp.zeros_like(pb))
        merged_k = jnp.concatenate(kernels, axis=-1)
        main_bias = jnp.concatenate(biases[: len(decls)], axis=-1)
        if frozen_stats:
            merged_b = jnp.concatenate(biases, axis=-1)
        else:
            # live BN: conv biases cancel through the normalization — the
            # conv runs bias-free and the biases land in the running-mean
            # updates only (see _train_bn mean_offset)
            merged_b = None
        y = conv2d_apply(x, merged_k, merged_b, 1, 0, dtype)

        n_main = sum(feat for _, feat in cells)
        y_main = y[..., :n_main]
        main_bns = [bn for _, bn in decls]
        y_main = nn.relu(
            self._train_bn(
                y_main.astype(jnp.float32),
                jnp.concatenate([bn[0] for bn in main_bns]),
                jnp.concatenate([bn[1] for bn in main_bns]),
                [
                    (bn[2], bn[3], feat)
                    for (_, feat), bn in zip(cells, main_bns)
                ],
                frozen_stats,
                mean_offset=None if frozen_stats else main_bias,
                row_mask=row_mask,
            ).astype(dtype)
        )

        sizes = [feat for _, feat in cells]
        offs = [0]
        for size in sizes:
            offs.append(offs[-1] + size)
        parts = [y_main[..., offs[i] : offs[i + 1]] for i in range(len(sizes))]
        b1 = parts[0] if s.b1x1 else None
        r3, rd = parts[-2], parts[-1]

        proj_out = None
        if pool_in_merge:
            (pk, pb), pbn = proj_decl
            xp = jnp.pad(y[..., n_main:], ((0, 0), (1, 1), (1, 1), (0, 0)))
            pooled = _pool_via_slices(xp, (3, 3), (1, 1), jnp.add)
            pooled = pooled.astype(jnp.float32)
            if frozen_stats:
                pooled = pooled + pb
            proj_out = nn.relu(
                self._train_bn(
                    pooled,
                    pbn[0],
                    pbn[1],
                    [(pbn[2], pbn[3], s.proj)],
                    frozen_stats,
                    mean_offset=None if frozen_stats else pb,
                    row_mask=row_mask,
                ).astype(dtype)
            )
        return b1, r3, rd, proj_out

    def _fused_eval(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.spec
        dtype = self.dtype
        in_ch = x.shape[-1]

        # Declaration order matches the training path so init trees agree.
        k1 = FoldedConvBN(s.b1x1, 1, name="1x1")(in_ch) if s.b1x1 else None
        kr3 = FoldedConvBN(s.r3x3, 1, name="3x3_reduce")(in_ch)
        k3 = FoldedConvBN(s.b3x3, 3, name="3x3")(s.r3x3)
        krd = FoldedConvBN(s.rd3x3, 1, name="double_3x3_reduce")(in_ch)
        kd1 = FoldedConvBN(s.d3x3, 3, name="double_3x3_1")(s.rd3x3)
        kd2 = FoldedConvBN(s.d3x3, 3, name="double_3x3_2")(s.d3x3)
        kproj = FoldedConvBN(s.proj, 1, name="pool_proj")(in_ch) if s.proj else None

        # per-conv-site calibrated input scales. NOT declared at init:
        # quant_stats exists only after a calibration pass, so an
        # uncalibrated int8 apply fails with a clear missing-collection
        # error instead of computing garbage with amax=0 (route_qconv).
        # The max-pool branch's proj reuses in_amax: a 3x3/s1 max pool
        # covers every element, so amax(pooled) == amax(x) exactly.
        q = (
            bool(self.quantize)
            and self.merge_1x1
            and not self.is_initializing()
        )
        if q:
            in_amax = self._amax("in_amax")
            r3_amax = self._amax("r3_amax")
            rd_amax = self._amax("rd_amax")
            d_amax = self._amax("d_amax")

        relu = nn.relu
        if self.merge_1x1:
            # The avg-pool branch's 1x1 proj commutes with its 3x3/1/p1
            # average pool (both linear; the count_include_pad divisor is 9
            # at every position for stride 1 / pad 1), so proj joins the
            # merged input-reading conv and the pool runs on the projected
            # 32-128 channels instead of the 192-1056 block input — exact
            # math, ~6x less pooling traffic.
            pool_in_merge = kproj is not None and s.pool == "avg"
            # proj section goes FIRST so its slice starts at lane offset 0:
            # it feeds the 9-tap pooling tree, whose pad otherwise pays a
            # lane-shuffle copy of the un-aligned slice. proj columns go in
            # BIAS-FREE: the pool pads with zeros, so only W.x commutes
            # (pool(W.x) == W.pool(x)); the bias is added after pooling or
            # border windows would average it /9. The constant /9 divisor is
            # pre-folded into the kernel so the pool is a plain add tree.
            heads = []
            if pool_in_merge:
                heads.append((kproj[0] / 9.0, jnp.zeros_like(kproj[1])))
            heads += ([k1] if k1 else []) + [kr3, krd]
            merged_k = jnp.concatenate([k for k, _ in heads], axis=-1)
            merged_b = jnp.concatenate([b for _, b in heads], axis=-1)
            if q:
                merged = self._qconv(x, merged_k, merged_b, 1, 0, in_amax)
            else:
                merged = conv2d_apply(x, merged_k, merged_b, 1, 0, dtype)
            sizes = [k.shape[-1] for k, _ in heads]
            offs = [0]
            for size in sizes:
                offs.append(offs[-1] + size)
            parts = [merged[..., offs[i] : offs[i + 1]] for i in range(len(sizes))]
            proj_pre = parts.pop(0) if pool_in_merge else None
            parts = [relu(p) for p in parts]
            if k1:
                b1, r3, rd = parts
            else:
                b1 = None
                r3, rd = parts
        else:
            proj_pre = None
            b1 = relu(conv2d_apply(x, *k1, 1, 0, dtype)) if k1 else None
            r3 = relu(conv2d_apply(x, *kr3, 1, 0, dtype))
            rd = relu(conv2d_apply(x, *krd, 1, 0, dtype))

        branches = []
        if b1 is not None:
            branches.append(b1)
        if q:
            branches.append(relu(self._qconv(r3, *k3, s.stride, 1, r3_amax)))
            d = relu(self._qconv(rd, *kd1, 1, 1, rd_amax))
            branches.append(relu(self._qconv(d, *kd2, s.stride, 1, d_amax)))
        else:
            branches.append(relu(conv2d_apply(r3, *k3, s.stride, 1, dtype)))
            d = relu(conv2d_apply(rd, *kd1, 1, 1, dtype))
            branches.append(relu(conv2d_apply(d, *kd2, s.stride, 1, dtype)))

        if kproj:
            if proj_pre is not None:
                # proj (already /9-scaled) came out of the merged conv; the
                # 3x3/s1/p1 average is a 9-tap shifted add tree — pure
                # elementwise ops XLA fuses with the bias+ReLU epilogue,
                # unlike reduce_window which lane-pads the narrow 32-128
                # proj channels (measured 10 ms/exec slower).
                xp = jnp.pad(proj_pre, ((0, 0), (1, 1), (1, 1), (0, 0)))
                summed = _pool_via_slices(xp, (3, 3), (1, 1), jnp.add)
                branches.append(relu(summed + kproj[1].astype(summed.dtype)))
            elif s.pool == "avg" and self.pool_proj_conv:
                # avg-pool(3x3/1/p1, count_include_pad) then 1x1 proj is
                # EXACTLY a 3x3 conv with the proj kernel replicated /9 at
                # every tap (the divisor is 9 at every position: stride 1,
                # pad 1 adds no ceil-extra rows and explicit padding counts).
                # Keeps the whole branch inside the conv pipeline instead of
                # a fusion-blocking pooling pass.
                pk, pb = kproj
                kp3 = jnp.broadcast_to(pk / 9.0, (3, 3) + pk.shape[2:])
                branches.append(relu(conv2d_apply(x, kp3, pb, 1, 1, dtype)))
            elif s.pool == "avg":
                pooled = avg_pool2d(
                    x, 3, 1, 1, ceil_mode=True, count_include_pad=True,
                    impl=self.pool_impl,
                )
                branches.append(relu(conv2d_apply(pooled, *kproj, 1, 0, dtype)))
            else:
                pooled = max_pool2d(x, 3, 1, 1, ceil_mode=True, impl=self.pool_impl, fast_vjp=self.pool_fast_vjp)
                if q:
                    # in_amax is exact for pooled (see declaration comment)
                    branches.append(
                        relu(self._qconv(pooled, *kproj, 1, 0, in_amax))
                    )
                else:
                    branches.append(relu(conv2d_apply(pooled, *kproj, 1, 0, dtype)))
        else:
            branches.append(
                max_pool2d(x, 3, s.stride, 0, ceil_mode=True, impl=self.pool_impl, fast_vjp=self.pool_fast_vjp)
            )

        return jnp.concatenate(branches, axis=-1)


class BNInception(nn.Module):
    """BN-Inception feature tower.

    Args:
      freq_pool_only: pool only the frequency (H) axis at the head, keeping
        the temporal axis — used by the audio tower under attention.
      audio_stem: use the two-branch (3,1)/(1,3) stem variant instead of the
        7x7 stem.
      partial_bn: treat every BN except the stem's first as frozen-stats
        during training is NOT the reference behavior — the reference only
        stops gradients to their affine params (model.py:170-176) while stats
        keep updating; gradient masking happens in the optimizer
        (models/builder.py). This flag is therefore unused here and the
        tower always updates stats when ``train=True``.
    """

    freq_pool_only: bool = False
    audio_stem: bool = False
    dtype: Dtype = jnp.float32
    # Merge each block's input-reading 1x1 convs into one conv at inference
    # (exact; see InceptionBlock). Off switch exists for A/B benchmarking.
    merge_1x1: bool = True
    # A/B: plain 7x7/2 stem conv instead of the column-packed rewrite
    # (layers.TorchConv._packed_w_conv); measured a wash on v5e.
    direct_stem: bool = False
    # A/B: see InceptionBlock.pool_proj_conv.
    pool_proj_conv: bool = False
    # Pool lowering strategy (ops/pooling.POOL_IMPLS).
    pool_impl: str = "reduce_window"
    # Phase-gather max-pool backward (ops/pooling._max_pool_fast_vjp).
    pool_fast_vjp: bool = False
    # Post-training int8 inference ("" | "calibrate" | "int8"): applies to
    # the conv2 cells and every inception block. The stem conv is excluded
    # — it reads uint8 input and runs at HBM bandwidth, so the int8 MXU
    # path buys nothing there (PERF.md).
    quantize: str = ""
    # Fused Pallas inference stem: normalize+conv7x7/2+BN-fold+ReLU+
    # ceil-pool in one VMEM-resident kernel (ops/fused_stem.py), skipping
    # the conv activation's HBM round trip into the pool. Eval-only, 7x7
    # stem only, requires H and W divisible by 4; A/B receipt in
    # benchmarks/fused_stem_probe.py + PERF.md round 5 (tpu.fused_stem).
    fused_stem: bool = False
    # Run the fused stem in Pallas interpret mode (CPU tests only).
    fused_stem_interpret: bool = False

    feature_size: int = FEATURE_SIZE

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        row_mask: jnp.ndarray = None,
        input_scale: jnp.ndarray = None,
        input_offset: jnp.ndarray = None,
        input_packed: bool = False,
    ) -> jnp.ndarray:
        """(input_scale, input_offset): per-channel affine normalization of
        a raw uint8 input, applied inside the stem conv after its pure
        reshapes (layers.TorchConv) to avoid layout copies.

        ``row_mask``: 0/1 per batch row; zero-weight rows (the loader's pad
        rows) are excluded from every live BatchNorm statistic
        (layers.TorchBatchNorm.row_mask).

        ``input_packed``: the host loader delivered x column-paired,
        (B, H, W/2, 2C) — see layers.TorchConv."""
        kw = dict(dtype=self.dtype)
        bn_kw = dict(train=train, row_mask=row_mask)

        use_fused = False
        if self.audio_stem:
            if input_scale is not None:
                x = x.astype(self.dtype) * input_scale.astype(
                    self.dtype
                ) + input_offset.astype(self.dtype)
            # Names follow the reference's (kernel shapes included — the
            # reference's "1x3" layer really has a (3,1) kernel and vice
            # versa, bn_inception_audio.py:11-19); concat order (1x3, 3x1).
            a = ConvBN(32, (3, 1), 2, (1, 0), name="conv1_1x3_s2", **kw)(x, **bn_kw)
            b = ConvBN(32, (1, 3), 2, (0, 1), name="conv1_3x1_s2", **kw)(x, **bn_kw)
            y = jnp.concatenate([a, b], axis=-1)
        else:
            in_ch = x.shape[-1] // 2 if input_packed else x.shape[-1]
            use_fused = (
                self.fused_stem
                and not train
                and not self.quantize
                and x.shape[1] % 4 == 0
                and (x.shape[2] * (2 if input_packed else 1)) % 4 == 0
            )
            if use_fused:
                # fused Pallas stem+pool: FoldedConvBN declares the exact
                # same parameter tree as the ConvBN cell below, so the two
                # interchange per call-site (layers.py)
                k, b = FoldedConvBN(64, 7, name="conv1_7x7_s2")(in_ch)
                if input_scale is None:
                    sc = jnp.ones((in_ch,), jnp.float32)
                    off = jnp.zeros((in_ch,), jnp.float32)
                else:
                    sc, off = input_scale, input_offset
                y = fused_stem_pallas(
                    x,
                    pack_kernel_jnp(k).astype(self.dtype),
                    b,
                    sc,
                    off,
                    dtype=self.dtype,
                    input_packed=input_packed,
                    interpret=self.fused_stem_interpret,
                )
            else:
                # column-packed stem: exact 7x7/2 rewrite that keeps the
                # MXU busy despite the 1-10 input channels (see TorchConv)
                y = ConvBN(
                    64,
                    7,
                    2,
                    3,
                    name="conv1_7x7_s2",
                    space_to_depth=not self.direct_stem,
                    **kw,
                )(
                    x,
                    input_scale=input_scale,
                    input_offset=input_offset,
                    input_packed=input_packed,
                    **bn_kw,
                )
        if not use_fused:  # the fused kernel already applied pool1
            y = max_pool2d(y, 3, 2, 0, ceil_mode=True, impl=self.pool_impl, fast_vjp=self.pool_fast_vjp)
        y = ConvBN(64, 1, name="conv2_3x3_reduce", quantize=self.quantize, **kw)(
            y, **bn_kw
        )
        y = ConvBN(192, 3, padding=1, name="conv2_3x3", quantize=self.quantize, **kw)(
            y, **bn_kw
        )
        y = max_pool2d(y, 3, 2, 0, ceil_mode=True, impl=self.pool_impl, fast_vjp=self.pool_fast_vjp)

        for name, spec in BN_INCEPTION_BLOCKS:
            y = InceptionBlock(
                spec,
                merge_1x1=self.merge_1x1,
                pool_proj_conv=self.pool_proj_conv,
                pool_impl=self.pool_impl,
                pool_fast_vjp=self.pool_fast_vjp,
                quantize=self.quantize,
                name=name,
                **kw,
            )(y, **bn_kw)

        return global_avg_pool(y, freq_only=self.freq_pool_only)
