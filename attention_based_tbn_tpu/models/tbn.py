"""The Temporal Binding Network, assembled as a pure Flax module.

Forward semantics mirror reference core/models/model.py:205-262:

* per-modality towers run on the (batch * segments) folded batch;
* the audio feature is either (a) zeroed batch-wide with one scalar draw when
  audio dropout is active (model.py:216-222), (b) reduced with fixed prior
  weights (model.py:224-228), or (c) attended with the first modality's
  feature as query via MHA / unimodal / prototype attention
  (model.py:229-241);
* at eval, if visual streams carry more crops than audio (10-crop), the
  audio feature is tiled to match (model.py:243-248);
* features concat -> Fusion(512) when multimodal -> per-class-type heads ->
  segment consensus = mean over segments (model.py:178-203, 257).

TPU-native: the audio tower input may be the raw waveform window — the
log-spectrogram (ops/spectrogram.py) then runs *inside* the jitted forward as
MXU matmuls, so the host never materializes spectrogram images.

Layouts: RGB (B, N, H, W, 3); Flow (B, N, H, W, 2*win); Audio waveform
(B, N, L) or spectrogram (B, N, F, T, 1); fixed/prior weights (B, N, W, 1).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.priors import attention_window_size
from ..ops.spectrogram import spectrogram
from .attention import (
    MultiheadAttention,
    PositionalEncoding,
    PrototypeAttention,
    UniModalAttention,
)
from .bn_inception import BNInception
from .heads import Classifier, Fusion
from .resnet import ResNet
from .vgg import VGG

Dtype = Any


def tile_crop_rows(feature: jnp.ndarray, b: int, reps: int) -> jnp.ndarray:
    """Broadcast per-(sample, segment) rows to ``reps`` crop rows.

    Visual streams under 10-crop eval are ordered crop-major within each
    sample by the ten_crop transform: row = loc*2N + seg*2 + flip
    (data/transforms.py ten_crop). Audio carries one row per segment; this
    broadcasts row (b, seg) to its ``reps`` crop rows so downstream Fusion
    pairs matching segments. Works on any trailing shape ((B*N, C) pooled
    features or (B*N, S, C) attention sequences).

    Documented divergence: the reference's dormant path (model.py:243-248,
    call sites commented out) tiles with ``repeat(new_size, 1)`` — rep-major
    ordering that pairs visual row loc*2N+seg*2+flip with audio row
    rep*N+seg, i.e. the wrong segment whenever N > 1; here the pairing is
    correct by construction (asserted in test_tbn_forward.py alignment
    tests).
    """
    n_seg = feature.shape[0] // b
    trailing = feature.shape[1:]
    if reps % 2 == 0:  # ten-crop style: (loc, seg, flip) row order
        out = jnp.broadcast_to(
            feature.reshape((b, 1, n_seg, 1) + trailing),
            (b, reps // 2, n_seg, 2) + trailing,
        )
    else:  # non-ten-crop expansion: plain per-sample repeat
        out = jnp.broadcast_to(
            feature.reshape((b, 1, n_seg) + trailing),
            (b, reps, n_seg) + trailing,
        )
    return out.reshape((b * reps * n_seg,) + trailing)


@dataclass(frozen=True)
class TBNSpec:
    """Static (hashable) model configuration distilled from the config tree."""

    modality: Tuple[str, ...] = ("RGB", "Flow", "Audio")
    arch: str = "bninception"
    num_classes: Tuple[Tuple[str, int], ...] = (("verb", 125), ("noun", 352))
    attention_enable: bool = True
    attention_type: str = "mha"
    use_pe: bool = True
    use_fixed: bool = False
    use_gumbel: bool = True
    attn_heads: int = 4
    attn_dropout: float = 0.5
    attn_win: int = 13
    audio_dropout: float = 0.0
    # Modalities whose BN-Inception tower uses the two-branch (3,1)/(1,3)
    # audio stem (reference bn_inception_audio.py:11-23). Config key
    # model.bninception.audio_stem=true selects it for the Audio tower.
    audio_stem: Tuple[str, ...] = ()
    fusion_dropout: float = 0.5
    resnet_depth: int = 101
    vgg_type: str = "16"
    flow_win_length: int = 5
    spec_type: str = "stft"
    sampling_rate: int = 24000
    audio_from_waveform: bool = True
    compute_dtype: str = "float32"
    # Pallas kernels for STFT / PE-block / MHA (TPU only; jnp elsewhere).
    use_pallas: bool = False
    # Merge inception-block 1x1 fan-out convs at inference (exact math;
    # fills the MXU's 128-wide output lanes — see models/bn_inception.py).
    merge_inception: bool = True
    # A/B switches (benchmarks/infer_ab.py; all measured slower or neutral
    # on v5e — see the field docs on BNInception/InceptionBlock/pooling):
    direct_stem: bool = False
    pool_proj_conv: bool = False
    pool_impl: str = "reduce_window"
    # Custom phase-gather backward for the tower max pools (replaces XLA's
    # select-and-scatter gradient; forward identical — see
    # ops/pooling._max_pool_fast_vjp, incl. the tie-gradient divergence).
    pool_fast_vjp: bool = False
    # Fused Pallas inference stem (conv+BN-fold+ReLU+pool in one VMEM
    # pass, ops/fused_stem.py). TPU eval only; A/B receipt in
    # benchmarks/fused_stem_probe.py.
    fused_stem: bool = False
    # Rematerialize tower activations in the backward pass (jax.checkpoint):
    # trades ~1/3 more FLOPs for large activation-memory savings, enabling
    # bigger train batches.
    remat: bool = False
    # Post-training int8 inference for the BN-Inception towers ("" off,
    # "calibrate" records per-conv-site input amax into quant_stats,
    # "int8" runs s8 convs with the recorded scales). Eval-only; training
    # is unaffected. See layers.conv2d_apply_q and calibrate_quantization.
    quantize: str = ""
    # Average features before the heads instead of logits after them —
    # mathematically identical (consensus commutes with linear heads),
    # N x fewer head FLOPs; off by default for strict logits-mean parity.
    fast_consensus: bool = False
    # Per-modality normalization (applied on device to uint8 inputs; the
    # reference normalizes on the host after /255, transform.py:464-543).
    # RGB mean is BGR-ordered, matching the reference's BGR decode.
    rgb_mean: Tuple[float, ...] = (0.408, 0.459, 0.502)
    rgb_std: Tuple[float, ...] = (1.0, 1.0, 1.0)
    flow_mean: Tuple[float, ...] = (0.502,)
    flow_std: Tuple[float, ...] = (1.0,)

    @classmethod
    def from_config(cls, cfg, modality) -> "TBNSpec":
        att = cfg.model.attention
        return cls(
            modality=tuple(modality),
            arch=cfg.model.arch,
            num_classes=tuple(cfg.model.num_classes.items()),
            attention_enable=bool(att.enable),
            attention_type=att.type,
            use_pe=bool(att.use_pe),
            use_fixed=bool(att.use_fixed),
            use_gumbel=bool(att.use_gumbel),
            attn_heads=int(att.attn_heads),
            attn_dropout=float(att.attn_dropout),
            attn_win=attention_window_size(cfg.data.audio.audio_length),
            audio_dropout=float(cfg.data.audio.dropout),
            audio_stem=(
                ("Audio",)
                if cfg.get_path("model.bninception.audio_stem", False)
                else ()
            ),
            rgb_mean=tuple(cfg.data.rgb.mean),
            rgb_std=tuple(cfg.data.rgb.std),
            flow_mean=tuple(cfg.data.flow.mean),
            flow_std=tuple(cfg.data.flow.std),
            fusion_dropout=float(cfg.model.fusion_dropout),
            resnet_depth=int(cfg.model.resnet.depth),
            vgg_type=str(cfg.model.vgg.type),
            flow_win_length=int(cfg.data.flow.win_length),
            spec_type=cfg.data.audio.spec_type,
            sampling_rate=int(cfg.data.audio.sampling_rate),
            compute_dtype=cfg.get_path("tpu.compute_dtype", "float32") or "float32",
            use_pallas=bool(cfg.get_path("tpu.use_pallas", False)),
            merge_inception=bool(cfg.get_path("tpu.merge_inception", True)),
            direct_stem=bool(cfg.get_path("tpu.direct_stem", False)),
            pool_proj_conv=bool(cfg.get_path("tpu.pool_proj_conv", False)),
            pool_impl=str(
                cfg.get_path("tpu.pool_impl", "reduce_window") or "reduce_window"
            ),
            pool_fast_vjp=bool(cfg.get_path("tpu.pool_fast_vjp", False)),
            fused_stem=bool(cfg.get_path("tpu.fused_stem", False)),
            fast_consensus=bool(cfg.get_path("tpu.fast_consensus", False)),
            remat=bool(cfg.get_path("tpu.remat", False)),
            quantize=str(cfg.get_path("tpu.quantize", "") or ""),
        )

    @property
    def multimodal(self) -> bool:
        return len(self.modality) > 1

    @property
    def audio_attends(self) -> bool:
        """Audio tower keeps its temporal axis (freq-only pooling)."""
        return "Audio" in self.modality and self.attention_enable

    def validate(self) -> None:
        if (
            self.attention_enable
            and not self.use_fixed
            and self.modality == ("Audio",)
        ):
            raise ValueError(
                "learned attention needs a visual query modality; "
                "audio-only supports attention.use_fixed only"
            )
        if (
            self.attention_enable
            and "Audio" in self.modality
            and self.arch != "bninception"
        ):
            # only the BN-Inception audio tower keeps its temporal axis
            # (frequency-only pooling); same constraint as the reference
            # (bn_inception.py:16-35 — resnet/vgg towers always global-pool)
            raise ValueError(
                "audio attention requires arch=bninception "
                "(resnet/vgg towers have no temporal feature axis)"
            )
        if self.attention_enable and self.attention_type not in (
            "mha",
            "unimodal",
            "proto",
        ):
            raise ValueError(f"Unknown attention type {self.attention_type!r}")
        from ..ops.pooling import POOL_IMPLS

        if self.pool_impl not in POOL_IMPLS:
            # without this a typo'd tpu.pool_impl would silently fall
            # through max_pool2d's impl dispatch to reduce_window and an
            # A/B run would report baseline numbers under the wrong label
            raise ValueError(
                f"Unknown pool_impl {self.pool_impl!r}; expected one of "
                f"{POOL_IMPLS}"
            )
        if self.quantize not in ("", "calibrate", "int8"):
            raise ValueError(f"Unknown quantize mode {self.quantize!r}")
        if self.quantize:
            if self.arch != "bninception":
                raise ValueError("tpu.quantize supports arch=bninception only")
            if not self.merge_inception:
                raise ValueError(
                    "tpu.quantize requires the merged inception lowering "
                    "(tpu.merge_inception=true)"
                )


class TBNModel(nn.Module):
    spec: TBNSpec

    @property
    def dtype(self):
        return jnp.bfloat16 if self.spec.compute_dtype == "bfloat16" else jnp.float32

    def feature_size(self, modality: str) -> int:
        if self.spec.arch == "bninception":
            return 1024
        if self.spec.arch == "resnet":
            from .resnet import RESNET_CONFIGS

            return 512 * RESNET_CONFIGS[self.spec.resnet_depth][2]
        return 4096

    @property
    def pallas_active(self) -> bool:
        # TPU only (the kernels use pltpu VMEM block specs): any other
        # backend — cpu, gpu — takes the jnp composition.
        return self.spec.use_pallas and jax.default_backend() == "tpu"

    def _make_tower(self, modality: str) -> nn.Module:
        name = f"Base_{modality}"
        dtype = self.dtype
        if self.spec.arch == "bninception":
            cls = BNInception
            kwargs = dict(
                freq_pool_only=(modality == "Audio" and self.spec.audio_attends),
                audio_stem=(modality in self.spec.audio_stem),
                merge_1x1=self.spec.merge_inception,
                direct_stem=self.spec.direct_stem,
                pool_proj_conv=self.spec.pool_proj_conv,
                pool_impl=self.spec.pool_impl,
                pool_fast_vjp=self.spec.pool_fast_vjp,
                quantize=self.spec.quantize,
                # TPU-only like the attention kernels (pallas_active)
                fused_stem=self.spec.fused_stem
                and jax.default_backend() == "tpu",
                dtype=dtype,
            )
        elif self.spec.arch == "resnet":
            cls = ResNet
            kwargs = dict(depth=self.spec.resnet_depth, dtype=dtype)
        elif self.spec.arch == "vgg":
            cls = VGG
            kwargs = dict(vgg_type=self.spec.vgg_type, dtype=dtype)
        else:
            raise ValueError(f"Unknown arch {self.spec.arch!r}")
        if self.spec.remat:
            # rematerialize the tower in the backward pass. Static args
            # (positional, module included): the train flag at index 2,
            # plus BNInception's input_packed bool at index 6 — the call
            # site passes the tower args POSITIONALLY because nn.remat's
            # static_argnums cannot reach keyword args (a traced
            # input_packed raises TracerBoolConversionError).
            static = (2, 6) if cls is BNInception else (2,)
            cls = nn.remat(cls, static_argnums=static)
        return cls(name=name, **kwargs)

    @nn.compact
    def __call__(
        self,
        batch: Mapping[str, jnp.ndarray],
        train: bool = False,
        true_batch: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """``true_batch``: traced scalar, the true (unpadded) batch size.
        When the loader padded the batch to the mesh size (data/loader.py),
        pad rows are excluded from live BatchNorm statistics so they cannot
        perturb the real rows' normalization or the running stats — BN is
        the only cross-row coupling in the network (GroupNorm, softmax and
        dropout are per-sample). The loss applies the same mask
        (models/losses.tbn_loss)."""
        spec = self.spec
        spec.validate()
        dtype = self.dtype
        features = []
        att_wts = None

        for m_no, m in enumerate(spec.modality):
            x = batch[m]
            if m == "Audio" and spec.audio_from_waveform and x.ndim == 3:
                b, n, length = x.shape
                spec_img = spectrogram(
                    x.reshape(b * n, length),
                    spec_type=spec.spec_type,
                    sr=spec.sampling_rate,
                    compute_dtype=dtype,
                )
                x = spec_img[..., None]  # (B*N, F, T, 1)
            else:
                b, n = x.shape[0], x.shape[1]
                x = x.reshape((b * n,) + x.shape[2:])

            norm_kw = {}
            if (
                m in ("RGB", "Flow")
                and x.dtype == jnp.uint8
                and spec.arch == "bninception"
            ):
                # keep x uint8; the stem conv normalizes after its pure
                # reshapes (avoids layout copies — layers.TorchConv).
                # The loader may deliver the stream ALREADY column-paired
                # ((B, N, H, W/2, 2C), a free numpy reshape on the host) —
                # then the device graph starts at the packed shape and the
                # input chain costs one fused normalize instead of ~3 ms
                # of reshape/relayout copies (data/loader.py pack_visual).
                base_ch = 3 if m == "RGB" else 2 * spec.flow_win_length
                if x.shape[-1] == 2 * base_ch and spec.direct_stem:
                    # direct-stem A/B with a host-packed stream: unpack
                    # (B*N, H, W/2, 2C) -> (B*N, H, W, C) — a pure view in
                    # (..., W, C) memory order — so the direct 7x7 conv
                    # sees the real image (otherwise input_packed would
                    # silently override the A/B and both arms measure the
                    # packed stem)
                    x = x.reshape(x.shape[:-2] + (x.shape[-2] * 2, base_ch))
                norm_kw = self._norm_affine(m, x.shape[-1])
                if x.shape[-1] == 2 * base_ch:
                    norm_kw["input_packed"] = True
            elif m in ("RGB", "Flow") and x.dtype == jnp.uint8:
                x = self._normalize(m, x)

            # 0/1 weight per folded (sample, segment) row — rows are
            # batch-major, so row r belongs to sample r // n
            row_mask = None
            if true_batch is not None and train:
                row_mask = jnp.repeat(
                    (jnp.arange(b) < jnp.asarray(true_batch)).astype(jnp.float32),
                    x.shape[0] // b,
                )

            tower = self._make_tower(m)
            # all-positional tower call: nn.remat static_argnums counts
            # positional args ((module, x, train, ...) -> train at 2,
            # BNInception's input_packed at 6), so the static bools must
            # not travel as keywords
            if spec.arch == "bninception":
                feature = tower(
                    x if norm_kw else x.astype(dtype),
                    train,
                    row_mask,
                    norm_kw.get("input_scale"),
                    norm_kw.get("input_offset"),
                    bool(norm_kw.get("input_packed", False)),
                )
            else:
                feature = tower(x.astype(dtype), train, row_mask)

            if m == "Audio":
                feature = self._audio_feature(batch, features, feature, b, n, train)
                if isinstance(feature, tuple):
                    feature, att_wts = feature
                # 10-crop eval: visual streams carry 10x rows per segment;
                # broadcast each (sample, segment) audio feature to its crop
                # rows so Fusion pairs matching segments (tile_crop_rows; the
                # learned-attention paths already pre-tiled the sequence
                # inside _attend, in which case shapes match and this no-ops).
                if m_no > 0 and features and features[0].shape[0] > feature.shape[0]:
                    reps = features[0].shape[0] // feature.shape[0]
                    feature = tile_crop_rows(feature, b, reps)

            features.append(feature)

        # Consensus count follows the first modality's stream count — with
        # 10-crop eval the audio feature was tiled up to match
        # (reference model.py:243-248 adjusts n the same way).
        n_consensus = features[0].shape[0] // b

        fused = jnp.concatenate(features, axis=-1)
        if spec.multimodal:
            fused = Fusion(512, dropout=spec.fusion_dropout, dtype=dtype, name="fusion")(
                fused, train=train
            )

        out: Dict[str, jnp.ndarray] = {}
        if spec.fast_consensus:
            # Consensus commutes with the linear heads: average the fused
            # features over segments first (N x fewer head FLOPs, same math).
            pooled = (
                fused.reshape(b, n_consensus, -1).astype(jnp.float32).mean(axis=1)
            ).astype(dtype)
            logits = Classifier(
                dict(spec.num_classes), dtype=dtype, name="classifier"
            )(pooled)
            for key, value in logits.items():
                out[key] = value.astype(jnp.float32)
        else:
            logits = Classifier(
                dict(spec.num_classes), dtype=dtype, name="classifier"
            )(fused)
            for key, value in logits.items():
                out[key] = (
                    value.reshape(b, n_consensus, -1).astype(jnp.float32).mean(axis=1)
                )

        if spec.attention_enable and not spec.use_fixed and att_wts is not None:
            out["weights"] = att_wts
        return out

    def _norm_affine(self, modality: str, channels: int) -> Dict[str, jnp.ndarray]:
        """Per-channel (scale, offset) with (v/255 - mean)/std == v*scale +
        offset, for normalizing inside the tower stem. Mean/std repeat
        across flow-stack channels like _normalize."""
        spec = self.spec
        mean = spec.rgb_mean if modality == "RGB" else spec.flow_mean
        std = spec.rgb_std if modality == "RGB" else spec.flow_std
        reps = channels // len(mean)
        mean = jnp.asarray(mean * reps, dtype=jnp.float32)
        std = jnp.asarray(std * reps, dtype=jnp.float32)
        return dict(
            input_scale=1.0 / (255.0 * std), input_offset=-mean / std
        )

    def _normalize(self, modality: str, x: jnp.ndarray) -> jnp.ndarray:
        """uint8 -> float/255 - mean / std on device (fused into the tower's
        first conv by XLA). Mean/std repeat across flow-stack channels like
        the reference Normalize (transform.py:533-536)."""
        spec = self.spec
        mean = spec.rgb_mean if modality == "RGB" else spec.flow_mean
        std = spec.rgb_std if modality == "RGB" else spec.flow_std
        channels = x.shape[-1]
        reps = channels // len(mean)
        mean = jnp.asarray(mean * reps, dtype=self.dtype)
        std = jnp.asarray(std * reps, dtype=self.dtype)
        return (x.astype(self.dtype) / 255.0 - mean) / std

    def _audio_feature(self, batch, features, feature, b, n, train):
        """Audio post-tower path: dropout / fixed weighting / attention."""
        spec = self.spec

        if train and spec.multimodal and spec.audio_dropout > 0:
            # One scalar draw per step zeroes the whole audio feature
            # (reference model.py:216-222 draws np.random.uniform() > p as
            # the DROP condition — p is effectively the keep probability;
            # that counterintuitive polarity is reproduced exactly. The
            # data-dependent branch becomes a traced select here).
            # With learned attention the reference's branch is exclusive:
            # a dropped step never assigns att_wts and model.py:259-260
            # NameErrors — the combination is untrainable there. Here the
            # attention weights are still produced (and keep feeding the
            # aux losses) while the fused feature is zeroed; PARITY.md
            # item 13.
            u = jax.random.uniform(self.make_rng("audio_dropout"), ())
            drop = u > spec.audio_dropout
            attended = self._attend(batch, features, feature, b, n, train)
            if isinstance(attended, tuple):
                attended, att_wts = attended
                return jnp.where(drop, jnp.zeros_like(attended), attended), att_wts
            return jnp.where(drop, jnp.zeros_like(attended), attended)

        return self._attend(batch, features, feature, b, n, train)

    def _attend(self, batch, features, feature, b, n, train):
        spec = self.spec
        dtype = self.dtype

        if not spec.attention_enable:
            return feature  # already globally pooled (B*N, C)

        if spec.use_fixed:
            # feature (B*N, T, C); weights (B, N, W, 1) -> (B*N, W)
            weights = batch["weights"].reshape(feature.shape[0], -1).astype(dtype)
            return jnp.einsum(
                "btc,bt->bc", feature, weights, preferred_element_type=jnp.float32
            ).astype(dtype)

        query = features[0]
        if query.shape[0] > feature.shape[0]:
            # 10-crop eval with learned attention: the reference's
            # corresponding path is dormant (the row mismatch would crash
            # torch MHA before its repeat at model.py:243-248 runs); here
            # each crop row queries its own segment's audio window by
            # tiling the sequence crop-major first.
            feature = tile_crop_rows(feature, b, query.shape[0] // feature.shape[0])
        if spec.attention_type == "mha":
            if spec.use_pe:
                seq = PositionalEncoding(
                    dim_size=10,
                    max_len=spec.attn_win,
                    out_features=1024,
                    dtype=dtype,
                    use_pallas=self.pallas_active,
                    name="pe",
                )(feature, train=train)
            else:
                # use_pe=false feeds the raw (B*N, T, 1024) tower feature to
                # MHA. Documented divergence: the reference constructs no
                # ``pe`` module in this configuration (model.py:63-67) but
                # still calls it in forward (model.py:230) — an
                # AttributeError crash, so there is no torch behavior to
                # match; skipping the block is the usable semantics.
                seq = feature
            out, wts = MultiheadAttention(
                embed_dim=1024,
                num_heads=spec.attn_heads,
                dropout_rate=spec.attn_dropout,
                dtype=dtype,
                use_pallas=self.pallas_active,
                name="attention_layer",
            )(query[:, None, :], seq, seq, train=train)
            return out[:, 0, :], wts  # (B*N, C), (B*N, 1, S)
        if spec.attention_type == "unimodal":
            return UniModalAttention(
                win_size=spec.attn_win,
                use_gumbel=spec.use_gumbel,
                dtype=dtype,
                name="attention_layer",
            )(query, feature, train=train)
        if spec.attention_type == "proto":
            return PrototypeAttention(
                win_size=spec.attn_win,
                use_gumbel=spec.use_gumbel,
                dtype=dtype,
                name="attention_layer",
            )(query, feature, train=train)
        raise ValueError(f"Unknown attention type {spec.attention_type!r}")


def calibrate_quantization(spec: TBNSpec, variables, batches) -> dict:
    """Post-training-quantization calibration pass (tpu.quantize=int8).

    Runs the EXACT bf16/fp32 inference forward over ``batches`` (an
    iterable of input dicts) while recording each conv site's input
    amax into a ``quant_stats`` collection (running max across batches).
    Returns ``variables`` with quant_stats attached; inference with
    ``spec.quantize="int8"`` then uses the recorded per-tensor scales.

    Calibration outputs equal the unquantized eval forward up to
    compile-level fusion rounding (~1e-7 — the observer only reads
    activations, but its amax reductions change XLA's fusion choices), so
    a calibration sweep doubles as a plain evaluation pass.
    """
    cal_model = TBNModel(dataclasses.replace(spec, quantize="calibrate"))

    @jax.jit
    def step(variables, batch):
        _, mutated = cal_model.apply(
            variables, batch, train=False, mutable=["quant_stats"]
        )
        return mutated["quant_stats"]

    batches = list(batches)
    if not batches:
        raise ValueError("calibration needs at least one batch")
    if "quant_stats" not in variables:
        # seed zeroed quant_stats abstractly so every step() call sees the
        # same pytree structure — otherwise the first (stats-absent) call
        # and the rest compile two separate flagship programs
        shapes = jax.eval_shape(step, variables, batches[0])
        variables = {
            **variables,
            "quant_stats": jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes
            ),
        }
    for batch in batches:
        stats = step(variables, batch)
        variables = {**variables, "quant_stats": stats}
    return variables
