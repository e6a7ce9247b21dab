"""Flax variables -> reference PyTorch state dicts (the reverse of convert.py).

Closes the migration loop in BOTH directions: a model trained in this
framework can be handed back to the reference PyTorch implementation
(tridivb/attention_based_tbn) — the emitted mapping loads into the
reference ``TBNModel`` with ``strict=True`` (reference
core/models/model.py:52-101 module naming, core/utils/misc.py:92-112
checkpoint layout) and per-tower into pretrainedmodels BN-Inception /
torchvision ResNet / VGG state-dict conventions.

Layout conversions are the exact inverses of ``convert.py``: conv kernels
HWIO -> OIHW, linear kernels (in, out) -> (out, in), ``batch_stats``
mean/var -> BN running_mean/running_var (plus the int64
``num_batches_tracked`` buffers modern torch modules require for strict
loads). Deterministic buffers the forward converter regenerates — the
positional-encoding table (reference attention.py:25-33) and the Gaussian
``prototype_wts`` (attention.py:121-132) — are re-emitted here from the
same parity-tested generators.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np

from .attention import positional_encoding_table
from .convert import vgg_conv_feature_indices

PE_CHANNELS = 10  # reference model.py:64 — PositionalEncoding(10, ...)


def _np(value) -> np.ndarray:
    return np.asarray(value, dtype=np.float32)


def _conv_weight(kernel) -> np.ndarray:
    """HWIO -> OIHW."""
    return np.transpose(_np(kernel), (3, 2, 0, 1)).copy()


def _linear_weight(kernel) -> np.ndarray:
    """(in, out) -> (out, in)."""
    return np.transpose(_np(kernel)).copy()


def _num_batches() -> np.ndarray:
    return np.zeros((), dtype=np.int64)


def _get(tree: Optional[Mapping], *path):
    node = tree
    for key in path:
        if not isinstance(node, Mapping) or key not in node:
            return None
        node = node[key]
    return node


def _bn_stats_or_fresh(bn_stats: Mapping[str, Any], shape) -> tuple:
    """(running_mean, running_var) from the stats node, or a freshly
    constructed torch BatchNorm's defaults (mean 0, var 1) when the caller
    exports params without batch statistics (``stats=None`` — e.g. an
    untrained tree)."""
    if "mean" in bn_stats and "var" in bn_stats:
        return _np(bn_stats["mean"]), _np(bn_stats["var"])
    return (
        np.zeros(shape, dtype=np.float32),
        np.ones(shape, dtype=np.float32),
    )


def _emit_conv_bn_module(
    out: Dict[str, np.ndarray],
    flat_name: str,
    node: Mapping[str, Any],
    stats_node: Optional[Mapping[str, Any]],
) -> None:
    """One {conv: {kernel[, bias]}, bn: {scale, bias}} module -> the
    pretrainedmodels ``<name>.weight`` / ``<name>_bn.*`` key family."""
    conv = node.get("conv")
    if conv is not None:
        out[f"{flat_name}.weight"] = _conv_weight(conv["kernel"])
        if "bias" in conv:
            out[f"{flat_name}.bias"] = _np(conv["bias"])
    bn = node.get("bn")
    if bn is not None:
        out[f"{flat_name}_bn.weight"] = _np(bn["scale"])
        out[f"{flat_name}_bn.bias"] = _np(bn["bias"])
        bn_stats = _get(stats_node, "bn") or {}
        mean, var = _bn_stats_or_fresh(bn_stats, _np(bn["scale"]).shape)
        out[f"{flat_name}_bn.running_mean"] = mean
        out[f"{flat_name}_bn.running_var"] = var
        out[f"{flat_name}_bn.num_batches_tracked"] = _num_batches()


def export_bninception(
    params: Mapping[str, Any], stats: Optional[Mapping[str, Any]] = None
) -> Dict[str, np.ndarray]:
    """(params, batch_stats) -> pretrainedmodels-style BN-Inception state
    dict (inverse of ``convert.convert_bninception``). Handles both the
    7x7 stem and the two-branch audio stem (conv1_1x3_s2 / conv1_3x1_s2,
    reference bn_inception_audio.py:11-23) — the naming is generic."""
    out: Dict[str, np.ndarray] = {}
    for name, node in params.items():
        stats_node = _get(stats, name)
        if "conv" in node or "bn" in node:
            _emit_conv_bn_module(out, name, node, stats_node)
        else:  # inception block: children are branch modules
            for branch, sub in node.items():
                _emit_conv_bn_module(
                    out, f"{name}_{branch}", sub, _get(stats_node, branch)
                )
    return out


def _emit_bn(
    out: Dict[str, np.ndarray],
    key: str,
    node: Mapping[str, Any],
    stats_node: Optional[Mapping[str, Any]],
) -> None:
    out[f"{key}.weight"] = _np(node["scale"])
    out[f"{key}.bias"] = _np(node["bias"])
    mean, var = _bn_stats_or_fresh(stats_node or {}, _np(node["scale"]).shape)
    out[f"{key}.running_mean"] = mean
    out[f"{key}.running_var"] = var
    out[f"{key}.num_batches_tracked"] = _num_batches()


def _emit_conv(out: Dict[str, np.ndarray], key: str, node: Mapping[str, Any]) -> None:
    out[f"{key}.weight"] = _conv_weight(node["kernel"])
    if "bias" in node:
        out[f"{key}.bias"] = _np(node["bias"])


def export_resnet(
    params: Mapping[str, Any], stats: Optional[Mapping[str, Any]] = None
) -> Dict[str, np.ndarray]:
    """(params, batch_stats) -> torchvision ResNet state dict (inverse of
    ``convert.convert_resnet``; the stripped ``fc`` head is not emitted —
    the reference deletes it too, resnet.py:38-41)."""
    out: Dict[str, np.ndarray] = {}
    for name, node in params.items():
        stats_node = _get(stats, name)
        if name == "conv1":
            _emit_conv(out, "conv1", node)
        elif name == "bn1":
            _emit_bn(out, "bn1", node, stats_node)
        elif name.startswith("layer"):
            layer, block = name.rsplit("_", 1)
            prefix = f"{layer}.{block}"
            for sub, sub_node in node.items():
                sub_stats = _get(stats_node, sub)
                if sub == "downsample_conv":
                    _emit_conv(out, f"{prefix}.downsample.0", sub_node)
                elif sub == "downsample_bn":
                    _emit_bn(out, f"{prefix}.downsample.1", sub_node, sub_stats)
                elif sub.startswith("conv"):
                    _emit_conv(out, f"{prefix}.{sub}", sub_node)
                else:  # bn1/bn2/bn3
                    _emit_bn(out, f"{prefix}.{sub}", sub_node, sub_stats)
    return out


def export_vgg(
    params: Mapping[str, Any],
    stats: Optional[Mapping[str, Any]] = None,
    vgg_type: str = "16",
) -> Dict[str, np.ndarray]:
    """(params, batch_stats) -> torchvision VGG state dict (inverse of
    ``convert.convert_vgg``; the stripped final classifier linear is not
    emitted — reference vgg.py:34-36)."""
    batch_norm = vgg_type.endswith("bn") or bool(stats)
    conv_map = vgg_conv_feature_indices(vgg_type, batch_norm)
    feat_of_conv = {conv: feat for feat, conv in conv_map.items()}

    out: Dict[str, np.ndarray] = {}
    for name, node in params.items():
        stats_node = _get(stats, name)
        if name.startswith("conv"):
            feat = feat_of_conv[int(name[len("conv"):])]
            out[f"features.{feat}.weight"] = _conv_weight(node["kernel"])
            if "bias" in node:
                out[f"features.{feat}.bias"] = _np(node["bias"])
        elif name.startswith("bn"):
            feat = feat_of_conv[int(name[len("bn"):])] + 1
            _emit_bn(out, f"features.{feat}", node, stats_node)
        elif name == "fc1":
            out["classifier.0.weight"] = _linear_weight(node["kernel"])
            out["classifier.0.bias"] = _np(node["bias"])
        elif name == "fc2":
            out["classifier.3.weight"] = _linear_weight(node["kernel"])
            out["classifier.3.bias"] = _np(node["bias"])
    return out


_TOWER_EXPORTERS = {
    "bninception": export_bninception,
    "resnet": export_resnet,
    "vgg": export_vgg,
}


def export_tbn_state_dict(variables: Mapping[str, Any], spec) -> Dict[str, np.ndarray]:
    """Full Flax TBN variables -> reference ``TBNModel.state_dict()``
    mapping (inverse of ``convert.convert_tbn_checkpoint``).

    ``spec`` is the model's :class:`~.tbn.TBNSpec`; it supplies the tower
    arch, attention type and window needed to place keys and regenerate the
    ``pe.0.pe`` / ``prototype_wts`` buffers. The result loads with
    ``strict=True`` into a reference ``TBNModel`` built from the matching
    config (verified against the verbatim reference modules in
    tests/test_convert_back.py)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}

    for tower, node in params.items():
        if not tower.startswith("Base_"):
            continue
        if spec.arch == "vgg":
            tower_sd = export_vgg(node, _get(stats, tower), vgg_type=spec.vgg_type)
        else:
            tower_sd = _TOWER_EXPORTERS[spec.arch](node, _get(stats, tower))
        # reference Resnet/VGG wrap the torchvision net under ".model"
        # (resnet.py:12, vgg.py:12); BN-Inception subclasses directly
        prefix = f"{tower}." if spec.arch == "bninception" else f"{tower}.model."
        out.update({prefix + k: v for k, v in tower_sd.items()})

    fusion = _get(params, "fusion", "fc")
    if fusion is not None:
        out["fusion.fusion_layer.0.weight"] = _linear_weight(fusion["kernel"])
        out["fusion.fusion_layer.0.bias"] = _np(fusion["bias"])

    for cls, node in _get(params, "classifier").items():
        out[f"classifier.{cls}.weight"] = _linear_weight(node["kernel"])
        out[f"classifier.{cls}.bias"] = _np(node["bias"])

    pe = _get(params, "pe")
    if pe is not None:
        # buffer: (max_len, dim) table -> (1, dim, max_len)
        # (reference attention.py:25-33 registers it transposed)
        table = positional_encoding_table(PE_CHANNELS, spec.attn_win)
        out["pe.0.pe"] = np.ascontiguousarray(table.T)[None]
        # Conv1d(1034, 1024, 1): our (in, out) -> torch (out, in, 1)
        out["pe.1.weight"] = _linear_weight(pe["conv"]["kernel"])[..., None]
        out["pe.1.bias"] = _np(pe["conv"]["bias"])
        out["pe.2.weight"] = _np(pe["norm"]["scale"])
        out["pe.2.bias"] = _np(pe["norm"]["bias"])

    attn = _get(params, "attention_layer")
    if attn is not None:
        if spec.attention_type == "mha":
            # torch MultiheadAttention packs q/k/v row-wise into in_proj
            out["attention_layer.attention_layer.in_proj_weight"] = np.concatenate(
                [
                    _linear_weight(attn[name]["kernel"])
                    for name in ("q_proj", "k_proj", "v_proj")
                ],
                axis=0,
            )
            out["attention_layer.attention_layer.in_proj_bias"] = np.concatenate(
                [_np(attn[name]["bias"]) for name in ("q_proj", "k_proj", "v_proj")]
            )
            out["attention_layer.attention_layer.out_proj.weight"] = _linear_weight(
                attn["out_proj"]["kernel"]
            )
            out["attention_layer.attention_layer.out_proj.bias"] = _np(
                attn["out_proj"]["bias"]
            )
        else:  # unimodal / proto MLP: Sequential(Linear, ReLU, Linear)
            out["attention_layer.seq.0.weight"] = _linear_weight(attn["fc1"]["kernel"])
            out["attention_layer.seq.0.bias"] = _np(attn["fc1"]["bias"])
            out["attention_layer.seq.2.weight"] = _linear_weight(attn["fc2"]["kernel"])
            out["attention_layer.seq.2.bias"] = _np(attn["fc2"]["bias"])
            if spec.attention_type == "proto":
                from .attention import PrototypeAttention

                out["attention_layer.prototype_wts"] = PrototypeAttention(
                    win_size=spec.attn_win
                ).prototypes()

    return out


def save_reference_checkpoint(
    path: str,
    variables: Mapping[str, Any],
    spec,
    epoch: int = 0,
    train_loss_hist: Optional[list] = None,
    val_loss_hist: Optional[list] = None,
    val_acc_hist: Optional[list] = None,
) -> Dict[str, Any]:
    """Write a reference-format ``.pth`` training checkpoint (the dict
    layout of reference core/utils/misc.py:92-112, minus optimizer state —
    optax state has no torch counterpart). The file loads directly in the
    reference's eval path (core/tools/test.py:128-133 reads
    ``data_dict["model"]``) and in this framework's ``test.pre_trained``
    importer (``convert.convert_tbn_checkpoint``)."""
    import torch

    state_dict = export_tbn_state_dict(variables, spec)
    data = {
        "epoch": int(epoch),
        "train_loss": train_loss_hist or [],
        "validation_loss": val_loss_hist or [],
        "validation_accuracy": val_acc_hist or [],
        "optimizer": {},
        "model": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state_dict.items()},
    }
    torch.save(data, path)
    return data


def main():
    """CLI: Orbax training checkpoint -> reference-format ``.pth``.

    Usage (same dot-override config surface as main.py; the checkpoint
    path rides the standard ``test.pre_trained`` key)::

        python -m attention_based_tbn_tpu.models.convert_back \\
            --output tbn_reference.pth \\
            test.pre_trained=/runs/.../checkpoints/epoch_29 \\
            model.attention.type=mha data.audio.audio_length=2.1

    The model config must match the training run (it determines the key
    layout and the regenerated PE / prototype buffers).
    """
    import argparse
    import sys

    parser = argparse.ArgumentParser(
        description="Export an Orbax checkpoint as a reference PyTorch .pth"
    )
    parser.add_argument("--output", required=True, help="destination .pth path")
    args, overrides = parser.parse_known_args()

    from ..config import load_config
    from ..utils.checkpoint import restore_for_eval
    from ..utils.misc import get_modality

    cfg = load_config(overrides=overrides)
    if not cfg.test.pre_trained:
        raise SystemExit("set test.pre_trained=<orbax checkpoint dir>")
    if str(cfg.test.pre_trained).endswith(".pth"):
        raise SystemExit(
            "test.pre_trained is already a torch checkpoint — nothing to export"
        )

    modality = get_modality(cfg)
    from .tbn import TBNSpec

    spec = TBNSpec.from_config(cfg, modality)
    params, batch_stats, history = restore_for_eval(cfg.test.pre_trained)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    history = history or {}
    save_reference_checkpoint(
        args.output,
        variables,
        spec,
        epoch=int(history.get("epoch", 0)),
        train_loss_hist=history.get("train_loss"),
        val_loss_hist=history.get("validation_loss"),
        val_acc_hist=history.get("validation_accuracy"),
    )
    print(f"wrote {args.output}", file=sys.stderr)


if __name__ == "__main__":
    main()
