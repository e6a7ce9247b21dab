"""PyTorch checkpoint -> Flax parameter conversion.

Consumes the weight formats the reference ecosystem produces:

* pretrainedmodels BN-Inception towers (``imagenet_bninception_rgb.pth``,
  ``kinetics_bninception_flow.pth`` — reference weights/download.sh,
  core/models/bn_inception.py:60-101);
* torchvision ResNet/VGG state dicts;
* full reference TBN training checkpoints ({"model": state_dict, ...},
  reference core/utils/misc.py:56-112).

Layout conversions: conv OIHW -> HWIO; linear (out, in) -> (in, out);
Conv1d (out, in, 1) -> (in, out); BN running stats -> ``batch_stats``.
First-conv adaptation for non-RGB modalities channel-means the RGB kernel
(reference bn_inception.py:78-80, resnet.py:26-36) and tiles it across the
new input channels.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


INCEPTION_BRANCHES = (
    "double_3x3_reduce",
    "double_3x3_1",
    "double_3x3_2",
    "3x3_reduce",
    "3x3",
    "pool_proj",
    "1x1",
)

_PARAM_SUFFIXES = (
    ".weight",
    ".bias",
    ".running_mean",
    ".running_var",
    ".num_batches_tracked",
)


def _to_numpy(value) -> np.ndarray:
    if hasattr(value, "detach"):
        value = value.detach().cpu().numpy()
    return np.asarray(value)


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(_to_numpy(w), (2, 3, 1, 0)).copy()  # OIHW -> HWIO


def _linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(_to_numpy(w)).copy()  # (out, in) -> (in, out)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value.astype(np.float32)


def _split_inception_name(name: str) -> Optional[Tuple[str, str]]:
    """'inception_3a_double_3x3_1' -> ('inception_3a', 'double_3x3_1')."""
    match = re.match(r"(inception_\d[a-e])_(.+)", name)
    if not match:
        return None
    return match.group(1), match.group(2)


def convert_bninception(
    state_dict: Mapping[str, Any],
) -> Tuple[Dict, Dict]:
    """pretrainedmodels BN-Inception state dict -> (params, batch_stats)."""
    params: Dict = {}
    stats: Dict = {}

    for key, value in state_dict.items():
        if key.startswith("last_linear") or key.endswith("num_batches_tracked"):
            continue
        module, _, leaf = key.rpartition(".")
        is_bn = module.endswith("_bn")
        base = module[: -len("_bn")] if is_bn else module

        split = _split_inception_name(base)
        if split:
            path_prefix: Tuple[str, ...] = split
        else:
            path_prefix = (base,)

        if is_bn:
            if leaf == "weight":
                _set(params, path_prefix + ("bn", "scale"), _to_numpy(value))
            elif leaf == "bias":
                _set(params, path_prefix + ("bn", "bias"), _to_numpy(value))
            elif leaf == "running_mean":
                _set(stats, path_prefix + ("bn", "mean"), _to_numpy(value))
            elif leaf == "running_var":
                _set(stats, path_prefix + ("bn", "var"), _to_numpy(value))
        else:
            if leaf == "weight":
                _set(params, path_prefix + ("conv", "kernel"), _conv_kernel(value))
            elif leaf == "bias":
                _set(params, path_prefix + ("conv", "bias"), _to_numpy(value))

    return params, stats


def adapt_first_conv_at(params: Dict, path: Tuple[str, ...], in_channels: int) -> Dict:
    """Channel-mean the first conv kernel at ``path`` (ending in the module
    holding "kernel") and tile to ``in_channels`` — TSN cross-modality init
    (reference bn_inception.py:78-80; resnet.py:27-36 takes the same mean
    but assigns it un-tiled, which only works for in_channels=1 — tiling
    makes Flow stacks work too; vgg.py:25-31 leaves the new conv randomly
    initialized — the mean-tile is applied uniformly here)."""
    node = params
    for key in path:
        node = node[key]
    kernel = node["kernel"]  # (H, W, I, O)
    mean = kernel.mean(axis=2, keepdims=True)
    node["kernel"] = np.tile(mean, (1, 1, in_channels, 1)).astype(np.float32)
    return params


def adapt_first_conv(params: Dict, in_channels: int, conv_name: str = "conv1_7x7_s2") -> Dict:
    """BN-Inception first-conv adaptation (see adapt_first_conv_at)."""
    return adapt_first_conv_at(params, (conv_name, "conv"), in_channels)


def convert_resnet(state_dict: Mapping[str, Any]) -> Tuple[Dict, Dict]:
    """torchvision ResNet state dict -> (params, batch_stats)."""
    params: Dict = {}
    stats: Dict = {}

    def put(module_path: Tuple[str, ...], kind: str, leaf: str, value):
        if kind == "conv":
            if leaf == "weight":
                _set(params, module_path + ("kernel",), _conv_kernel(value))
            elif leaf == "bias":
                _set(params, module_path + ("bias",), _to_numpy(value))
        else:  # bn
            if leaf == "weight":
                _set(params, module_path + ("scale",), _to_numpy(value))
            elif leaf == "bias":
                _set(params, module_path + ("bias",), _to_numpy(value))
            elif leaf == "running_mean":
                _set(stats, module_path + ("mean",), _to_numpy(value))
            elif leaf == "running_var":
                _set(stats, module_path + ("var",), _to_numpy(value))

    for key, value in state_dict.items():
        if key.startswith("fc.") or key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        if parts[0] in ("conv1", "bn1"):
            kind = "conv" if parts[0] == "conv1" else "bn"
            put((parts[0],), kind, parts[1], value)
        elif parts[0].startswith("layer"):
            block = f"{parts[0]}_{parts[1]}"
            if parts[2] == "downsample":
                sub = "downsample_conv" if parts[3] == "0" else "downsample_bn"
                kind = "conv" if parts[3] == "0" else "bn"
                put((block, sub), kind, parts[4], value)
            else:
                kind = "conv" if parts[2].startswith("conv") else "bn"
                put((block, parts[2]), kind, parts[3], value)

    return params, stats


def vgg_conv_feature_indices(vgg_type: str, batch_norm: bool) -> Dict[int, int]:
    """torchvision features.<idx> -> our conv<i> index map."""
    from .vgg import VGG_CONFIGS, vgg_base_type

    cfg = VGG_CONFIGS[vgg_base_type(vgg_type)]
    mapping = {}
    feat_idx = 0
    conv_idx = 0
    for item in cfg:
        if item == "M":
            feat_idx += 1
        else:
            mapping[feat_idx] = conv_idx
            feat_idx += 2 if not batch_norm else 3  # conv(+bn)+relu
            conv_idx += 1
    return mapping


def convert_vgg(state_dict: Mapping[str, Any], vgg_type: str = "16") -> Tuple[Dict, Dict]:
    """torchvision VGG state dict -> (params, batch_stats)."""
    batch_norm = vgg_type.endswith("bn") or any(
        ".running_mean" in k for k in state_dict
    )
    conv_map = vgg_conv_feature_indices(vgg_type, batch_norm)
    bn_map = {feat + 1: conv for feat, conv in conv_map.items()}

    params: Dict = {}
    stats: Dict = {}
    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        if parts[0] == "features":
            idx, leaf = int(parts[1]), parts[2]
            if idx in conv_map:
                name = f"conv{conv_map[idx]}"
                if leaf == "weight":
                    _set(params, (name, "kernel"), _conv_kernel(value))
                else:
                    _set(params, (name, "bias"), _to_numpy(value))
            elif batch_norm and idx in bn_map:
                name = f"bn{bn_map[idx]}"
                if leaf == "weight":
                    _set(params, (name, "scale"), _to_numpy(value))
                elif leaf == "bias":
                    _set(params, (name, "bias"), _to_numpy(value))
                elif leaf == "running_mean":
                    _set(stats, (name, "mean"), _to_numpy(value))
                elif leaf == "running_var":
                    _set(stats, (name, "var"), _to_numpy(value))
        elif parts[0] == "classifier":
            idx, leaf = int(parts[1]), parts[2]
            if idx == 0:
                name = "fc1"
            elif idx == 3:
                name = "fc2"
            else:
                continue  # final linear stripped (reference vgg.py:34-36)
            if leaf == "weight":
                _set(params, (name, "kernel"), _linear_kernel(value))
            else:
                _set(params, (name, "bias"), _to_numpy(value))

    return params, stats


def convert_tbn_checkpoint(
    state_dict: Mapping[str, Any], arch: str = "bninception", vgg_type: str = "16"
) -> Tuple[Dict, Dict]:
    """Full reference TBNModel state dict -> (params, batch_stats).

    Handles tower weights (Base_<modality>.*), PE block (pe.0/1/2), attention
    layers, fusion and classifier heads (reference model.py:52-101 naming).
    """
    params: Dict = {}
    stats: Dict = {}

    towers: Dict[str, Dict[str, Any]] = {}
    for key, value in state_dict.items():
        if key.startswith("Base_"):
            tower, _, rest = key.partition(".")
            towers.setdefault(tower, {})[rest] = value

    for tower, sub_dict in towers.items():
        # reference Resnet/VGG wrap the torchvision net under ".model"
        stripped = {k[len("model."):] if k.startswith("model.") else k: v
                    for k, v in sub_dict.items()}
        if arch == "bninception":
            t_params, t_stats = convert_bninception(stripped)
        elif arch == "resnet":
            t_params, t_stats = convert_resnet(stripped)
        else:
            t_params, t_stats = convert_vgg(stripped, vgg_type)
        params[tower] = t_params
        if t_stats:
            stats[tower] = t_stats

    for key, value in state_dict.items():
        if key.startswith("Base_"):
            continue
        if key.startswith("fusion.fusion_layer.0."):
            leaf = key.rsplit(".", 1)[1]
            if leaf == "weight":
                _set(params, ("fusion", "fc", "kernel"), _linear_kernel(value))
            else:
                _set(params, ("fusion", "fc", "bias"), _to_numpy(value))
        elif key.startswith("classifier."):
            _, cls, leaf = key.split(".")
            if leaf == "weight":
                _set(params, ("classifier", cls, "kernel"), _linear_kernel(value))
            else:
                _set(params, ("classifier", cls, "bias"), _to_numpy(value))
        elif key.startswith("pe."):
            parts = key.split(".")
            if parts[1] == "0":
                continue  # sin/cos buffer — regenerated
            if parts[1] == "1":  # Conv1d(1034, 1024, 1)
                if parts[2] == "weight":
                    w = _to_numpy(value)[..., 0]  # (out, in)
                    _set(params, ("pe", "conv", "kernel"), w.T)
                else:
                    _set(params, ("pe", "conv", "bias"), _to_numpy(value))
            elif parts[1] == "2":  # GroupNorm(64, 1024)
                leaf = "scale" if parts[2] == "weight" else "bias"
                _set(params, ("pe", "norm", leaf), _to_numpy(value))
        elif key.startswith("attention_layer."):
            rest = key[len("attention_layer."):]
            if rest.startswith("attention_layer."):  # torch MHA wrapper
                leaf = rest[len("attention_layer."):]
                if leaf == "in_proj_weight":
                    w = _to_numpy(value)
                    e = w.shape[0] // 3
                    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
                        _set(
                            params,
                            ("attention_layer", name, "kernel"),
                            w[i * e : (i + 1) * e].T,
                        )
                elif leaf == "in_proj_bias":
                    bias = _to_numpy(value)
                    e = bias.shape[0] // 3
                    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
                        _set(
                            params,
                            ("attention_layer", name, "bias"),
                            bias[i * e : (i + 1) * e],
                        )
                elif leaf == "out_proj.weight":
                    _set(
                        params,
                        ("attention_layer", "out_proj", "kernel"),
                        _linear_kernel(value),
                    )
                elif leaf == "out_proj.bias":
                    _set(params, ("attention_layer", "out_proj", "bias"), _to_numpy(value))
            elif rest.startswith("seq."):  # unimodal/proto MLP
                idx, leaf = rest.split(".")[1:3]
                name = "fc1" if idx == "0" else "fc2"
                if leaf == "weight":
                    _set(
                        params,
                        ("attention_layer", name, "kernel"),
                        _linear_kernel(value),
                    )
                else:
                    _set(params, ("attention_layer", name, "bias"), _to_numpy(value))
            # prototype_wts buffer is regenerated, not loaded

    return params, stats


def load_torch_file(path: str) -> Dict[str, Any]:
    """torch.load a .pth (tower weights or full training checkpoint)."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, dict) and "model" in data and isinstance(data["model"], dict):
        return data["model"]
    return data
