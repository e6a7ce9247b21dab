"""Model construction + pretrained-weight loading.

Equivalent of reference core/models/model_builder.py: validates arch/loss
choices, builds the TBNModel, and loads converted pretrained tower weights
(ImageNet BN-Inception for RGB/Audio — audio conv1 channel-meaned — and
Kinetics BN-Inception for Flow; reference bn_inception.py:38-107).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

from .tbn import TBNModel, TBNSpec

_MODEL_TYPES = ("vgg", "resnet", "bninception")
_LOSS_TYPES = ("crossentropy", "nll", "kl", "mse", "smoothl1")

_IN_CHANNELS = {"RGB": 3, "Audio": 1}


def build_model(cfg, modality: List[str]) -> Tuple[TBNModel, TBNSpec]:
    assert (
        cfg.model.arch in _MODEL_TYPES
    ), f"Model type '{cfg.model.arch}' not supported"
    assert (
        cfg.model.loss_fn in _LOSS_TYPES
    ), f"Loss type '{cfg.model.loss_fn}' not supported"

    spec = TBNSpec.from_config(cfg, modality)
    spec.validate()
    return TBNModel(spec), spec


def _weights_dir(cfg) -> str:
    configured = cfg.get_path("model.weights_dir", "weights") or "weights"
    if os.path.isabs(configured):
        return configured
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    return os.path.join(repo_root, configured)


def load_pretrained_towers(
    cfg, modality: List[str], params: Dict, batch_stats: Dict, logger=None
) -> Tuple[Dict, Dict]:
    """Load converted pretrained weights into each tower, when present.

    Looks for ``imagenet_bninception_rgb.pth`` (RGB/Audio) and
    ``kinetics_bninception_flow.pth`` (Flow) under the weights dir, like the
    reference (bn_inception.py:60-70). Missing files are skipped with a
    warning (this environment cannot download them); random init remains.
    """
    if not cfg.get_path("model.pretrained", True):
        return params, batch_stats
    if cfg.model.arch != "bninception":
        if logger:
            logger.info(
                "Pretrained torchvision weights for resnet/vgg: provide .pth "
                "files and use models.convert; skipping auto-load."
            )
        return params, batch_stats

    from .convert import adapt_first_conv, convert_bninception, load_torch_file

    weights_dir = _weights_dir(cfg)
    stems = {
        "RGB": "imagenet_bninception_rgb",
        "Audio": "imagenet_bninception_rgb",
        "Flow": "kinetics_bninception_flow",
    }

    for m in modality:
        tower = f"Base_{m}"
        stem = os.path.join(weights_dir, stems[m])
        npz_path, pth_path = stem + ".npz", stem + ".pth"
        if os.path.exists(npz_path):
            # pre-converted native weights (models/convert_cli.py) —
            # no torch dependency at train time
            from .convert_cli import load_npz

            t_params, t_stats = load_npz(npz_path)
            loaded = os.path.basename(npz_path)
        elif os.path.exists(pth_path):
            t_params, t_stats = convert_bninception(load_torch_file(pth_path))
            loaded = os.path.basename(pth_path)
        else:
            if logger:
                logger.warning(
                    f"Pretrained weights {stem}.{{npz,pth}} not found; "
                    f"{tower} keeps random init"
                )
            continue
        if m == "Audio" and t_params["conv1_7x7_s2"]["conv"]["kernel"].shape[2] != 1:
            adapt_first_conv(t_params, in_channels=1)
        params[tower] = t_params
        batch_stats[tower] = t_stats
        if logger:
            logger.info(f"{tower} initialized from {loaded}")

    return params, batch_stats
