"""Model construction + pretrained-weight loading.

Equivalent of reference core/models/model_builder.py: validates arch/loss
choices, builds the TBNModel, and loads converted pretrained tower weights
(ImageNet BN-Inception for RGB/Audio — audio conv1 channel-meaned — and
Kinetics BN-Inception for Flow; reference bn_inception.py:38-107).
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

from .tbn import TBNModel, TBNSpec

_MODEL_TYPES = ("vgg", "resnet", "bninception")
_LOSS_TYPES = ("crossentropy", "nll", "kl", "mse", "smoothl1")


def build_model(cfg, modality: List[str]) -> Tuple[TBNModel, TBNSpec]:
    assert (
        cfg.model.arch in _MODEL_TYPES
    ), f"Model type '{cfg.model.arch}' not supported"
    assert (
        cfg.model.loss_fn in _LOSS_TYPES
    ), f"Loss type '{cfg.model.loss_fn}' not supported"
    if cfg.model.loss_fn not in ("crossentropy", "nll"):
        # Same names the reference registers (model_builder.py:16-22), but
        # kl/mse/smoothl1 have no integer-label head semantics — the
        # reference itself crashes on them (get_loss hardwires
        # criterion["crossentropy"], core/models/model.py:294). They remain
        # valid as the prior loss via model.attention.wt_loss.
        raise ValueError(
            f"model.loss_fn={cfg.model.loss_fn!r} is a prior-loss "
            "(model.attention.wt_loss) option, not a head loss; use "
            "'crossentropy' or 'nll'"
        )

    spec = TBNSpec.from_config(cfg, modality)
    spec.validate()
    if spec.quantize:
        # The train/test/export drivers run the fp32/bf16 parity paths;
        # quantized inference needs a calibration pass that populates a
        # quant_stats collection the SPMD step functions do not carry
        # (and it measured NEGATIVE on v5e — PERF.md round 3). Fail fast
        # instead of crashing later on the missing collection.
        raise ValueError(
            "tpu.quantize is an opt-in serving mode, not a driver mode: "
            "build the model directly and calibrate via "
            "models.tbn.calibrate_quantization (see benchmarks/infer_ab.py "
            "int8q variant); unset tpu.quantize for train/test/export"
        )
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

    * bninception: ``imagenet_bninception_rgb.{npz,pth}`` (RGB/Audio — audio
      conv1 channel-meaned) and ``kinetics_bninception_flow`` (Flow), like
      the reference (bn_inception.py:60-70).
    * resnet / vgg: torchvision state dicts ``resnet<depth>`` /
      ``vgg<type>`` shared by every modality, first conv channel-mean-tiled
      for Flow/Audio (reference resnet.py:26-36, vgg.py:20-33 — see
      convert.adapt_first_conv_at for the documented divergences).

    Missing files are skipped with a warning (this environment cannot
    download them); random init remains.
    """
    if not cfg.get_path("model.pretrained", True):
        return params, batch_stats

    from .convert import (
        adapt_first_conv_at,
        convert_bninception,
        convert_resnet,
        convert_vgg,
        load_torch_file,
    )

    arch = cfg.model.arch
    weights_dir = _weights_dir(cfg)
    audio_alt_stem = bool(cfg.get_path("model.bninception.audio_stem", False))

    if arch == "bninception":
        stems = {
            "RGB": "imagenet_bninception_rgb",
            "Audio": "imagenet_bninception_rgb",
            "Flow": "kinetics_bninception_flow",
        }
        convert = convert_bninception
        first_conv = ("conv1_7x7_s2", "conv")
    elif arch == "resnet":
        stem_name = f"resnet{int(cfg.model.resnet.depth)}"
        stems = {m: stem_name for m in ("RGB", "Flow", "Audio")}
        convert = convert_resnet
        first_conv = ("conv1",)
    else:  # vgg
        stem_name = f"vgg{cfg.model.vgg.type}"
        stems = {m: stem_name for m in ("RGB", "Flow", "Audio")}
        convert = lambda sd: convert_vgg(sd, str(cfg.model.vgg.type))  # noqa: E731
        first_conv = ("conv0",)

    in_channels = {
        "RGB": 3,
        "Flow": 2 * int(cfg.data.flow.win_length),
        "Audio": 1,
    }

    for m in modality:
        tower = f"Base_{m}"
        if arch == "bninception" and m == "Audio" and audio_alt_stem:
            if logger:
                logger.warning(
                    "model.bninception.audio_stem=true: the (3,1)/(1,3) stem "
                    "has no pretrained counterpart (the reference never loads "
                    "BNInception_Audio either); Base_Audio keeps random init"
                )
            continue
        stem = os.path.join(weights_dir, stems[m])
        npz_path, pth_path = stem + ".npz", stem + ".pth"
        if os.path.exists(npz_path):
            # pre-converted native weights (models/convert_cli.py) —
            # no torch dependency at train time
            from .convert_cli import load_npz

            t_params, t_stats = load_npz(npz_path)
            loaded = os.path.basename(npz_path)
        elif os.path.exists(pth_path):
            t_params, t_stats = convert(load_torch_file(pth_path))
            loaded = os.path.basename(pth_path)
        else:
            if logger:
                logger.warning(
                    f"Pretrained weights {stem}.{{npz,pth}} not found; "
                    f"{tower} keeps random init"
                )
            continue

        node = t_params
        for key in first_conv:
            node = node[key]
        if node["kernel"].shape[2] != in_channels[m]:
            adapt_first_conv_at(t_params, first_conv, in_channels[m])
        params[tower] = t_params
        batch_stats[tower] = t_stats
        if logger:
            logger.info(f"{tower} initialized from {loaded}")

    return params, batch_stats
