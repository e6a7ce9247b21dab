#!/usr/bin/env python
"""CLI: convert reference PyTorch checkpoints to native NHWC .npz weights.

Usage:
  python -m attention_based_tbn_tpu.models.convert_cli \
      --input weights/imagenet_bninception_rgb.pth \
      --kind bninception --output weights/imagenet_bninception_rgb.npz

  python -m attention_based_tbn_tpu.models.convert_cli \
      --input ckpt.pth --kind tbn --arch bninception --output ckpt.npz

The .npz holds flattened "params/<path>" and "batch_stats/<path>" arrays;
``load_npz`` reassembles the trees.
"""

from __future__ import annotations

import argparse
from typing import Dict, Tuple

import numpy as np


def flatten(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for key, value in tree.items():
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(value, dict):
            out.update(flatten(value, path))
        else:
            out[path] = np.asarray(value)
    return out


def unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def save_npz(path: str, params: Dict, batch_stats: Dict) -> None:
    payload = {}
    payload.update({f"params/{k}": v for k, v in flatten(params).items()})
    payload.update({f"batch_stats/{k}": v for k, v in flatten(batch_stats).items()})
    np.savez_compressed(path, **payload)


def load_npz(path: str) -> Tuple[Dict, Dict]:
    with np.load(path) as data:
        params_flat = {
            k[len("params/"):]: data[k] for k in data.files if k.startswith("params/")
        }
        stats_flat = {
            k[len("batch_stats/"):]: data[k]
            for k in data.files
            if k.startswith("batch_stats/")
        }
    return unflatten(params_flat), unflatten(stats_flat)


def main(argv=None):
    from .convert import (
        adapt_first_conv,
        convert_bninception,
        convert_resnet,
        convert_tbn_checkpoint,
        convert_vgg,
        load_torch_file,
    )

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help=".pth file")
    parser.add_argument(
        "--kind", required=True,
        choices=["bninception", "resnet", "vgg", "tbn"],
    )
    parser.add_argument("--arch", default="bninception", help="tower arch for --kind tbn")
    parser.add_argument("--vgg-type", default="16")
    parser.add_argument(
        "--in-channels", type=int, default=0,
        help="adapt the first conv to this many input channels (0 = keep)",
    )
    parser.add_argument("--output", required=True, help=".npz output path")
    args = parser.parse_args(argv)

    state_dict = load_torch_file(args.input)
    if args.kind == "bninception":
        params, stats = convert_bninception(state_dict)
        if args.in_channels:
            adapt_first_conv(params, args.in_channels)
    elif args.kind == "resnet":
        params, stats = convert_resnet(state_dict)
    elif args.kind == "vgg":
        params, stats = convert_vgg(state_dict, args.vgg_type)
    else:
        params, stats = convert_tbn_checkpoint(
            state_dict, arch=args.arch, vgg_type=args.vgg_type
        )

    save_npz(args.output, params, stats)
    n = len(flatten(params)) + len(flatten(stats))
    print(f"Wrote {n} arrays to {args.output}")


if __name__ == "__main__":
    main()
