#!/usr/bin/env bash
# Fetch the pretrained tower weights — the same Google-Drive bundle the
# reference framework downloads (reference weights/download.sh), then
# convert to the native NHWC .npz layout.
#
# Requires network access (run OUTSIDE sandboxed environments) and either
# gdown (pip install gdown) or wget+unzip.
#
# Contents of the bundle:
#   imagenet_bninception_rgb.pth    ImageNet BN-Inception (RGB + Audio towers;
#                                   the audio conv1 is channel-meaned at load)
#   kinetics_bninception_flow.pth   TSN Kinetics flow net (10-channel conv1)
set -euo pipefail
cd "$(dirname "$0")"

FILE_ID="1zdo43oc2wiUgNMNiPc45OpECBHHwQgd4"

if command -v gdown >/dev/null 2>&1; then
    gdown "${FILE_ID}" -O weights.zip
else
    # cookie dance for Google Drive's large-file confirm page
    wget --load-cookies /tmp/tbn_cookies.txt \
        "https://docs.google.com/uc?export=download&confirm=$(wget --quiet \
        --save-cookies /tmp/tbn_cookies.txt --keep-session-cookies \
        --no-check-certificate \
        "https://docs.google.com/uc?export=download&id=${FILE_ID}" -O- \
        | sed -rn 's/.*confirm=([0-9A-Za-z_]+).*/\1\n/p')&id=${FILE_ID}" \
        -O weights.zip
    rm -f /tmp/tbn_cookies.txt
fi

unzip -o weights.zip
rm -f weights.zip

for f in imagenet_bninception_rgb.pth kinetics_bninception_flow.pth; do
    if [ ! -f "$f" ]; then
        echo "ERROR: expected $f in the bundle" >&2
        exit 1
    fi
    sha256sum "$f"
done

# Optional ahead-of-time conversion to Orbax-free .npz (torch needed once).
# PYTHONPATH=..: the package lives at the repo root, one level up from this
# weights/ dir we cd'd into — without it `python -m` can't import it from a
# plain (un-installed) checkout.
if python -c "import torch" >/dev/null 2>&1; then
    PYTHONPATH="..${PYTHONPATH:+:$PYTHONPATH}" \
    python -m attention_based_tbn_tpu.models.convert_cli \
        --input imagenet_bninception_rgb.pth --kind bninception \
        --output imagenet_bninception_rgb.npz
    PYTHONPATH="..${PYTHONPATH:+:$PYTHONPATH}" \
    python -m attention_based_tbn_tpu.models.convert_cli \
        --input kinetics_bninception_flow.pth --kind bninception \
        --output kinetics_bninception_flow.npz
    echo "Converted to .npz (loadable without torch)."
else
    echo "torch not importable: skipping .npz conversion (done lazily at load)."
fi

echo "Done. Gated parity tests activate automatically:"
echo "  python -m pytest tests/test_pretrained_weights.py -v"
