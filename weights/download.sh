#!/usr/bin/env bash
# Fetch the pretrained tower weights — the same Google-Drive bundle the
# reference framework downloads (reference weights/download.sh) — then hand
# off to prepare.sh for integrity check + conversion to the native NHWC
# .npz layout + load verification. prepare.sh is the testable half (see
# tests/test_weights_prepare.py); only this fetch needs network access.
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

exec bash ./prepare.sh  # we cd'd into the weights dir above
