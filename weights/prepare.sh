#!/usr/bin/env bash
# Post-download preparation for the pretrained tower weights: presence +
# integrity check, conversion to the native NHWC .npz layout, and a load
# verification of every converted artifact.
#
# Factored out of download.sh (which only fetches, then calls this) so the
# whole pipeline minus the network fetch is testable on locally generated
# reference-format .pth files — tests/test_weights_prepare.py runs it on
# random-weight state dicts with the verbatim pretrainedmodels naming.
#
# Usage: prepare.sh [weights_dir]
#   weights_dir defaults to this script's directory. If it contains a
#   sha256sums.txt, the .pth files are checked against it (hard failure on
#   mismatch); otherwise their digests are printed for the record.
set -euo pipefail

SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
REPO_ROOT="$(dirname "$SCRIPT_DIR")"
DIR="${1:-$SCRIPT_DIR}"
cd "$DIR"

FILES=(imagenet_bninception_rgb.pth kinetics_bninception_flow.pth)

for f in "${FILES[@]}"; do
    if [ ! -f "$f" ]; then
        echo "ERROR: expected $f in $DIR" >&2
        exit 1
    fi
done

if [ -f sha256sums.txt ]; then
    sha256sum -c sha256sums.txt
else
    sha256sum "${FILES[@]}"
fi

if ! python -c "import torch" >/dev/null 2>&1; then
    echo "torch not importable: skipping .npz conversion (done lazily at load)."
    exit 0
fi

# PYTHONPATH: the package lives at the repo root (un-installed checkout).
export PYTHONPATH="${REPO_ROOT}${PYTHONPATH:+:$PYTHONPATH}"

for f in "${FILES[@]}"; do
    stem="${f%.pth}"
    python -m attention_based_tbn_tpu.models.convert_cli \
        --input "$f" --kind bninception --output "${stem}.npz"
done

# Verify: every converted artifact re-loads and every array is finite.
for f in "${FILES[@]}"; do
    stem="${f%.pth}"
    python - "$stem.npz" <<'PYEOF'
import sys
import numpy as np
from attention_based_tbn_tpu.models.convert_cli import flatten, load_npz

params, stats = load_npz(sys.argv[1])
arrays = {**{f"p/{k}": v for k, v in flatten(params).items()},
          **{f"s/{k}": v for k, v in flatten(stats).items()}}
assert arrays, f"{sys.argv[1]}: empty conversion"
bad = [k for k, v in arrays.items() if not np.isfinite(v).all()]
assert not bad, f"{sys.argv[1]}: non-finite arrays: {bad[:5]}"
print(f"verified {sys.argv[1]}: {len(arrays)} arrays, all finite")
PYEOF
done

echo "Converted + verified .npz artifacts (loadable without torch)."
echo "Gated parity tests activate automatically:"
echo "  python -m pytest tests/test_pretrained_weights.py -v"
