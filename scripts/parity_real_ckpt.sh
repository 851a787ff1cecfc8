#!/usr/bin/env bash
# One-command real-weights parity (BASELINE.json north star).
#
# Usage: scripts/parity_real_ckpt.sh <sam2_hiera.pt|-> <sam2unet.pth> <dataset_dir> [extra flags]
#   sam2_hiera.pt : official SAM2 trunk checkpoint ('-' to skip the
#                   converter strict-check; the trained .pth already
#                   carries trunk weights)
#   sam2unet.pth  : trained reference SAM2-UNet checkpoint
#   dataset_dir   : CVC-300 / CAMO style dir with images+masks subdirs
#
# Prints a JSON report with the mDice delta vs the 0.003 gate; exit 1 on
# gate failure. See scripts/parity_real_ckpt.py for details.
set -euo pipefail
cd "$(dirname "$0")/.."

HIERA="${1:?usage: parity_real_ckpt.sh <sam2_hiera.pt|-> <sam2unet.pth> <dataset_dir>}"
PTH="${2:?missing <sam2unet.pth>}"
DATA="${3:?missing <dataset_dir>}"
shift 3

EXTRA=()
if [[ "$HIERA" != "-" ]]; then EXTRA+=(--hiera_ckpt "$HIERA"); fi

exec python scripts/parity_real_ckpt.py \
  --sam2unet_ckpt "$PTH" --dataset_dir "$DATA" "${EXTRA[@]}" "$@"
