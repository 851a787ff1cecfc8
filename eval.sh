#!/bin/bash
# Example: offline evaluation of saved prediction PNGs vs ground truth.
python eval.py \
    --pred_path "${PRED_PATH:-preds/}" \
    --gt_path "${GT_PATH:-data/test/masks/}"
