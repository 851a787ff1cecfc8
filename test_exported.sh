#!/bin/bash
# Example: run an exported StableHLO artifact over a test set and evaluate.
python test_exported.py \
    --model_path "${MODEL_PATH:-model.stablehlo}" \
    --test_image_path "${TEST_IMAGES:-data/test/images/}" \
    --test_gt_path "${TEST_GT:-data/test/masks/}" \
    --save_path "${SAVE_PATH:-deploy_preds/}" \
    --size "${SIZE:-960}"
