#!/bin/bash
# Example: train SAM2-UNet (Hiera-S trunk) with bf16 compute on all chips.
python train.py \
    --save_path "${SAVE_PATH:-runs/exp1}" \
    --hiera_path "${HIERA_PATH:-sam2_hiera_small.pt}" \
    --train_image_path "${TRAIN_IMAGES:-data/train/images/}" \
    --train_mask_path "${TRAIN_MASKS:-data/train/masks/}" \
    --test_image_path "${TEST_IMAGES:-data/test/images/}" \
    --test_gt_path "${TEST_GT:-data/test/masks/}" \
    --epoch "${EPOCHS:-50}" --lr 1e-3 --batch_size "${BATCH:-16}" \
    --size "${SIZE:-352}" --bf16
