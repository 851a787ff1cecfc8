#!/usr/bin/env python
"""CLI wrapper: TPU-native SAM2-UNet training (see sam2unet_tpu/cli/train_cli.py).
Flag-compatible with the reference train.py."""
from sam2unet_tpu.cli.train_cli import run

if __name__ == "__main__":
    run()
