#!/usr/bin/env python
"""CLI wrapper: offline PNG-vs-GT evaluation (see sam2unet_tpu/cli/eval_cli.py).
Flag-compatible with the reference eval.py."""
from sam2unet_tpu.cli.eval_cli import run

if __name__ == "__main__":
    run()
