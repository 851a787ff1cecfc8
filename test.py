#!/usr/bin/env python
"""CLI wrapper: per-image inference + PNG dump (see sam2unet_tpu/cli/test_cli.py).
Flag-compatible with the reference test.py."""
from sam2unet_tpu.cli.test_cli import run

if __name__ == "__main__":
    run()
