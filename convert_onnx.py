#!/usr/bin/env python
"""Export CLI — flag-compatible with the reference convert_onnx.py.

Default format is a serialized StableHLO artifact (the TPU-native portable
deployment format; jax.export). ONNX is available with --format onnx when
the optional tooling is installed. Parity is verified like the reference
(rtol/atol 1e-1, convert_onnx.py:69-107)."""
import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--onnx_path", type=str, default="",
                   help="output path (kept for reference flag parity)")
    p.add_argument("--output", type=str, default="", help="output path")
    p.add_argument("--size", type=int, default=960)
    p.add_argument("--model_cfg", type=str, default="sam2_hiera_s")
    p.add_argument("--format", choices=["stablehlo", "onnx"], default="stablehlo")
    p.add_argument("--skip_verify", action="store_true")
    args = p.parse_args()

    from sam2unet_tpu.cli.common import build_model, init_variables, load_weights
    from sam2unet_tpu.interop.export import (
        export_onnx, export_stablehlo, verify_export,
    )

    out_path = args.output or args.onnx_path
    if not out_path:
        raise SystemExit("provide --output (or --onnx_path)")
    model, _ = build_model(args.model_cfg)
    variables = init_variables(model, args.size)
    variables = load_weights(variables, checkpoint=args.checkpoint)

    if args.format == "onnx":
        export_onnx(model, variables, args.size, out_path)
    else:
        export_stablehlo(model, variables, args.size, out_path)
    print("Exported to", out_path)
    if not args.skip_verify and args.format == "stablehlo":
        diff = verify_export(model, variables, args.size, out_path)
        print(f"Export verified: max abs diff {diff:.3e} (tolerance 1e-1)")


if __name__ == "__main__":
    main()
