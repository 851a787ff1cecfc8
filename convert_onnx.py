#!/usr/bin/env python
"""Export CLI — flag-compatible with the reference convert_onnx.py.

Default format is a serialized StableHLO artifact (the TPU-native portable
deployment format; jax.export). --format onnx produces a real .onnx: via
jax2tf->tf2onnx when that tooling is installed, otherwise via the torch
bridge (--torch_impl, a "module:factory" callable returning a torch
SAM2-UNet; framework weights are loaded into it through the strict inverse
converter and torch.onnx.export runs with the in-repo protobuf bindings).
Parity is verified like the reference (convert_onnx.py:69-107) — the ONNX
leg with the in-repo numpy ONNX runtime when onnxruntime is absent."""
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
    p.add_argument("--torch_impl", type=str, default="",
                   help="'module:factory' for the ONNX torch-bridge fallback: "
                        "an importable zero-arg callable returning a torch "
                        "SAM2-UNet whose state-dict keys follow the upstream "
                        "layout (used when jax2tf/tf2onnx are absent)")
    p.add_argument("--skip_verify", action="store_true")
    args = p.parse_args()

    from sam2unet_tpu.cli.common import build_model, init_variables, load_weights
    from sam2unet_tpu.interop.export import (
        export_onnx, export_onnx_via_torch, export_stablehlo, verify_export,
        verify_onnx,
    )

    out_path = args.output or args.onnx_path
    if not out_path:
        raise SystemExit("provide --output (or --onnx_path)")
    model, _ = build_model(args.model_cfg)
    variables = init_variables(model, args.size)
    variables = load_weights(variables, checkpoint=args.checkpoint)

    if args.format == "onnx":
        try:
            export_onnx(model, variables, args.size, out_path)
        except ImportError:
            if not args.torch_impl:
                raise SystemExit(
                    "jax2tf/tf2onnx tooling is not installed; pass "
                    "--torch_impl module:factory to export via the torch "
                    "bridge instead")
            import importlib

            mod_name, _, attr = args.torch_impl.partition(":")
            torch_module = getattr(importlib.import_module(mod_name), attr)()
            export_onnx_via_torch(torch_module, variables, args.size, out_path)
    else:
        export_stablehlo(model, variables, args.size, out_path)
    print("Exported to", out_path)
    if not args.skip_verify:
        if args.format == "stablehlo":
            diff = verify_export(model, variables, args.size, out_path)
        else:
            diff = verify_onnx(model, variables, args.size, out_path,
                               rtol=1e-1, atol=1e-1)
        print(f"Export verified: max abs diff {diff:.3e} (tolerance 1e-1)")


if __name__ == "__main__":
    main()
