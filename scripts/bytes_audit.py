#!/usr/bin/env python
"""Bytes/step budget auditor — where the HBM traffic lives.

The model is bandwidth-bound (docs/PERF.md: ~80% HBM utilization, every
adopted win removed bytes), so the actionable profile is BYTES, not
FLOPs. This tool compiles the same program bench.py measures (on the
real TPU by default, Pallas kernels included) and reports:

  * total "bytes accessed" from XLA's cost analysis of the compiled
    program (the round-2 102.7 GB/step figure's source), and
  * a write-side attribution: every optimized-HLO instruction's output
    buffer size, grouped by category (pallas custom-calls, convolution
    fusions, elementwise fusions, layout copies, slices, ...), with the
    top individual writers listed.

plus the budget arithmetic: at --img_per_s X and --target_ratio R, the
GB/step that must disappear for the BASELINE 3.0x target.

Usage:
    python scripts/bytes_audit.py --mode infer --batch 32 [--img_per_s 299.4]
    python scripts/bytes_audit.py --mode train --batch 32 [--img_per_s 112.5]

One JSON line on stdout; human-readable table on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "s32": 4, "u32": 4,
    "s64": 8, "u64": 8, "f16": 2, "bf16": 2, "f32": 4, "f64": 8,
    "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"(pred|s8|u8|s16|u16|s32|u32|s64|u64|f16|bf16|f32|f64|c64|c128)\[([0-9,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """Total bytes of all array shapes in an HLO type string (handles
    tuples by summing every element)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\([^)]*\)|\S+)\s+([\w\-]+)\("
)


def categorize(name: str, op: str, line: str) -> str:
    if op == "custom-call":
        m = re.search(r'custom_call_target="([^"]+)"', line)
        tgt = m.group(1) if m else "custom"
        if "tpu_custom_call" in tgt or "Mosaic" in tgt:
            return "pallas-kernel"
        return f"custom:{tgt[:24]}"
    if op == "fusion":
        if "conv" in name or "convolution" in line:
            return "conv-fusion"
        if "dot" in name or "%dot" in line:
            return "matmul-fusion"
        return "elementwise-fusion"
    if op in ("copy", "transpose", "bitcast-convert", "reshape"):
        return "layout-copy"
    if op in ("dynamic-slice", "slice", "dynamic-update-slice", "gather",
              "scatter", "concatenate", "pad"):
        return "slice/concat/pad"
    if op in ("convolution",):
        return "conv-fusion"
    if op in ("dot",):
        return "matmul-fusion"
    if op in ("all-reduce", "all-gather", "reduce-scatter",
              "collective-permute"):
        return "collective"
    return f"op:{op}"


_COMP_RE = re.compile(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*(?:\([^)]*\))?\s*->.*\{\s*$")


def attribute_writes(hlo_text: str) -> tuple[dict, list]:
    """Per-category output-buffer bytes of the optimized HLO, skipping
    fusion-body computations (their internal instructions live in
    registers/VMEM — only the fusion root is an HBM write) and parameters/
    constants (reads, not writes). ENTRY, while bodies/conditions, and
    other called computations are counted."""
    cats: dict[str, int] = {}
    top: list[tuple[int, str, str]] = []
    in_fusion_body = False
    for line in hlo_text.splitlines():
        cm = _COMP_RE.match(line)
        if cm:
            # region_* computations back while bodies (must count) and
            # reduce combiners (scalar, ~0 bytes) — counting both is fine.
            in_fusion_body = "fused_computation" in cm.group(1)
            continue
        if in_fusion_body:
            continue
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, shape_str, op = m.groups()
        if op in ("parameter", "constant", "iota", "get-tuple-element",
                  "tuple", "bitcast"):
            continue
        b = shape_bytes(shape_str)
        if b == 0:
            continue
        cat = categorize(name, op, line)
        if "S(1)" in shape_str:
            # memory-space-1 (scoped/alternate memory) outputs: XLA's
            # prefetch staging into VMEM around custom calls — an HBM
            # *read* (already in "bytes accessed"), not an HBM write.
            cat = "scoped-staging(not-HBM-writes)"
        cats[cat] = cats.get(cat, 0) + b
        top.append((b, cat, name[:60]))
    top.sort(reverse=True)
    return cats, top[:25]


def pallas_io_bytes(hlo_text: str) -> int:
    """Total HBM I/O bytes of the Pallas (Mosaic) custom calls in counted
    computations: sum of operand-buffer + output-buffer sizes per call.

    XLA's cost analysis scores custom calls as ZERO bytes (and zero
    flops — see utils/flops_audit.py), so the headline "bytes accessed"
    under-counts every fused kernel's traffic. The correction here is the
    block-spec ground truth to first order: a pallas_call streams exactly
    its operand and result buffers between HBM and VMEM once each
    (constant-index-map weight blocks are fetched once, not per grid
    step — Mosaic keeps them resident; revolving layouts re-fetch but
    weights are <<1% of activation bytes at our shapes)."""
    sizes: dict[str, int] = {}
    in_fusion_body = False
    total = 0
    for line in hlo_text.splitlines():
        cm = _COMP_RE.match(line)
        if cm:
            in_fusion_body = "fused_computation" in cm.group(1)
            continue
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, shape_str, op = m.groups()
        sizes[name] = shape_bytes(shape_str)
        if in_fusion_body or op != "custom-call":
            continue
        if "tpu_custom_call" not in line and "Mosaic" not in line:
            continue
        om = re.search(r"custom-call\(([^)]*)\)", line)
        operands = []
        if om:
            operands = [
                t.strip().lstrip("%") for t in om.group(1).split(",") if t.strip()
            ]
        total += sizes.get(name, 0)
        total += sum(sizes.get(o, 0) for o in operands)
    return total


def measure_stream_gbps(repeats: int = 3, n: int = 256 * 1024 * 1024,
                        steps: int = 24) -> float:
    """Measured HBM stream bandwidth: a jitted lax.scan of dependent
    elementwise scales over a 1 GiB buffer (each step reads + writes the
    full buffer), timed like bench.py (one jit, one scalar readback).
    Returns the best-of-N GB/s — the achievable STREAM number the budget
    arithmetic should use instead of the 819 GB/s nominal."""
    import time

    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def stream(x):
        def body(c, _):
            return c * jnp.float32(1.0000001), ()

        c, _ = lax.scan(body, x, None, length=steps)
        return c[0]

    x = jnp.zeros((n,), jnp.float32)
    float(stream(x))  # compile + warm
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(stream(x))
        dt = time.perf_counter() - t0
        gbps = 2 * 4 * n * steps / 1e9 / dt
        best = max(best, gbps)
    return best


def build(mode: str, batch: int, size: int, model_cfg: str, scan_steps: int):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sam2unet_tpu.configs import SAM2UNetConfig, hiera_config
    from sam2unet_tpu.models.sam2unet import SAM2UNet

    on_tpu = jax.default_backend() == "tpu"
    model = SAM2UNet(
        SAM2UNetConfig(trunk=hiera_config(model_cfg)),
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    x = jnp.zeros((batch, size, size, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False
    )
    if mode == "infer":
        if scan_steps > 1:
            def fn(variables, x0):
                def body(c, _):
                    out, _, _ = model.apply(variables, c, train=False)
                    return c + out.astype(c.dtype) * 1e-12, ()

                c, _ = lax.scan(body, x0, None, length=scan_steps)
                return c.sum()
        else:
            def fn(variables, x0):
                return model.apply(variables, x0, train=False)
        return jax.jit(fn).lower(variables, x).compile(), scan_steps
    from sam2unet_tpu.train.engine import create_train_state, make_train_step
    from sam2unet_tpu.train.optim import make_optimizer

    optimizer = make_optimizer(lr=1e-3, epochs=10, steps_per_epoch=100)
    state = create_train_state(variables, optimizer)
    raw_step = make_train_step(model, optimizer, jit=False)
    y = jnp.zeros((batch, size, size, 1), jnp.float32)
    if scan_steps > 1:
        def fn(state, x0, y0):
            def body(s, _):
                s2, m = raw_step(s, x0, y0)
                return s2, m["loss"]

            s, losses = lax.scan(body, state, None, length=scan_steps)
            return losses[-1]
        return jax.jit(fn).lower(state, x, y).compile(), scan_steps
    return jax.jit(raw_step).lower(state, x, y).compile(), 1


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["infer", "train"], default="infer")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=352)
    p.add_argument("--model_cfg", default="sam2_hiera_l")
    p.add_argument("--scan_steps", type=int, default=1,
                   help=">1 wraps the step in lax.scan like bench.py "
                        "(per-step numbers are divided back out)")
    p.add_argument("--img_per_s", type=float, default=0.0,
                   help="measured throughput; enables achieved-GB/s and "
                        "target-budget arithmetic")
    p.add_argument("--target_ratio", type=float, default=3.0)
    p.add_argument("--hbm_gbps", type=float, default=819.0,
                   help="v5e peak HBM bandwidth (nominal; superseded by "
                        "--measure_bw when given)")
    p.add_argument("--measure_bw", action="store_true",
                   help="measure the achievable stream bandwidth on the "
                        "device and use it for the budget arithmetic")
    p.add_argument("--dump_hlo", default="",
                   help="write the optimized HLO text to this path (for "
                        "tracing individual writers back to their source)")
    args = p.parse_args()

    from sam2unet_tpu.utils.jax_setup import setup_jax

    setup_jax()

    compiled, steps = build(
        args.mode, args.batch, args.size, args.model_cfg, args.scan_steps
    )
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    hlo_text = compiled.as_text()
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(hlo_text)
    bytes_total = float(ca.get("bytes accessed", 0.0)) / steps
    pallas_io = pallas_io_bytes(hlo_text) / steps
    bytes_incl = bytes_total + pallas_io
    cats, top = attribute_writes(hlo_text)
    write_total = sum(
        v for k, v in cats.items() if not k.startswith("scoped-staging")
    ) / steps

    rec = {
        "mode": args.mode,
        "model_cfg": args.model_cfg,
        "size": args.size,
        "batch": args.batch,
        "bytes_accessed_gb_per_step": round(bytes_total / 1e9, 2),
        "pallas_io_gb_per_step": round(pallas_io / 1e9, 2),
        "bytes_incl_pallas_gb_per_step": round(bytes_incl / 1e9, 2),
        "write_gb_per_step": round(write_total / 1e9, 2),
        "write_categories_gb": {
            k: round(v / steps / 1e9, 3)
            for k, v in sorted(cats.items(), key=lambda kv: -kv[1])
        },
    }
    hbm_gbps = args.hbm_gbps
    if args.measure_bw:
        hbm_gbps = measure_stream_gbps()
        rec["measured_stream_gbps"] = round(hbm_gbps, 1)
    if args.img_per_s > 0:
        step_s = args.batch / args.img_per_s
        achieved_gbps = bytes_incl / 1e9 / step_s
        target_img_s = args.target_ratio * (
            240.0 if args.mode == "infer" else 80.0
        )
        target_step_s = args.batch / target_img_s
        allowed_gb = hbm_gbps * target_step_s
        # the physics ceiling: with the compiled program's Pallas-inclusive
        # byte traffic and the MEASURED stream bandwidth, the step cannot
        # beat bytes/bandwidth seconds — the driver-checkable statement of
        # what throughput this architecture can reach on this chip.
        max_img_s = hbm_gbps / (bytes_incl / 1e9 / args.batch)
        rec.update(
            step_ms=round(step_s * 1e3, 2),
            achieved_gbps=round(achieved_gbps, 1),
            hbm_utilization=round(achieved_gbps / hbm_gbps, 3),
            target_img_per_s=target_img_s,
            allowed_gb_per_step_at_target=round(allowed_gb, 2),
            gb_to_remove_for_target=round(bytes_incl / 1e9 - allowed_gb, 2),
            max_img_per_s_at_bw=round(max_img_s, 1),
        )

    print("top write instructions (per scan body):", file=sys.stderr)
    for b, cat, name in top:
        print(f"  {b / 1e6:9.1f} MB  {cat:<22} {name}", file=sys.stderr)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
