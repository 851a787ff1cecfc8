#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json north star): Hiera-L SAM2-UNet at 352x352,
images/sec/chip, bfloat16, on the available TPU. The default run measures
BOTH inference and the full train step (the reference's headline workflow,
train.py:66-87); infer is the `value`, train rides along as extra keys in
the same JSON line.

Timing method: this environment reaches the TPU through a high-latency
tunnel where per-call dispatch/readback dominates, so N steps are chained
*inside one jit program* with lax.scan (data-dependent carry prevents
elision) and a single scalar readback ends the clock; the measured empty-
program round trip is subtracted.

vs_baseline is the ratio to an A100-equivalent PyTorch reference estimate.
The reference repo records no numbers (BASELINE.md), so the estimate is
compute-derived: Hiera-L SAM2UNet forward ≈ 0.45 TFLOP/img at 352^2; an
A100 (312 fp16 TFLOPs) at a typical 35% PyTorch MFU sustains ~240 img/s.
240 img/s is the 1.0x baseline; the BASELINE.json target is >= 3.0x.
Train baseline: reference train step ≈ 3x forward FLOPs -> ~80 img/s.

A raw 4096^3 bf16 matmul calibration line is printed to stderr so the
absolute numbers can be normalized across the machine-state variance
documented in docs/PERF.md.

Usage: python bench.py [--mode both|infer|train] [--batch N] [--steps N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

A100_EQUIV_IMG_PER_S = 240.0
A100_EQUIV_TRAIN_IMG_PER_S = 80.0


def _roundtrip_seconds(jax, jnp) -> float:
    g = jax.jit(lambda: jnp.zeros(()))
    float(g())  # warm the path
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(g())
        samples.append(time.perf_counter() - t0)
    return min(samples)


def _calibrate_matmul(jax, jnp, rt: float) -> float:
    """Raw bf16 4096^3 matmul TFLOP/s — machine-state normalizer."""
    from jax import lax

    n, steps = 4096, 16
    a = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def run(a):
        def body(c, _):
            return jnp.tanh(c @ a), ()

        c, _ = lax.scan(body, a, None, length=steps)
        return c.sum()

    float(run(a))  # compile
    t0 = time.perf_counter()
    float(run(a))
    dt = time.perf_counter() - t0 - rt
    return 2 * n**3 * steps / max(dt, 1e-9) / 1e12


def _bench_one(mode: str, args, model, variables, jax, jnp, rt: float):
    from jax import lax

    batch, steps = args.batch, args.steps
    x = jnp.zeros((batch, args.size, args.size, 3), jnp.float32)

    if mode == "infer":

        @jax.jit
        def run_n(variables, x0):
            def body(c, _):
                out, _, _ = model.apply(variables, c, train=False)
                # data-dependent carry so scan iterations cannot be elided
                return c + out.astype(c.dtype) * 1e-12, ()

            c, _ = lax.scan(body, x0, None, length=steps)
            return c.sum()

        bench_args = (variables, x)
    else:
        from sam2unet_tpu.train.engine import create_train_state, make_train_step
        from sam2unet_tpu.train.optim import make_optimizer

        optimizer = make_optimizer(lr=1e-3, epochs=10, steps_per_epoch=100)
        state0 = create_train_state(variables, optimizer)
        raw_step = make_train_step(model, optimizer, jit=False)
        y = jnp.zeros((batch, args.size, args.size, 1), jnp.float32)

        @jax.jit
        def run_n(state, x0, y0):
            def body(s, _):
                s2, m = raw_step(s, x0, y0)
                return s2, m["loss"]

            s, losses = lax.scan(body, state, None, length=steps)
            return losses[-1]

        bench_args = (state0, x, y)

    float(run_n(*bench_args))  # compile + warm
    t0 = time.perf_counter()
    val = float(run_n(*bench_args))
    dt = time.perf_counter() - t0 - rt
    assert val == val, "NaN escaped the bench loop"
    return batch * steps / max(dt, 1e-9)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["both", "infer", "train"], default="both")
    p.add_argument("--batch", type=int, default=0, help="0 = auto")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--size", type=int, default=352)
    p.add_argument("--model_cfg", type=str, default="sam2_hiera_l")
    p.add_argument("--no_calibrate", action="store_true")
    args = p.parse_args()

    from sam2unet_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from sam2unet_tpu.configs import SAM2UNetConfig, hiera_config
    from sam2unet_tpu.models.sam2unet import SAM2UNet

    on_tpu = jax.default_backend() == "tpu"
    n_chips = len(jax.devices())
    args.batch = args.batch or (32 if on_tpu else 2)

    model = SAM2UNet(
        SAM2UNetConfig(trunk=hiera_config(args.model_cfg)),
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    x = jnp.zeros((args.batch, args.size, args.size, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False
    )

    rt = _roundtrip_seconds(jax, jnp)
    calib = 0.0
    if on_tpu and not args.no_calibrate:
        calib = _calibrate_matmul(jax, jnp, rt)
        print(f"[bench] calibration: raw bf16 4096^3 matmul "
              f"{calib:.1f} TFLOP/s (machine-state normalizer)",
              file=sys.stderr)

    modes = ["infer", "train"] if args.mode == "both" else [args.mode]
    per_chip = {}
    for mode in modes:
        img_per_s = _bench_one(mode, args, model, variables, jax, jnp, rt)
        per_chip[mode] = img_per_s / max(n_chips, 1)
        print(
            f"[bench] {mode}: backend={jax.default_backend()} chips={n_chips} "
            f"batch={args.batch} steps={args.steps} (rt {rt * 1e3:.0f}ms) "
            f"total={img_per_s:.2f} img/s",
            file=sys.stderr,
        )

    primary = "infer" if "infer" in per_chip else "train"
    base = (A100_EQUIV_IMG_PER_S if primary == "infer"
            else A100_EQUIV_TRAIN_IMG_PER_S)
    record = {
        "metric": f"{args.model_cfg}_{args.size}_{primary}_img_per_s_chip",
        "value": round(per_chip[primary], 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip[primary] / base, 3),
    }
    if "train" in per_chip and primary == "infer":
        record["train_img_per_s_chip"] = round(per_chip["train"], 2)
        record["train_vs_baseline"] = round(
            per_chip["train"] / A100_EQUIV_TRAIN_IMG_PER_S, 3
        )
    if calib:
        record["calib_matmul_tflops"] = round(calib, 1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
