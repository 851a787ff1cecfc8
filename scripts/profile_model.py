#!/usr/bin/env python
"""Profile the SAM2-UNet forward (or train) step on the attached TPU and
print the top HLO ops by device time — the iteration tool behind the
framework's perf work.

Usage: python scripts/profile_model.py [--mode infer|train] [--batch 32]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["infer", "train"], default="infer")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=352)
    p.add_argument("--model_cfg", type=str, default="sam2_hiera_l")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--steps", type=int, default=3)
    args = p.parse_args()

    from sam2unet_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sam2unet_tpu.configs import SAM2UNetConfig, hiera_config
    from sam2unet_tpu.models.sam2unet import SAM2UNet

    model = SAM2UNet(
        SAM2UNetConfig(trunk=hiera_config(args.model_cfg)), dtype=jnp.bfloat16
    )
    x = jnp.zeros((args.batch, args.size, args.size, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False
    )

    if args.mode == "infer":
        fn = jax.jit(lambda v, x: model.apply(v, x, train=False))

        def run():
            return fn(variables, x)[0]
    else:
        from sam2unet_tpu.train.engine import create_train_state, make_train_step
        from sam2unet_tpu.train.optim import make_optimizer

        opt = make_optimizer()
        state = create_train_state(variables, opt)
        step = make_train_step(model, opt, donate=False)
        y = jnp.zeros((args.batch, args.size, args.size, 1), jnp.float32)

        def run():
            nonlocal state
            state, m = step(state, x, y)
            return m["loss"]

    _ = np.asarray(run())  # compile + settle
    tmp = tempfile.mkdtemp(prefix="jxprof_")
    jax.profiler.start_trace(tmp)
    out = None
    for _ in range(args.steps):
        out = run()
    _ = np.asarray(out)
    jax.profiler.stop_trace()

    files = glob.glob(f"{tmp}/**/*.xplane.pb", recursive=True)
    pd = jax.profiler.ProfileData.from_file(files[0])
    tot = collections.Counter()
    cnt = collections.Counter()
    for plane in pd.planes:
        for line in plane.lines:
            for ev in line.events:
                if not ev.name.startswith("%"):
                    continue
                key = ev.name.split(" = ")[0].split(".")[0]
                shape = ev.name.split(" = ")[1].split(" ")[0] if " = " in ev.name else ""
                tot[(key, shape)] += ev.duration_ns
                cnt[(key, shape)] += 1
    print(f"top {args.top} HLO groups (avg per step over {args.steps}):")
    for (key, shape), ns in tot.most_common(args.top):
        print(f"{ns / 1e6 / args.steps:9.3f} ms  n={cnt[(key, shape)]:5d}  "
              f"{key:24s} {shape[:70]}")


if __name__ == "__main__":
    main()
