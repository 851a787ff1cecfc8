"""Config-derived FLOPs audit for the benchmark's MFU claim.

Counts the exact FLOPs of the SAM2-UNet forward / train step by lowering
the model on the CPU backend with every Pallas kernel forced to its XLA
reference form (ops/pallas/dispatch.force_xla) and reading XLA's own HLO
cost analysis. This is the auditable replacement for a hand-derived
constant: the number comes from the compiler's cost model of the same
computation graph the TPU executes (kernel-internal algebra matches the
_xla_* reference forms, which the parity tests pin).

TPU processes cannot see the CPU backend here (the axon plugin registers
only itself), so bench.py runs this module as a subprocess:

    python -m sam2unet_tpu.utils.flops_audit --model_cfg sam2_hiera_l \
        --size 352 --mode both

prints one JSON line: {"infer": <flops/img>, "train": <flops/img>}.

Measured context (2026-08, hiera_l@352): forward = 222.1 GFLOP/img —
the old bench.py docstring constant (0.45 TFLOP/img) was ~2x too high,
which overstated earlier speed-of-light claims; MFU fields derived from
this audit are the honest ones.
"""

from __future__ import annotations

import argparse
import json


def _flops(lowered) -> float:
    ca = lowered.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0]
    return float(ca["flops"])


def audit(model_cfg: str, size: int, mode: str) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sam2unet_tpu.configs import SAM2UNetConfig, hiera_config
    from sam2unet_tpu.models.sam2unet import SAM2UNet
    from sam2unet_tpu.ops.pallas.dispatch import force_xla

    model = SAM2UNet(
        SAM2UNetConfig(trunk=hiera_config(model_cfg)), dtype=jnp.bfloat16
    )
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    out = {}
    with force_xla():
        shapes = jax.eval_shape(
            lambda r, xx: model.init(r, xx, train=False),
            jax.random.PRNGKey(0), x,
        )
        variables = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes
        )
        if mode in ("infer", "both"):
            lowered = jax.jit(
                lambda v, xx: model.apply(v, xx, train=False)
            ).lower(variables, x)
            out["infer"] = _flops(lowered)
        if mode in ("train", "both"):
            from sam2unet_tpu.train.engine import (
                create_train_state,
                make_train_step,
            )
            from sam2unet_tpu.train.optim import make_optimizer

            optimizer = make_optimizer(
                lr=1e-3, epochs=10, steps_per_epoch=100
            )
            state = create_train_state(variables, optimizer)
            raw_step = make_train_step(model, optimizer, jit=False)
            y = jnp.zeros((1, size, size, 1), jnp.float32)
            lowered = jax.jit(raw_step).lower(state, x, y)
            out["train"] = _flops(lowered)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model_cfg", default="sam2_hiera_l")
    p.add_argument("--size", type=int, default=352)
    p.add_argument("--mode", choices=["infer", "train", "both"],
                   default="both")
    args = p.parse_args()
    print(json.dumps(audit(args.model_cfg, args.size, args.mode)))


if __name__ == "__main__":
    main()
