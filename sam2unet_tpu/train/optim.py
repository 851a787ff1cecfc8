"""Optimizer, schedule, and PEFT partitioning.

Matches train.py:48-54: AdamW (torch defaults: betas 0.9/0.999, eps 1e-8,
weight_decay 5e-4) with CosineAnnealingLR stepped per *epoch* down to
eta_min=1e-7.

PEFT: the reference freezes the whole trunk via requires_grad=False
(SAM2UNet.py:146-147) before wrapping blocks with trainable Adapters. Here
the same contract is a parameter partition — backward never computes dW for
frozen leaves (cheaper than masking the optimizer after full backprop)."""

from __future__ import annotations

import jax.numpy as jnp
import optax
from flax import traverse_util


def cosine_epoch_schedule(
    base_lr: float, epochs: int, steps_per_epoch: int, eta_min: float = 1e-7
):
    """Torch CosineAnnealingLR semantics, held constant within an epoch."""

    def schedule(step):
        epoch = jnp.minimum(step // max(steps_per_epoch, 1), epochs)
        t = epoch / max(epochs, 1)
        return eta_min + (base_lr - eta_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * t))

    return schedule


def make_optimizer(
    lr: float = 1e-3,
    weight_decay: float = 5e-4,
    epochs: int = 50,
    steps_per_epoch: int = 100,
    eta_min: float = 1e-7,
) -> optax.GradientTransformation:
    return optax.adamw(
        learning_rate=cosine_epoch_schedule(lr, epochs, steps_per_epoch, eta_min),
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=weight_decay,
    )


def is_trainable(path: tuple[str, ...]) -> bool:
    """True for adapter/neck/decoder/head leaves; False for trunk weights.

    `up4` is constructed-but-never-called in the reference (SAM2UNet.py:159
    vs forward :167-172), so its torch grads stay None and torch AdamW skips
    it entirely — were it in the trainable partition here, optax's decoupled
    weight decay would shrink it every step despite zero gradients."""
    if path[0] == "up4":
        return False
    if path[0] != "encoder":
        return True
    return "prompt_learn" in path


def partition_params(params: dict) -> tuple[dict, dict]:
    """Split the params tree into (trainable, frozen) flat dicts."""
    flat = traverse_util.flatten_dict(params)
    trainable = {k: v for k, v in flat.items() if is_trainable(k)}
    frozen = {k: v for k, v in flat.items() if not is_trainable(k)}
    return trainable, frozen


def merge_params(trainable: dict, frozen: dict) -> dict:
    return traverse_util.unflatten_dict({**trainable, **frozen})
