"""Jitted training/eval engine.

One compiled program per step (train.py:66-87's loop body, device-side):
forward (3 heads) -> summed structure loss -> backward w.r.t. the trainable
partition only -> AdamW update -> BN stat update. Under a data-sharded mesh
the same program is the multi-chip program; XLA inserts the psums.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sam2unet_tpu.parallel.mesh import DATA_AXIS
from sam2unet_tpu.train.loss import multi_head_loss
from sam2unet_tpu.train.optim import merge_params, partition_params


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    trainable: Any
    frozen: Any
    batch_stats: Any
    opt_state: Any

    @property
    def params(self) -> dict:
        return merge_params(self.trainable, self.frozen)

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


def create_train_state(
    variables: dict, optimizer: optax.GradientTransformation
) -> TrainState:
    trainable, frozen = partition_params(variables["params"])
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        frozen=frozen,
        batch_stats=variables.get("batch_stats"),
        opt_state=optimizer.init(trainable),
    )


def create_sharded_train_state(
    variables: dict, optimizer: optax.GradientTransformation, mesh: Mesh,
    min_shard_size: int | None = None,
) -> TrainState:
    """TrainState placed per the tensor-parallel policy: large matmul
    weights (and their Adam moments) sharded over 'model', the rest
    replicated. With a 1-sized model axis this is plain replication."""
    from sam2unet_tpu.parallel.sharding import shard_tree

    state = create_train_state(variables, optimizer)
    kw = {} if min_shard_size is None else {"min_size": min_shard_size}
    return shard_tree(state, mesh, **kw)


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    weighted_bce: bool = False,
    mesh: Mesh | None = None,
    donate: bool = True,
    jit: bool = True,
    use_shard_map: bool = False,
) -> Callable:
    """Returns jitted (state, images, labels) -> (state, metrics).

    images: (B, H, W, 3) normalized; labels: (B, H, W, 1) in {0, 1}.
    With a mesh, the batch is sharded over 'data' and state replicated.
    jit=False returns the raw step (for embedding in a lax.scan).

    use_shard_map=True compiles the step as a shard_map over the 'data'
    axis: each device runs the FULL per-shard program locally (required on
    real multi-chip TPU — Mosaic/Pallas custom calls cannot be partitioned
    by GSPMD) with explicit pmean'd grads/loss. The model must be built
    with bn_axis=DATA_AXIS so BatchNorm reduces batch moments across
    shards (SyncBN) and the step stays numerically identical to the GSPMD
    form (asserted by tests/test_shard_map_dp.py)."""

    def loss_fn(trainable, frozen, batch_stats, images, labels):
        variables = {"params": merge_params(trainable, frozen)}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        (preds, new_model_state) = model.apply(
            variables, images, train=True, mutable=["batch_stats"]
        )
        loss = multi_head_loss(preds, labels, weighted_bce)
        return loss, new_model_state.get("batch_stats")

    def step_fn(state: TrainState, images, labels):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable, state.frozen, state.batch_stats, images, labels
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.trainable
        )
        trainable = optax.apply_updates(state.trainable, updates)
        new_state = state.replace(
            step=state.step + 1,
            trainable=trainable,
            batch_stats=new_stats,
            opt_state=opt_state,
        )
        return new_state, {"loss": loss}

    if not jit:
        return step_fn
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    if use_shard_map:
        from jax import shard_map

        def global_loss_fn(trainable, frozen, batch_stats, images, labels):
            # the pmean is INSIDE the differentiated function: under vma
            # typing (check_vma=True, the default) the cotangent of the
            # unvarying `trainable` is automatically psum'd over 'data'
            # when it crosses the unvarying->varying broadcast, so
            # differentiating the pmean'd (global-batch mean) loss yields
            # exactly the global mean grad — psum(local_grad / n) — with
            # no explicit grad collective. Differentiating the LOCAL loss
            # and pmean-ing grads afterwards (the pre-vma idiom) would
            # double-count: the implicit psum already summed the shards,
            # and pmean of identical values divides nothing (caught by
            # tests/test_shard_map_dp.py as an exactly-8x grad error).
            loss, new_stats = loss_fn(
                trainable, frozen, batch_stats, images, labels
            )
            return jax.lax.pmean(loss, DATA_AXIS), new_stats

        def local_step(state: TrainState, images, labels):
            (loss, new_stats), grads = jax.value_and_grad(
                global_loss_fn, has_aux=True
            )(state.trainable, state.frozen, state.batch_stats, images, labels)
            # BN stats were already cross-shard reduced inside the model
            # (bn_axis SyncBN), so every device holds identical new_stats
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.trainable
            )
            trainable = optax.apply_updates(state.trainable, updates)
            new_state = state.replace(
                step=state.step + 1,
                trainable=trainable,
                batch_stats=new_stats,
                opt_state=opt_state,
            )
            return new_state, {"loss": loss}

        # check_vma stays ON (default): state arrives unvarying (P()), the
        # loss is pmean'd over 'data' and grads inherit unvarying-ness from
        # the implicit cotangent psum — so the P() out_specs are statically
        # inferable.
        return jax.jit(
            shard_map(
                local_step, mesh=mesh,
                in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=(P(), P()),
            ),
            donate_argnums=(0,) if donate else (),
        )
    if mesh.shape.get("model", 1) > 1:
        # tensor parallelism: params/moments placed by the sharding policy;
        # jit infers in-shardings from the placed state and XLA inserts the
        # collectives. Shard the state with parallel.sharding.shard_tree
        # (see create_sharded_train_state) before the first call.
        return jax.jit(
            step_fn,
            in_shardings=(None, data, data),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(
    model, mesh: Mesh | None = None, use_shard_map: bool = False
) -> Callable:
    """Jitted inference: (variables, images) -> (out, out1, out2) logits.
    use_shard_map: per-device local programs (Pallas-safe on real
    multi-chip TPU); eval-mode BN uses running averages, so no bn_axis
    is needed here."""

    def fwd(variables, images):
        return model.apply(variables, images, train=False)

    if mesh is None:
        return jax.jit(fwd)
    if use_shard_map:
        from jax import shard_map

        # check_vma stays ON (default): images vary over 'data' only, so
        # the P(DATA_AXIS) out_specs replication over any other mesh axis
        # is statically inferable.
        return jax.jit(
            shard_map(
                fwd, mesh=mesh,
                in_specs=(P(), P(DATA_AXIS)),
                out_specs=P(DATA_AXIS),
            )
        )
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(fwd, in_shardings=(repl, data), out_shardings=data)


@partial(jax.jit, static_argnames=("size", "h", "w"))
def letterbox_valid_mask(
    paddings: jnp.ndarray, size: int, h: int, w: int
) -> jnp.ndarray:
    """(B, h, w, 1) bool — True inside the un-padded letterbox content.

    paddings: (B, 4) int32 [left, top, right, bottom]."""
    rows = jnp.arange(h)[None, :, None, None]
    cols = jnp.arange(w)[None, None, :, None]
    top = paddings[:, 1][:, None, None, None]
    bot = (size - paddings[:, 3])[:, None, None, None]
    left = paddings[:, 0][:, None, None, None]
    right = (size - paddings[:, 2])[:, None, None, None]
    return (rows >= top) & (rows < bot) & (cols >= left) & (cols < right)


@partial(jax.jit, static_argnames=("size",))
def postprocess_logits(
    logits: jnp.ndarray, paddings: jnp.ndarray, size: int
) -> jnp.ndarray:
    """Device-side equivalent of the reference eval postprocess
    (train.py:103-112): mask out letterbox padding, sigmoid. The final
    un-pad crop + resize to GT resolution stays on host (variable shapes).

    paddings: (B, 4) int32 [left, top, right, bottom]."""
    b, h, w, _ = logits.shape
    valid = letterbox_valid_mask(paddings, size, h, w)
    return jnp.where(valid, jax.nn.sigmoid(logits.astype(jnp.float32)), 0.0)
