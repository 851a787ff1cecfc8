"""Training entry point — flag-compatible with the reference train.py:163-208.

TPU-native execution: one jitted train step over a data-sharded Mesh, device
prefetch, per-epoch sharded eval with IoU-gated checkpointing and the
reference's log.txt report format.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from sam2unet_tpu.cli.common import (
    build_model,
    init_variables,
    load_weights,
    postprocess_prediction,
)
from sam2unet_tpu.data.dataset import EvalDataset, TrainDataset
from sam2unet_tpu.eval.metrics import (
    MIOU,
    evaluate_dataset,
    evaluate_segmentation_performance,
    print_eval_report,
)
from sam2unet_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from sam2unet_tpu.train.checkpoints import CheckpointPolicy
from sam2unet_tpu.train.engine import create_train_state, make_eval_step, make_train_step
from sam2unet_tpu.train.optim import make_optimizer


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("SAM2-UNet (TPU)")
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--hiera_path", type=str, default="",
                   help="path to the sam2 pretrained hiera (.pt)")
    p.add_argument("--checkpoint", type=str, default="",
                   help="SAM2-UNet checkpoint (orbax dir or torch .pth)")
    p.add_argument("--train_image_path", type=str, required=True)
    p.add_argument("--train_mask_path", type=str, required=True)
    p.add_argument("--test_image_path", type=str, required=True)
    p.add_argument("--test_gt_path", type=str, required=True)
    p.add_argument("--epoch", type=int, default=500)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--batch_size", default=16, type=int)
    p.add_argument("--size", default=960, type=int)
    p.add_argument("--weight_decay", default=5e-4, type=float)
    p.add_argument("--save_interval", default=20, type=int)
    p.add_argument("--base_mean_iou", default=0.83, type=float)
    p.add_argument("--model_cfg", type=str, default="sam2_hiera_s")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (fp32 params/loss)")
    p.add_argument("--remat", action="store_true",
                   help="gradient checkpointing per trunk block")
    p.add_argument("--eval_batch_size", type=int, default=0,
                   help="0 = same as batch_size")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--fast_eval", action="store_true",
                   help="deprecated: device-side semantic eval is the default")
    p.add_argument("--full_eval", action="store_true",
                   help="reference-style host eval: per-image un-pad + resize "
                        "to GT resolution, semantic AND instance metrics "
                        "(train.py:89-123). Slower; the default device eval "
                        "computes mIoU/mDice at model resolution — the "
                        "checkpoint gate uses mIoU only either way")
    p.add_argument("--shard_map", action="store_true",
                   help="compile the dp step as a shard_map over 'data' "
                        "(per-device local programs + SyncBN; required for "
                        "the Pallas kernels on real multi-chip TPU)")
    p.add_argument("--profile_dir", type=str, default="",
                   help="write a JAX profiler trace of steps 10-14 here")
    p.add_argument("--resume", type=str, default="",
                   help="full TrainState checkpoint dir to resume from "
                        "(optimizer + step included; reference restarts them)")
    p.add_argument("--save_train_state", action="store_true",
                   help="also save the full TrainState beside each snapshot")
    return p


def main(args) -> None:
    import jax
    import jax.numpy as jnp

    from sam2unet_tpu.utils.jax_setup import setup_jax

    # Must precede the jax.devices() below: backend init is one-shot, and
    # setup_jax is what honors JAX_PLATFORMS (the axon TPU plugin ignores
    # the env var, so without this `JAX_PLATFORMS=cpu train.py` would still
    # initialize — and possibly hang on — the TPU backend).
    setup_jax()

    dataset = TrainDataset(args.train_image_path, args.train_mask_path, args.size)
    if len(dataset) == 0:
        raise SystemExit(
            f"no training images found under {args.train_image_path!r} "
            f"(masks: {args.train_mask_path!r})"
        )
    test_data = EvalDataset(args.test_image_path, args.test_gt_path, args.size)

    n_dev = len(jax.devices())
    if jax.default_backend() == "tpu" and n_dev > 1 and not args.shard_map:
        from sam2unet_tpu.ops.pallas import dispatch

        if not dispatch.xla_only():
            # GSPMD cannot partition the Pallas custom calls (CLAUDE.md);
            # shard_map + SyncBN is the supported real-multi-chip path and
            # is numerically identical (tests/test_shard_map_dp.py)
            print(f"[train] {n_dev} TPU chips detected: enabling --shard_map "
                  "(the Pallas kernels cannot ride the GSPMD partitioner)")
            args.shard_map = True

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    bn_axis = None
    if args.shard_map:
        from sam2unet_tpu.parallel.mesh import DATA_AXIS

        bn_axis = DATA_AXIS
    model, _ = build_model(args.model_cfg, dtype=dtype, remat=args.remat,
                           bn_axis=bn_axis)
    variables = init_variables(model, args.size, batch=args.batch_size)
    variables = load_weights(variables, args.hiera_path, args.checkpoint)

    steps_per_epoch = max(1, -(-len(dataset) // args.batch_size))
    optimizer = make_optimizer(
        lr=args.lr,
        weight_decay=args.weight_decay,
        epochs=args.epoch,
        steps_per_epoch=steps_per_epoch,
    )
    mesh = make_mesh()
    state = create_train_state(variables, optimizer)
    if args.resume:
        from sam2unet_tpu.train.checkpoints import restore_train_state

        state = restore_train_state(args.resume, state)
        print(f"Resumed full train state from {args.resume} "
              f"(step {int(state.step)})")
    state = replicate(mesh, state)
    train_step = make_train_step(model, optimizer, mesh=mesh,
                                 use_shard_map=args.shard_map)
    eval_step = make_eval_step(model, mesh=mesh, use_shard_map=args.shard_map)

    eval_bs = args.eval_batch_size or args.batch_size
    n_data = int(np.prod(list(mesh.shape.values())))
    for nm, bs in (("--batch_size", args.batch_size),
                   ("--eval_batch_size", eval_bs)):
        if bs % n_data:
            raise SystemExit(
                f"{nm}={bs} is not divisible by the {n_data}-device data "
                "axis; pick a multiple so batches shard evenly (a partial "
                "shard would otherwise fail AFTER the first epoch trains)"
            )
    os.makedirs(args.save_path, exist_ok=True)
    log_path = os.path.join(args.save_path, "log.txt")
    policy = CheckpointPolicy(
        args.save_path, args.base_mean_iou, args.save_interval, args.epoch
    )

    epoch_loss = 2.0
    global_step = 0
    profiling = False
    for epoch in range(args.epoch):
        print("Training:")
        t_epoch = time.perf_counter()
        n_imgs = 0
        for i, batch in enumerate(
            dataset.epoch(args.batch_size, epoch, num_workers=args.num_workers)
        ):
            if args.profile_dir and global_step == 10:
                jax.profiler.start_trace(args.profile_dir)
                profiling = True
            images = shard_batch(mesh, batch.image)
            labels = shard_batch(mesh, batch.label)
            state, metrics = train_step(state, images, labels)
            n_imgs += batch.valid
            global_step += 1
            if profiling and global_step == 15:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                profiling = False
                print(f"profiler trace written to {args.profile_dir}")
            if i % 10 == 0:
                epoch_loss = float(metrics["loss"])
                print(f"epoch-{epoch + 1}-{i + 1}: loss:{epoch_loss}")
        if profiling:
            # run ended before the 5-step window filled: flush what we have
            jax.block_until_ready(metrics["loss"])
            jax.profiler.stop_trace()
            profiling = False
            print(f"profiler trace (short run) written to {args.profile_dir}")
        epoch_loss = float(metrics["loss"])
        dt = time.perf_counter() - t_epoch
        print(f"epoch-{epoch + 1}: {n_imgs} imgs in {dt:.1f}s "
              f"({n_imgs / max(dt, 1e-9):.2f} img/s)")

        print("Evaluating", end="")
        t_eval = time.perf_counter()
        eval_vars = state.variables()
        if not args.full_eval:
            from sam2unet_tpu.eval.metrics_device import batched_semantic_metrics
            from sam2unet_tpu.train.engine import (
                letterbox_valid_mask,
                postprocess_logits,
            )

            ious, dices, count = [], [], 0
            for eb in test_data.batches(eval_bs, letterbox_gt=True):
                logits, _, _ = eval_step(eval_vars, shard_batch(mesh, eb["image"]))
                paddings = jnp.asarray(eb["padding"])
                probs = postprocess_logits(logits, paddings, args.size)[..., 0]
                valid = np.arange(eval_bs) < eb["valid"]
                # pixel mask -> reference-exact binarization (per-image
                # min-max over the un-padded region, train.py:109-112), so
                # the checkpoint-gate mIoU is the reference's metric
                pix = letterbox_valid_mask(
                    paddings, args.size, probs.shape[1], probs.shape[2]
                )[..., 0]
                iou, dice = batched_semantic_metrics(
                    probs, jnp.asarray(eb["gt_letterboxed"]),
                    jnp.asarray(valid), pix,
                )
                # one batched readback (async copies share the round trip)
                iou, dice = jax.device_get((iou, dice))
                ious.append(iou)
                dices.append(dice)
                count += eb["valid"]
                print(".", end="", flush=True)
            final_result = {
                MIOU: float(np.concatenate(ious).sum() / count),
                "mDice": float(np.concatenate(dices).sum() / count),
                "images_count": count,
            }
        else:
            results = []
            for bi, eb in enumerate(test_data.batches(eval_bs)):
                logits, _, _ = eval_step(eval_vars, shard_batch(mesh, eb["image"]))
                logits = np.asarray(logits)
                for j in range(eb["valid"]):
                    res = postprocess_prediction(
                        logits[j : j + 1], eb["padding"][j], args.size,
                        eb["gt"][j].shape,
                    )
                    results.append(
                        evaluate_segmentation_performance(res, eb["gt"][j])
                    )
                    if (bi * eval_bs + j) % 10 == 0:
                        print(".", end="", flush=True)
            final_result = evaluate_dataset(results)
        dt_eval = time.perf_counter() - t_eval
        # final_result['images_count'] is the GT *instance* count on the
        # host path (reference quirk, eval.py:200) — report real images
        print(f"\nepoch-{epoch + 1} eval: {test_data.count} imgs "
              f"in {dt_eval:.1f}s "
              f"({'host' if args.full_eval else 'device'} path)")
        epoch_name = f"epoch-{epoch + 1}_loss-{epoch_loss:.3f}"
        print_eval_report(final_result, title=epoch_name, log_path=log_path)
        saved = policy.maybe_save(
            epoch + 1, epoch_loss, final_result[MIOU], eval_vars
        )
        if saved and args.save_train_state:
            from sam2unet_tpu.train.checkpoints import save_train_state

            save_train_state(saved + "_train_state", state)


def run() -> None:
    main(build_parser().parse_args())


if __name__ == "__main__":
    run()
