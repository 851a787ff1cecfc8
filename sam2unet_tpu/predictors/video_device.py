"""Device-resident memory bank for the streaming video tracker.

TPU-first redesign of the reference's per-frame memory handling
(sam2/sam2_video_predictor.py:761-825, 801-813): where the reference keeps
the memory bank as a dict of GPU tensors and rebuilds the conditioning
stack eagerly every frame, here the bank lives in fixed-shape device
arrays — a cond-frame bank uploaded once per propagation pass plus two
ring buffers (mask-memory grids, object pointers) updated IN PLACE by the
single jitted track step. The host never touches memory bytes in the
steady state; per frame it computes a handful of int32 gather indices +
validity bits (pure functions of the frame number and the host's mirror of
ring contents) and uploads one uint8 frame.

Layout invariants that make this numerically identical to the host-
gathered path (predictors/video_predictor.py::_gather_memory):
- memory tokens are whole hw-aligned grids, so axial RoPE (which repeats
  per grid) is order-invariant across grids;
- object-pointer tokens carry no RoPE (num_k_exclude_rope) and have
  per-token time encodings, so their order is free too;
- invalid slots are masked out of the cross-attention softmax via
  `memory_valid`, exactly like the padded host path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.partial(jax.jit, donate_argnums=(0,))
def _ring_write(ring, val, slot):
    """In-place (donated) ring-slot write. Module-level so the jit cache is
    shared across DeviceMemoryBank instances — one bank is built per
    propagation pass, and a per-instance lambda re-hit the slow remote
    compile service on every pass."""
    return lax.dynamic_update_index_in_dim(ring, val, slot, 0)


class DeviceMemoryBank:
    """Fixed-shape device arrays + host mirrors for one propagation pass.

    grid ring capacity covers the selection window of
    _gather_memory's stride math: at frame f the oldest needed non-cond
    memory is f -+ (1 + (num_maskmem - 2) * r), so a ring of
    (num_maskmem - 2) * r + 2 slots keyed on `frame % cap` always holds
    every live frame without collisions.
    """

    def __init__(self, predictor, state, output_dict, batch_size: int):
        cfg = predictor.cfg
        self.cfg = cfg
        self.predictor = predictor
        r = cfg.memory_temporal_stride_for_eval
        self.grid_cap = max((cfg.num_maskmem - 2) * r + 2, 1)
        self.ptr_cap = max(cfg.max_obj_ptrs_in_encoder, 1)
        dtype = predictor.model.dtype

        cond = output_dict["cond_frame_outputs"]
        self.cond_frames = sorted(cond)
        assert self.cond_frames, "device bank needs at least one cond frame"
        feats0 = np.asarray(cond[self.cond_frames[0]]["maskmem_features"],
                            np.float32)
        b, h, w, c = feats0.shape
        assert b == batch_size, (b, batch_size)
        self.hw, self.mem_dim = h * w, c

        grids, ptrs = [], []
        for t in self.cond_frames:
            f = np.asarray(cond[t]["maskmem_features"], np.float32)
            grids.append(f.reshape(b, self.hw, c))
            ptrs.append(np.asarray(cond[t]["obj_ptr"], np.float32))
        self.cond_mem = jnp.asarray(np.stack(grids), dtype)
        self.cond_ptr = jnp.asarray(np.stack(ptrs), jnp.float32)

        penc = np.asarray(cond[self.cond_frames[0]]["maskmem_pos_enc"][-1],
                          np.float32)
        self.spatial_penc = jnp.asarray(penc.reshape(self.hw, c), jnp.float32)
        # legacy-format pos-enc list stored into output_dict entries so the
        # interactive (host-gather) path keeps working on device outputs
        self.penc_list = [penc.reshape(1, h, w, c)]

        self.grid_ring = jnp.zeros((self.grid_cap, b, self.hw, c), dtype)
        self.ptr_ring = jnp.zeros((self.ptr_cap, b, cfg.hidden_dim),
                                  jnp.float32)
        self.grid_frames = [-1] * self.grid_cap  # abs frame idx per slot
        self.ptr_frames = [-1] * self.ptr_cap

    # ------------------------------------------------------------- seeding

    def _grid_pool_idx(self, frame_idx: int, output_dict, unselected_cond):
        """Pool index (cond slots first, then ring) of `frame_idx`'s mask
        memory, lazily uploading ring entries from output_dict (covers
        pass-start frames tracked before this pass began); -1 if absent."""
        out = output_dict["non_cond_frame_outputs"].get(frame_idx)
        if out is not None and out.get("maskmem_features") is not None:
            slot = frame_idx % self.grid_cap
            if self.grid_frames[slot] != frame_idx:
                feats = jnp.asarray(
                    np.asarray(out["maskmem_features"], np.float32).reshape(
                        -1, self.hw, self.mem_dim
                    ),
                    self.grid_ring.dtype,
                )
                self.grid_ring = _ring_write(self.grid_ring, feats, slot)
                self.grid_frames[slot] = frame_idx
            return len(self.cond_frames) + slot
        if frame_idx in unselected_cond:
            return self.cond_frames.index(frame_idx)
        return -1

    def _ptr_pool_idx(self, frame_idx: int, output_dict, unselected_cond):
        out = output_dict["non_cond_frame_outputs"].get(
            frame_idx, unselected_cond.get(frame_idx)
        )
        if out is None:
            return -1
        if frame_idx in self.cond_frames:
            return self.cond_frames.index(frame_idx)
        slot = frame_idx % self.ptr_cap
        if self.ptr_frames[slot] != frame_idx:
            ptr = jnp.asarray(
                np.asarray(out["obj_ptr"], np.float32), jnp.float32
            )
            self.ptr_ring = _ring_write(self.ptr_ring, ptr, slot)
            self.ptr_frames[slot] = frame_idx
        return len(self.cond_frames) + slot

    # ----------------------------------------------------------- selection

    def gather_meta(self, state, output_dict, frame_idx: int, reverse: bool):
        """Host half of the per-frame memory selection: same frame choices
        as _gather_memory (sam2_base.py:504-662 semantics), emitted as
        gather indices + validity instead of gathered bytes."""
        from sam2unet_tpu.predictors.video_predictor import (
            select_closest_cond_frames,
        )

        cfg = self.cfg
        n_cond = len(self.cond_frames)
        selected_cond, unselected_cond = select_closest_cond_frames(
            frame_idx, output_dict["cond_frame_outputs"],
            cfg.max_cond_frames_in_attn,
        )

        n_grid_slots = n_cond + cfg.num_maskmem - 1
        g_idx = np.zeros(n_grid_slots, np.int32)
        g_tpos = np.zeros(n_grid_slots, np.int32)
        g_valid = np.zeros(n_grid_slots, bool)
        for i, t in enumerate(self.cond_frames):  # t_pos = 0 slots
            g_idx[i] = i
            g_tpos[i] = cfg.num_maskmem - 1
            g_valid[i] = t in selected_cond

        r = cfg.memory_temporal_stride_for_eval
        for t_pos in range(1, cfg.num_maskmem):
            t_rel = cfg.num_maskmem - t_pos
            if t_rel == 1:
                prev = frame_idx + t_rel if reverse else frame_idx - t_rel
            elif not reverse:
                prev = ((frame_idx - 2) // r) * r - (t_rel - 2) * r
            else:
                prev = -(-(frame_idx + 2) // r) * r + (t_rel - 2) * r
            slot = n_cond + t_pos - 1
            pool = self._grid_pool_idx(prev, output_dict, unselected_cond)
            g_idx[slot] = max(pool, 0)
            g_tpos[slot] = cfg.num_maskmem - t_pos - 1
            g_valid[slot] = pool >= 0

        meta = {
            "g_idx": g_idx, "g_tpos": g_tpos, "g_valid": g_valid,
            "store_slot": np.int32(frame_idx % self.grid_cap),
            "ptr_store_slot": np.int32(frame_idx % self.ptr_cap),
        }

        if cfg.use_obj_ptrs_in_encoder:
            max_ptrs = min(state["num_frames"], cfg.max_obj_ptrs_in_encoder)
            # slot count bounds what the reference actually attends to:
            # EVERY selected cond pointer plus up to max - 1 non-cond ones
            # (sam2_base.py:570-620) — a flat max_obj_ptrs_in_encoder cap
            # silently dropped pointers with >1 cond frame. Mirrors the
            # host path's pad target (video_predictor.py::_gather_memory).
            n_ptr_slots = n_cond + cfg.max_obj_ptrs_in_encoder - 1
            p_idx = np.zeros(n_ptr_slots, np.int32)
            p_tdiff = np.zeros(n_ptr_slots, np.float32)
            p_valid = np.zeros(n_ptr_slots, bool)
            k = 0
            if cfg.only_obj_ptrs_in_the_past_for_eval:
                ptr_cond = [
                    t for t in selected_cond
                    if (t >= frame_idx if reverse else t <= frame_idx)
                ]
            else:
                ptr_cond = list(selected_cond)
            for t in ptr_cond:  # len(ptr_cond) <= n_cond: always fits
                p_idx[k] = self.cond_frames.index(t)
                p_tdiff[k] = abs(frame_idx - t)
                p_valid[k] = True
                k += 1
            for t_diff in range(1, max_ptrs):  # <= max - 1 entries: fits
                t = frame_idx + t_diff if reverse else frame_idx - t_diff
                if t < 0 or t >= state["num_frames"]:
                    break
                pool = self._ptr_pool_idx(t, output_dict, unselected_cond)
                if pool >= 0:
                    p_idx[k] = pool
                    p_tdiff[k] = t_diff
                    p_valid[k] = True
                    k += 1
            meta.update(
                p_idx=p_idx, p_tdiff=p_tdiff, p_valid=p_valid,
                t_diff_max=np.float32(max(max_ptrs - 1, 1)),
            )
        return meta

    def note_tracked(self, frame_idx: int) -> None:
        """Record the in-step ring writes after the step ran."""
        self.grid_frames[frame_idx % self.grid_cap] = frame_idx
        self.ptr_frames[frame_idx % self.ptr_cap] = frame_idx


def pack_bits_width(m: jnp.ndarray) -> jnp.ndarray:
    """Bit-pack a bool array along its last (width) axis into uint8 —
    same layout as np.unpackbits expects (MSB first). Cuts serving
    readback bytes 8x vs bool (docs/PERF.md: 29 vs 57 ms at 720x960)."""
    wpad = (-m.shape[-1]) % 8
    if wpad:
        pad = [(0, 0)] * (m.ndim - 1) + [(0, wpad)]
        m = jnp.pad(m, pad)
    u = m.reshape(*m.shape[:-1], -1, 8).astype(jnp.uint8)
    bits = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return jnp.sum(u * bits, axis=-1, dtype=jnp.uint8)


def build_device_track_step(predictor):
    """One jitted program per propagated frame: uint8 frame in -> device
    preprocess -> image encoder -> memory attention over the device bank ->
    SAM heads -> memory encoder -> in-place ring update -> video-res masks.

    Replaces the reference's eager per-frame graph + storage-device memory
    dict (sam2_video_predictor.py:761-825) with a single fixed-shape
    XLA program; rings are donated so the bank is updated in place.
    """
    from sam2unet_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
    from sam2unet_tpu.models.position_encoding import get_1d_sine_pe
    from sam2unet_tpu.models.sam2_base import SAM2Base
    from sam2unet_tpu.ops.resize import resize

    model = predictor.model
    cfg = predictor.cfg
    C, mem_dim = cfg.hidden_dim, cfg.mem_dim
    split = C // mem_dim if mem_dim < C else 1
    use_ptrs = cfg.use_obj_ptrs_in_encoder
    multimask = model.use_multimask(is_init_cond_frame=False, num_pts=0)
    fill_hole_area = predictor.fill_hole_area
    non_overlap = predictor.non_overlap_masks
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)

    def step(v, frame_u8, cond_mem, cond_ptr, spatial_penc, grid_ring,
             ptr_ring, g_idx, g_tpos, g_valid, store_slot, ptr_store_slot,
             p_idx=None, p_tdiff=None, p_valid=None, t_diff_max=None,
             pack_masks=False):
        vh, vw = frame_u8.shape[0], frame_u8.shape[1]
        b = cond_mem.shape[1]
        hw = cond_mem.shape[2]

        def run(mm: SAM2Base):
            # --- frame preprocess (SAM2Transforms semantics, on device) ---
            img = frame_u8.astype(jnp.float32) / 255.0
            img = resize(img[None], (cfg.image_size, cfg.image_size),
                         "bilinear", antialias=True)
            img = (img - mean) / std

            backbone = mm.forward_image(img)
            fpn, pos = backbone["backbone_fpn"], backbone["vision_pos_enc"]
            top = jnp.repeat(fpn[-1], b, axis=0)
            top_pos = jnp.repeat(pos[-1], b, axis=0)
            hr0 = jnp.repeat(fpn[0], b, axis=0)
            hr1 = jnp.repeat(fpn[1], b, axis=0)

            # --- assemble memory from the device pools ------------------
            pool = jnp.concatenate([cond_mem, grid_ring], axis=0)
            grids = pool[g_idx]                       # (G, B, hw, mem)
            tpos = mm.maskmem_tpos_enc[g_tpos].astype(jnp.float32)
            gpos = spatial_penc[None, None] + tpos    # (G, 1, hw, mem)
            n_g = grids.shape[0]
            mem_tok = grids.transpose(1, 0, 2, 3).reshape(b, n_g * hw, -1)
            pos_tok = (
                jnp.broadcast_to(gpos, (n_g, b, hw, mem_dim))
                .transpose(1, 0, 2, 3).reshape(b, n_g * hw, mem_dim)
            )
            valid = jnp.repeat(g_valid, hw)
            nptr = 0
            if use_ptrs:
                # token count rides the (static) gather-meta shape:
                # n_cond + max_obj_ptrs_in_encoder - 1 slots per pointer
                ptr_slots = p_idx.shape[0] * split
                ptr_pool = jnp.concatenate([cond_ptr, ptr_ring], axis=0)
                ptrs = ptr_pool[p_idx].transpose(1, 0, 2)  # (B, P, C)
                if cfg.add_tpos_enc_to_obj_ptrs:
                    tdim = C if cfg.proj_tpos_enc_in_obj_ptrs else mem_dim
                    obj_pos = get_1d_sine_pe(p_tdiff / t_diff_max, tdim)
                    if cfg.proj_tpos_enc_in_obj_ptrs:
                        obj_pos = mm.obj_ptr_tpos_proj(obj_pos)
                    obj_pos = obj_pos.astype(jnp.float32)
                else:
                    obj_pos = jnp.zeros((p_idx.shape[0], mem_dim),
                                        jnp.float32)
                if mem_dim < C:
                    ptrs = ptrs.reshape(b, -1, split, mem_dim).reshape(
                        b, -1, mem_dim
                    )
                    obj_pos = jnp.repeat(obj_pos, split, axis=0)
                obj_pos = jnp.broadcast_to(
                    obj_pos[None], (b, ptr_slots, mem_dim)
                )
                mem_tok = jnp.concatenate([mem_tok, ptrs], axis=1)
                pos_tok = jnp.concatenate([pos_tok, obj_pos], axis=1)
                valid = jnp.concatenate(
                    [valid, jnp.repeat(p_valid, split)]
                )
                nptr = ptr_slots

            dt = mm.dtype
            mem_tok = mem_tok.astype(dt)
            pos_tok = pos_tok.astype(dt)
            valid_b = jnp.broadcast_to(valid[None], mem_tok.shape[:2])

            pix = mm.condition_features_on_memory(
                top, top_pos, mem_tok, pos_tok, nptr, memory_valid=valid_b
            )
            coords = jnp.zeros((b, 1, 2), jnp.float32)
            labels = -jnp.ones((b, 1), jnp.int32)
            outs = mm.forward_sam_heads(
                pix, coords, labels, None, (hr0, hr1), multimask
            )
            _, _, _, low_res_masks, high_res_masks, obj_ptr, obj_scores = outs
            feats, _ = mm.encode_new_memory(
                top, high_res_masks, is_mask_from_pts=False
            )

            # --- ring updates (donated: in-place on device) -------------
            new_grid_ring = lax.dynamic_update_index_in_dim(
                grid_ring, feats.reshape(b, hw, -1).astype(grid_ring.dtype),
                store_slot, 0,
            )
            new_ptr_ring = lax.dynamic_update_index_in_dim(
                ptr_ring, obj_ptr.astype(jnp.float32), ptr_store_slot, 0
            )

            # --- outputs -------------------------------------------------
            low = low_res_masks.astype(jnp.float32)
            if fill_hole_area > 0:
                from sam2unet_tpu.ops.connected_components import (
                    label_components_jax,
                )

                lbl, areas = label_components_jax(
                    (low <= 0).astype(jnp.uint8)
                )
                is_hole = (lbl > 0) & (areas <= fill_hole_area)
                low = jnp.where(is_hole, jnp.float32(0.1), low)
            video_res = resize(
                low.transpose(0, 2, 3, 1), (vh, vw), "bilinear"
            ).transpose(0, 3, 1, 2)
            if non_overlap:
                video_res = SAM2Base.apply_non_overlapping_constraints(
                    video_res
                )
            packed = (
                pack_bits_width(video_res > 0) if pack_masks else jnp.zeros(
                    (), jnp.uint8
                )
            )
            return (new_grid_ring, new_ptr_ring, low, video_res, packed,
                    obj_ptr.astype(jnp.float32), feats, obj_scores)

        return model.apply(v, method=run)

    return jax.jit(
        step, donate_argnums=(5, 6), static_argnames=("pack_masks",)
    )
