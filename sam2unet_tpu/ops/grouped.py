"""Persistent valid-window-group token layout for remainder grids.

The round-5 train HLO audit (docs/PERF.md R5-E4) showed the valid-group
partitioned path re-partitions and re-merges the full activation around
EVERY dim-preserving block at remainder window geometries — at
hiera_l@352 stage 3 (22x22 grid, window 16, 35 blocks) that is ~70
slice/pad/reshape/copy instructions of ~17.8 MB each per train step,
in the forward AND again in the backward.

But every op between the partition and the merge is one of:
  * per-token (LayerNorm, the MLP tail, the PEFT adapter),
  * per-window (windowed attention over the valid-group kernels), or
  * permutation-equivariant over the full token set (global attention —
    softmax attention has no positional structure of its own; the
    pos-embed was added once at trunk entry).

So the group layout can PERSIST across the whole run of dim-preserving
blocks: partition once at run entry, merge once at run exit (the Hiera
loop orchestrates this; each MultiScaleBlock consumes/produces
GroupedTokens in between). The per-block partition/merge HBM copies —
the largest remaining write category of the train step — never happen.

Numerics: identical kernel calls per window group (same tensors, same
synthetic-pad-key counts) as the per-block valid-group path; global
attention sees the same token set in a different order, which is
mathematically identical and numerically within reordered-sum noise.

Reference behavior being reproduced: the zero-padded window attention of
sam2/modeling/backbones/utils.py:16-55 + hieradet.py:112-167, via the
pad-free valid-group decomposition of ops/windowing.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sam2unet_tpu.ops.windowing import (
    window_merge_valid,
    window_partition_valid,
)


class GroupedTokens:
    """A (B, H, W, C) activation held as valid-window-group token rows.

    groups: tuple of (B*nW_g, S_g, C) tensors — batch-major window rows,
    tokens row-major within each window (exactly what the fused window
    kernels consume). n_pads aligns with groups: the synthetic-pad-key
    count per window (window_partition_valid). geoms holds each group's
    (gh, gw) window shape for the merge.
    """

    def __init__(self, groups, n_pads, geoms, b, h, w, window):
        self.groups = tuple(groups)
        self.n_pads = tuple(n_pads)
        self.geoms = tuple(geoms)
        self.b = b
        self.h = h
        self.w = w
        self.window = window

    # -- construction / materialization ---------------------------------
    @classmethod
    def from_dense(cls, x: jnp.ndarray, window: int) -> "GroupedTokens":
        b, h, w, c = x.shape
        gs, pads, geoms = [], [], []
        for g, n_pad in window_partition_valid(x, window):
            nw_, gh, gw, _ = g.shape
            gs.append(g.reshape(nw_, gh * gw, c))
            pads.append(n_pad)
            geoms.append((gh, gw))
        return cls(gs, pads, geoms, b, h, w, window)

    def to_dense(self) -> jnp.ndarray:
        outs = [
            g.reshape(g.shape[0], gh, gw, g.shape[-1])
            for g, (gh, gw) in zip(self.groups, self.geoms)
        ]
        return window_merge_valid(outs, self.b, self.h, self.w, self.window)

    def with_groups(self, new_groups) -> "GroupedTokens":
        return GroupedTokens(new_groups, self.n_pads, self.geoms,
                             self.b, self.h, self.w, self.window)

    # -- global attention over the full token set -----------------------
    def concat_tokens(self) -> jnp.ndarray:
        """(B, H*W, C) with tokens in group/window-major order: a free
        batch-major reshape per group plus one concatenate. Global
        attention is permutation-equivariant over the token axis, so
        this order is as good as the row-major grid order."""
        parts = [g.reshape(self.b, -1, g.shape[-1]) for g in self.groups]
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)

    def split_tokens(self, x: jnp.ndarray) -> "GroupedTokens":
        """Inverse of concat_tokens for a same-token-order (B, S, C)."""
        outs, i = [], 0
        for g in self.groups:
            n = (g.shape[0] // self.b) * g.shape[1]
            outs.append(x[:, i:i + n].reshape(g.shape[0], g.shape[1], -1))
            i += n
        return self.with_groups(outs)

    # -- conveniences ----------------------------------------------------
    def astype(self, dtype) -> "GroupedTokens":
        return self.with_groups([g.astype(dtype) for g in self.groups])

    @property
    def dtype(self):
        return self.groups[0].dtype

    @property
    def shape(self):
        return (self.b, self.h, self.w, self.groups[0].shape[-1])


def _flatten(gt: GroupedTokens):
    aux = (gt.n_pads, gt.geoms, gt.b, gt.h, gt.w, gt.window)
    return gt.groups, aux


def _unflatten(aux, children):
    n_pads, geoms, b, h, w, window = aux
    return GroupedTokens(children, n_pads, geoms, b, h, w, window)


jax.tree_util.register_pytree_node(GroupedTokens, _flatten, _unflatten)
