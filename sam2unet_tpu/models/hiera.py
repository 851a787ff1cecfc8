"""Hiera trunk (hierarchical ViT with windowed attention) — TPU-native.

Re-design of sam2/modeling/backbones/hieradet.py:170-292 for XLA:
  - NHWC throughout; window partition is pure reshape/transpose that XLA
    folds away, so all attention runs as one large batched matmul per block.
  - Q-pooling at stage changes is lax.reduce_window max (hieradet.py:110).
  - Pos-embed = bicubic-resized background grid + tiled window grid
    (hieradet.py:268-276) built with the MXU-matmul resizer in ops/resize.
  - Optionally wraps each block with a PEFT Adapter (prompt MLP added to the
    block input, SAM2UNet.py:52-65) — the fork's trainable path.

Static shapes only: the grid sizes for every block are derived from the
input size at trace time, so jit sees a fixed program.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sam2unet_tpu.configs import HieraConfig
from sam2unet_tpu.nn.layers import MLP, DropPath, gelu, layer_norm
from sam2unet_tpu.ops.attention import sdpa
from sam2unet_tpu.ops.pallas.fused_transition import (
    transition_bwd_supported,
)
from sam2unet_tpu.ops.pooling import max_pool2d
from sam2unet_tpu.ops.resize import resize
from sam2unet_tpu.ops.windowing import window_partition, window_unpartition


class MultiScaleAttention(nn.Module):
    """Attention with optional 2x2 max q-pool (hieradet.py:35-81).

    Split into `project_qkv` / `attend` so the block can fuse the pre-norm
    into the QKV matmul (one Pallas kernel over the un-partitioned tensor)
    and window-partition the projected qkv instead of the activations."""

    dim: int
    dim_out: int
    num_heads: int
    q_stride: tuple[int, int] | None = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        from sam2unet_tpu.nn.layers import _DenseParams

        self.qkv = _DenseParams(self.dim, 3 * self.dim_out)
        self.proj = _DenseParams(self.dim_out, self.dim_out)

    def project_qkv(self, x: jnp.ndarray, ln_scale=None, ln_bias=None,
                    add_bias: bool = True):
        """x: (..., dim) -> (..., 3*dim_out); optional fused pre-norm.
        add_bias=False defers the projection bias to the window-pad fill."""
        if ln_scale is not None:
            from sam2unet_tpu.ops.pallas.fused_mlp import fused_ln_matmul

            return fused_ln_matmul(
                x.astype(self.dtype), self.qkv.kernel, self.qkv.bias,
                ln_scale, ln_bias, add_bias,
            )
        y = jnp.dot(
            x.astype(self.dtype), self.qkv.kernel.astype(self.dtype)
        )
        if add_bias:
            y = y + self.qkv.bias.astype(self.dtype)
        return y

    def _split_heads(self, qkv: jnp.ndarray, bias):
        """Slice contiguous q/k/v channel blocks (+ deferred bias) and shape
        to (B, S, heads, head_dim)."""
        b, h, w, _ = qkv.shape
        c, nh = self.dim_out, self.num_heads
        q = qkv[..., :c]
        k = qkv[..., c : 2 * c]
        v = qkv[..., 2 * c :]
        if bias is not None:
            bias = bias.astype(qkv.dtype)
            q = q + bias[:c]
            k = k + bias[c : 2 * c]
            v = v + bias[2 * c :]
        s = h * w
        return (q.reshape(b, s, nh, -1), k.reshape(b, s, nh, -1),
                v.reshape(b, s, nh, -1))

    @property
    def head_dim(self) -> int:
        return self.dim_out // self.num_heads

    def project_out(self, o: jnp.ndarray) -> jnp.ndarray:
        o = jnp.dot(o.astype(self.dtype), self.proj.kernel.astype(self.dtype))
        return o + self.proj.bias.astype(self.dtype)

    def attend(self, qkv: jnp.ndarray, bias=None) -> jnp.ndarray:
        """qkv: (B', h, w, 3*dim_out) (windowed or full grid). `bias` is the
        deferred projection bias; adding it to the q/k/v slices fuses into
        the attention matmul operands (pads included — exact reference
        semantics)."""
        b, h, w, _ = qkv.shape
        # q/k/v are contiguous channel blocks of the projection output
        # (feature order is [3, heads, head_dim]) — slicing the last dim is
        # layout-free, unlike the reference's 5-D reshape + unbind
        q, k, v = self._split_heads(qkv, bias)

        if self.q_stride is not None:
            q = q.reshape(b, h, w, -1)
            q = max_pool2d(q, self.q_stride[0], self.q_stride[0])
            h, w = q.shape[1], q.shape[2]
            q = q.reshape(b, h * w, self.num_heads, -1)

        o = sdpa(q, k, v)  # (B, S, heads, head_dim)
        return self.project_out(o.reshape(b, h, w, -1))

    def __call__(self, x: jnp.ndarray, ln_scale=None, ln_bias=None):
        return self.attend(self.project_qkv(x, ln_scale, ln_bias))


class MultiScaleBlock(nn.Module):
    """Pre-norm windowed attention block (hieradet.py:84-167)."""

    dim: int
    dim_out: int
    num_heads: int
    window_size: int  # 0 => global attention
    q_stride: tuple[int, int] | None = None
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    # frozen=True mirrors the fork's hard trunk freeze (SAM2UNet.py:52-65
    # requires_grad_(False)): block weights are wrapped in stop_gradient and
    # the fused kernels skip weight-grad computation entirely.
    frozen: bool = False
    # sequence parallelism for global-attention blocks (window_size == 0):
    # inside a shard_map whose mesh has `sp_axis` of size `sp_degree`, each
    # device computes its token slice of the full-grid attention via ring
    # attention (ops/sp_attention) and the outputs are all-gathered back —
    # the only full-sequence attention in the trunk splits n ways over ICI
    # instead of being replicated (SURVEY §2.4 headroom, engaged).
    sp_axis: str | None = None
    sp_degree: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from sam2unet_tpu.nn.layers import LNParams
        from sam2unet_tpu.ops.grouped import GroupedTokens

        if isinstance(x, GroupedTokens):
            # persistent valid-group token layout (ops/grouped.py): the
            # Hiera loop partitioned once for this whole run of
            # dim-preserving blocks; consume and produce GroupedTokens so
            # the per-block partition/merge HBM copies never happen.
            return self._grouped_call(x, train)

        attn = MultiScaleAttention(
            self.dim, self.dim_out, self.num_heads, self.q_stride,
            self.dtype, name="attn",
        )
        shortcut = x
        h, w = x.shape[1], x.shape[2]
        window = self.window_size

        use_sp = (
            self.sp_axis is not None
            and window == 0
            and self.dim == self.dim_out
            and (h * w) % self.sp_degree == 0
        )
        if use_sp:
            from jax import lax

            from sam2unet_tpu.ops.sp_attention import ring_sdpa

            # raw-param form (same "norm1" scale/bias leaves as
            # nn.LayerNorm) so the fork's hard trunk freeze applies here
            # exactly like the fused branch: stop_gradient on the weights
            # -> dx-only backward, no weight grads computed
            ln1 = LNParams(self.dim, name="norm1")
            wargs = (attn.qkv.kernel, attn.qkv.bias, ln1.scale, ln1.bias,
                     attn.proj.kernel, attn.proj.bias)
            if self.frozen:
                wargs = tuple(jax.lax.stop_gradient(t) for t in wargs)
            wq, bq, lns, lnb, wp, bp = wargs
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
            xn = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * lns + lnb).astype(
                self.dtype
            )
            qkv = jnp.dot(xn, wq.astype(self.dtype)) + bq.astype(self.dtype)
            q, k, v = attn._split_heads(qkv, None)
            b = x.shape[0]
            sl = (h * w) // self.sp_degree
            i0 = lax.axis_index(self.sp_axis) * sl
            o_loc = ring_sdpa(
                lax.dynamic_slice_in_dim(q, i0, sl, 1),
                lax.dynamic_slice_in_dim(k, i0, sl, 1),
                lax.dynamic_slice_in_dim(v, i0, sl, 1),
                self.sp_axis,
            )
            o = lax.all_gather(o_loc, self.sp_axis, axis=1, tiled=True)
            y = jnp.dot(
                o.reshape(b, h, w, -1).astype(self.dtype),
                wp.astype(self.dtype),
            ) + bp.astype(self.dtype)
            dp = DropPath(self.drop_path, name="drop_path")
            x = shortcut + dp(y, train)

        # Dim-preserving blocks run as ONE Pallas program per window group:
        # LN -> QKV -> attention (synthetic pad key for remainder groups) ->
        # proj -> residual, everything between x-in and y-out stays in VMEM
        # (ops/pallas/fused_attention_block.py). The raw activations are
        # partitioned first (C-wide transpose; exact because neither window
        # path pads: divisible grids partition cleanly, remainder grids use
        # valid-token groups). With an active DropPath the residual is kept
        # outside the kernel.
        elif self.dim == self.dim_out:
            assert self.q_stride is None, "q-pool implies a dim change"
            from sam2unet_tpu.ops.pallas.fused_attention_block import (
                fused_window_block,
            )

            ln1 = LNParams(self.dim, name="norm1")
            fuse_res = not (train and self.drop_path > 0.0)
            wargs = (attn.qkv.kernel, attn.qkv.bias, ln1.scale, ln1.bias,
                     attn.proj.kernel, attn.proj.bias)
            if self.frozen:
                wargs = tuple(jax.lax.stop_gradient(t) for t in wargs)
            kargs = dict(num_heads=self.num_heads, residual=fuse_res,
                         weight_grads=not self.frozen)
            b = x.shape[0]
            xd = x.astype(self.dtype)
            from sam2unet_tpu.ops.pallas import dispatch as _dispatch
            from sam2unet_tpu.ops.pallas.fused_attention_block import (
                strips_rem_supported,
            )

            # Remainder/16-unaligned grids (hiera_s@960 stage 3: 60x60 w14;
            # hiera_l@352 stages 3-4: 22x22 w16, 11x11 w8 — the reference
            # fork's shipped operating points) take the remainder-strip
            # kernel when it engages: in-VMEM zero pads + alignment key
            # mask, no partition/merge HBM copies (docs/PERF.md round 5).
            # EVAL ONLY: under train the s@960 stage-3 backward lands in
            # the serialized window-as-grid-axis regime and the step loses
            # 1.4% vs the partitioned path (same-session A/B, docs/PERF.md
            # R5-E1) — and the rem kernel is dx-only anyway, so unfrozen
            # training never qualified. Geometries past the VMEM gate also
            # fall back.
            rem_grid = window > 0 and (
                h % window or w % window or (window * window) % 16)
            use_rem_strips = (
                rem_grid
                and not _dispatch.xla_only()
                and not train
                and strips_rem_supported(h, w, window, xd.shape[-1],
                                         self.num_heads,
                                         xd.dtype.itemsize,
                                         bwd=False))
            if rem_grid and not use_rem_strips and (h % window
                                                    or w % window):
                # NOTE: a whole-grid masked single call (block-diagonal
                # window mask + per-query pad-key multiplicity, supported by
                # the kernel via attn_mask/pad_logmult) measured SLOWER than
                # these valid groups at 352 — 241.6/81.6 vs 261.8/88.2
                # img/s — the S^2 score blowup outweighs the saved
                # partition/merge slices.
                from sam2unet_tpu.ops.windowing import (
                    window_merge_valid,
                    window_partition_valid,
                )

                outs = []
                for g, n_pad in window_partition_valid(xd, window):
                    nw_, gh, gw, c = g.shape
                    o = fused_window_block(g.reshape(nw_, gh * gw, c),
                                           *wargs, n_pad=n_pad, **kargs)
                    outs.append(o.reshape(nw_, gh, gw, c))
                y = window_merge_valid(outs, b, h, w, window)
            elif use_rem_strips or (window > 0 and h % window == 0
                                    and w % window == 0
                                    and (window * window) % 16 == 0):
                # divisible grid, 16-aligned token count: strip-I/O kernel —
                # the window partition/merge happens IN VMEM (5-D transpose
                # at the first/last head step), so the two full-activation
                # layout copies per block the HLO byte audit flagged
                # (docs/PERF.md round 4) never reach HBM, and the residual
                # saved for backward is the raw x
                from sam2unet_tpu.ops.pallas.fused_attention_block import (
                    fused_window_block_strips,
                )

                y = fused_window_block_strips(xd, *wargs, window=window,
                                              **kargs)
            elif window > 0:
                xw, pad_hw = window_partition(xd, window)
                nw_, wh, ww, c = xw.shape
                o = fused_window_block(xw.reshape(nw_, wh * ww, c),
                                       *wargs, **kargs)
                y = window_unpartition(o.reshape(nw_, wh, ww, c), window,
                                       pad_hw, (h, w))
            else:
                o = fused_window_block(xd.reshape(b, h * w, xd.shape[-1]),
                                       *wargs, **kargs)
                y = o.reshape(b, h, w, -1)
            if fuse_res:
                x = y
            else:
                dp = DropPath(self.drop_path, name="drop_path")
                x = shortcut + dp(y, train)
        elif (
            self.q_stride == (2, 2)
            and window > 0
            and window % 2 == 0
            and (window * window) % 16 == 0
            and h % window == 0
            and w % window == 0
            # Under train, only take the fused transition where its Pallas
            # dx backward actually fits VMEM: the jax.vjp(_xla_transition)
            # fallback inside the custom_vjp materializes the transition's
            # full-resolution intermediates at backward time, which
            # overflowed HBM by 4 GB at s@960 stage 1->2 (round 5) — the
            # unfused path's backward (XLA's own remat schedule) is the
            # right train form there.
            and (not train or (self.frozen and self.drop_path == 0.0
                               and transition_bwd_supported(
                                   window, self.dim_out, w, self.dim)))
        ):
            # q-pool transition on a divisible grid: one strip-I/O Pallas
            # program (LN + shortcut Dense/pool + windowed qkv + in-window
            # q-pool + attention + proj + residual). The full-resolution
            # qkv/LN tensors — the top HBM writers in the round-4 byte
            # audit (docs/PERF.md) — never leave VMEM; only the 4x-smaller
            # pooled output is written: infer +9.7%. Training takes this
            # path too when the trunk is FROZEN (the fork's only train
            # config): the dx-only Pallas backward recomputes the chain in
            # VMEM (fused_transition.py::_transition_bwd_kernel), unlike
            # the earlier XLA-recompute backward that re-materialized what
            # the unfused forward would have saved (measured -1.5%, E2).
            # Unfrozen-trunk or active-DropPath training and remainder
            # grids (hiera_l stage 3->4 at 352) keep the unfused path.
            # Both branches register identical param leaves ("norm1"
            # scale/bias, "proj" kernel/bias), so the split is
            # checkpoint-invisible.
            from sam2unet_tpu.nn.layers import LNParams, _DenseParams
            from sam2unet_tpu.ops.pallas.fused_transition import (
                fused_transition_block,
            )

            ln1 = LNParams(self.dim, name="norm1")
            short = _DenseParams(self.dim, self.dim_out, name="proj")
            wargs = (attn.qkv.kernel, attn.qkv.bias, ln1.scale, ln1.bias,
                     attn.proj.kernel, attn.proj.bias,
                     short.kernel, short.bias)
            if self.frozen:
                wargs = tuple(jax.lax.stop_gradient(t) for t in wargs)
            x = fused_transition_block(
                x.astype(self.dtype), *wargs, num_heads=self.num_heads,
                window=window, weight_grads=not self.frozen,
            )
        else:
            xn = layer_norm(self.dtype, name="norm1")(x)
            shortcut = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(xn)
            if self.q_stride is not None:
                shortcut = max_pool2d(shortcut, self.q_stride[0], self.q_stride[0])
            if window > 0:
                xn, pad_hw = window_partition(xn, window)
            x = attn(xn)
            if self.q_stride is not None:
                # Q-pool halved the token grid; unpartition with the halved
                # window against the pooled shortcut grid (hieradet.py:148-159)
                if self.window_size > 0:
                    window = self.window_size // self.q_stride[0]
                    h2, w2 = shortcut.shape[1], shortcut.shape[2]
                    pad_h = (window - h2 % window) % window
                    pad_w = (window - w2 % window) % window
                    x = window_unpartition(
                        x, window, (h2 + pad_h, w2 + pad_w), (h2, w2)
                    )
            elif window > 0:
                x = window_unpartition(x, window, pad_hw, (h, w))
            dp = DropPath(self.drop_path, name="drop_path")
            x = shortcut + dp(x, train)

        hidden = int(self.dim_out * self.mlp_ratio)
        if self.drop_path == 0.0 or not train:
            # block tail fused into one kernel on TPU: x + MLP(gelu, LN2(x))
            # — LN stats, the 4x hidden, and the residual all stay in VMEM
            from sam2unet_tpu.nn.layers import LNParams, MLPParams
            from sam2unet_tpu.ops.pallas.fused_mlp import fused_mlp

            ln = LNParams(self.dim_out, name="norm2")
            mp = MLPParams(self.dim_out, hidden, self.dim_out, name="mlp")
            margs = (mp.layers_0.kernel, mp.layers_0.bias,
                     mp.layers_1.kernel, mp.layers_1.bias,
                     ln.scale, ln.bias)
            if self.frozen:
                margs = tuple(jax.lax.stop_gradient(t) for t in margs)
            return fused_mlp(
                x.astype(self.dtype), *margs[:4],
                ln_scale=margs[4], ln_bias=margs[5], residual=True,
                weight_grads=not self.frozen,
            )
        y = layer_norm(self.dtype, name="norm2")(x)
        y = MLP(
            hidden,
            self.dim_out,
            num_layers=2,
            activation=gelu,
            dtype=self.dtype,
            name="mlp",
        )(y)
        return x + dp(y, train)

    def _grouped_call(self, x, train: bool):
        """Dim-preserving block over GroupedTokens: the window groups are
        already in kernel layout, so the attention runs one fused kernel
        per group with ZERO partition/merge traffic; a global block
        (window_size == 0) concatenates the token axis (permutation-
        equivariant) and splits it back; the MLP tail is per-token.
        Registers exactly the same param leaves as the dense path."""
        from sam2unet_tpu.nn.layers import LNParams, MLPParams
        from sam2unet_tpu.ops.pallas.fused_attention_block import (
            fused_window_block,
        )
        from sam2unet_tpu.ops.pallas.fused_mlp import fused_mlp

        assert self.dim == self.dim_out and self.q_stride is None
        # the Hiera loop only groups where the residual fuses (no active
        # DropPath): a (B*nW, S, C) batch dim would make DropPath drop
        # per-window instead of per-sample
        assert not (train and self.drop_path > 0.0)
        attn = MultiScaleAttention(
            self.dim, self.dim_out, self.num_heads, None, self.dtype,
            name="attn",
        )
        ln1 = LNParams(self.dim, name="norm1")
        wargs = (attn.qkv.kernel, attn.qkv.bias, ln1.scale, ln1.bias,
                 attn.proj.kernel, attn.proj.bias)
        if self.frozen:
            wargs = tuple(jax.lax.stop_gradient(t) for t in wargs)
        kargs = dict(num_heads=self.num_heads, residual=True,
                     weight_grads=not self.frozen)
        if self.window_size == 0:
            o = fused_window_block(
                x.concat_tokens().astype(self.dtype), *wargs, **kargs)
            x = x.split_tokens(o)
        else:
            x = x.with_groups([
                fused_window_block(g.astype(self.dtype), *wargs,
                                   n_pad=np_, **kargs)
                for g, np_ in zip(x.groups, x.n_pads)
            ])
        hidden = int(self.dim_out * self.mlp_ratio)
        ln = LNParams(self.dim_out, name="norm2")
        mp = MLPParams(self.dim_out, hidden, self.dim_out, name="mlp")
        margs = (mp.layers_0.kernel, mp.layers_0.bias,
                 mp.layers_1.kernel, mp.layers_1.bias, ln.scale, ln.bias)
        if self.frozen:
            margs = tuple(jax.lax.stop_gradient(t) for t in margs)
        return x.with_groups([
            fused_mlp(g.astype(self.dtype), *margs[:4], ln_scale=margs[4],
                      ln_bias=margs[5], residual=True,
                      weight_grads=not self.frozen)
            for g in x.groups
        ])


class AdapterBlock(nn.Module):
    """PEFT wrapper: x + prompt_learn(x) fed to the frozen block
    (SAM2UNet.py:52-65; state-dict prefix `blocks.N.block.*`)."""

    block_kwargs: dict
    adapter_dim: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from sam2unet_tpu.nn.layers import SequentialMLPParams
        from sam2unet_tpu.ops.grouped import GroupedTokens
        from sam2unet_tpu.ops.pallas.fused_mlp import fused_mlp

        dim = self.block_kwargs["dim"]
        # one fused pass: down-proj -> gelu -> up-proj -> gelu -> +x. The
        # unfused form materialized four full-res fp32 erf-GELU chains per
        # adapter (142 MB each at stage 1) — the dominant write source in
        # the post-mega-kernel HLO byte attribution (docs/PERF.md)
        p = SequentialMLPParams(dim, (self.adapter_dim, dim),
                                name="prompt_learn")
        pargs = (p.layers_0.kernel, p.layers_0.bias,
                 p.layers_2.kernel, p.layers_2.bias)
        if isinstance(x, GroupedTokens):
            # the adapter is per-token: apply it to each window group in
            # place, keeping the persistent group layout (ops/grouped.py)
            xa = x.with_groups([
                fused_mlp(g.astype(self.dtype), *pargs,
                          residual=True, gelu_out=True)
                for g in x.groups
            ])
        else:
            xa = fused_mlp(
                x.astype(self.dtype), *pargs, residual=True, gelu_out=True,
            )
        return MultiScaleBlock(**self.block_kwargs, dtype=self.dtype, name="block")(
            xa, train
        )


def _groupable_block(bk: dict, h: int, w: int, itemsize: int,
                     train: bool) -> bool:
    """Can this block run on the persistent GroupedTokens layout?

    True exactly where the dense path would take the per-block
    valid-group partitioned path (or a plain padded partition), i.e.
    where partition/merge HBM copies exist to be hoisted: dim-preserving,
    residual fusable, and a window geometry the strip kernels do NOT
    already handle I/O-free. Global-attention blocks (window 0) are
    token-permutation-equivariant and join any run."""
    if bk["dim"] != bk["dim_out"] or bk["q_stride"] is not None:
        return False
    if train and bk["drop_path"] > 0.0:
        return False  # DropPath needs the per-sample batch dim
    window = bk["window_size"]
    if window == 0:
        return True
    if h % window == 0 and w % window == 0 and (window * window) % 16 == 0:
        return False  # divisible 16-aligned grids: strip kernels win
    from sam2unet_tpu.ops.pallas import dispatch as _dispatch
    from sam2unet_tpu.ops.pallas.fused_attention_block import (
        strips_rem_supported,
    )

    if (not _dispatch.xla_only() and not train
            and strips_rem_supported(h, w, window, bk["dim"],
                                     bk["num_heads"], itemsize, bwd=False)):
        return False  # rem-strip kernels win this geometry (R5-E1)
    return True


def _block_plan(cfg: HieraConfig) -> list[dict]:
    """Static per-block hyperparameters (hieradet.py:232-260)."""
    plan = []
    embed_dim, num_heads, cur_stage = cfg.embed_dim, cfg.num_heads, 1
    for i in range(cfg.depth):
        dim_out = embed_dim
        window_size = cfg.window_spec[cur_stage - 1]
        if cfg.global_att_blocks and i in cfg.global_att_blocks:
            window_size = 0
        if i - 1 in cfg.stage_ends:
            dim_out = int(embed_dim * cfg.dim_mul)
            num_heads = int(num_heads * cfg.head_mul)
            cur_stage += 1
        dpr = cfg.drop_path_rate * i / max(cfg.depth - 1, 1)
        plan.append(
            dict(
                dim=embed_dim,
                dim_out=dim_out,
                num_heads=num_heads,
                window_size=window_size,
                q_stride=cfg.q_stride if i in cfg.q_pool_blocks else None,
                mlp_ratio=cfg.mlp_ratio,
                drop_path=dpr,
            )
        )
        embed_dim = dim_out
    return plan


class Hiera(nn.Module):
    """The trunk. Returns the 4 stage-end feature maps (strides 4/8/16/32),
    NHWC, fine-to-coarse — hieradet.py:278-292.

    remat=True wraps each block in jax.checkpoint (activations recomputed
    in backward — trades ~30% more FLOPs for O(depth) less live memory,
    enabling larger train batches at 960+ inputs)."""

    cfg: HieraConfig
    use_adapters: bool = False
    adapter_dim: int = 32
    remat: bool = False
    # sequence parallelism for the global-attention blocks: set to a mesh
    # axis name (+ its size) when calling inside a shard_map over that axis
    # (see MultiScaleBlock.sp_axis and ops/sp_attention.py)
    sp_axis: str | None = None
    sp_degree: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> list[jnp.ndarray]:
        cfg = self.cfg
        x = nn.Conv(
            cfg.embed_dim, (7, 7), strides=4, padding=((3, 3), (3, 3)),
            dtype=self.dtype, name="patch_embed_proj",
        )(x)

        h, w = x.shape[1], x.shape[2]
        bkg_h, bkg_w = cfg.window_pos_embed_bkg_spatial_size
        win0 = cfg.window_spec[0]
        pos_embed = self.param(
            "pos_embed", nn.initializers.zeros, (1, bkg_h, bkg_w, cfg.embed_dim)
        )
        pos_embed_window = self.param(
            "pos_embed_window", nn.initializers.zeros, (1, win0, win0, cfg.embed_dim)
        )
        pe = resize(pos_embed.astype(self.dtype), (h, w), "bicubic")
        tiles = (1, h // win0, w // win0, 1)
        pe = pe + jnp.tile(pos_embed_window.astype(self.dtype), tiles)
        x = x + pe

        outputs = []
        # Persistent grouped-token layout (ops/grouped.py): across a run
        # of consecutive dim-preserving blocks at a remainder window
        # geometry, partition into valid window groups ONCE and merge
        # ONCE — instead of per block, fwd and bwd (docs/PERF.md R5-E4).
        # Kill switch SAM2UNET_DISABLE_GROUPED=1 restores per-block
        # partitioning for A/B.
        import os

        from sam2unet_tpu.ops.grouped import GroupedTokens

        grouping_on = (
            self.sp_axis is None
            and not os.environ.get("SAM2UNET_DISABLE_GROUPED")
        )
        itemsize = jnp.dtype(self.dtype).itemsize
        for i, bk in enumerate(_block_plan(cfg)):
            if self.sp_axis is not None and bk["window_size"] == 0:
                bk = dict(**bk, sp_axis=self.sp_axis,
                          sp_degree=self.sp_degree)
            grouped = isinstance(x, GroupedTokens)
            h_, w_ = (x.h, x.w) if grouped else (x.shape[1], x.shape[2])
            g_ok = grouping_on and _groupable_block(bk, h_, w_, itemsize,
                                                    train)
            if grouped and not (
                g_ok and bk["window_size"] in (0, x.window)
            ):
                x = x.to_dense()
            elif not grouped and g_ok and bk["window_size"] > 0:
                x = GroupedTokens.from_dense(x, bk["window_size"])
            if self.use_adapters:
                # adapters imply the fork's hard trunk freeze
                # (SAM2UNet.py:52-65): block weights get stop_gradient and
                # the fused kernels skip weight-grad work
                block_cls = AdapterBlock
                kwargs = dict(block_kwargs=dict(**bk, frozen=True),
                              adapter_dim=self.adapter_dim,
                              dtype=self.dtype, name=f"blocks_{i}")
            else:
                block_cls = MultiScaleBlock
                kwargs = dict(**bk, dtype=self.dtype, name=f"blocks_{i}")
            if self.remat:
                block_cls = nn.remat(block_cls, static_argnums=(2,))
            x = block_cls(**kwargs)(x, train)
            if i in cfg.stage_ends:
                if isinstance(x, GroupedTokens):
                    x = x.to_dense()
                outputs.append(x)
        return outputs


def hiera_grid_sizes(cfg: HieraConfig, input_size: int) -> list[tuple[int, int]]:
    """Stage-end grid sizes for a square input (useful for shape checks)."""
    g = input_size // 4
    sizes = []
    for s in range(len(cfg.stages)):
        sizes.append((g, g))
        g = int(np.floor(g / cfg.q_stride[0]))
    return sizes
