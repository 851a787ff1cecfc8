"""Fused transformer-MLP kernel: x @ W1 -> GELU -> @ W2, hidden in VMEM.

Removes the 4x-dim hidden activation's HBM round trip (the second-largest
traffic source per Hiera block after attention scores). Weights use
constant index maps so Mosaic keeps them resident across grid steps.

Backward is a custom-VJP XLA recompute (same pattern as flash_attention).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from sam2unet_tpu.ops.pallas import dispatch
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 512
_LN_EPS = 1e-6


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, ln_ref, o_ref,
            *, use_ln: bool, residual: bool, gelu_out: bool = False):
    x = x_ref[:]
    if use_ln:
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        normed = (xf - mu) * jax.lax.rsqrt(var + _LN_EPS)
        normed = normed * ln_ref[0].astype(jnp.float32) + ln_ref[1].astype(
            jnp.float32
        )
        y = normed.astype(x.dtype)
    else:
        y = x
    h = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    # Mosaic has no erf primitive; tanh-gelu differs from exact gelu by
    # ~1e-3 relative — far below bf16 rounding of the surrounding compute
    h = jax.nn.gelu(h, approximate=True)
    o = jnp.dot(h.astype(x.dtype), w2_ref[:], preferred_element_type=jnp.float32)
    o = o + b2_ref[:].astype(jnp.float32)
    if gelu_out:
        o = jax.nn.gelu(o, approximate=True)
    if residual:
        o = o + x.astype(jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype)


def _xla_mlp(x, w1, b1, w2, b2, ln_scale=None, ln_bias=None, residual=False,
             gelu_out=False):
    y = x
    if ln_scale is not None:
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        y = ((xf - mu) * jax.lax.rsqrt(var + _LN_EPS) * ln_scale + ln_bias).astype(
            x.dtype
        )
    h = jax.nn.gelu(
        (jnp.dot(y, w1, preferred_element_type=jnp.float32)
         + b1).astype(jnp.float32),
        approximate=False,
    ).astype(x.dtype)
    o = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2
    if gelu_out:
        o = jax.nn.gelu(o.astype(jnp.float32), approximate=False)
    o = o.astype(x.dtype)
    return x + o if residual else o


def _f32_weights_overflow(x, *weights) -> bool:
    """Mosaic compiles far larger bf16 weight operands than f32 ones: the
    f32 d=768 MLP (18.9 MB of weights) overflows scoped VMEM while the
    bf16 d=1152 MLP (21.2 MB) compiles — f32 operands need stack relayout
    copies (caught by verify_export's fp32 trace on TPU). Large-f32 cases
    route to the XLA form; bf16 always uses the kernel."""
    if jnp.dtype(x.dtype).itemsize < 4:
        return False
    n = 0
    for w in weights:
        k = 1
        for dim in w.shape:
            k *= dim
        n += k
    return n * 4 > 12 * 1024 * 1024

def fused_mlp(x: jnp.ndarray, w1, b1, w2, b2, ln_scale=None, ln_bias=None,
              residual: bool = False,
              weight_grads: bool = True,
              gelu_out: bool = False) -> jnp.ndarray:
    """[LN ->] x @ W1 -> gelu -> @ W2 [-> gelu] [-> +x]. x: (..., D).

    weight_grads=False declares the MLP frozen (the fork hard-freezes the
    trunk): the backward runs a dx-only Pallas kernel — the 4x hidden
    never touches HBM in either direction — and returns zero weight grads.
    Pair with stop_gradient on the weights.

    gelu_out=True applies GELU to the second projection too (before the
    residual) — the Adapter's prompt_learn shape (SAM2UNet.py:57-59)."""
    return _fused_mlp_vjp(x, w1, b1, w2, b2, ln_scale, ln_bias, residual,
                          weight_grads, gelu_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _fused_mlp_vjp(x, w1, b1, w2, b2, ln_scale, ln_bias, residual,
                   weight_grads=True, gelu_out=False):
    if dispatch.xla_only() or _f32_weights_overflow(x, w1, w2):
        return _xla_mlp(x, w1, b1, w2, b2, ln_scale, ln_bias, residual,
                        gelu_out)
    use_ln = ln_scale is not None
    shape = x.shape
    d = shape[-1]
    n = 1
    for s in shape[:-1]:
        n *= s
    xf = x.reshape(n, d)
    pad = (-n) % _TILE
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    np_ = xf.shape[0]
    hidden = w1.shape[1]
    d_out = w2.shape[1]
    if use_ln:
        ln = jnp.stack(
            [jnp.asarray(ln_scale, x.dtype), jnp.asarray(ln_bias, x.dtype)]
        )
    else:
        ln = jnp.zeros((2, d), x.dtype)

    out = pl.pallas_call(
        functools.partial(_kernel, use_ln=use_ln, residual=residual,
                          gelu_out=gelu_out),
        grid=(np_ // _TILE,),
        in_specs=[
            pl.BlockSpec((_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, d_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, d_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, d_out), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * hidden * (d + d_out),
            bytes_accessed=(np_ * (d + d_out)) * x.dtype.itemsize,
            transcendentals=np_ * hidden,
        ),
    )(xf, w1.astype(x.dtype), b1.reshape(1, -1).astype(x.dtype),
      w2.astype(x.dtype), b2.reshape(1, -1).astype(x.dtype), ln)
    if pad:
        out = out[:n]
    return out.reshape(*shape[:-1], d_out)


def _ln_matmul_kernel(x_ref, w_ref, b_ref, ln_ref, o_ref, *, add_bias: bool):
    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + _LN_EPS)
    y = y * ln_ref[0].astype(jnp.float32) + ln_ref[1].astype(jnp.float32)
    o = jnp.dot(y.astype(o_ref.dtype), w_ref[:],
                preferred_element_type=jnp.float32)
    if add_bias:
        o = o + b_ref[:].astype(jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype)


def _xla_ln_matmul(x, w, b, ln_scale, ln_bias, add_bias=True):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + _LN_EPS) * ln_scale + ln_bias).astype(
        x.dtype
    )
    o = jnp.dot(y, w, preferred_element_type=jnp.float32)
    if add_bias:
        o = o + b
    return o.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_ln_matmul(x, w, b, ln_scale, ln_bias, add_bias=True):
    """LayerNorm (eps 1e-6) -> x @ W [+ b], one HBM pass over x. Used for
    the pre-norm QKV projection in Hiera blocks; add_bias=False lets the
    caller fuse the bias into a later pass (window-pad fill)."""
    if dispatch.xla_only() or _f32_weights_overflow(x, w):
        return _xla_ln_matmul(x, w, b, ln_scale, ln_bias, add_bias)
    shape = x.shape
    d = shape[-1]
    n = 1
    for s in shape[:-1]:
        n *= s
    xf = x.reshape(n, d)
    pad = (-n) % _TILE
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    np_ = xf.shape[0]
    d_out = w.shape[1]
    ln = jnp.stack([jnp.asarray(ln_scale, x.dtype), jnp.asarray(ln_bias, x.dtype)])
    out = pl.pallas_call(
        functools.partial(_ln_matmul_kernel, add_bias=add_bias),
        grid=(np_ // _TILE,),
        in_specs=[
            pl.BlockSpec((_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, d_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, d_out), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * d * d_out,
            bytes_accessed=(np_ * (d + d_out)) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xf, w.astype(x.dtype), b.reshape(1, -1).astype(x.dtype), ln)
    if pad:
        out = out[:n]
    return out.reshape(*shape[:-1], d_out)


def _ln_qkv_kernel(x_ref, w_ref, b_ref, ln_ref, q_ref, k_ref, v_ref,
                   *, c: int, add_bias: bool):
    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + _LN_EPS)
    y = y * ln_ref[0].astype(jnp.float32) + ln_ref[1].astype(jnp.float32)
    full = jnp.dot(y.astype(q_ref.dtype), w_ref[:],
                   preferred_element_type=jnp.float32)
    if add_bias:
        full = full + b_ref[:].astype(jnp.float32)
    full = full.astype(q_ref.dtype)
    # the q/k/v split happens here in VMEM (a vector relayout) instead of
    # as three lane-misaligned HBM slice copies downstream (c is rarely a
    # multiple of the 128-lane width: 144/288/576)
    q_ref[:] = full[:, :c]
    k_ref[:] = full[:, c : 2 * c]
    v_ref[:] = full[:, 2 * c :]


def _xla_ln_qkv(x, w, b, ln_scale, ln_bias, add_bias=True):
    full = _xla_ln_matmul(x, w, b, ln_scale, ln_bias, add_bias)
    c = w.shape[1] // 3
    return full[..., :c], full[..., c : 2 * c], full[..., 2 * c :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_ln_qkv(x, w, b, ln_scale, ln_bias, add_bias=True):
    """LayerNorm -> x @ W_qkv [+ b] -> split into (q, k, v), one kernel.

    One HBM pass over x, qkv matmul at full MXU width, and the split is an
    in-VMEM relayout — the three outputs land as separate aligned arrays.
    Replaces hieradet.py:60-63's qkv projection + unbind."""
    if dispatch.xla_only() or _f32_weights_overflow(x, w):
        return _xla_ln_qkv(x, w, b, ln_scale, ln_bias, add_bias)
    shape = x.shape
    d = shape[-1]
    n = 1
    for s in shape[:-1]:
        n *= s
    xf = x.reshape(n, d)
    pad = (-n) % _TILE
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    np_ = xf.shape[0]
    c = w.shape[1] // 3
    ln = jnp.stack([jnp.asarray(ln_scale, x.dtype), jnp.asarray(ln_bias, x.dtype)])
    out_sd = jax.ShapeDtypeStruct((np_, c), x.dtype)
    q, k, v = pl.pallas_call(
        functools.partial(_ln_qkv_kernel, c=c, add_bias=add_bias),
        grid=(np_ // _TILE,),
        in_specs=[
            pl.BlockSpec((_TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((_TILE, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(3)
        ),
        out_shape=(out_sd, out_sd, out_sd),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * d * 3 * c,
            bytes_accessed=(np_ * (d + 3 * c)) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xf, w.astype(x.dtype), b.reshape(1, -1).astype(x.dtype), ln)
    outs = []
    for t in (q, k, v):
        if pad:
            t = t[:n]
        outs.append(t.reshape(*shape[:-1], c))
    return tuple(outs)


def _lq_fwd(x, w, b, ln_scale, ln_bias, add_bias):
    out = fused_ln_qkv(x, w, b, ln_scale, ln_bias, add_bias)
    return out, (x, w, b, ln_scale, ln_bias)


def _lq_bwd(add_bias, res, g):
    x, w, b, ln_scale, ln_bias = res

    def ref(x, w, b, ln_scale, ln_bias):
        return _xla_ln_qkv(x, w, b, ln_scale, ln_bias, add_bias)

    _, vjp = jax.vjp(ref, x, w, b, ln_scale, ln_bias)
    return vjp(g)


fused_ln_qkv.defvjp(_lq_fwd, _lq_bwd)


def _lm_fwd(x, w, b, ln_scale, ln_bias, add_bias):
    out = fused_ln_matmul(x, w, b, ln_scale, ln_bias, add_bias)
    return out, (x, w, b, ln_scale, ln_bias)


def _lm_bwd(add_bias, res, g):
    x, w, b, ln_scale, ln_bias = res

    def ref(x, w, b, ln_scale, ln_bias):
        return _xla_ln_matmul(x, w, b, ln_scale, ln_bias, add_bias)

    _, vjp = jax.vjp(ref, x, w, b, ln_scale, ln_bias)
    return vjp(g)


fused_ln_matmul.defvjp(_lm_fwd, _lm_bwd)


_SQRT_2_PI = math.sqrt(2.0 / math.pi)
_GELU_C = 0.044715


def _dgelu_tanh(y, t):
    """d/dy of tanh-GELU given y and t = tanh(sqrt(2/pi)(y + c y^3)) —
    one definition shared by every backward kernel (a fix applied to one
    copy and not another silently desyncs gradients)."""
    return (0.5 * (1.0 + t)
            + 0.5 * y * (1.0 - t * t)
            * _SQRT_2_PI * (1.0 + 3.0 * _GELU_C * y * y))


def _mlp_bwd_dx_kernel(x_ref, g_ref, w1_ref, b1_ref, w2_ref, ln_ref,
                       dx_ref, *, use_ln: bool, residual: bool):
    """dx for the frozen MLP tail: recompute LN/W1/tanh-gelu' in VMEM, run
    the two transposed matmuls, LN-backprop — hidden never leaves VMEM."""
    x = x_ref[:]                                   # (T, c)
    gy = g_ref[:]
    xf = x.astype(jnp.float32)
    if use_ln:
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        r = jax.lax.rsqrt(var + _LN_EPS)
        xhat = (xf - mu) * r
        z = (xhat * ln_ref[0].astype(jnp.float32)
             + ln_ref[1].astype(jnp.float32)).astype(x.dtype)
    else:
        z = x
    h = jax.lax.dot_general(                       # (T, hidden) fp32
        z, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:].astype(jnp.float32)
    u = _SQRT_2_PI * (h + _GELU_C * h * h * h)
    th = jnp.tanh(u)
    da = jax.lax.dot_general(                      # g @ W2^T: (T, hidden)
        gy, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh = (da * _dgelu_tanh(h, th)).astype(x.dtype)
    dz = jax.lax.dot_general(                      # dh @ W1^T: (T, c)
        dh, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if use_ln:
        dxhat = dz * ln_ref[0].astype(jnp.float32)
        mean1 = jnp.mean(dxhat, axis=-1, keepdims=True)
        mean2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        dx = r * (dxhat - mean1 - xhat * mean2)
    else:
        dx = dz
    if residual:
        dx = dx + gy.astype(jnp.float32)
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _mlp_bwd_dx(x, g, w1, b1, w2, ln_scale, ln_bias, residual,
                interpret=False):
    use_ln = ln_scale is not None
    shape = x.shape
    d = shape[-1]
    hidden = w1.shape[1]
    n = 1
    for s in shape[:-1]:
        n *= s
    xf = x.reshape(n, d)
    gf = g.reshape(n, d)
    # smaller tile than forward: three (T, hidden) fp32 values live at
    # once. At c=768/hidden=3072 (hiera_s stage 4) the weight stacks are
    # 9.4 MB and tile 128 overflows Mosaic's 16 MB scoped-vmem stack
    # (measured: 16.75M with the gy->dx alias) — shrink the tile until
    # weights + fp32 temporaries + IO blocks fit.
    tile = 128
    wbytes = 2 * d * hidden * x.dtype.itemsize
    while tile > 32 and (wbytes + 3 * tile * hidden * 4
                         + 6 * tile * d * x.dtype.itemsize
                         > 14 * 1024 * 1024):
        tile //= 2
    pad = (-n) % tile
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
        gf = jnp.pad(gf, ((0, pad), (0, 0)))
    np_ = xf.shape[0]
    if use_ln:
        ln = jnp.stack(
            [jnp.asarray(ln_scale, x.dtype), jnp.asarray(ln_bias, x.dtype)]
        )
    else:
        ln = jnp.zeros((2, d), x.dtype)
    dx = pl.pallas_call(
        functools.partial(_mlp_bwd_dx_kernel, use_ln=use_ln,
                          residual=residual),
        grid=(np_ // tile,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, d), x.dtype),
        input_output_aliases=dispatch.io_alias({1: 0}),               # donate gy -> dx
        interpret=interpret,
    )(xf, gf, w1.astype(x.dtype), b1.reshape(1, -1).astype(x.dtype),
      # W2 passed as stored (hidden, d): the kernel contracts over d
      jnp.asarray(w2, x.dtype), ln)
    if pad:
        dx = dx[:n]
    return dx.reshape(shape)



def _adapter_bwd_kernel(x_ref, g_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                        dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                        dw1_acc, db1_acc, dw2_acc, db2_acc,
                        *, residual: bool, nsteps: int):
    """Full backward for the adapter form (x@W1 -> gelu -> @W2 -> gelu
    [-> +x], no LN): dx per tile plus f32 weight-grad accumulators — the
    (T, hidden) intermediates and both recomputed activations never leave
    VMEM. tanh-gelu derivative matches the forward kernel."""
    i = pl.program_id(0)
    x = x_ref[:]                                     # (T, d)
    gy = g_ref[:].astype(jnp.float32)
    y1 = jax.lax.dot_general(                        # (T, hidden) f32
        x, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:].astype(jnp.float32)
    u1 = _SQRT_2_PI * (y1 + _GELU_C * y1 * y1 * y1)
    t1 = jnp.tanh(u1)
    h = 0.5 * y1 * (1.0 + t1)
    y2 = jax.lax.dot_general(                        # (T, d) f32
        h.astype(x.dtype), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:].astype(jnp.float32)
    u2 = _SQRT_2_PI * (y2 + _GELU_C * y2 * y2 * y2)
    t2 = jnp.tanh(u2)
    dy2 = gy * _dgelu_tanh(y2, t2)                   # (T, d) f32
    dy2c = dy2.astype(x.dtype)
    dw2_blk = jax.lax.dot_general(                   # h^T dy2: (hidden, d)
        h.astype(x.dtype), dy2c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2_blk = jnp.sum(dy2, axis=0, keepdims=True)    # (1, d)
    dh = jax.lax.dot_general(                        # dy2 @ W2^T: (T, hidden)
        dy2c, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dy1 = dh * _dgelu_tanh(y1, t1)                   # (T, hidden) f32
    dy1c = dy1.astype(x.dtype)
    dw1_blk = jax.lax.dot_general(                   # x^T dy1: (d, hidden)
        x, dy1c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1_blk = jnp.sum(dy1, axis=0, keepdims=True)    # (1, hidden)
    dx = jax.lax.dot_general(                        # dy1 @ W1^T: (T, d)
        dy1c, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if residual:
        dx = dx + gy
    dx_ref[:] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dw1_acc[:] = dw1_blk
        db1_acc[:] = db1_blk
        dw2_acc[:] = dw2_blk
        db2_acc[:] = db2_blk

    @pl.when(i > 0)
    def _():
        dw1_acc[:] = dw1_acc[:] + dw1_blk
        db1_acc[:] = db1_acc[:] + db1_blk
        dw2_acc[:] = dw2_acc[:] + dw2_blk
        db2_acc[:] = db2_acc[:] + db2_blk

    @pl.when(i == nsteps - 1)
    def _():
        dw1_ref[:] = dw1_acc[:]
        db1_ref[:] = db1_acc[:]
        dw2_ref[:] = dw2_acc[:]
        db2_ref[:] = db2_acc[:]


def _adapter_bwd(x, g, w1, b1, w2, b2, residual, interpret=False):
    """Returns (dx, dw1, db1, dw2, db2) for the gelu_out adapter MLP."""
    shape = x.shape
    d = shape[-1]
    hidden = w1.shape[1]
    n = 1
    for s_ in shape[:-1]:
        n *= s_
    xf = x.reshape(n, d)
    gf = g.reshape(n, d)
    tile = 256
    pad = (-n) % tile
    if pad:
        # zero gy pads contribute zero to every grad term
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
        gf = jnp.pad(gf, ((0, pad), (0, 0)))
    np_ = xf.shape[0]
    nsteps = np_ // tile
    outs = pl.pallas_call(
        functools.partial(_adapter_bwd_kernel, residual=residual,
                          nsteps=nsteps),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, d), x.dtype),
            jax.ShapeDtypeStruct((d, hidden), jnp.float32),
            jax.ShapeDtypeStruct((1, hidden), jnp.float32),
            jax.ShapeDtypeStruct((hidden, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, hidden), jnp.float32),
            pltpu.VMEM((1, hidden), jnp.float32),
            pltpu.VMEM((hidden, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
        input_output_aliases=dispatch.io_alias({1: 0}),               # donate gy -> dx
        interpret=interpret,
    )(xf, gf, jnp.asarray(w1, x.dtype), b1.reshape(1, -1).astype(jnp.float32),
      jnp.asarray(w2, x.dtype), b2.reshape(1, -1).astype(jnp.float32))
    dx, dw1, db1, dw2, db2 = outs
    if pad:
        dx = dx[:n]
    return (dx.reshape(shape), dw1.astype(w1.dtype),
            db1.reshape(-1).astype(b1.dtype), dw2.astype(w2.dtype),
            db2.reshape(-1).astype(b2.dtype))


def _fwd(x, w1, b1, w2, b2, ln_scale, ln_bias, residual, weight_grads=True,
         gelu_out=False):
    out = _fused_mlp_vjp(x, w1, b1, w2, b2, ln_scale, ln_bias, residual,
                         weight_grads, gelu_out)
    return out, (x, w1, b1, w2, b2, ln_scale, ln_bias)


def _bwd(residual, weight_grads, gelu_out, res, g):
    x, w1, b1, w2, b2, ln_scale, ln_bias = res
    if (gelu_out and weight_grads and ln_scale is None
            and w1.shape[1] <= 128
            and not dispatch.xla_only()
            and not _f32_weights_overflow(x, w1, w2)):
        # trainable adapter: fused dx + weight grads (hidden <= 128 keeps
        # the per-tile f32 accumulators small)
        dx, dw1, db1, dw2, db2 = _adapter_bwd(x, g, w1, b1, w2, b2, residual)
        return dx, dw1, db1, dw2, db2, None, None
    if (not weight_grads and not gelu_out and not dispatch.xla_only()
            and not _f32_weights_overflow(x, w1, w2)):
        dx = _mlp_bwd_dx(x, g, w1, b1, w2, ln_scale, ln_bias, residual)
        zeros = [jnp.zeros_like(t) for t in (w1, b1, w2, b2)]
        lz = (None if ln_scale is None else jnp.zeros_like(ln_scale),
              None if ln_bias is None else jnp.zeros_like(ln_bias))
        return (dx, *zeros, *lz)

    def ref(x, w1, b1, w2, b2, ln_scale, ln_bias):
        return _xla_mlp(x, w1, b1, w2, b2, ln_scale, ln_bias, residual,
                        gelu_out)

    args = (x, w1, b1, w2, b2, ln_scale, ln_bias)
    if ln_scale is None:
        def ref2(x, w1, b1, w2, b2):
            return _xla_mlp(x, w1, b1, w2, b2, None, None, residual,
                            gelu_out)

        _, vjp = jax.vjp(ref2, x, w1, b1, w2, b2)
        dx, dw1, db1, dw2, db2 = vjp(g)
        return dx, dw1, db1, dw2, db2, None, None
    _, vjp = jax.vjp(ref, *args)
    return vjp(g)


_fused_mlp_vjp.defvjp(_fwd, _bwd)
