"""Persistent grouped-token layout (ops/grouped.py): layout roundtrips
and end-to-end trunk equivalence vs the per-block partitioned path.

The grouped layout must be semantics-invisible: same param tree, same
outputs (global attention reorders a permutation-equivariant softmax, so
tolerance-level equality), same gradients — pinned here against the
SAM2UNET_DISABLE_GROUPED=1 dense path at a remainder window geometry
with a global-attention block inside the run.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam2unet_tpu.configs import HieraConfig
from sam2unet_tpu.models.hiera import Hiera
from sam2unet_tpu.ops.grouped import GroupedTokens

# stage 3 = blocks 2..5: transition at 2, then three dim-preserving
# blocks at a 3x3 grid with window 2 (remainder geometry), the middle one
# global — one grouped run covering windowed + global + windowed.
CFG = HieraConfig(
    embed_dim=16,
    stages=(1, 1, 4, 1),
    global_att_blocks=(4,),
    # stage-3 window 4 on a 3x3 grid: remainder geometry (single rr
    # valid group with synthetic pads); transition windows stay
    # pool-compatible with the reference's post-pool re-pad formula
    window_spec=(4, 2, 4, 4),
    window_pos_embed_bkg_spatial_size=(7, 7),
)


@pytest.mark.parametrize(
    "h,w,window",
    [(22, 22, 16), (60, 60, 14), (11, 11, 8), (5, 5, 4), (3, 3, 2),
     (16, 16, 8), (12, 8, 5)],
)
def test_roundtrip(h, w, window):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, h, w, 6)).astype(np.float32))
    gt = GroupedTokens.from_dense(x, window)
    np.testing.assert_array_equal(np.asarray(gt.to_dense()), np.asarray(x))


@pytest.mark.parametrize("h,w,window", [(22, 22, 16), (3, 3, 2), (5, 5, 4)])
def test_concat_split_roundtrip(h, w, window):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, h, w, 6)).astype(np.float32))
    gt = GroupedTokens.from_dense(x, window)
    xc = gt.concat_tokens()
    assert xc.shape == (2, h * w, 6)
    gt2 = gt.split_tokens(xc)
    for a, b in zip(gt2.groups, gt.groups):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(gt2.to_dense()), np.asarray(x))


def _build(use_adapters: bool):
    model = Hiera(CFG, use_adapters=use_adapters, adapter_dim=8)
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 48, 48, 3)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, x, variables


def _apply_both(model, x, variables, monkeypatch, train):
    monkeypatch.delenv("SAM2UNET_DISABLE_GROUPED", raising=False)
    outs_g = model.apply(variables, x, train=train)
    monkeypatch.setenv("SAM2UNET_DISABLE_GROUPED", "1")
    outs_d = model.apply(variables, x, train=train)
    monkeypatch.delenv("SAM2UNET_DISABLE_GROUPED", raising=False)
    return outs_g, outs_d


@pytest.mark.parametrize("train", [False, True])
@pytest.mark.parametrize("use_adapters", [False, True])
def test_trunk_equivalence(monkeypatch, train, use_adapters):
    model, x, variables = _build(use_adapters)
    outs_g, outs_d = _apply_both(model, x, variables, monkeypatch, train)
    assert len(outs_g) == len(outs_d) == 4
    for og, od in zip(outs_g, outs_d):
        assert og.shape == od.shape
        np.testing.assert_allclose(
            np.asarray(og), np.asarray(od), rtol=2e-5, atol=2e-6
        )


def test_param_tree_identical(monkeypatch):
    # init under both modes must register the exact same leaves
    model = Hiera(CFG, use_adapters=True, adapter_dim=8)
    x = jnp.zeros((1, 48, 48, 3), jnp.float32)
    monkeypatch.delenv("SAM2UNET_DISABLE_GROUPED", raising=False)
    v_g = model.init(jax.random.PRNGKey(0), x, train=False)
    monkeypatch.setenv("SAM2UNET_DISABLE_GROUPED", "1")
    v_d = model.init(jax.random.PRNGKey(0), x, train=False)
    monkeypatch.delenv("SAM2UNET_DISABLE_GROUPED", raising=False)
    assert jax.tree_util.tree_structure(v_g) == jax.tree_util.tree_structure(v_d)
    for a, b in zip(jax.tree_util.tree_leaves(v_g),
                    jax.tree_util.tree_leaves(v_d)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gradient_equivalence(monkeypatch):
    model, x, variables = _build(use_adapters=True)

    def loss(params, disable):
        if disable:
            monkeypatch.setenv("SAM2UNET_DISABLE_GROUPED", "1")
        else:
            monkeypatch.delenv("SAM2UNET_DISABLE_GROUPED", raising=False)
        outs = model.apply({"params": params}, x, train=True)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    g_grouped = jax.grad(lambda p: loss(p, False))(variables["params"])
    g_dense = jax.grad(lambda p: loss(p, True))(variables["params"])
    monkeypatch.delenv("SAM2UNET_DISABLE_GROUPED", raising=False)
    for (ka), (kb) in zip(
        jax.tree_util.tree_leaves_with_path(g_grouped),
        jax.tree_util.tree_leaves_with_path(g_dense),
    ):
        pa, a = ka
        pb, b = kb
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(pa),
        )
