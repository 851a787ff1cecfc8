"""Sequence-parallel attention == dense attention, on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sam2unet_tpu.ops.attention import sdpa
from sam2unet_tpu.ops.sp_attention import allgather_sdpa, ring_sdpa


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("seq",))


def _qkv(seed, b=2, s=64, h=3, d=16):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    return mk(), mk(), mk()


@pytest.mark.parametrize("fn", [allgather_sdpa, ring_sdpa])
def test_sp_matches_dense(mesh, fn):
    from jax import shard_map

    q, k, v = _qkv(0)
    want = np.asarray(sdpa(q, k, v))

    sharded = shard_map(
        lambda q, k, v: fn(q, k, v, "seq"),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"),
    )
    spec = NamedSharding(mesh, P(None, "seq"))
    got = np.asarray(
        jax.jit(sharded)(
            jax.device_put(q, spec), jax.device_put(k, spec),
            jax.device_put(v, spec),
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_ring_sdpa_uneven_softmax_stability(mesh):
    """Large logit offsets across blocks must not break the online
    softmax (running max handles blocks seen in any order)."""
    from jax import shard_map

    q, k, v = _qkv(1)
    # make one token block dominate: huge key norms in shard 3
    k = k.at[:, 24:32].multiply(30.0)
    want = np.asarray(sdpa(q, k, v))
    sharded = shard_map(
        lambda q, k, v: ring_sdpa(q, k, v, "seq"),
        mesh=mesh,
        in_specs=(P(None, "seq"),) * 3,
        out_specs=P(None, "seq"),
    )
    spec = NamedSharding(mesh, P(None, "seq"))
    got = np.asarray(
        jax.jit(sharded)(
            jax.device_put(q, spec), jax.device_put(k, spec),
            jax.device_put(v, spec),
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_hiera_global_block_sequence_parallel_matches_dense(mesh):
    """Hiera with sp_axis set: the global-attention block runs ring
    attention over the mesh axis inside shard_map and the whole-trunk
    outputs must match the dense forward."""
    from jax import shard_map

    from sam2unet_tpu.configs import HieraConfig
    from sam2unet_tpu.models.hiera import Hiera
    import sam2unet_tpu.ops.sp_attention as spa

    # global block at a DIM-PRESERVING position (like the real hiera
    # configs: L's 23/33/43 sit inside stage 3): block 1 of a 3-block
    # first stage. Input 64 -> stage-1 grid 16x16 = 256 tokens, divisible
    # by the 8-way axis.
    cfg = HieraConfig(embed_dim=8, stages=(3, 1, 1, 1),
                      global_att_blocks=(1,), window_spec=(4, 2, 2, 2),
                      window_pos_embed_bkg_spatial_size=(7, 7))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 64, 64, 3)),
        jnp.float32,
    )
    dense = Hiera(cfg)
    variables = jax.jit(
        lambda r, xx: dense.init(r, xx, train=False)
    )(jax.random.PRNGKey(0), x)
    want = jax.jit(lambda v, xx: dense.apply(v, xx, train=False))(
        variables, x
    )

    calls = {"ring": 0}
    orig = spa.ring_sdpa

    def counting(*a, **k):
        calls["ring"] += 1
        return orig(*a, **k)

    spa.ring_sdpa = counting
    try:
        sp_model = Hiera(cfg, sp_axis="seq", sp_degree=8)
        # check_vma=False is required: the SP path ends in lax.all_gather
        # over 'seq', whose output the vma system types as varying over
        # that axis even though every device holds identical values — the
        # replicated P() out_spec can never be statically inferred. The
        # allclose below IS the replication check.
        fn = shard_map(
            lambda v, xx: sp_model.apply(v, xx, train=False),
            mesh=mesh, in_specs=(P(), P()), out_specs=P(),
            check_vma=False,
        )
        got = jax.jit(fn)(variables, x)
    finally:
        spa.ring_sdpa = orig

    assert calls["ring"] == 1  # the SP path genuinely engaged
    assert len(got) == len(want) == 4
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-5, atol=2e-5
        )


def test_sam2unet_sp_param_structure_matches_dense():
    """SP is a pure execution-strategy flag: a dense-initialized
    variables tree must apply unchanged to the SP-enabled model (so
    checkpoints interchange)."""
    from sam2unet_tpu.configs import HIERA_TEST, SAM2UNetConfig
    from sam2unet_tpu.models.sam2unet import SAM2UNet

    dense = SAM2UNet(SAM2UNetConfig(trunk=HIERA_TEST, rfb_out=8))
    sp = SAM2UNet(SAM2UNetConfig(trunk=HIERA_TEST, rfb_out=8),
                  sp_axis="model", sp_degree=2)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v_dense = jax.jit(dense.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False
    )
    # HIERA_TEST's global block is a dim-change block, so the SP branch
    # never engages outside shard_map here — but the init structures must
    # match regardless of the flag
    v_sp = jax.jit(sp.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False
    )
    assert jax.tree_util.tree_structure(v_dense) == (
        jax.tree_util.tree_structure(v_sp)
    )
