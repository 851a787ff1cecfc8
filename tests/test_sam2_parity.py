"""Golden parity for the SAM2 capability modules vs the reference torch code.

Small shapes keep CPU compiles fast; every module gets converted-weight
output parity (the same gate as the SAM2-UNet core in test_model_parity)."""

import numpy as np
import pytest
import torch

from tests.ref_loader import REF, _register_pkg, state_dict_numpy

from sam2unet_tpu.interop.torch_convert import convert_state_dict

_register_pkg("sam2", f"{REF}/sam2")


def _to_jax(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def test_sine_position_embedding_matches():
    from sam2.modeling.position_encoding import PositionEmbeddingSine

    from sam2unet_tpu.models.position_encoding import sine_position_embedding

    ref_mod = PositionEmbeddingSine(num_pos_feats=64, normalize=True)
    x = torch.zeros(1, 64, 6, 9)
    ref = ref_mod(x).numpy()[0]  # (C, H, W)
    got = sine_position_embedding(6, 9, 64).transpose(2, 0, 1)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_axial_rope_matches():
    from sam2.modeling.position_encoding import apply_rotary_enc, compute_axial_cis

    from sam2unet_tpu.models.position_encoding import (
        apply_rotary_enc as jax_apply,
        axial_rope_cos_sin,
    )

    d, ex, ey = 16, 4, 4
    cis = compute_axial_cis(d, ex, ey)
    cos, sin = axial_rope_cos_sin(d, ex, ey)
    np.testing.assert_allclose(cis.real.numpy(), cos, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(cis.imag.numpy(), sin, rtol=1e-5, atol=1e-6)

    rng = np.random.default_rng(0)
    q = rng.standard_normal((2, 2, ex * ey, d)).astype(np.float32)
    k = rng.standard_normal((2, 2, 2 * ex * ey, d)).astype(np.float32)
    rq, rk = apply_rotary_enc(
        torch.from_numpy(q), torch.from_numpy(k), cis, repeat_freqs_k=True
    )
    jq, jk = jax_apply(q, k, cos, sin, repeat_freqs_k=True)
    np.testing.assert_allclose(np.asarray(jq), rq.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jk), rk.numpy(), rtol=1e-5, atol=1e-5)


def _rand_init(module, seed=0, std=0.05):
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            sd[k] = torch.randn(v.shape, generator=g, dtype=v.dtype) * std
    module.load_state_dict(sd)
    return module.eval()


def test_two_way_transformer_parity():
    import jax

    from sam2.modeling.sam.transformer import TwoWayTransformer as RefTWT

    from sam2unet_tpu.models.transformer import TwoWayTransformer

    ref = _rand_init(RefTWT(depth=2, embedding_dim=64, num_heads=4, mlp_dim=128))
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 64, 6, 6)).astype(np.float32)
    pe = rng.standard_normal((2, 64, 6, 6)).astype(np.float32)
    pts = rng.standard_normal((2, 5, 64)).astype(np.float32)
    with torch.no_grad():
        rq, rk = ref(torch.from_numpy(img), torch.from_numpy(pe),
                     torch.from_numpy(pts))

    model = TwoWayTransformer(depth=2, embedding_dim=64, num_heads=4, mlp_dim=128)
    variables = convert_state_dict(state_dict_numpy(ref))
    q, k = jax.jit(lambda v, a, b, c: model.apply(v, a, b, c))(
        variables, _to_jax(img), _to_jax(pe), pts
    )
    np.testing.assert_allclose(np.asarray(q), rq.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(k), rk.numpy(), rtol=1e-3, atol=1e-3)


def test_rope_attention_parity():
    import jax

    from sam2.modeling.sam.transformer import RoPEAttention as RefRoPE

    from sam2unet_tpu.models.transformer import RoPEAttention

    ref = _rand_init(
        RefRoPE(embedding_dim=64, num_heads=1, rope_k_repeat=True,
                feat_sizes=(4, 4), kv_in_dim=16)
    )
    rng = np.random.default_rng(1)
    q = rng.standard_normal((2, 16, 64)).astype(np.float32)
    # (nk - num_k_exclude_rope) must be a multiple of nq (repeat_freqs_k)
    k = rng.standard_normal((2, 36, 16)).astype(np.float32)
    v = rng.standard_normal((2, 36, 16)).astype(np.float32)
    with torch.no_grad():
        r = ref(torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
                num_k_exclude_rope=4)

    model = RoPEAttention(embedding_dim=64, num_heads=1, rope_k_repeat=True,
                          feat_sizes=(4, 4), kv_in_dim=16)
    variables = convert_state_dict(state_dict_numpy(ref))
    got = jax.jit(
        lambda vr, a, b, c: model.apply(vr, a, b, c, num_k_exclude_rope=4)
    )(variables, q, k, v)
    np.testing.assert_allclose(np.asarray(got), r.numpy(), rtol=1e-3, atol=1e-3)
    # NOTE: torch requires (nk - excl) % nq == 0 here too (repeat_freqs_k)


def test_prompt_encoder_parity():
    import jax

    from sam2.modeling.sam.prompt_encoder import PromptEncoder as RefPE

    from sam2unet_tpu.models.prompt_encoder import PromptEncoder

    ref = _rand_init(RefPE(embed_dim=32, image_embedding_size=(8, 8),
                           input_image_size=(128, 128), mask_in_chans=16))
    rng = np.random.default_rng(2)
    pts = (rng.random((2, 3, 2)) * 128).astype(np.float32)
    lbl = rng.integers(0, 2, (2, 3)).astype(np.int32)
    masks = rng.standard_normal((2, 1, 32, 32)).astype(np.float32)

    with torch.no_grad():
        rs, rd = ref(points=(torch.from_numpy(pts), torch.from_numpy(lbl)),
                     boxes=None, masks=torch.from_numpy(masks))
        ref_pe = ref.get_dense_pe().numpy()

    model = PromptEncoder(embed_dim=32, image_embedding_size=(8, 8),
                          input_image_size=(128, 128), mask_in_chans=16)
    variables = convert_state_dict(state_dict_numpy(ref))
    # reference pads points with a (-1)-label point when boxes is None
    pts_p = np.concatenate([pts, np.zeros((2, 1, 2), np.float32)], axis=1)
    lbl_p = np.concatenate([lbl, -np.ones((2, 1), np.int32)], axis=1)
    sparse, dense = jax.jit(
        lambda vr, p, l, m: model.apply(vr, p, l, None, m)
    )(variables, pts_p, lbl_p, _to_jax(masks))
    np.testing.assert_allclose(np.asarray(sparse), rs.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(dense).transpose(0, 3, 1, 2), rd.numpy(), rtol=1e-3, atol=1e-3
    )
    got_pe = jax.jit(lambda vr: model.apply(vr, method=PromptEncoder.get_dense_pe))(
        variables
    )
    np.testing.assert_allclose(
        np.asarray(got_pe).transpose(0, 3, 1, 2), ref_pe, rtol=1e-3, atol=1e-3
    )


@pytest.mark.parametrize("pred_obj", [False, True])
def test_mask_decoder_parity(pred_obj):
    import jax

    from sam2.modeling.sam.mask_decoder import MaskDecoder as RefMD
    from sam2.modeling.sam.transformer import TwoWayTransformer as RefTWT

    from sam2unet_tpu.models.mask_decoder import MaskDecoder

    dim = 64
    ref = _rand_init(
        RefMD(
            transformer_dim=dim,
            transformer=RefTWT(depth=2, embedding_dim=dim, num_heads=4, mlp_dim=128),
            num_multimask_outputs=3,
            use_high_res_features=True,
            iou_prediction_use_sigmoid=True,
            pred_obj_scores=pred_obj,
            pred_obj_scores_mlp=pred_obj,
            use_multimask_token_for_obj_ptr=True,
            dynamic_multimask_via_stability=True,
        )
    )
    rng = np.random.default_rng(3)
    b, h, w = 2, 8, 8
    img = rng.standard_normal((b, dim, h, w)).astype(np.float32)
    pe = rng.standard_normal((1, dim, h, w)).astype(np.float32)
    sparse = rng.standard_normal((b, 4, dim)).astype(np.float32)
    dense = rng.standard_normal((b, dim, h, w)).astype(np.float32)
    s0 = rng.standard_normal((b, dim // 8, 4 * h, 4 * w)).astype(np.float32)
    s1 = rng.standard_normal((b, dim // 4, 2 * h, 2 * w)).astype(np.float32)

    with torch.no_grad():
        rm, ri, rt, ro = ref(
            image_embeddings=torch.from_numpy(img),
            image_pe=torch.from_numpy(pe),
            sparse_prompt_embeddings=torch.from_numpy(sparse),
            dense_prompt_embeddings=torch.from_numpy(dense),
            multimask_output=True,
            repeat_image=False,
            high_res_features=[torch.from_numpy(s0), torch.from_numpy(s1)],
        )

    model = MaskDecoder(
        transformer_dim=dim,
        transformer_depth=2,
        transformer_mlp_dim=128,
        transformer_num_heads=4,
        use_high_res_features=True,
        iou_prediction_use_sigmoid=True,
        pred_obj_scores=pred_obj,
        pred_obj_scores_mlp=pred_obj,
        use_multimask_token_for_obj_ptr=True,
        dynamic_multimask_via_stability=True,
    )
    variables = convert_state_dict(state_dict_numpy(ref))
    gm, gi, gt, go = jax.jit(
        lambda vr, a, b_, c, d, e, f: model.apply(
            vr, a, b_, c, d, multimask_output=True, high_res_features=(e, f)
        )
    )(variables, _to_jax(img), _to_jax(pe), sparse, _to_jax(dense),
      _to_jax(s0), _to_jax(s1))
    np.testing.assert_allclose(np.asarray(gm), rm.numpy(), rtol=1.5e-3, atol=1.5e-3)
    np.testing.assert_allclose(np.asarray(gi), ri.numpy(), rtol=1.5e-3, atol=1.5e-3)
    np.testing.assert_allclose(np.asarray(gt), rt.numpy(), rtol=1.5e-3, atol=1.5e-3)
    np.testing.assert_allclose(np.asarray(go), ro.numpy(), rtol=1.5e-3, atol=1.5e-3)


def test_memory_encoder_parity():
    import jax

    from sam2.modeling.memory_encoder import (
        CXBlock as RefCX,
        Fuser as RefFuser,
        MaskDownSampler as RefMDS,
        MemoryEncoder as RefME,
    )
    from sam2.modeling.position_encoding import PositionEmbeddingSine

    from sam2unet_tpu.models.memory import MemoryEncoder

    in_dim, out_dim = 32, 16
    ref = _rand_init(
        RefME(
            out_dim=out_dim,
            mask_downsampler=RefMDS(embed_dim=in_dim, kernel_size=3, stride=2,
                                    padding=1),
            fuser=RefFuser(RefCX(dim=in_dim, kernel_size=7, padding=3,
                                 layer_scale_init_value=1e-6, use_dwconv=True),
                           num_layers=2),
            position_encoding=PositionEmbeddingSine(num_pos_feats=out_dim,
                                                    normalize=True),
            in_dim=in_dim,
        )
    )
    rng = np.random.default_rng(4)
    pix = rng.standard_normal((1, in_dim, 8, 8)).astype(np.float32)
    masks = rng.standard_normal((1, 1, 128, 128)).astype(np.float32)
    with torch.no_grad():
        r = ref(torch.from_numpy(pix), torch.from_numpy(masks))

    model = MemoryEncoder(out_dim=out_dim, in_dim=in_dim, fuser_layers=2)
    variables = convert_state_dict(state_dict_numpy(ref))
    got = jax.jit(lambda vr, p, m: model.apply(vr, p, m))(
        variables, _to_jax(pix), _to_jax(masks)
    )
    np.testing.assert_allclose(
        np.asarray(got["vision_features"]).transpose(0, 3, 1, 2),
        r["vision_features"].numpy(), rtol=1.5e-3, atol=1.5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(got["vision_pos_enc"][0]).transpose(0, 3, 1, 2),
        r["vision_pos_enc"][0].numpy(), rtol=1e-4, atol=1e-4,
    )
