"""Whole-graph parity: full reference SAM2Base (trunk + FPN + memory +
prompt/mask heads, assembled exactly like sam2_hiera_s.yaml but tiny)
against our SAM2Base with converted weights."""

import numpy as np
import pytest
import torch

from tests.ref_loader import REF, _register_pkg, state_dict_numpy

from sam2unet_tpu.configs import HieraConfig
from sam2unet_tpu.interop.torch_convert import convert_state_dict, validate_against
from sam2unet_tpu.models.sam2_base import SAM2Base, SAM2Config

_register_pkg("sam2", f"{REF}/sam2")

TINY = SAM2Config(image_size=64, hidden_dim=64, mem_dim=16,
                  max_obj_ptrs_in_encoder=4)
# reference-runnable tiny trunk: the global-att block (3) is NOT a q-pool
# block (the reference crashes on that combination, hieradet.py:150-153)
TRUNK = HieraConfig(embed_dim=8, stages=(1, 1, 2, 1), global_att_blocks=(3,),
                    window_spec=(4, 2, 2, 2),
                    window_pos_embed_bkg_spatial_size=(7, 7))


def _build_ref_sam2base():
    from sam2.modeling.backbones.hieradet import Hiera
    from sam2.modeling.backbones.image_encoder import FpnNeck, ImageEncoder
    from sam2.modeling.memory_attention import (
        MemoryAttention,
        MemoryAttentionLayer,
    )
    from sam2.modeling.memory_encoder import (
        CXBlock,
        Fuser,
        MaskDownSampler,
        MemoryEncoder,
    )
    from sam2.modeling.position_encoding import PositionEmbeddingSine
    from sam2.modeling.sam.transformer import RoPEAttention
    from sam2.modeling.sam2_base import SAM2Base as RefSAM2Base

    trunk = Hiera(embed_dim=8, num_heads=1, stages=[1, 1, 2, 1],
                  global_att_blocks=[3], window_spec=(4, 2, 2, 2),
                  window_pos_embed_bkg_spatial_size=[7, 7])
    neck = FpnNeck(
        position_encoding=PositionEmbeddingSine(num_pos_feats=64,
                                                normalize=True),
        d_model=64, backbone_channel_list=[64, 32, 16, 8],
        fpn_top_down_levels=[2, 3], fpn_interp_model="nearest",
    )
    image_encoder = ImageEncoder(trunk=trunk, neck=neck, scalp=1)

    def make_layer():
        return MemoryAttentionLayer(
            activation="relu", dim_feedforward=2048, dropout=0.1,
            pos_enc_at_attn=False,
            self_attention=RoPEAttention(rope_theta=10000.0, feat_sizes=[32, 32],
                                         embedding_dim=64, num_heads=1,
                                         downsample_rate=1, dropout=0.1),
            d_model=64, pos_enc_at_cross_attn_keys=True,
            pos_enc_at_cross_attn_queries=False,
            cross_attention=RoPEAttention(rope_theta=10000.0, feat_sizes=[32, 32],
                                          rope_k_repeat=True, embedding_dim=64,
                                          num_heads=1, downsample_rate=1,
                                          dropout=0.1, kv_in_dim=16),
        )

    memory_attention = MemoryAttention(d_model=64, pos_enc_at_input=True,
                                       layer=make_layer(), num_layers=4)
    memory_encoder = MemoryEncoder(
        out_dim=16,
        # embed_dim must match in_dim=64 below — the reference's forward adds
        # the downsampled mask to the in_dim-channel pix_feat projection, so
        # leaving torch's default 256 builds a module that cannot run.
        mask_downsampler=MaskDownSampler(embed_dim=64, kernel_size=3,
                                         stride=2, padding=1),
        fuser=Fuser(CXBlock(dim=64, kernel_size=7, padding=3,
                            layer_scale_init_value=1e-6, use_dwconv=True),
                    num_layers=2),
        position_encoding=PositionEmbeddingSine(num_pos_feats=16,
                                                normalize=True),
        in_dim=64,
    )
    return RefSAM2Base(
        image_encoder=image_encoder,
        memory_attention=memory_attention,
        memory_encoder=memory_encoder,
        num_maskmem=7,
        image_size=64,
        backbone_stride=16,
        sigmoid_scale_for_mem_enc=20.0,
        sigmoid_bias_for_mem_enc=-10.0,
        use_mask_input_as_output_without_sam=True,
        directly_add_no_mem_embed=True,
        use_high_res_features_in_sam=True,
        multimask_output_in_sam=True,
        iou_prediction_use_sigmoid=True,
        use_obj_ptrs_in_encoder=True,
        max_obj_ptrs_in_encoder=4,
        add_tpos_enc_to_obj_ptrs=False,
        only_obj_ptrs_in_the_past_for_eval=True,
        pred_obj_scores=True,
        pred_obj_scores_mlp=True,
        fixed_no_obj_ptr=True,
        multimask_output_for_tracking=True,
        use_multimask_token_for_obj_ptr=True,
        multimask_min_pt_num=0,
        multimask_max_pt_num=1,
        use_mlp_for_obj_ptr_proj=True,
    )


def _rand_init(module, seed=0, std=0.05):
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            sd[k] = torch.randn(v.shape, generator=g, dtype=v.dtype) * std
    module.load_state_dict(sd)
    return module.eval()


@pytest.fixture(scope="module")
def pair():
    import jax

    ref = _rand_init(_build_ref_sam2base())
    variables = convert_state_dict(state_dict_numpy(ref))

    from sam2unet_tpu.build_sam import build_sam2

    model, template = build_sam2("hiera_test", sam2_config=TINY,
                                 trunk_cfg=TRUNK)
    validate_against(dict(template), variables, scope="full sam2 base")
    del jax
    return ref, model, variables


def test_full_state_dict_converts_strictly(pair):
    pass  # validation happens in the fixture


def test_forward_image_parity(pair):
    import jax

    ref, model, variables = pair
    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        r = ref.forward_image(torch.from_numpy(x))
    out = jax.jit(
        lambda v, x: model.apply(v, x, method=SAM2Base.forward_image)
    )(variables, np.transpose(x, (0, 2, 3, 1)))
    assert len(out["backbone_fpn"]) == len(r["backbone_fpn"]) == 3
    for got, want in zip(out["backbone_fpn"], r["backbone_fpn"]):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want.numpy(),
            rtol=2e-3, atol=2e-3,
        )


def test_sam_heads_parity(pair):
    import jax

    ref, model, variables = pair
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    pts = np.array([[[20.0, 30.0]]], np.float32)
    lbl = np.array([[1]], np.int32)

    with torch.no_grad():
        bb = ref.forward_image(torch.from_numpy(x))
        _, vision_feats, _, _ = ref._prepare_backbone_features(bb)
        vision_feats[-1] = vision_feats[-1] + ref.no_mem_embed  # (HW, B, C)
        feats = [
            f.permute(1, 2, 0).view(1, -1, *s)
            for f, s in zip(vision_feats, [(16, 16), (8, 8), (4, 4)])
        ]
        r_out = ref._forward_sam_heads(
            backbone_features=feats[-1],
            point_inputs={"point_coords": torch.from_numpy(pts),
                          "point_labels": torch.from_numpy(lbl)},
            high_res_features=feats[:-1],
            multimask_output=True,
        )

    def run(v, xj, pj, lj):
        def body(m):
            out = m.forward_image(xj)
            fpn = out["backbone_fpn"]
            f = fpn[-1]
            b, h, w, c = f.shape
            nme = m.no_mem_embed
            pix = (f.reshape(b, h * w, c) + nme).reshape(b, h, w, c)
            return m.forward_sam_heads(
                pix, pj, lj, None, (fpn[0], fpn[1]), True
            )

        return model.apply(v, method=body)

    pts_p = np.concatenate([pts, np.zeros((1, 1, 2), np.float32)], axis=1)
    lbl_p = np.concatenate([lbl, -np.ones((1, 1), np.int32)], axis=1)
    out = jax.jit(run)(variables, np.transpose(x, (0, 2, 3, 1)), pts_p, lbl_p)

    # compare the 7-tuple: multimasks, high-res, ious, best masks, obj_ptr
    names = ["low_multi", "high_multi", "ious", "low", "high", "obj_ptr",
             "obj_logits"]
    for name, got, want in zip(names, out, r_out):
        g = np.asarray(got, np.float32)
        w = want.detach().numpy()
        assert g.shape == w.shape, (name, g.shape, w.shape)
        np.testing.assert_allclose(g, w, rtol=5e-3, atol=5e-3, err_msg=name)
