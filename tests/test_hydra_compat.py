"""Hydra-compat layer: `_target_` instantiation, dotlist overrides, and
reference-YAML model building (reference sam2/build_sam.py:15-44)."""

import dataclasses
import pathlib

import pytest

from sam2unet_tpu.configs import HieraConfig, hydra_compat

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_parse_dotlist_nesting_and_types():
    tree = hydra_compat.parse_dotlist(
        ["++model.a.flag=true", "+model.a.delta=0.05", "model.n=7",
         "top=hello", "lst=[1, 2]"]
    )
    assert tree == {
        "model": {"a": {"flag": True, "delta": 0.05}, "n": 7},
        "top": "hello",
        "lst": [1, 2],
    }
    with pytest.raises(ValueError):
        hydra_compat.parse_dotlist(["no_equals_sign"])


def test_merge_overrides_deep_and_pure():
    base = {"model": {"x": 1, "sub": {"y": 2}}}
    out = hydra_compat.merge_overrides(base, ["++model.sub.z=3", "model.x=9"])
    assert out == {"model": {"x": 9, "sub": {"y": 2, "z": 3}}}
    assert base["model"]["x"] == 1  # input not mutated


def test_instantiate_recursive_and_partial():
    import fractions

    node = {
        "_target_": "sam2unet_tpu.configs.HieraConfig",
        "embed_dim": 32,
    }
    cfg = hydra_compat.instantiate(node)
    assert isinstance(cfg, HieraConfig) and cfg.embed_dim == 32

    nested = hydra_compat.instantiate(
        {"outer": {"_target_": "fractions.Fraction",
                   "numerator": 3, "denominator": 4},
         "plain": [1, {"_target_": "fractions.Fraction", "numerator": 2}]}
    )
    assert nested["outer"] == fractions.Fraction(3, 4)
    assert nested["plain"][1] == fractions.Fraction(2)

    part = hydra_compat.instantiate(
        {"_target_": "sam2unet_tpu.configs.HieraConfig", "_partial_": True,
         "embed_dim": 64}
    )
    assert part().embed_dim == 64
    # kwargs at the call site override node children (hydra semantics)
    got = hydra_compat.instantiate(node, embed_dim=128)
    assert got.embed_dim == 128
    with pytest.raises(ImportError):
        hydra_compat.instantiate({"_target_": "no.such.module.Cls"})


def test_instantiate_honors_node_level_recursive_false():
    """`_recursive_: false` in the config (standard hydra idiom, often
    with _partial_) must stop eager child instantiation: children pass
    through as raw dicts instead of being constructed."""
    import fractions

    node = {
        "_target_": "builtins.dict",
        "_recursive_": False,
        "sub": {"_target_": "fractions.Fraction", "numerator": 3},
    }
    got = hydra_compat.instantiate(node)
    assert got["sub"] == {"_target_": "fractions.Fraction", "numerator": 3}
    # ...and the subtree can be instantiated later (the deferred pattern)
    assert hydra_compat.instantiate(got["sub"]) == fractions.Fraction(3)
    # the flag scopes to its subtree only: siblings above still recurse
    outer = hydra_compat.instantiate({"a": node, "b": {
        "_target_": "fractions.Fraction", "numerator": 2}})
    assert outer["b"] == fractions.Fraction(2)
    assert outer["a"]["sub"]["_target_"] == "fractions.Fraction"


def test_configs_from_reference_shaped_tree():
    tree = hydra_compat.compose(
        str(REPO / "sam2unet_tpu/configs/yaml/sam2_hiera_s.yaml"),
        ["++model.num_maskmem=5",
         "++model.sam_mask_decoder_extra_args.dynamic_multimask_via_stability=true"],
    )
    trunk, cfg = hydra_compat.configs_from_tree(tree)
    assert trunk.stages == (1, 2, 11, 2) and trunk.global_att_blocks == (7, 10, 13)
    assert cfg.num_maskmem == 5
    assert cfg.dynamic_multimask_via_stability is True


def test_build_sam2_postprocessing_and_overrides():
    # config resolution only (no init): registry name + overrides -> SAM2Config
    from sam2unet_tpu.configs import hiera_config

    overrides = [
        "++model.sam_mask_decoder_extra_args.dynamic_multimask_via_stability=true",
        "++model.image_size=512",
    ]
    tree = hydra_compat.merge_overrides({}, overrides)
    tree.setdefault("model", {}).setdefault("image_encoder", {})["trunk"] = (
        dataclasses.asdict(hiera_config("hiera_test"))
    )
    trunk, cfg = hydra_compat.configs_from_tree(tree)
    assert trunk == hiera_config("hiera_test")
    assert cfg.image_size == 512
    assert cfg.dynamic_multimask_via_stability is True
    # the reference's video-predictor _target_ override is tolerated
    tree2 = hydra_compat.merge_overrides(
        {}, ["++model._target_=sam2.sam2_video_predictor.SAM2VideoPredictor"]
    )
    _, cfg2 = hydra_compat.configs_from_tree(tree2)
    assert cfg2.dynamic_multimask_via_stability is False


def test_build_sam2_from_reference_yaml(tmp_path):
    """End-to-end: build a tiny model from a reference-shaped YAML file."""
    import yaml as pyyaml

    from sam2unet_tpu.build_sam import build_sam2
    from sam2unet_tpu.configs import hiera_config

    tiny = dataclasses.asdict(hiera_config("hiera_test"))
    doc = {
        "model": {
            "_target_": "sam2.modeling.sam2_base.SAM2Base",
            "image_encoder": {"trunk": tiny},
            "image_size": 64,
            "num_maskmem": 2,
            "max_obj_ptrs_in_encoder": 4,
        }
    }
    p = tmp_path / "tiny.yaml"
    p.write_text(pyyaml.safe_dump(doc))
    model, variables = build_sam2(str(p))
    assert model.cfg.image_size == 64 and model.cfg.num_maskmem == 2
    # apply_postprocessing default matches reference build_sam.py:24-31
    assert model.cfg.dynamic_multimask_via_stability is True
    m2, _ = build_sam2(str(p), apply_postprocessing=False)
    assert m2.cfg.dynamic_multimask_via_stability is False


def test_video_predictor_builder_postprocessing_defaults():
    """build_sam2_video_predictor applies the reference's video defaults
    (sam2/build_sam.py:55-66): binarized memory encoding for prompted
    frames + fill_hole_area=8; both off with apply_postprocessing=False."""
    from sam2unet_tpu.build_sam import build_sam2_video_predictor

    pred = build_sam2_video_predictor("hiera_test")
    assert pred.cfg.binarize_mask_from_pts_for_mem_enc is True
    assert pred.cfg.dynamic_multimask_via_stability is True
    assert pred.fill_hole_area == 8

    raw = build_sam2_video_predictor("hiera_test", apply_postprocessing=False)
    assert raw.cfg.binarize_mask_from_pts_for_mem_enc is False
    assert raw.fill_hole_area == 0
    # explicit fill_hole_area wins over the default
    custom = build_sam2_video_predictor("hiera_test", fill_hole_area=3)
    assert custom.fill_hole_area == 3
