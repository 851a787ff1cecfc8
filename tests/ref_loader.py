"""Import the reference PyTorch implementation for golden-parity testing.

The reference lives read-only at /root/reference. Its `sam2` package __init__
registers Hydra (not installed here), so we register a synthetic `sam2`
package whose __path__ points at the reference tree without executing that
__init__. The SAM2UNet module additionally imports `build_sam2`; we stub it
with a factory that assembles only what SAM2UNet keeps (the Hiera trunk)
plus deletable placeholders, sidestepping the Hydra YAML machinery.

Nothing is copied: the reference's own modules are executed in-place, used
purely as a numerical oracle inside tests.
"""

from __future__ import annotations

import importlib.util
import sys
import types

REF = "/root/reference"


def _register_pkg(name: str, path: str) -> None:
    if name in sys.modules:
        return
    pkg = types.ModuleType(name)
    pkg.__path__ = [path]
    pkg.__package__ = name
    sys.modules[name] = pkg


def load_ref_hiera_module():
    """Return the reference hieradet module (torch Hiera & blocks)."""
    _register_pkg("sam2", f"{REF}/sam2")
    import sam2.modeling.backbones.hieradet as hieradet  # noqa: PLC0415

    return hieradet


def load_ref_sam2unet_class():
    """Return the reference SAM2UNet class with build_sam2 stubbed so that
    construction needs no Hydra/YAML: the stub returns an object exposing a
    real reference-Hiera trunk and the attributes SAM2UNet deletes
    (SAM2UNet.py:136-144)."""
    hieradet = load_ref_hiera_module()

    if "sam2.build_sam" not in sys.modules:
        stub = types.ModuleType("sam2.build_sam")

        def build_sam2(config_file, ckpt_path=None, **kw):
            import torch.nn as nn

            assert config_file == "sam2_hiera_s.yaml"
            trunk = hieradet.Hiera(
                embed_dim=96,
                num_heads=1,
                stages=[1, 2, 11, 2],
                global_att_blocks=[7, 10, 13],
                window_pos_embed_bkg_spatial_size=[7, 7],
            )
            image_encoder = types.SimpleNamespace(trunk=trunk, neck=nn.Identity())
            return types.SimpleNamespace(
                image_encoder=image_encoder,
                sam_mask_decoder=None,
                sam_prompt_encoder=None,
                memory_encoder=None,
                memory_attention=None,
                mask_downsample=None,
                obj_ptr_tpos_proj=None,
                obj_ptr_proj=None,
            )

        stub.build_sam2 = build_sam2
        sys.modules["sam2.build_sam"] = stub

    if "torchsummary" not in sys.modules:
        ts = types.ModuleType("torchsummary")
        ts.summary = lambda *a, **k: None
        sys.modules["torchsummary"] = ts

    spec = importlib.util.spec_from_file_location("ref_sam2unet", f"{REF}/SAM2UNet.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.SAM2UNet


def load_ref_module(relpath: str, name: str):
    """Load an arbitrary reference top-level module by file path."""
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def state_dict_numpy(module) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
