"""Convert PyTorch checkpoints into this framework's parameter pytrees.

Two source formats are supported, matching the reference's loaders:
  - Official SAM2 checkpoints (`sam2_hiera_*.pt`, a dict with a "model" key,
    build_sam.py:81) — only the `image_encoder.trunk.*` keys are consumed,
    exactly what SAM2UNet keeps (SAM2UNet.py:144).
  - Trained SAM2-UNet checkpoints (the fork's `.pth` state dicts, whose
    trunk keys carry the Adapter wrapper prefix `encoder.blocks.N.block.*`,
    SAM2UNet.py:148-151).

Conversion is strict (build_sam.py:79-89 semantics): any missing or
unexpected key raises. Tensor layout transforms:
  torch Linear (O, I)        -> flax Dense kernel (I, O)
  torch Conv2d (O, I, kh, kw) -> flax Conv kernel (kh, kw, I, O)
  torch BN weight/bias        -> flax scale/bias; running_* -> batch_stats
  pos embeds (1, C, H, W)     -> (1, H, W, C)

Loading .pt files does NOT require torch: the zip/pickle payload is decoded
with a minimal reader (interop/pt_reader.py) so the framework has no torch
dependency; torch is used in tests only.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np


# ModuleLists whose entries are flattened to `name_{i}` module names
_MODULELIST_FLAT = {"point_embeddings", "output_hypernetworks_mlps"}
# Sequentials whose entries are flattened to `name_layers_{i}` module names
_SEQ_FLAT = {"mask_downscaling", "output_upscaling"}
# torch params/Embeddings stored raw (no transpose, no kernel/scale leaf)
_EMBED_BASES = (
    "not_a_point_embed", "no_mask_embed", "iou_token", "mask_tokens",
    "obj_score_token", "no_mem_embed", "no_mem_pos_enc", "maskmem_tpos_enc",
    "no_obj_ptr", "no_obj_embed_spatial",
    "positional_encoding_gaussian_matrix", "gamma",
)


def _to_flax_path(key: str) -> tuple[str, ...]:
    """Map a torch state-dict key (minus the trailing .weight etc.) to our
    flax module path. Mechanical rules per container kind:
      blocks.N / layers.N / <list>.N  -> blocks_N / layers_N / <list>_N
      prompt_learn.N (Sequential)     -> prompt_learn/layers_N
      branchK.N / mask_downscaling.N  -> branchK_layers_N / ..._layers_N
      double_conv.N                   -> layers_N
      patch_embed.proj                -> patch_embed_proj
      pe_layer.positional_encoding_gaussian_matrix -> joined flat name
    """
    parts = key.split(".")
    out: list[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        nxt = parts[i + 1] if i + 1 < len(parts) else None
        if p == "patch_embed" and nxt == "proj":
            out.append("patch_embed_proj")
            i += 2
        elif p == "pe_layer" and nxt == "positional_encoding_gaussian_matrix":
            out.append("pe_layer_positional_encoding_gaussian_matrix")
            i += 2
        elif nxt is not None and nxt.isdigit():
            if p in ("blocks", "layers", "double_conv"):
                out.append(f"{'layers' if p == 'double_conv' else p}_{nxt}")
            elif p in _MODULELIST_FLAT:
                out.append(f"{p}_{nxt}")
            elif p in _SEQ_FLAT or re.fullmatch(r"branch[0-3]", p):
                out.append(f"{p}_layers_{nxt}")
            elif p == "encoder" and "mask_downsampler" in parts[:i]:
                # MaskDownSampler's inner Sequential named `encoder`
                out.append(f"encoder_layers_{nxt}")
            elif p == "convs" and i + 2 < len(parts):
                # FpnNeck ModuleList of Sequential(conv=...) -> convs_N_conv
                out.append(f"convs_{nxt}_{parts[i + 2]}")
                i += 1
            else:  # generic Sequential container (e.g. prompt_learn)
                out.append(p)
                out.append(f"layers_{nxt}")
            i += 2
        else:
            out.append(p)
            i += 1
    return tuple(out)


def _classify(key: str, arr: np.ndarray) -> tuple[str, str, np.ndarray]:
    """Return (collection, leaf_name, transformed array)."""
    if key.endswith("running_mean"):
        return "batch_stats", "mean", arr
    if key.endswith("running_var"):
        return "batch_stats", "var", arr
    if key.endswith("num_batches_tracked"):
        return "drop", "", arr
    stripped = key[: -len(".weight")] if key.endswith(".weight") else key
    parts = stripped.split(".")
    last, prev = parts[-1], parts[-2] if len(parts) > 1 else ""
    if last in _EMBED_BASES or (prev == "point_embeddings" and last.isdigit()):
        return "params", "", arr  # raw embedding/param, no transpose

    leaf = key.rsplit(".", 1)[-1]
    if leaf == "weight":
        if arr.ndim == 4:
            # regular Conv2d (O, I, kh, kw) and ConvTranspose2d (I, O, kh, kw)
            # both map with (2, 3, 1, 0): our ConvTranspose modules use
            # flax transpose_kernel=True, whose kernel layout is (kh, kw, O, I)
            return "params", "kernel", arr.transpose(2, 3, 1, 0)
        if arr.ndim == 2:
            return "params", "kernel", arr.T
        return "params", "scale", arr  # BN / LayerNorm gain
    if leaf == "bias":
        return "params", "bias", arr
    if key.endswith("pos_embed") or key.endswith("pos_embed_window"):
        return "params", "", arr.transpose(0, 2, 3, 1)
    return "params", "", arr


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    if path[-1] in node:
        raise ValueError(f"duplicate converted key at {'/'.join(path)}")
    node[path[-1]] = value


def convert_state_dict(
    state: dict[str, np.ndarray],
    wrap_blocks: bool = False,
) -> dict[str, Any]:
    """Torch state dict (numpy values) -> {'params': ..., 'batch_stats': ...}.

    wrap_blocks: insert the Adapter `block` scope after each `blocks_N` when
    the source keys don't already carry it — used when loading a plain SAM2
    trunk into the adapter-wrapped SAM2UNet encoder (SAM2UNet.py:148-151).
    """
    tree: dict[str, Any] = {"params": {}, "batch_stats": {}}
    for key, arr in state.items():
        arr = np.asarray(arr)
        coll, leaf, value = _classify(key, arr)
        if coll == "drop":
            continue
        name_key = key
        for suffix in (".weight", ".bias", ".running_mean", ".running_var"):
            if name_key.endswith(suffix):
                name_key = name_key[: -len(suffix)]
                break
        path = _to_flax_path(name_key)
        if wrap_blocks:
            path = _wrap_block_path(path)
        if leaf:
            path = path + (leaf,)
        _set(tree[coll], path, value)
    if not tree["batch_stats"]:
        tree.pop("batch_stats")
    return tree


def _wrap_block_path(path: tuple[str, ...]) -> tuple[str, ...]:
    """Insert the AdapterBlock's inner 'block' scope after each 'blocks_N'
    (shared by both conversion directions so the rule cannot drift)."""
    new_path: list[str] = []
    for j, x in enumerate(path):
        new_path.append(x)
        if x.startswith("blocks_") and path[j + 1 : j + 2] != ("block",):
            new_path.append("block")
    return tuple(new_path)


def _get(tree: dict, path: tuple[str, ...]):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def flax_to_torch_state_dict(
    variables: dict,
    torch_keys: list[str],
    wrap_blocks: bool = False,
) -> dict[str, np.ndarray]:
    """Inverse of convert_state_dict: framework variables -> a torch state
    dict covering `torch_keys` (the target module's state_dict().keys()).

    Driving the mapping from the torch key list reuses the exact forward
    path/transform rules, so the two directions cannot drift apart. Layout
    inverses: flax Conv kernel (kh, kw, I, O) -> (O, I, kh, kw); Dense
    (I, O) -> (O, I); pos embeds (1, H, W, C) -> (1, C, H, W); BN
    mean/var -> running_*; num_batches_tracked is synthesized as 0.
    Raises KeyError for any torch key with no converted counterpart.
    """
    params = variables.get("params", {})
    batch_stats = variables.get("batch_stats", {})
    out: dict[str, np.ndarray] = {}
    for key in torch_keys:
        name_key = key
        for suffix in (".weight", ".bias", ".running_mean", ".running_var",
                       ".num_batches_tracked"):
            if name_key.endswith(suffix):
                name_key = name_key[: -len(suffix)]
                break
        path = _to_flax_path(name_key)
        if wrap_blocks:
            path = _wrap_block_path(path)
        if key.endswith(".num_batches_tracked"):
            out[key] = np.asarray(0, np.int64)
            continue
        if key.endswith(".running_mean"):
            value = _get(batch_stats, path + ("mean",))
        elif key.endswith(".running_var"):
            value = _get(batch_stats, path + ("var",))
        elif key.endswith(".weight"):
            value = _get(params, path + ("kernel",))
            if value is not None:
                value = (
                    np.asarray(value).transpose(3, 2, 0, 1)
                    if np.ndim(value) == 4
                    else np.asarray(value).T
                )
            else:
                value = _get(params, path + ("scale",))  # BN / LayerNorm
                if value is None:
                    value = _get(params, path)  # raw embedding ".weight"
        elif key.endswith(".bias"):
            value = _get(params, path + ("bias",))
        else:
            value = _get(params, path)
            if value is not None and (
                key.endswith("pos_embed") or key.endswith("pos_embed_window")
            ):
                value = np.asarray(value).transpose(0, 3, 1, 2)
        if value is None:
            raise KeyError(f"no framework parameter for torch key {key}")
        out[key] = np.asarray(value)
    return out


def load_sam2_trunk(path: str) -> dict[str, Any]:
    """Read an official sam2_hiera_*.pt and return trunk variables under the
    `encoder` scope (ready to merge into SAM2UNet's variables)."""
    state = load_torch_file(path)
    if "model" in state and isinstance(state["model"], dict):
        state = state["model"]
    prefix = "image_encoder.trunk."
    trunk = {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}
    if not trunk:
        raise ValueError(f"no image_encoder.trunk.* keys found in {path}")
    converted = convert_state_dict(trunk, wrap_blocks=True)
    out: dict[str, Any] = {}
    for coll, sub in converted.items():
        out[coll] = {"encoder": sub}
    return out


def load_sam2unet_checkpoint(path: str) -> dict[str, Any]:
    """Read a fork-style SAM2-UNet .pth state dict into full variables."""
    state = load_torch_file(path)
    if "model" in state and isinstance(state["model"], dict):
        state = state["model"]
    return convert_state_dict(state)


def load_torch_file(path: str) -> dict[str, np.ndarray]:
    """Load a torch-saved file to numpy without importing torch if possible."""
    from sam2unet_tpu.interop.pt_reader import read_pt

    try:
        return read_pt(path)
    except Exception as e:
        # fall back to torch (legacy non-zip saves, exotic storages) — but
        # never let a missing torch MASK the real decode failure
        try:
            import torch
        except ImportError:
            raise e from None

        obj = torch.load(path, map_location="cpu", weights_only=True)
        return _torch_tree_to_numpy(obj)


def _torch_tree_to_numpy(obj):
    import torch

    if isinstance(obj, dict):
        return {k: _torch_tree_to_numpy(v) for k, v in obj.items()}
    if isinstance(obj, torch.Tensor):
        return obj.detach().cpu().numpy()
    return obj


def validate_against(template: dict, converted: dict, scope: str = "") -> None:
    """Strict key AND shape check mirroring torch load_state_dict(strict):
    raise on any missing/unexpected leaf path or shape-divergent leaf
    (build_sam.py:82-88 names the keys; torch also rejects wrong shapes —
    without this, a checkpoint from a different architecture variant loads
    'cleanly' and dies later inside a jitted apply)."""
    import jax

    t_leaves = {jax.tree_util.keystr(p): v for p, v in
                jax.tree_util.tree_flatten_with_path(template)[0]}
    c_leaves = {jax.tree_util.keystr(p): v for p, v in
                jax.tree_util.tree_flatten_with_path(converted)[0]}
    missing = sorted(set(t_leaves) - set(c_leaves))
    unexpected = sorted(set(c_leaves) - set(t_leaves))
    if missing or unexpected:
        raise RuntimeError(
            f"strict load failed{f' ({scope})' if scope else ''}: "
            f"missing={missing[:8]}{'...' if len(missing) > 8 else ''} "
            f"unexpected={unexpected[:8]}{'...' if len(unexpected) > 8 else ''}"
        )
    bad_shapes = [
        f"{k}: {np.shape(c_leaves[k])} != {np.shape(t_leaves[k])}"
        for k in t_leaves
        if np.shape(c_leaves[k]) != np.shape(t_leaves[k])
    ]
    if bad_shapes:
        raise RuntimeError(
            f"strict load failed{f' ({scope})' if scope else ''}: "
            f"shape mismatches {bad_shapes[:8]}"
            f"{'...' if len(bad_shapes) > 8 else ''}"
        )
