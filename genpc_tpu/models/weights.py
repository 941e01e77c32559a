"""Checkpoint conversion: HF safetensors -> flax parameter trees.

The reference loads its pretrained weights from HF hub / local paths at
runtime (reference: tools/controlnet_depth.py:17-43, tools/qwen_depth.py
:50-62, tools/instantmesh.py:65-113, tools/RMBG.py:10-13).  This container
is zero-egress, so conversion is gated on cfg.weights_dir actually holding
the safetensors files; everything else in the framework runs without them
(synthetic backends / random-init tiny configs).

Conversion strategy: flatten both trees, map torch parameter names to flax
paths via the per-model rename tables below, transpose torch OIHW convs ->
flax HWIO and torch [out,in] dense -> flax [in,out], verify shapes, and
report misses instead of failing silently.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Tuple

import numpy as np


def _load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open
    out = {}
    for fn in sorted(os.listdir(path)):
        if fn.endswith(".safetensors"):
            with safe_open(os.path.join(path, fn), framework="np") as f:
                for k in f.keys():
                    out[k] = f.get_tensor(k)
    return out


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree


def _torch_to_flax(name: str, tensor: np.ndarray,
                   flax_shape: Tuple[int, ...]) -> np.ndarray:
    t = tensor
    if t.ndim == 4 and len(flax_shape) == 4:       # conv OIHW -> HWIO
        t = t.transpose(2, 3, 1, 0)
    elif t.ndim == 2 and len(flax_shape) == 2 and t.shape[::-1] == tuple(
            flax_shape):
        t = t.T
    return t


def _unbox(leaf):
    """Unwrap flax LogicallyPartitioned (and similar .value boxes)."""
    return getattr(leaf, "value", leaf)


def graft_weights(params, torch_tensors: Dict[str, np.ndarray],
                  rename: Dict[str, str], label: str):
    """Copy matching tensors into the flax tree; report coverage.

    Logical-partitioning boxes (nn.with_logical_partitioning) are
    preserved: values graft inside the box so sharding metadata survives.
    """
    flat = dict(_flatten(params))
    hits, misses = 0, []
    new = {"/".join(p): np.asarray(_unbox(v)) for p, v in flat.items()}
    for tname, tensor in torch_tensors.items():
        fname = tname
        for pat, rep in rename.items():
            fname = re.sub(pat, rep, fname)
        if fname in new:
            conv = _torch_to_flax(tname, tensor, new[fname].shape)
            if conv.shape == new[fname].shape:
                new[fname] = np.ascontiguousarray(conv).astype(
                    new[fname].dtype)
                hits += 1
                continue
        misses.append(tname)
    print(f"[weights:{label}] grafted {hits}/{len(torch_tensors)} tensors"
          + (f"; first misses: {misses[:5]}" if misses else ""))

    def rebuild(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: rebuild(v, prefix + (k,)) for k, v in tree.items()}
        val = new["/".join(prefix)]
        if hasattr(tree, "value") and hasattr(tree, "replace"):
            return tree.replace(value=val)   # re-box partitioned leaves
        return val

    return rebuild(params)


# --- per-model entry points (rename tables grow as checkpoints are used) --

_SDXL_RENAMES = {
    r"\.weight$": "/kernel",
    r"\.bias$": "/bias",
    r"\.": "/",
}


def sdxl_unet_name_to_flax(name: str, num_levels: int = 3) -> str:
    """diffusers UNet2DConditionModel parameter name -> our flax path.

    Handles the structural renames: down/up block indexing (diffusers
    up_blocks[0] is the deepest level; ours is up_{num_levels-1}),
    GEGLU feed-forward (ff.net.0.proj / ff.net.2 -> ff/proj_in /
    ff/proj_out), attention to_out.0 -> to_out, transformer block
    nesting, GroupNorm/LayerNorm weight -> scale.
    """
    n = name
    # up-block index inversion
    m = re.match(r"up_blocks\.(\d+)\.(.*)", n)
    if m:
        lvl = num_levels - 1 - int(m.group(1))
        n = f"up_{lvl}.{m.group(2)}"
    n = re.sub(r"^down_blocks\.(\d+)\.", r"core.down_\1.", n)
    n = re.sub(r"^mid_block\.", "core.mid.", n)
    n = re.sub(r"^conv_in\.", "core.conv_in.", n)
    n = re.sub(r"resnets\.(\d+)\.", r"resnets_\1.", n)
    n = re.sub(r"attentions\.(\d+)\.", r"attentions_\1.", n)
    n = re.sub(r"transformer_blocks\.(\d+)\.", r"blocks_\1.", n)
    n = re.sub(r"downsamplers\.0\.conv\.", "downsample.conv.", n)
    n = re.sub(r"upsamplers\.0\.conv\.", "upsample.conv.", n)
    n = re.sub(r"ff\.net\.0\.proj\.", "ff.proj_in.", n)
    n = re.sub(r"ff\.net\.2\.", "ff.proj_out.", n)
    n = re.sub(r"to_out\.0\.", "to_out.", n)
    n = n.replace(".", "/")
    # parameter leaf names: norms use scale, everything else kernel
    if n.endswith("/weight"):
        leaf = "scale" if re.search(
            r"(^|/)(norm\d?|conv_norm_out|ln\w*)/weight$", n) else "kernel"
        n = n[: -len("weight")] + leaf
    return "params/" + n


def convert_sdxl_unet(tensors: Dict[str, np.ndarray],
                      num_levels: int = 3) -> Dict[str, np.ndarray]:
    """Full-checkpoint name conversion (values transposed by graft)."""
    return {sdxl_unet_name_to_flax(k, num_levels): v
            for k, v in tensors.items()}


def vae_name_to_flax(name: str, num_levels: int = 4) -> str:
    """diffusers AutoencoderKL parameter name -> our flax path.

    Our VAE flattens blocks into enc/dec stage names: encoder
    down_blocks.L.resnets.I -> encoder/down_L_res_I, downsamplers.0.conv
    -> down_L_ds/conv, mid_block resnets/attention -> mid_res_{0,1} /
    mid_attn, decoder up_blocks reversed (diffusers up_blocks[0] is the
    deepest level), conv_norm_out -> norm_out.
    """
    n = name
    m = re.match(r"decoder\.up_blocks\.(\d+)\.(.*)", n)
    if m:
        lvl = num_levels - 1 - int(m.group(1))
        rest = m.group(2)
        rest = re.sub(r"^resnets\.(\d+)\.", rf"up_{lvl}_res_\1.", rest)
        rest = re.sub(r"^upsamplers\.0\.", rf"up_{lvl}_us.", rest)
        n = "decoder." + rest
    n = re.sub(r"encoder\.down_blocks\.(\d+)\.resnets\.(\d+)\.",
               r"encoder.down_\1_res_\2.", n)
    n = re.sub(r"encoder\.down_blocks\.(\d+)\.downsamplers\.0\.",
               r"encoder.down_\1_ds.", n)
    n = re.sub(r"mid_block\.resnets\.(\d+)\.", r"mid_res_\1.", n)
    n = re.sub(r"mid_block\.attentions\.0\.", "mid_attn.", n)
    n = n.replace("group_norm.", "norm.")
    n = n.replace("conv_norm_out.", "norm_out.")
    n = n.replace("to_out.0.", "to_out.")
    # attention projections live inside the inner Attention module
    n = re.sub(r"mid_attn\.(to_q|to_k|to_v|to_out)\.",
               r"mid_attn.attn.\1.", n)
    n = n.replace(".", "/")
    if n.endswith("/weight"):
        leaf = "scale" if re.search(r"(^|/)(norm\w*)/weight$", n) else "kernel"
        n = n[: -len("weight")] + leaf
    return "params/" + n


def convert_vae(tensors: Dict[str, np.ndarray], num_levels: int = 4
                ) -> Dict[str, np.ndarray]:
    return {vae_name_to_flax(k, num_levels): v for k, v in tensors.items()}


def load_sdxl_controlnet(weights_dir: str, params):
    for sub in ("unet", "controlnet"):
        p = os.path.join(weights_dir, sub)
        if os.path.isdir(p):
            tensors = _load_safetensors_dir(p)
            n_levels = len([k for k in params[sub]["params"].get("core", {})
                            if k.startswith("down_")]) or 3
            converted = convert_sdxl_unet(tensors, n_levels)
            params[sub] = graft_weights(params[sub], converted, {}, sub)
    p = os.path.join(weights_dir, "vae")
    if os.path.isdir(p):
        tensors = _load_safetensors_dir(p)
        n_levels = len({k.split("_")[1] for k in
                        params["vae"]["params"].get("encoder", {})
                        if k.startswith("down_")}) or 4
        params["vae"] = graft_weights(params["vae"], convert_vae(
            tensors, n_levels), {}, "vae")
    return params


def load_dit(weights_dir: str, params, variant: str):
    p = os.path.join(weights_dir, variant)
    if os.path.isdir(p):
        tensors = _load_safetensors_dir(p)
        params["dit"] = graft_weights(params["dit"], tensors,
                                      _SDXL_RENAMES, variant)
    return params


def load_instantmesh(weights_dir: str, params):
    p = os.path.join(weights_dir, "instantmesh")
    if os.path.isdir(p):
        tensors = _load_safetensors_dir(p)
        params["lrm"] = graft_weights(params["lrm"], tensors,
                                      _SDXL_RENAMES, "lrm")
    return params


def load_trellis(weights_dir: str, params):
    p = os.path.join(weights_dir, "trellis")
    if os.path.isdir(p):
        tensors = _load_safetensors_dir(p)
        params = graft_weights(params, tensors, _SDXL_RENAMES, "trellis")
    return params


def load_matting(weights_dir: str, params):
    p = os.path.join(weights_dir, "rmbg")
    if os.path.isdir(p):
        tensors = _load_safetensors_dir(p)
        params = graft_weights(params, tensors, _SDXL_RENAMES, "rmbg")
    return params
