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


def graft_weights(params, torch_tensors: Dict[str, np.ndarray],
                  rename: Dict[str, str], label: str):
    """Copy matching tensors into the flax tree; report coverage."""
    import jax
    flat = dict(_flatten(params))
    hits, misses = 0, []
    new = {"/".join(p): np.asarray(v) for p, v in flat.items()}
    for tname, tensor in torch_tensors.items():
        fname = tname
        for pat, rep in rename.items():
            fname = re.sub(pat, rep, fname)
        if fname in new:
            conv = _torch_to_flax(tname, tensor, new[fname].shape)
            if conv.shape == new[fname].shape:
                new[fname] = conv.astype(new[fname].dtype)
                hits += 1
                continue
        misses.append(tname)
    print(f"[weights:{label}] grafted {hits}/{len(torch_tensors)} tensors"
          + (f"; first misses: {misses[:5]}" if misses else ""))

    def rebuild(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: rebuild(v, prefix + (k,)) for k, v in tree.items()}
        return new["/".join(prefix)]

    return rebuild(params)


# --- per-model entry points (rename tables grow as checkpoints are used) --

_SDXL_RENAMES = {
    r"\.weight$": "/kernel",
    r"\.bias$": "/bias",
    r"\.": "/",
}


def load_sdxl_controlnet(weights_dir: str, params):
    for sub in ("unet", "controlnet", "vae"):
        p = os.path.join(weights_dir, sub)
        if os.path.isdir(p):
            tensors = _load_safetensors_dir(p)
            params[sub] = graft_weights(params[sub], tensors,
                                        _SDXL_RENAMES, sub)
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


def load_matting(weights_dir: str, params):
    p = os.path.join(weights_dir, "rmbg")
    if os.path.isdir(p):
        tensors = _load_safetensors_dir(p)
        params = graft_weights(params, tensors, _SDXL_RENAMES, "rmbg")
    return params
