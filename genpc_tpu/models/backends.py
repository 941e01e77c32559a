"""Backend registry for the three generative stages.

Mirrors the reference's string-keyed backend switches
(reference: DepthPrompting.py:44-67 control_model; ScaleAdapter.py:20-37
rembg_model/generative_model) but with lazy construction and no
import-time model loads (the reference loads checkpoints at module import,
e.g. tools/instantmesh.py:65-113 — a known wart we do not replicate).

Neural backends (flax) register here as they land; every name falls back
to a clear error pointing at the synthetic equivalent.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from genpc_tpu.models.synthetic import (
    SyntheticDepth2Image, SyntheticImage23D, SyntheticRembg)


def prep_rgb(image: np.ndarray, size: int) -> np.ndarray:
    """RGBA/RGB [H,W,*] in [0,1] -> alpha-matted RGB [size,size,3].

    The shared no-background-image normalization every image23d backend
    applies before encoding (reference: tools/instantmesh.py:121-128
    preprocesses the RGBA matte the same way)."""
    img = np.asarray(image, np.float32)
    if img.shape[-1] == 4:
        img = img[..., :3] * img[..., 3:4]
    from PIL import Image
    return np.asarray(Image.fromarray(
        (np.clip(img, 0, 1) * 255).astype(np.uint8)).resize(
        (size, size), Image.BILINEAR), np.float32) / 255.0


def get_depth2image(name: str, cfg: Any = None):
    """Depth-conditioned image generator: .generate(depth, category, size)."""
    if name == "synthetic":
        return SyntheticDepth2Image(cfg)
    if name == "controlnet":
        from genpc_tpu.models.controlnet_depth import ControlNetDepth
        return ControlNetDepth(cfg)
    if name == "qwen":
        from genpc_tpu.models.dit_depth import DiTDepthEdit
        return DiTDepthEdit(cfg, variant="qwen")
    if name == "flux":
        from genpc_tpu.models.dit_depth import DiTDepthEdit
        return DiTDepthEdit(cfg, variant="flux")
    if name == "adapter":
        from genpc_tpu.models.controlnet_depth import ControlNetDepth
        return ControlNetDepth(cfg, adapter=True)
    raise ValueError(
        f"unknown control_model {name!r}; use 'synthetic', 'controlnet', "
        f"'adapter', 'flux' or 'qwen'")


def get_rembg(name: str, cfg: Any = None):
    """Background removal: callable(image [H,W,3]) -> RGBA [H,W,4]."""
    if name in ("synthetic", "rembg"):
        return SyntheticRembg(cfg)
    if name in ("RMBG", "rmbg"):
        from genpc_tpu.models.rmbg import RMBGMatting
        return RMBGMatting(cfg)
    raise ValueError(f"unknown rembg_model {name!r}")


def get_image23d(name: str, cfg: Any = None):
    """Image-to-3D: callable(flag, image_nobg, partial_xyz=..., ...) ->
    (points, colors) or a Mesh."""
    if name == "synthetic":
        return SyntheticImage23D(cfg)
    if name == "instantmesh":
        from genpc_tpu.models.lrm import InstantMeshBackend
        return InstantMeshBackend(cfg)
    if name in ("trellis", "trellis_2"):
        from genpc_tpu.models.trellis import TrellisBackend
        return TrellisBackend(cfg, variant=name)
    if name == "sf3d":
        from genpc_tpu.models.sf3d import SF3DBackend
        return SF3DBackend(cfg)
    raise ValueError(f"unknown generative_model {name!r}")
