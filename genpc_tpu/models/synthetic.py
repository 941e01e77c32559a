"""Deterministic model-free backends for the three generative stages.

BASELINE configs 1-2 evaluate the framework with "no pretrained models";
these backends make the *full* pipeline runnable and benchmarkable without
any checkpoint, while exercising every numeric path the neural backends
will use:

  * ``SyntheticDepth2Image`` — depth -> a shaded pseudo-RGB photo: the
    inpainted depth map is treated as a height field, lit with a fixed
    lambertian light and tinted with a category-deterministic hue.
  * ``SyntheticRembg`` — background matte from the near-black background
    the pipeline's renders guarantee (the real RMBG-2.0 flax port plugs in
    behind the same interface).
  * ``SyntheticImage23D`` — completion by symmetry: mirror the partial
    cloud across the vertical plane through its centroid perpendicular to
    the scan direction (the Stage-1 viewpoint), union with the input and
    densify by local jitter.  A classic geometric completion heuristic —
    honest about being model-free, yet it produces a genuinely more
    complete shape whose registration/fusion behaves like a generated one.
"""

from __future__ import annotations

import hashlib
from typing import Optional, Tuple

import numpy as np

from genpc_tpu.categories import get_category


def _category_hue(flag: str) -> np.ndarray:
    h = int(hashlib.sha1(get_category(flag).encode()).hexdigest()[:6], 16)
    rgb = np.array([(h >> 16) & 255, (h >> 8) & 255, h & 255], np.float32)
    return 0.35 + 0.6 * rgb / 255.0


class SyntheticDepth2Image:
    """Depth image [3,H,W] -> plausible RGB [H,W,3] (deterministic)."""

    def __init__(self, cfg=None):
        self.cfg = cfg

    def generate(self, depth: np.ndarray, category_or_flag: str,
                 size: int = 512) -> np.ndarray:
        d = np.asarray(depth, np.float32)
        if d.ndim == 3:
            d = d.mean(axis=0)
        # resize to the generation resolution with PIL (host)
        if d.shape[0] != size:
            from PIL import Image
            d = np.asarray(Image.fromarray(
                (d * 255).astype(np.uint8)).resize((size, size),
                                                   Image.BILINEAR),
                np.float32) / 255.0
        gy, gx = np.gradient(d)
        normal_z = 1.0 / np.sqrt(gx ** 2 + gy ** 2 + 1.0)
        light = np.clip(0.25 + 0.75 * normal_z, 0, 1)
        shade = light * (0.3 + 0.7 * d)
        hue = _category_hue(category_or_flag)
        img = shade[..., None] * hue[None, None, :]
        img = np.where(d[..., None] > 0.02, img, 0.0)
        return np.clip(img, 0, 1).astype(np.float32)


class SyntheticRembg:
    """RGB [H,W,3] -> RGBA [H,W,4]: near-black background becomes alpha 0."""

    def __init__(self, cfg=None, threshold: float = 0.04):
        self.threshold = threshold

    def __call__(self, image: np.ndarray) -> np.ndarray:
        img = np.asarray(image, np.float32)
        if img.shape[-1] == 4:
            return img
        lum = img.max(axis=-1)
        alpha = (lum > self.threshold).astype(np.float32)
        return np.concatenate([img, alpha[..., None]], axis=-1)


class SyntheticImage23D:
    """Partial cloud + viewpoint -> complete cloud by mirror symmetry.

    The neural backends consume the no-background image; this one consumes
    the geometry the pipeline already carries (partial cloud + selected
    viewpoint), which is what a model-free completion can honestly use.
    """

    def __init__(self, cfg=None, num_points: int | None = None,
                 jitter: float = 0.004):
        if num_points is None:
            num_points = (int(cfg.get("glb_sample_points", 163840))
                          if cfg is not None else 163840)
        self.num_points = num_points
        self.jitter = jitter

    def __call__(self, flag: str, image_nobg: np.ndarray,
                 partial_xyz: Optional[np.ndarray] = None,
                 partial_rgb: Optional[np.ndarray] = None,
                 viewpoint: Optional[np.ndarray] = None,
                 ) -> Tuple[np.ndarray, np.ndarray]:
        if partial_xyz is None:
            raise ValueError("synthetic image23d needs the partial cloud")
        pts = np.asarray(partial_xyz, np.float32)
        cols = (np.asarray(partial_rgb, np.float32)
                if partial_rgb is not None else np.full_like(pts, 0.6))
        centroid = pts.mean(axis=0)
        if viewpoint is None:
            viewpoint = centroid + np.array([0, 0, 1], np.float32)
        # mirror across the vertical plane through the centroid whose normal
        # is the horizontal component of the scan direction
        n = np.asarray(viewpoint, np.float32) - centroid
        n[1] = 0.0
        nrm = np.linalg.norm(n)
        if nrm < 1e-6:
            n = np.array([0.0, 0.0, 1.0], np.float32)
        else:
            n = n / nrm
        d = (pts - centroid) @ n
        mirrored = pts - 2.0 * d[:, None] * n[None, :]
        all_pts = np.concatenate([pts, mirrored], axis=0)
        all_cols = np.concatenate([cols, cols], axis=0)
        rng = np.random.default_rng(
            int(hashlib.sha1(flag.encode()).hexdigest()[:8], 16))
        if len(all_pts) < self.num_points:
            extra = self.num_points - len(all_pts)
            idx = rng.integers(0, len(all_pts), extra)
            scale = float(np.abs(all_pts - all_pts.mean(0)).max())
            noise = rng.normal(0, self.jitter * scale, (extra, 3)).astype(np.float32)
            all_pts = np.concatenate([all_pts, all_pts[idx] + noise], axis=0)
            all_cols = np.concatenate([all_cols, all_cols[idx]], axis=0)
        else:
            idx = rng.choice(len(all_pts), self.num_points, replace=False)
            all_pts, all_cols = all_pts[idx], all_cols[idx]
        return all_pts.astype(np.float32), np.clip(all_cols, 0, 1)
