"""Stage 2 — Scale Adapter: background removal, point coloring, image-to-3D.

Rebuild of the reference ``ScaleAdapter`` (reference: ScaleAdapter.py:15-97).
``color_point`` replaces the reference's per-point Python pixel-lookup loop
(ScaleAdapter.py:64-66, hot loop #4) with one vectorized gather; sampling
uses the generated image's true resolution rather than the reference's
hard-coded 1024 (which over-indexes 512² generations — a known reference
bug noted in SURVEY §7).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from genpc_tpu.models.backends import get_image23d, get_rembg
from genpc_tpu.pipeline.artifacts import ObjectArtifacts, Workspace
from genpc_tpu.io.glb import Mesh


class ScaleAdapter:
    def __init__(self, cfg, rembg=None, image23d=None):
        self.cfg = cfg
        self.rembg = rembg or get_rembg(cfg.rembg_model, cfg)
        self.image23d = image23d or get_image23d(cfg.generative_model, cfg)
        self.workspace = Workspace(cfg.output_path, cfg.generative_model)

    # ------------------------------------------------------------------
    def remove_bg(self, art: ObjectArtifacts) -> ObjectArtifacts:
        art.image_nobg = np.asarray(self.rembg(art.image))
        return art

    # ------------------------------------------------------------------
    def color_point(self, art: ObjectArtifacts) -> ObjectArtifacts:
        """Color the partial cloud from the generated image at its UVs
        (reference: ScaleAdapter.py:46-68)."""
        img = np.asarray(art.image, np.float32)
        res = img.shape[0]
        # undo the paint-time vertical flip before sampling
        img = img[::-1, :, :]
        pix = (np.asarray(art.point_uv) * res).astype(np.int64)
        rows = np.clip(pix[:, 1], 0, res - 1)
        cols = np.clip(pix[:, 0], 0, res - 1)
        art.color_xyz = np.asarray(art.xyz, np.float32)
        art.color_rgb = img[rows, cols, :3].astype(np.float32)
        return art

    # ------------------------------------------------------------------
    def img2shape(self, art: ObjectArtifacts) -> ObjectArtifacts:
        out = self.image23d(art.flag, art.image_nobg,
                            partial_xyz=art.color_xyz,
                            partial_rgb=art.color_rgb,
                            viewpoint=art.viewpoint)
        if isinstance(out, Mesh):
            art.complete_mesh = out
        else:
            art.complete_xyz, art.complete_rgb = out
        art.complete_aligned = bool(getattr(self.image23d,
                                            "output_aligned", False))
        return art

    # ------------------------------------------------------------------
    def scale_adapter(self, art: ObjectArtifacts) -> ObjectArtifacts:
        """Full Stage 2 (reference: ScaleAdapter.py:78-86)."""
        self.remove_bg(art)
        self.color_point(art)
        self.img2shape(art)
        if self.cfg.save:
            self.workspace.save_stage2(art)
        return art

    def scale_adapter_batch(self, arts) -> None:
        """Stage 2 for a batch: per-object matting/coloring (cheap host
        work) + batched symmetry planning when the backend supports it
        (two device dispatches for the whole batch)."""
        from genpc_tpu.models.synthetic import SyntheticImage23D
        for art in arts:
            self.remove_bg(art)
            self.color_point(art)
        if isinstance(self.image23d, SyntheticImage23D):
            plans = SyntheticImage23D.plan_symmetry_batched(
                [a.color_xyz for a in arts])
            for art, plan in zip(arts, plans):
                art.complete_xyz, art.complete_rgb = \
                    self.image23d.complete_with_plan(
                        art.flag, art.color_xyz, art.color_rgb,
                        art.viewpoint, plan)
                art.complete_aligned = True
        elif hasattr(self.image23d, "generate_meshes_batch"):
            # object-batched image-to-3D: the denoise/decode/triplane
            # programs run once over [B,...] (VERDICT r2 #3).
            # cfg.image23d_batch bounds the per-program object count so
            # full-size presets can fit HBM (0 = whole batch).
            nb = int(self.cfg.get("image23d_batch", 0)) or len(arts)
            aligned = bool(getattr(self.image23d, "output_aligned",
                                   False))
            for i in range(0, len(arts), nb):
                chunk = arts[i:i + nb]
                meshes = self.image23d.generate_meshes_batch(
                    [a.flag for a in chunk],
                    [a.image_nobg for a in chunk])
                for art, m in zip(chunk, meshes):
                    art.complete_mesh = m
                    art.complete_aligned = aligned
        else:
            for art in arts:
                self.img2shape(art)
        if self.cfg.save:
            for art in arts:
                self.workspace.save_stage2(art)

    def scale_reg(self, art: ObjectArtifacts) -> ObjectArtifacts:
        """Stage 3 hand-off (reference: ScaleAdapter.py:74-75)."""
        from genpc_tpu.pipeline.registration import reg
        return reg(self.cfg, art, cd_inv_weight=0.5, diff_init=True,
                   reg_fine_xyz=True)
