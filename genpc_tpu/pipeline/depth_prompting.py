"""Stage 1 — Depth Prompting: viewpoint selection + depth render + inpaint
+ depth-conditioned image generation.

TPU-native rebuild of the reference ``DepthPrompting`` class
(reference: DepthPrompting.py:15-405).  The reference's three hot loops
become batched device programs:
  * getUvs' per-camera Python loop (DepthPrompting.py:239-271) -> one
    vmapped projection over all 1024 views (geometry/cameras.py);
  * getVisiblePoints' per-view open3d hidden_point_removal
    (DepthPrompting.py:273-290, the dominant Stage-1 cost) -> the batched
    z-buffer visibility kernel (cfg.visibility='zbuffer'), with exact host
    HPR available for parity (cfg.visibility='hpr');
  * paintPixels/getRawDepth host-assembled splats -> jitted scatter
    programs with a static-shape validity mask.

Numeric contracts preserved: UV rescale to [0.05,0.95] with padding
(DepthPrompting.py:247-261), best-vs-opposite-view selection by visible
depth sum (DepthPrompting.py:110-176), (row,col) pixel swap + clip
(:179-184), inverted depth encoding 0.1+0.8·(1−d̂) (:362-366), vertical
flip (:339).
"""

from __future__ import annotations

import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from genpc_tpu.categories import get_category
from genpc_tpu.geometry.cameras import (
    Camera, create_cameras, rescale_uvs, transform_points)
from genpc_tpu.models.backends import get_depth2image
from genpc_tpu.ops.fps import farthest_point_sample
from genpc_tpu.ops.hpr import visible_points
from genpc_tpu.pipeline.artifacts import ObjectArtifacts, Workspace
from genpc_tpu.render.inpaint import inpaint_image
from genpc_tpu.render.splat import raw_depth_images, uvs_to_pixels


class DepthPrompting:
    def __init__(self, cfg, depth2image=None):
        self.cfg = cfg
        self.cameras, self.viewpoints = create_cameras(
            num_views=cfg.view_num,
            distance=cfg.distance,
            fovy=cfg.fovy,
            res=cfg.cam_res,
            distribution=cfg.camera_distribution,
        )
        self.depth2image = depth2image or get_depth2image(cfg.control_model, cfg)
        self.workspace = Workspace(cfg.output_path, cfg.generative_model)
        # inpainter switch (reference: DepthPrompting.py:21-34 — flux /
        # DDNM / cv2, anything else raises); 'jax' is this rebuild's
        # device-native default
        inpainter = cfg.get("inpainter", "jax")
        if inpainter == "flux":
            from genpc_tpu.models.dit_depth import FluxInpainter
            self.inpainter = FluxInpainter(cfg)
        elif inpainter == "DDNM":
            from genpc_tpu.models.ddnm import DDNMInpainter
            self.inpainter = DDNMInpainter(cfg)
        elif inpainter in ("cv2", "jax"):
            self.inpainter = None   # handled by render/inpaint.py dispatch
        else:
            raise NotImplementedError(
                f"Inpainter {inpainter} not implemented.")

    # ------------------------------------------------------------------
    def viewpoint_select(self, xyz: np.ndarray) -> int:
        """Best viewpoint = argmax of visible-point count over the rig
        (reference: DepthPrompting.py:87-98).

        The zbuffer path uses the coarse-to-exact two-stage selector
        (ops/hpr.py select_best_view); 'hpr' runs the exact Katz host
        loop over every view for parity checks.
        """
        cfg = self.cfg
        sampled, _ = farthest_point_sample(xyz, cfg.downsample_num)
        if cfg.get("visibility", "zbuffer") == "zbuffer":
            from genpc_tpu.ops.hpr import select_best_view
            # the coarse pass scores an FPS-ordered PREFIX; when the
            # cloud is smaller than downsample_num, FPS degrades to the
            # original (possibly scanline) order, so score every point
            # instead of a spatially biased prefix (ADVICE r2 #2)
            n_coarse = int(cfg.get("select_coarse_points", 2500))
            if len(xyz) <= int(cfg.downsample_num):
                n_coarse = len(sampled)
            return int(select_best_view(
                jnp.asarray(sampled), jnp.asarray(self.viewpoints),
                n_coarse=n_coarse,
                topk=int(cfg.get("select_topk", 48))))
        vis = visible_points(np.asarray(sampled), self.viewpoints,
                             cfg.removal_radius, method="hpr")
        return int(vis.sum(axis=1).argmax())

    # ------------------------------------------------------------------
    def get_depth(self, art: ObjectArtifacts) -> ObjectArtifacts:
        cfg = self.cfg
        xyz = np.asarray(art.xyz, np.float32)
        rgb = np.asarray(art.rgb, np.float32)

        if cfg.view_num == 6:
            best = 1
        else:
            best = self.viewpoint_select(xyz)

        # project through the best camera and its opposite
        viewpoint = np.asarray(self.viewpoints[best], np.float64)
        opposite = -viewpoint
        cam_best = self.cameras[best]
        cam_opp = Camera.from_eyes(opposite[None], cfg.fovy, cfg.cam_res)

        tb = transform_points(cam_best, jnp.asarray(xyz))
        to = transform_points(cam_opp, jnp.asarray(xyz))
        if cfg.rescale:
            uv_b, d_b = rescale_uvs(tb, cfg.padding)
            uv_o, d_o = rescale_uvs(to, cfg.padding)
        else:
            uv_b, d_b = (tb[..., :2] + 1) * 0.5, tb[..., 2]
            uv_o, d_o = (to[..., :2] + 1) * 0.5, to[..., 2]
        uv_b, d_b, uv_o, d_o = uv_b[0], d_b[0], uv_o[0], d_o[0]

        # visibility from each candidate on the full cloud
        method = cfg.get("visibility", "zbuffer")
        vis = visible_points(xyz, np.stack([viewpoint, opposite]),
                             cfg.removal_radius, method=method)
        vis1, vis2 = vis[0], vis[1]

        # heuristic: keep the view with the larger visible depth sum
        # (reference: DepthPrompting.py:153-176)
        sum1 = float(np.asarray(d_b)[vis1].sum())
        sum2 = float(np.asarray(d_o)[vis2].sum())
        if sum1 >= sum2:
            uv, depth, visible, view = uv_b, d_b, vis1, viewpoint
        else:
            uv, depth, visible, view = uv_o, d_o, vis2, opposite

        pixels = uvs_to_pixels(uv, cfg.res)
        sparse_img, raw_depth, m1, m2 = raw_depth_images(
            pixels, depth, jnp.asarray(rgb), res=cfg.res,
            point_size=cfg.point_size, mask_pixel_rate=cfg.mask_pixel_rate,
            valid=jnp.asarray(visible))

        # inpaint the splat ring holes (reference dispatch:
        # DepthPrompting.py:201-229 — flux paints mask1 with a text prompt,
        # DDNM projects onto mask2 data consistency, cv2 uses INPAINT_NS)
        inpainter = cfg.get("inpainter", "jax")
        hole = m2 if inpainter == "DDNM" else m1
        if inpainter == "flux":
            depth_img = jnp.asarray(self.inpainter.paint(
                np.asarray(raw_depth), np.asarray(m1),
                prompt="complete the depth map. ", size=cfg.res))
        elif inpainter == "DDNM":
            depth_img = jnp.asarray(self.inpainter.inpaint(
                np.asarray(raw_depth), np.asarray(m2)))
        else:
            backend = "cv2" if inpainter == "cv2" else "jax"
            depth_img = inpaint_image(raw_depth, hole, backend=backend,
                                      iters=int(cfg.get("inpaint_iters", 250)))

        art.point_uv = np.asarray(uv)
        art.viewpoint = np.asarray(view)
        art.raw_depth = np.asarray(raw_depth)
        art.depth = np.asarray(depth_img)
        art.mask = np.asarray(m1 if inpainter != "DDNM" else m2)
        return art

    # ------------------------------------------------------------------
    def get_image(self, art: ObjectArtifacts, depth_gen: bool = True,
                  img_gen: bool = True, verbose: bool = True
                  ) -> ObjectArtifacts:
        """Full Stage 1 (reference: DepthPrompting.py:69-85)."""
        start = time.time()
        if art.rgb is None:
            rng = np.random.default_rng(0)
            art.rgb = (rng.random((len(art.xyz), 3)) / 255.0).astype(np.float32)
        if depth_gen:
            self.get_depth(art)
        if img_gen:
            art.image = np.asarray(self.depth2image.generate(
                art.depth, get_category(art.flag),
                size=self.cfg.generate_res))
        if self.cfg.save:
            self.workspace.save_stage1(art)
        if verbose:
            print(f" Stage 1 [{art.flag}] took {time.time()-start:.1f}s")
        return art
