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


def _sweep_planes_batched_impl(p, normals, offsets, new_thresh2, k: int):
    """p [B,N,3]; normals [B,A,3]; offsets [B,A,O]; new_thresh2 [B]."""
    import jax
    import jax.numpy as jnp
    from genpc_tpu.ops.chamfer import _nn

    def per_object(p1, normals1, offsets1, thr):
        def one(n, c):
            d = p1 @ n - c
            mir = p1 - 2.0 * d[:, None] * n[None, :]
            d2, _ = _nn(mir[None], p1[None])
            d2 = d2[0]
            dist = jnp.sqrt(jnp.maximum(d2, 0.0))
            trimmed = jax.lax.top_k(-dist, k)[0]
            score = -trimmed.mean()
            new = (d2 > thr).sum()
            return score, new

        return jax.vmap(jax.vmap(one, in_axes=(None, 0)),
                        in_axes=(0, 0))(normals1, offsets1)

    return jax.vmap(per_object)(p, normals, offsets, new_thresh2)


_SWEEP_JIT = None


def _sweep_planes_batched(p, normals, offsets, new_thresh2, k: int):
    global _SWEEP_JIT
    import functools
    import jax
    if _SWEEP_JIT is None:
        _SWEEP_JIT = jax.jit(_sweep_planes_batched_impl,
                             static_argnames=("k",))
    import jax.numpy as jnp
    return _SWEEP_JIT(jnp.asarray(p), jnp.asarray(normals),
                      jnp.asarray(offsets), jnp.asarray(new_thresh2), k=k)


def _sweep_planes(p, normals, offsets, k_keep: int, new_thresh2):
    """Score every (azimuth, offset) mirror plane in one device program.

    p [N,3]; normals [A,3]; offsets [A,O].  Returns (scores [A,O] =
    trimmed-mean NN distance of mirror(p) into p, new_counts [A,O]).
    """
    import numpy as _np
    s, n = _sweep_planes_batched(p[None], normals[None], offsets[None],
                                 _np.asarray([new_thresh2]), k_keep)
    return s[0], n[0]


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
    """Partial cloud + viewpoint -> complete cloud by constrained mirroring.

    The neural backends consume the no-background image; this one consumes
    the geometry the pipeline already carries (partial cloud + selected
    viewpoint), which is what a model-free completion can honestly use.

    Mirrored candidates are filtered by the **visual hull** of the scan:
    a mirrored point survives only if its projection through the Stage-1
    camera lands inside the (dilated) silhouette of the partial cloud —
    geometry the captured view proves empty is never hallucinated.  This
    keeps backside fill and drops the phantom wings a raw reflection
    creates on asymmetric objects.
    """

    #: this backend's completion lives in the input cloud's frame
    output_aligned = True

    def __init__(self, cfg=None, num_points: int | None = None,
                 jitter: float = 0.004, sil_res: int = 128,
                 sil_dilate: int = 2):
        if num_points is None:
            num_points = (int(cfg.get("glb_sample_points", 163840))
                          if cfg is not None else 163840)
        self.num_points = num_points
        self.jitter = jitter
        self.sil_res = sil_res
        self.sil_dilate = sil_dilate
        self.fovy = float(cfg.get("fovy", 49.1)) if cfg is not None else 49.1

    def _visual_hull_mask(self, partial: np.ndarray, candidates: np.ndarray,
                          viewpoint: np.ndarray) -> np.ndarray:
        """True for candidates projecting inside the partial's silhouette."""
        from genpc_tpu.geometry.cameras import Camera, transform_points
        import jax.numpy as jnp
        cam = Camera.from_eyes(np.asarray(viewpoint, np.float64)[None],
                               self.fovy, self.sil_res)
        both = np.concatenate([partial, candidates])
        t = np.asarray(transform_points(cam, jnp.asarray(both)))[0]
        uv = t[:, :2]
        # normalize by the PARTIAL's uv bounds (stage-1 rescale convention)
        np_part = len(partial)
        lo = uv[:np_part].min(0)
        hi = uv[:np_part].max(0)
        span = max((hi - lo).max(), 1e-9)
        px = np.clip(((uv[:, 0] - lo[0]) / span * (self.sil_res - 1)),
                     -1, self.sil_res).astype(np.int64)
        py = np.clip(((uv[:, 1] - lo[1]) / span * (self.sil_res - 1)),
                     -1, self.sil_res).astype(np.int64)
        sil = np.zeros((self.sil_res + 2, self.sil_res + 2), bool)
        sil[py[:np_part] + 1, px[:np_part] + 1] = True
        # dilate the silhouette a few pixels
        for _ in range(self.sil_dilate):
            s = sil.copy()
            s[1:] |= sil[:-1]
            s[:-1] |= sil[1:]
            s[:, 1:] |= sil[:, :-1]
            s[:, :-1] |= sil[:, 1:]
            sil = s
        cx = np.clip(px[np_part:] + 1, 0, self.sil_res + 1)
        cy = np.clip(py[np_part:] + 1, 0, self.sil_res + 1)
        inside_img = (px[np_part:] >= 0) & (px[np_part:] < self.sil_res) \
            & (py[np_part:] >= 0) & (py[np_part:] < self.sil_res)
        return sil[cy, cx] & inside_img

    @staticmethod
    def plan_symmetry_batched(pts_list, n_azimuths: int = 24,
                              sample: int = 4096, trim: float = 0.5,
                              accept_ratio: float = 0.008):
        """Find (normal, offset) symmetry planes for a BATCH of clouds.

        All B objects' coarse sweeps (24 azimuths × 13 offsets each) run
        as one device program, then all fine sweeps as a second — two
        dispatches total instead of ~2B.  Returns a list of (n [3], c)
        or None per object.

        Score(plane) = mean of the smallest ``trim`` fraction of
        NN(mirror(partial) -> partial) distances; acceptance is floored
        at 1.5x the cloud's own sampling spacing.  Among acceptable
        planes the one GENERATING the most new geometry wins (a perfect
        self-symmetry plane scores best but completes nothing).
        """
        import jax
        import jax.numpy as jnp
        from genpc_tpu.ops.knn import knn
        B = len(pts_list)
        rng = np.random.default_rng(0)
        ps, cents, exts = [], [], []
        for pts in pts_list:
            idx = rng.choice(len(pts), min(sample, len(pts)), replace=False)
            p = pts[idx]
            if len(p) < sample:   # pad by repetition to the fixed size
                pad = rng.integers(0, len(p), sample - len(p))
                p = np.concatenate([p, p[pad]])
            ps.append(p.astype(np.float32))
            cents.append(pts.mean(axis=0))
            exts.append(float((pts.max(0) - pts.min(0)).max()))
        P = np.stack(ps)                                  # [B,S,3]
        k_keep = max(1, int(sample * trim))

        d_self, _ = jax.vmap(lambda a: knn(a, a, 2))(jnp.asarray(P))
        spacing = np.median(np.sqrt(np.asarray(d_self)[:, :, 1]), axis=1)
        accept = np.maximum(accept_ratio * np.asarray(exts), 1.5 * spacing)
        thr2 = (0.02 * np.asarray(exts)) ** 2

        def make_planes(thetas_b):
            """thetas_b [B,A] -> (normals [B,A,3], offsets [B,A,O])."""
            normals = np.stack([np.cos(thetas_b),
                                np.zeros_like(thetas_b),
                                np.sin(thetas_b)], axis=-1)
            base = np.einsum("bad,bd->ba", normals, np.stack(cents))
            offsets = base[..., None] + (np.linspace(-0.15, 0.15, 13)[None,
                                         None, :]
                                         * np.asarray(exts)[:, None, None])
            return normals, offsets

        thetas = np.tile(np.linspace(0, np.pi, n_azimuths,
                                     endpoint=False)[None], (B, 1))
        normals, offsets = make_planes(thetas)
        scores, news = map(np.asarray, _sweep_planes_batched(
            P, normals, offsets, thr2, k_keep))

        jbest = scores.argmin(axis=2)                      # [B,A]
        az = np.arange(n_azimuths)
        s_az = np.take_along_axis(scores, jbest[..., None], 2)[..., 0]
        ok = s_az < accept[:, None]
        n_az = np.take_along_axis(news, jbest[..., None], 2)[..., 0]
        gain = np.where(ok, n_az, -1)
        i0 = gain.argmax(axis=1)                           # [B]
        any_ok = ok.any(axis=1)

        # fine azimuth refinement around each winner, re-searching offsets
        th0 = thetas[np.arange(B), i0]
        fine = th0[:, None] + np.linspace(-np.pi / n_azimuths,
                                          np.pi / n_azimuths, 9)[None]
        fnormals, foffsets = make_planes(fine)
        fs, _ = map(np.asarray, _sweep_planes_batched(
            P, fnormals, foffsets, thr2, k_keep))
        jf = fs.argmin(axis=2)                             # [B,9]
        fmin = np.take_along_axis(fs, jf[..., None], 2)[..., 0]
        iaz = fmin.argmin(axis=1)                          # [B]
        score = fmin[np.arange(B), iaz]

        plans = []
        for b in range(B):
            if not any_ok[b] or score[b] > accept[b]:
                plans.append(None)
            else:
                plans.append((fnormals[b, iaz[b]],
                              float(foffsets[b, iaz[b], jf[b, iaz[b]]])))
        return plans

    def _apply_mirror(self, pts, cols, plan):
        """Mirror the full cloud across the plan's plane, drop duplicates."""
        import jax.numpy as jnp
        from genpc_tpu.ops.chamfer import nearest_neighbor
        if plan is None:
            return None, None
        n, c = plan
        extent = float((pts.max(0) - pts.min(0)).max())
        d = (pts @ n) - c
        mirrored = pts - 2.0 * d[:, None] * n[None, :]
        d2, _ = nearest_neighbor(jnp.asarray(mirrored, jnp.float32),
                                 jnp.asarray(pts, jnp.float32))
        new = np.asarray(d2) > (0.01 * extent) ** 2
        return mirrored[new].astype(np.float32), cols[new]

    def _best_symmetry_mirror(self, pts: np.ndarray, cols: np.ndarray,
                              n_azimuths: int = 24, sample: int = 4096,
                              trim: float = 0.5, accept_ratio: float = 0.008
                              ) -> Tuple[Optional[np.ndarray],
                                         Optional[np.ndarray]]:
        """Single-object symmetry search (see plan_symmetry_batched)."""
        plan = self.plan_symmetry_batched([pts], n_azimuths, sample, trim,
                                          accept_ratio)[0]
        return self._apply_mirror(pts, cols, plan)

    def complete_with_plan(self, flag: str, partial_xyz, partial_rgb,
                           viewpoint, plan) -> Tuple[np.ndarray, np.ndarray]:
        """Assemble the completion from a precomputed symmetry plan
        (the batched driver plans all objects in two device calls)."""
        pts = np.asarray(partial_xyz, np.float32)
        cols = (np.asarray(partial_rgb, np.float32)
                if partial_rgb is not None else np.full_like(pts, 0.6))
        if viewpoint is None:
            viewpoint = pts.mean(axis=0) + np.array([0, 0, 1], np.float32)
        mirrored, mir_cols = self._apply_mirror(pts, cols, plan)
        return self._assemble(flag, pts, cols, mirrored, mir_cols, viewpoint)

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

        # detect the object's vertical symmetry plane: sweep azimuths and
        # plane offsets, score each by the trimmed chamfer of the mirrored
        # cloud against the partial (trimming tolerates genuinely-new
        # backside points).  No credible symmetry -> identity completion,
        # which can never score worse than the raw partial.
        mirrored, mir_cols = self._best_symmetry_mirror(pts, cols)
        return self._assemble(flag, pts, cols, mirrored, mir_cols, viewpoint)

    def _assemble(self, flag, pts, cols, mirrored, mir_cols, viewpoint
                  ) -> Tuple[np.ndarray, np.ndarray]:
        if mirrored is not None and len(mirrored):
            keep = self._visual_hull_mask(pts, mirrored,
                                          np.asarray(viewpoint, np.float64))
            mirrored, mir_cols = mirrored[keep], mir_cols[keep]
        if mirrored is None or len(mirrored) == 0:
            mirrored = pts[:0]
            mir_cols = cols[:0]
        all_pts = np.concatenate([pts, mirrored], axis=0)
        all_cols = np.concatenate([cols, mir_cols], axis=0)
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
