"""Object-batched pipeline execution (the SURVEY §7 "throughput pass").

The per-object pipeline is dominated by long sequential chains whose
per-step work is tiny (pose optimization: 200 Adam steps; scale searches:
ICP iterations; FPS: k argmax steps).  Batching B objects multiplies the
per-step work while keeping the chain length — near-linear throughput gain
on one chip, and the object axis is exactly what shards over `dp` on a
multi-chip mesh.

This module vmaps the existing jitted stage-3 programs over the object
axis and provides ``run_batched`` — load + stage1/2 (host-orchestrated) +
fully batched registration, fusion and metrics.
"""

from __future__ import annotations

import functools
import gc
import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from genpc_tpu.geometry.normalize import normalize_points
from genpc_tpu.io.ply import load_xyz
from genpc_tpu.metrics.losses import chamfer_partial_l1
from genpc_tpu.ops.chamfer import chamfer_nn, nearest_neighbor
from genpc_tpu.ops.emd import emd_auction
from genpc_tpu.ops.fps import _fps_indices_xla, fps_indices
from genpc_tpu.ops.outliers import statistical_outlier_mask
from genpc_tpu.ops.voxel import voxel_down_sample
from genpc_tpu.pipeline.artifacts import ObjectArtifacts, Workspace
from genpc_tpu.pipeline.depth_prompting import DepthPrompting
from genpc_tpu.pipeline.registration import resample_fixed
from genpc_tpu.pipeline.scale_adapter import ScaleAdapter
from genpc_tpu.registration.icp import _coarse_one, _fine_score
from genpc_tpu.registration.pose_optim import (
    build_transform, rotation_6d_to_matrix)

POSE_N = 2048
ICP_N = 2048


# ------------------------------------------------------------ batched ops

@functools.partial(jax.jit, static_argnames=("render_size",))
def _bpose_init(comp, comp_col, part, part_col, radius, lr,
                render_size: int):
    from genpc_tpu.registration.pose_optim import pose_carry_init
    return jax.vmap(lambda c, cc, p, pc: pose_carry_init(
        c, cc, p, pc, radius, lr, render_size))(comp, comp_col, part,
                                                part_col)


@functools.partial(jax.jit, static_argnames=("steps", "render_size"),
                   donate_argnums=(0,))
def _bpose_steps(carry, comp, comp_col, part, radius, lr,
                 steps: int, render_size: int):
    from genpc_tpu.registration.pose_optim import pose_carry_steps
    return jax.vmap(lambda ca, c, cc, p: pose_carry_steps(
        ca, c, cc, p, radius, lr, steps, render_size))(carry, comp,
                                                       comp_col, part)


@functools.partial(jax.jit, static_argnames=("keep",))
def _bpose_prune(lo, carry, keep: int):
    """Carry the `keep` best coarse-phase starts into the full-res carry.

    Coarse-phase best losses are comparable across starts (same render
    resolution/point set), so the basin ranking is already decided when
    the coarse phase ends; polishing only the winner(s) at full
    resolution cuts the fine-phase work by 4/keep while the full-res
    best-loss tracking still picks the final pose.
    """
    idx = jnp.argsort(lo["best"], axis=1)[:, :keep]         # [B,keep]

    def take(x):
        kk = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
        return jnp.take_along_axis(x, kk, axis=1)

    params = jax.tree.map(take, lo["params"])
    return {"params": params,
            "best_params": jax.tree.map(jnp.copy, params),
            "opt": jax.tree.map(take, lo["opt"]),
            "best": jnp.full_like(carry["best"][:, :keep], jnp.inf),
            "ref_img": carry["ref_img"], "ref_mask": carry["ref_mask"]}


@jax.jit
def _bpose_pick(carry):
    def pick(params, best):
        k = jnp.argmin(best)
        R = rotation_6d_to_matrix(params["rot6d"][k])
        s = jnp.exp(params["log_scale"][k])[0]
        return build_transform(R, params["trans"][k], s)

    return jax.vmap(pick)(carry["best_params"], carry["best"])


def batched_pose_optim(comp, comp_col, part, part_col, radius, lr,
                       iters: int, render_size: int,
                       chunk: int | None = None,
                       coarse_frac: float = 0.7,
                       coarse_res: int | None = None,
                       prune_to: int = 1):
    """[B,...] pose optimization; returns best 4x4 per object [B,4,4].

    Host-chunked: one fused 200-step program for a 13-object batch is a
    ~2 min single device execution, which trips the tunnel watchdog and
    kills the TPU worker — so the loop runs as POSE_CHUNK-step jitted
    segments (identical math, one compile, short executions).

    Coarse-to-fine (VERDICT r2 #5): the first coarse_frac of the
    iterations runs at half resolution AND on a 4x FPS point subsample
    (the step cost is point-dominated: slot-table build + point-centric
    backward gathers scale with N, so subsampling points is where the
    time is), then the carry's params+Adam state transfer to a
    full-N/full-res phase whose best-loss tracking picks the final pose
    — final accuracy is set by the full phase (the reference renders
    2048 points at 224² throughout, diff_obj_pose.py:108-134).
    coarse_frac=0 reproduces the single-phase behavior exactly.

    prune_to keeps only the best prune_to coarse-phase starts for the
    full-res phase (the reference polishes all 4 starts for all 200
    steps, diff_obj_pose.py:518-567, but the basin ranking is decided by
    the coarse search; prune_to=0 or >=4 disables pruning).
    """
    from genpc_tpu.registration.pose_optim import POSE_CHUNK
    chunk = chunk or POSE_CHUNK
    coarse_res = coarse_res or max(64, render_size // 2)
    n_coarse = int(iters * coarse_frac)
    if n_coarse < chunk:      # not worth a second compile
        n_coarse = 0

    def run(carry, n, res, cmp_, ccol_, prt_, rad_):
        done = 0
        while done < n:
            k = min(chunk, n - done)
            carry = _bpose_steps(carry, cmp_, ccol_, prt_, rad_, lr,
                                 k, res)
            done += k
        return carry

    if n_coarse:
        # the step cost is POINT-dominated, not pixel-dominated (slot
        # table build + point-centric backward gathers scale with N;
        # measured 201 vs 240 ms/step at 112² vs 224²) — so the coarse
        # basin-finding phase subsamples POINTS 4x as well, with radius
        # scaled by sqrt(N/Nc) to preserve rendered mask coverage.
        # FPS subsample (cheap via ops/fps_kernel): spatially uniform
        # coverage beats a random draw for basin finding, and is
        # deterministic per object.
        n_pts = comp.shape[1]
        nc = min(n_pts, max(512, n_pts // 4))
        ci = batched_fps(comp, nc)[..., None]
        pi = batched_fps(part, nc)[..., None]
        cc = jnp.take_along_axis(comp, ci, axis=1)
        ccol_c = jnp.take_along_axis(comp_col, ci, axis=1)
        pc = jnp.take_along_axis(part, pi, axis=1)
        pcol_c = jnp.take_along_axis(part_col, pi, axis=1)
        rad_c = radius * jnp.sqrt(jnp.float32(n_pts) / nc)
        lo = _bpose_init(cc, ccol_c, pc, pcol_c, rad_c, lr, coarse_res)
        lo = run(lo, n_coarse, coarse_res, cc, ccol_c, pc, rad_c)
        carry = _bpose_init(comp, comp_col, part, part_col, radius, lr,
                            render_size)
        n_starts = int(carry["best"].shape[1])
        if 0 < prune_to < n_starts:
            # transfer only the best coarse basin(s); moments ride along.
            # best restarts at the new resolution (losses across
            # resolutions are not comparable).
            carry = _bpose_prune(lo, carry, prune_to)
        else:
            # transfer basin + optimizer moments for all starts.
            # best_params must be a COPY — the carry is donated, and the
            # same buffer may not be donated twice in one call
            carry["params"] = lo["params"]
            carry["best_params"] = jax.tree.map(jnp.copy, lo["params"])
            carry["opt"] = lo["opt"]
        carry = run(carry, iters - n_coarse, render_size,
                    comp, comp_col, part, radius)
    else:
        carry = _bpose_init(comp, comp_col, part, part_col, radius, lr,
                            render_size)
        carry = run(carry, iters, render_size,
                    comp, comp_col, part, radius)
    return _bpose_pick(carry)


@functools.partial(jax.jit, static_argnames=())
def batched_coarse_sweep(src, tgt, scales, cd_inv_weight):
    """src/tgt [B,N,3]; scales [S] -> (best T [B,4,4], best loss [B])."""
    def per_object(s, t):
        cds, Ts = jax.vmap(lambda sc: _coarse_one(sc, s, t, cd_inv_weight))(
            scales)
        k = jnp.argmin(cds)
        return Ts[k], cds[k]

    return jax.vmap(per_object)(src, tgt)


def batched_fine_search(src, tgt, cd_inv_weight: float = 0.5,
                        scale_steps: int = 10, chunk: int = 250
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-axis scale grid over a batch: returns (S [B,4,4], T [B,4,4]).

    Score/register split (see icp._fine_score): the reference scores
    candidates on the unregistered scaled source, so all 10^3 scores run
    chamfer-only and the 15-iter ICP runs once per object at the winner
    — identical selection + transform, ~1000x less ICP work."""
    axes = [np.linspace(0.8, 1.2, scale_steps)] * 3
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    B = src.shape[0]
    f = jax.jit(jax.vmap(jax.vmap(
        lambda sc, s, t: _fine_score(sc, s, t, jnp.float32(cd_inv_weight)),
        in_axes=(0, None, None)), in_axes=(None, 0, 0)))
    best_cd = np.full(B, np.inf)
    best_scales = np.ones((B, 3))
    for i in range(0, len(grid), chunk):
        g = jnp.asarray(grid[i:i + chunk], jnp.float32)
        cds = np.asarray(f(g, src, tgt))  # [B,chunk]
        j = cds.argmin(axis=1)
        better = cds[np.arange(B), j] < best_cd
        best_cd = np.where(better, cds[np.arange(B), j], best_cd)
        best_scales[better] = grid[i:i + chunk][j][better]
    best_T = np.asarray(_fine_icp_batch(
        jnp.asarray(best_scales, jnp.float32), src, tgt))
    S = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    S[:, 0, 0], S[:, 1, 1], S[:, 2, 2] = best_scales.T
    return S, best_T


@jax.jit
def _fine_icp_batch(scales3, src, tgt):
    """15-iter ICP per object at its winning per-axis scales -> T [B,4,4]."""
    from genpc_tpu.registration.icp import icp

    def one(sc, s, t):
        T, _, _ = icp(s * sc[None, :], t, 0.075, iters=15)
        return T

    return jax.vmap(one)(scales3, src, tgt)


@functools.partial(jax.jit, static_argnames=("mode",))
def batched_similarity_refine(src, tgt, mode: str = "anisotropic"):
    """[B,N,3] partials -> [B,4,4] final-refine transforms onto
    completes.  mode: 'anisotropic' (R·diag(s), default) | 'affine'
    (general A, cancels the chain's full R1·diag·R2 residual) |
    'similarity' (Umeyama c·R)."""
    from genpc_tpu.registration.icp import (affine_icp, anisotropic_icp,
                                            similarity_icp)
    fn = {"anisotropic": anisotropic_icp, "affine": affine_icp,
          "similarity": similarity_icp}[mode]
    return jax.vmap(lambda s, t: fn(s, t, 0.05))(src, tgt)


@jax.jit
def batched_dedup_mask(src, tgt, threshold: float = 1e-4):
    """[B,Ns,3]/[B,Nt,3] -> keep-mask [B,Nt] (squared-dist >= threshold)."""
    d2, _, _, _ = chamfer_nn(tgt, src)
    return d2 >= threshold


@functools.partial(jax.jit, static_argnames=("k",))
def batched_fps(pts, k: int):
    from genpc_tpu.ops.fps_kernel import fps_pallas_batched, fps_supported
    from genpc_tpu.runtime import use_pallas
    if use_pallas() and fps_supported(pts.shape[1], k):
        return fps_pallas_batched(pts, k)
    return jax.vmap(lambda p: _fps_indices_xla(p, k))(pts)


@functools.partial(jax.jit, static_argnames=("num_points",))
def batched_fps_gather(pts, num_points: int = 16384):
    """[B,N,3] -> FPS-selected [B,num_points,3]."""
    idx = batched_fps(pts, num_points)
    return jnp.take_along_axis(pts, idx[..., None], axis=1)


@functools.partial(jax.jit, static_argnames=("emd_eps", "emd_iters",
                                             "with_emd"))
def batched_metric_sampled(p, g, emd_eps: float = 0.005,
                           emd_iters: int = 50, with_emd: bool = True):
    """Already-FPS-sampled pred/gt [B,n,3] -> (cd [B], emd [B]).

    Split out of batched_metric so the GT side's FPS (the gt clouds are
    immutable across eval passes) can be computed once and cached on
    device next to the GT upload (_GT_DEVICE_CACHE)."""
    d1, d2, _, _ = chamfer_nn(p, g)
    cd = (jnp.sqrt(jnp.maximum(d1, 0)).mean(1)
          + jnp.sqrt(jnp.maximum(d2, 0)).mean(1)) / 2
    if with_emd:
        de, _ = emd_auction(p, g, eps=emd_eps, iters=emd_iters)
        emd = jnp.sqrt(jnp.maximum(de, 0)).mean(1)
    else:
        emd = jnp.full_like(cd, jnp.nan)
    return cd, emd


def batched_metric(pred, gt, num_points: int = 16384,
                   emd_eps: float = 0.005, emd_iters: int = 50,
                   with_emd: bool = True):
    """pred/gt [B,N,3] -> (cd [B], emd [B]).

    Reference protocol: FPS both clouds to 16384 then CD-l1 + auction
    EMD (reference: main.py:21-33, utils/loss_util.py:25-49)."""
    p = batched_fps_gather(pred, num_points)
    g = batched_fps_gather(gt, num_points)
    return batched_metric_sampled(p, g, emd_eps=emd_eps,
                                  emd_iters=emd_iters, with_emd=with_emd)


# GT device-upload cache for repeated evals over the same object set
_GT_DEVICE_CACHE: Dict[str, tuple] = {}


# ----------------------------------------------------------------- runner

def _apply(T, pts):
    return (pts @ T[:3, :3].T + T[:3, 3]).astype(np.float32)


def batched_reg(cfg, arts: List[ObjectArtifacts],
                cd_inv_weight: float = 0.5, mesh=None,
                fusion_debug: Optional[Dict[str, dict]] = None) -> None:
    """Stage 3 for a batch of objects; writes fused clouds into arts.

    With a device mesh (cfg.mesh_shape -> parallel/mesh.get_mesh) the
    object axis of every stacked array is sharded over 'dp' before the
    jitted programs run — XLA partitions the vmapped pose optimization
    and ICP sweeps across chips (len(arts) must divide by dp; run_batched
    pads the batch).

    fusion_debug (optional dict) receives per-flag attribution of the
    partial->fused UHD across the fusion sub-steps (registration
    residual, FPS survival, outlier-mask survival) — the Waymo PED
    diagnosis instrumentation (VERDICT r4 #8).
    """
    # aligned-completion fast path (see pipeline/registration.py)
    if bool(cfg.get("trust_aligned_completion", False)):
        aligned = [a for a in arts if a.complete_aligned]
        if aligned:
            from genpc_tpu.registration.fusion import fuse_clouds
            for art in aligned:
                tgt, tgt_rgb = resample_fixed(
                    art.complete_xyz,
                    int(cfg.get("glb_sample_points", 163840)),
                    art.complete_rgb)
                art.fused_xyz, art.fused_rgb = fuse_clouds(
                    np.asarray(art.color_xyz, np.float32),
                    tgt.astype(np.float32),
                    np.asarray(art.color_rgb, np.float32),
                    (np.asarray(tgt_rgb, np.float32) if tgt_rgb is not None
                     else None),
                    num_points=int(cfg.get("fused_points", 20000)))
            arts = [a for a in arts if not a.complete_aligned]
            if not arts:
                return
    from genpc_tpu.parallel.mesh import dp_size
    if mesh is not None and len(arts) % dp_size(mesh) != 0:
        mesh = None      # mixed aligned/unaligned batch broke divisibility
    B = len(arts)
    pose_n = int(cfg.get("pose_complete_points", POSE_N))
    icp_n = int(cfg.get("icp_points", ICP_N))
    # host prep: voxel downsample + fixed resample per object
    pose_c, pose_cc, pose_p, pose_pc = [], [], [], []
    tgts, tgt_rgbs, srcs, src_rgbs = [], [], [], []
    for art in arts:
        src = np.asarray(art.color_xyz, np.float32)
        src_rgb = (np.asarray(art.color_rgb, np.float32)
                   if art.color_rgb is not None else np.full_like(src, 0.5))
        if art.complete_xyz is None and art.complete_mesh is not None:
            # mesh-producing backends (InstantMesh/TRELLIS/SF3D): sample
            # the surface like the single-object path (reference:
            # reg_xyz.py:125 glb2point)
            from genpc_tpu.io.glb import sample_mesh_surface
            art.complete_xyz, art.complete_rgb = sample_mesh_surface(
                art.complete_mesh, int(cfg.get("glb_sample_points",
                                               163840)))
        tgt, tgt_rgb = resample_fixed(
            art.complete_xyz, int(cfg.get("glb_sample_points", 163840)),
            art.complete_rgb)
        tgt = tgt.astype(np.float32)
        tgt_rgb = (np.asarray(tgt_rgb, np.float32) if tgt_rgb is not None
                   else np.full_like(tgt, 0.5))
        srcs.append(src)
        src_rgbs.append(src_rgb)
        tgts.append(tgt)
        tgt_rgbs.append(tgt_rgb)
        pv, pvc = voxel_down_sample(src, 0.02, src_rgb)
        t120, t120c = resample_fixed(tgt, min(120000, len(tgt)), tgt_rgb)
        cv, cvc = voxel_down_sample(t120, 0.02, t120c)
        pv, pvc = resample_fixed(pv, pose_n, pvc)
        cv, cvc = resample_fixed(cv, pose_n, cvc)
        pose_p.append(pv), pose_pc.append(pvc)
        pose_c.append(cv), pose_cc.append(cvc)

    from genpc_tpu.parallel.mesh import dp_sharded
    pc, pcc, pp, ppc = dp_sharded(
        mesh, jnp.asarray(np.stack(pose_c)), jnp.asarray(np.stack(pose_cc)),
        jnp.asarray(np.stack(pose_p)), jnp.asarray(np.stack(pose_pc)))
    T = batched_pose_optim(
        pc, pcc, pp, ppc,
        jnp.float32(0.02), jnp.float32(cfg.get("pose_lr", 0.01)),
        int(cfg.get("pose_iters", 200)),
        int(cfg.get("pose_render_size", 224)),
        coarse_frac=float(cfg.get("pose_coarse_frac", 0.7)),
        prune_to=int(cfg.get("pose_prune_starts", 0)))
    diff_T = np.linalg.inv(np.asarray(T)).astype(np.float32)

    # normalize targets, transform sources into pose frame (host, per obj)
    src_w = [_apply(diff_T[i], srcs[i]) for i in range(B)]
    tgt_n = [np.asarray(normalize_points(t, range=0.5)[0], np.float32)
             for t in tgts]

    # coarse sweep on fixed-size voxel downsamples
    cs, ct = [], []
    for i in range(B):
        sd, _ = voxel_down_sample(src_w[i], 0.03)
        td, _ = voxel_down_sample(tgt_n[i], 0.03)
        cs.append(resample_fixed(sd, icp_n)[0].astype(np.float32))
        ct.append(resample_fixed(td, icp_n)[0].astype(np.float32))
    cs_d, ct_d = dp_sharded(mesh, jnp.asarray(np.stack(cs)),
                            jnp.asarray(np.stack(ct)))
    coarse_T, _ = batched_coarse_sweep(
        cs_d, ct_d,
        jnp.asarray(np.linspace(1.5, 0.8, 11), jnp.float32),
        jnp.float32(cd_inv_weight))
    coarse_T = np.asarray(coarse_T)

    # fine per-axis grid
    src_w = [_apply(coarse_T[i], src_w[i]) for i in range(B)]
    fs, ft = [], []
    for i in range(B):
        sd, _ = voxel_down_sample(src_w[i], 0.03)
        td, _ = voxel_down_sample(tgt_n[i], 0.03)
        fs.append(resample_fixed(sd, icp_n)[0].astype(np.float32))
        ft.append(resample_fixed(td, icp_n)[0].astype(np.float32))
    fs_d, ft_d = dp_sharded(mesh, jnp.asarray(np.stack(fs)),
                            jnp.asarray(np.stack(ft)))
    S, fine_T = batched_fine_search(
        fs_d, ft_d,
        cd_inv_weight=cd_inv_weight,
        scale_steps=int(cfg.get("fine_scale_steps", 10)))

    # undo chain (reference order) back into the input frame
    fused_n = int(cfg.get("fused_points", 20000))
    final_s, final_t = [], []
    for i in range(B):
        t = tgt_n[i]
        t = _apply(np.linalg.inv(S[i]), t)
        t = _apply(np.linalg.inv(fine_T[i]), t)
        s = _apply(np.linalg.inv(coarse_T[i]), src_w[i])
        t = _apply(np.linalg.inv(coarse_T[i]), t)
        t = _apply(np.linalg.inv(diff_T[i]), t)
        s = _apply(np.linalg.inv(diff_T[i]), s)
        final_s.append(s)
        final_t.append(t)

    # final similarity snap in the input frame: the grid searches leave a
    # few-percent residual scale/pose error that makes registration LOSE
    # to the aligned fast path on already-aligned completions — one
    # Umeyama ICP (partial -> complete, inverse applied to the complete)
    # removes it (registration/icp.py:similarity_icp)
    if bool(cfg.get("final_icp_refine", True)):
        rs, rt = [], []
        for i in range(B):
            sd, _ = voxel_down_sample(final_s[i], 0.03)
            td, _ = voxel_down_sample(final_t[i], 0.03)
            rs.append(resample_fixed(sd, icp_n)[0].astype(np.float32))
            rt.append(resample_fixed(td, icp_n)[0].astype(np.float32))
        rs_d, rt_d = dp_sharded(mesh, jnp.asarray(np.stack(rs)),
                                jnp.asarray(np.stack(rt)))
        Tr = np.asarray(batched_similarity_refine(
            rs_d, rt_d, mode=str(cfg.get("final_refine", "anisotropic"))))
        for i in range(B):
            final_t[i] = _apply(np.linalg.inv(Tr[i]), final_t[i])

    for i, art in enumerate(arts):
        s, t = final_s[i], final_t[i]
        # dedup + concat + fps + denoise (per object; sizes differ)
        d2, _ = nearest_neighbor(jnp.asarray(t), jnp.asarray(s))
        keep = np.asarray(d2) >= 1e-4
        pts = np.concatenate([s, t[keep]])
        cols = np.concatenate([src_rgbs[i], tgt_rgbs[i][keep]])
        from_partial = np.arange(len(pts)) < len(s)
        if len(pts) > fused_n:
            idx = np.asarray(fps_indices(jnp.asarray(pts), fused_n))
            pts, cols = pts[idx], cols[idx]
            from_partial = from_partial[idx]
        mask = np.asarray(statistical_outlier_mask(
            jnp.asarray(pts), int(cfg.get("denoise_neighbors", 20)),
            float(cfg.get("denoise_std", 2.5))))
        art.fused_xyz = pts[mask]
        art.fused_rgb = cols[mask]
        if fusion_debug is not None:
            def _uhd(a, b):
                dd, _ = nearest_neighbor(jnp.asarray(a, jnp.float32),
                                         jnp.asarray(b, jnp.float32))
                return float(np.sqrt(np.maximum(np.asarray(dd), 0)).max())
            part = (np.asarray(art.xyz, np.float32)
                    if art.xyz is not None else s)
            ds, _ = nearest_neighbor(jnp.asarray(s), jnp.asarray(t))
            fusion_debug[art.flag] = {
                # how far the registered completion sits from the partial
                "reg_residual_cd_x100": round(float(np.sqrt(np.maximum(
                    np.asarray(ds), 0)).mean()) * 100, 3),
                "uhd_x100_partial_to_concat": round(
                    _uhd(part, np.concatenate([s, t[keep]])) * 100, 3),
                "uhd_x100_partial_to_postfps": round(
                    _uhd(part, pts) * 100, 3),
                "uhd_x100_partial_to_fused": round(
                    _uhd(part, art.fused_xyz) * 100, 3),
                "partial_frac_after_fps": round(
                    float(from_partial.mean()), 4),
                "partial_kept_by_outlier_mask": round(
                    float(mask[from_partial].mean()), 4)
                if from_partial.any() else None,
                "generated_kept_by_outlier_mask": round(
                    float(mask[~from_partial].mean()), 4)
                if (~from_partial).any() else None,
            }


def _release_backend(owner, attr: str) -> None:
    """Free a pipeline stage's neural backend HBM at a stage boundary.

    release() deletes the backend's device param buffers explicitly —
    required because jitted bound methods with static ``self`` leave
    the instance pinned by the global pjit cache (a plain del +
    gc.collect provably returns nothing).  The reference performs the
    same stage-boundary free with free_memory()
    (main_lidar.py:12-16)."""
    backend = getattr(owner, attr, None)
    if backend is not None and hasattr(backend, "release"):
        backend.release()
    setattr(owner, attr, None)
    gc.collect()


def _generate_images(cfg, dp, arts) -> None:
    """Depth->image for a list of objects.

    DiT backends batch the denoise loops across objects in one device
    program (SURVEY §2.3; models/dit_depth.py generate_batch); backends
    without a batched path fall back to the reference's per-object loop.
    """
    from genpc_tpu.categories import get_category
    size = int(cfg.generate_res)
    gen = dp.depth2image
    if hasattr(gen, "generate_batch") and len(arts) > 1:
        # generate_obj_batch caps the objects per device program: the
        # full-size presets' denoise activations scale with B next to
        # 10+ GB of resident params (0 = all objects in one program)
        ob = int(cfg.get("generate_obj_batch", 0) or 0)
        ob = ob if ob > 0 else len(arts)
        for lo in range(0, len(arts), ob):
            grp = arts[lo:lo + ob]
            imgs = gen.generate_batch([a.depth for a in grp],
                                      [a.flag for a in grp], size=size)
            for art, img in zip(grp, imgs):
                art.image = np.asarray(img)
        return
    for art in arts:
        art.image = np.asarray(gen.generate(
            art.depth, get_category(art.flag), size=size))


def run_batched(cfg, flags: List[str], data_dir: str,
                gt_dir: Optional[str] = None, with_emd: bool = True,
                batch: Optional[int] = None, verbose: bool = True,
                timings: Optional[Dict[str, float]] = None,
                dp: Optional["DepthPrompting"] = None
                ) -> Dict[str, Dict[str, float]]:
    """Full pipeline with batched stage 3 + batched metrics.

    Honors cfg.mesh_shape: with e.g. {'dp': 8} the object batch is padded
    to a dp multiple and every batched device program shards its object
    axis across the mesh (parallel/mesh.py).

    timings (optional dict) receives per-stage wall seconds
    (load/stage1/generate/stage2/stage3/metric) — the bench's
    throughput-regression breakdown.

    dp (optional) injects a pre-built DepthPrompting — benches use it to
    install matched parameter trees into the generation backend (e.g.
    the int4-vs-bf16 same-weights CD A/B).
    """
    from genpc_tpu.parallel.mesh import dp_sharded, dp_size, get_mesh
    t_last = [time.time()]

    def mark(name):
        if timings is not None:
            now = time.time()
            timings[name] = round(now - t_last[0], 2) + timings.get(name,
                                                                    0.0)
            t_last[0] = now
        else:
            t_last[0] = time.time()

    gt_dir = gt_dir or os.path.join(data_dir, "GT")
    mesh = get_mesh(cfg)
    dp = dp if dp is not None else DepthPrompting(cfg)
    sa = ScaleAdapter(cfg)
    n_in = int(cfg.get("input_points", 65536))

    arts = []
    for flag in flags:
        xyz, rgb = load_xyz(os.path.join(data_dir, f"{flag}.ply"))
        rng = np.random.default_rng(0)
        idx = rng.choice(len(xyz), n_in, replace=len(xyz) < n_in)
        arts.append(ObjectArtifacts(flag=flag, xyz=xyz[idx], rgb=rgb[idx]))
    # pad the batch to a dp multiple with copies of the last object;
    # padded entries run on-device but are skipped on host + in results
    n_real = len(arts)
    pad = (-n_real) % dp_size(mesh)
    for i in range(pad):
        src = arts[-1]
        arts.append(ObjectArtifacts(flag=f"_pad{i}", xyz=src.xyz,
                                    rgb=src.rgb))
    real_arts = arts[:n_real]
    mark("load")
    # stage 1: one jitted program over the whole batch
    batched_stage1(cfg, arts, dp.viewpoints, dp=dp, mesh=mesh)
    mark("stage1")
    _generate_images(cfg, dp, real_arts)
    for art in arts[n_real:]:
        art.image = real_arts[-1].image
    # release the depth->image tower: its params are dead weight from here
    # on, and at full preset scale (SDXL 3.9B + towers) they must leave
    # HBM before the image-to-3D params materialize (the reference frees
    # between stages for the same reason: main_lidar.py:12-16).
    # Dropping the attribute + gc.collect() is NOT enough: the backends
    # jit their methods with static self, so the global pjit cache pins
    # the instance (and its param tree) — measured 9.4 GB still live
    # after del+collect at the SDXL full preset.  release() deletes the
    # device buffers explicitly (jax.Array.delete works regardless of
    # Python references).
    _release_backend(dp, "depth2image")
    mark("generate")
    sa.scale_adapter_batch(arts)
    # same for the image-to-3D stack before the pose-optimization stage
    _release_backend(sa, "image23d")
    mark("stage2")

    batch = batch or len(arts)
    for i in range(0, len(arts), batch):
        batched_reg(cfg, arts[i:i + batch], mesh=mesh)
    arts = real_arts
    mark("stage3")

    # batched metric: FPS from the FULL clouds (reference: main.py:21-22).
    # Static shapes come from padding each cloud to the batch max by
    # repeating its own points: duplicates never win an FPS argmax tie
    # (the original has the lower index) and have distance 0 once their
    # original is selected, so the selected set equals the full-cloud run.
    results: Dict[str, Dict[str, float]] = {}
    preds, gts, valid = [], [], []
    for art in arts:
        gt_path = os.path.join(gt_dir, f"{art.flag}.ply")
        if not os.path.exists(gt_path):
            continue
        gt, _ = load_xyz(gt_path)
        from genpc_tpu.metrics.frame_fixes import apply_frame_fix
        gt = apply_frame_fix(art.flag, gt)
        preds.append(np.asarray(art.fused_xyz, np.float32))
        gts.append(np.asarray(gt, np.float32))
        valid.append(art.flag)
    if preds:
        def pad_repeat(clouds):
            n = max(len(c) for c in clouds)
            return np.stack([np.concatenate(
                [c, np.tile(c, (-(-n // len(c)) - 1, 1))[: n - len(c)]])
                for c in clouds])
        preds = pad_repeat(preds)
        gts = pad_repeat(gts)
        bpad = (-len(preds)) % dp_size(mesh)
        if bpad:
            preds = np.concatenate([preds] + [preds[-1:]] * bpad)
            gts = np.concatenate([gts] + [gts[-1:]] * bpad)
        pred_d = dp_sharded(mesh, jnp.asarray(preds))
        # GT clouds are immutable across passes of the same eval set:
        # keep the stacked device upload (the [B, 165k, 3] transfer is
        # the metric stage's single biggest host<->device cost) AND the
        # GT-side FPS selection (16384 sequential argmax steps over the
        # full clouds — the stage's biggest compute) keyed by the exact
        # flag set + shape + sample count.
        num_points = int(cfg.metric_points)
        gt_key = (tuple(valid), gts.shape, mesh is None, num_points)
        cached = _GT_DEVICE_CACHE.get("entry")
        if cached is not None and cached[0] == gt_key:
            gt_s = cached[1]
        else:
            gt_d = dp_sharded(mesh, jnp.asarray(gts))
            gt_s = batched_fps_gather(gt_d, num_points)
            _GT_DEVICE_CACHE["entry"] = (gt_key, gt_s)
        pred_s = batched_fps_gather(pred_d, num_points)
        cd, emd = batched_metric_sampled(
            pred_s, gt_s,
            emd_eps=float(cfg.emd_eps), emd_iters=int(cfg.emd_iters),
            with_emd=with_emd)
        for i, flag in enumerate(valid):
            results[flag] = {"cd": float(cd[i])}
            if with_emd:
                results[flag]["emd"] = float(emd[i])
    mark("metric")
    return results


def run_batched_lidar(cfg, flags: List[str], data_dir: str, category: str,
                      batch: Optional[int] = None,
                      holdout_wedge_deg: float = 0.0,
                      fusion_debug: Optional[Dict[str, dict]] = None
                      ) -> Dict[str, Dict[str, float]]:
    """Waymo LiDAR pipeline with batched stages (reference: main_lidar.py).

    Same batched execution as run_batched, but scans load from
    data_dir/category and — LiDAR has no GT — quality is the
    partial->completion UHD (reference: metric.py:105-132), computed as
    one batched NN program over repeat-padded clouds (duplicates never
    change a max-of-min).

    holdout_wedge_deg > 0 enables the held-out-slice protocol (VERDICT
    r2 #9): an azimuthal wedge of each scan is WITHHELD from the
    pipeline, and the extra metric ``holdout_uhd`` measures the max
    distance from the held-out points to the fused completion — a
    completion-quality signal the partial->fused UHD cannot give (the
    fused cloud contains the partial by construction).
    """
    from genpc_tpu.categories import get_category
    from genpc_tpu.ops.chamfer import chamfer_nn
    from genpc_tpu.parallel.mesh import dp_sharded, dp_size, get_mesh
    mesh = get_mesh(cfg)
    dp = DepthPrompting(cfg)
    sa = ScaleAdapter(cfg)
    n_in = int(cfg.get("input_points", 65536))

    arts = []
    heldout: Dict[str, np.ndarray] = {}
    for flag in flags:
        xyz, rgb = load_xyz(os.path.join(data_dir, category, f"{flag}.ply"))
        if holdout_wedge_deg > 0.0:
            c = xyz.mean(0)
            az = np.degrees(np.arctan2(xyz[:, 1] - c[1], xyz[:, 0] - c[0]))
            # wedge centered on the densest azimuth's antipode so the
            # remaining cloud still anchors the viewpoint selection
            hist, edges = np.histogram(az, bins=36, range=(-180, 180))
            center = (edges[hist.argmax()] + 5.0 + 180.0)
            d = (az - center + 180.0) % 360.0 - 180.0
            held = np.abs(d) < holdout_wedge_deg / 2.0
            # keep-enough guard scales with scan size: PED scans are
            # ~350-500 points total (an absolute 1024 bound silently
            # disabled the protocol for the whole category)
            keep_min = min(1024, len(xyz) // 2)
            if held.any() and (~held).sum() >= keep_min:
                heldout[flag] = xyz[held].astype(np.float32)
                xyz, rgb = xyz[~held], rgb[~held]
        rng = np.random.default_rng(0)
        idx = rng.choice(len(xyz), n_in, replace=len(xyz) < n_in)
        arts.append(ObjectArtifacts(flag=flag, xyz=xyz[idx], rgb=rgb[idx]))
    n_real = len(arts)
    pad = (-n_real) % dp_size(mesh)
    for i in range(pad):
        src = arts[-1]
        arts.append(ObjectArtifacts(flag=f"_pad{i}", xyz=src.xyz,
                                    rgb=src.rgb))
    real_arts = arts[:n_real]

    batched_stage1(cfg, arts, dp.viewpoints, dp=dp, mesh=mesh)
    _generate_images(cfg, dp, real_arts)
    for art in arts[n_real:]:
        art.image = real_arts[-1].image
    _release_backend(dp, "depth2image")  # stage frees, as in run_batched
    sa.scale_adapter_batch(arts)
    _release_backend(sa, "image23d")
    batch = batch or len(arts)
    for i in range(0, len(arts), batch):
        batched_reg(cfg, arts[i:i + batch], mesh=mesh,
                    fusion_debug=fusion_debug)
    arts = real_arts

    def pad_repeat(clouds):
        n = max(len(c) for c in clouds)
        return np.stack([np.concatenate(
            [c, np.tile(c, (-(-n // len(c)) - 1, 1))[: n - len(c)]])
            for c in clouds])

    partials = pad_repeat([np.asarray(a.xyz, np.float32) for a in arts])
    fused = pad_repeat([np.asarray(a.fused_xyz, np.float32) for a in arts])
    bpad = (-len(partials)) % dp_size(mesh)
    if bpad:
        partials = np.concatenate([partials] + [partials[-1:]] * bpad)
        fused = np.concatenate([fused] + [fused[-1:]] * bpad)
    p_d, f_d = dp_sharded(mesh, jnp.asarray(partials), jnp.asarray(fused))
    d2, _, _, _ = jax.jit(chamfer_nn)(p_d, f_d)
    h = np.sqrt(np.maximum(np.asarray(d2), 0.0)).max(axis=1)
    results = {a.flag: {"uhd": float(h[i])} for i, a in enumerate(arts)}
    if heldout:
        # one batched NN program over repeat-padded held-out clouds
        # (duplicates never change a max-of-min); the old per-object
        # loop compiled a fresh executable per unique cloud shape —
        # ~20 compiles every holdout pass, 4-5x the timed pass wall.
        hflags = [a.flag for a in arts if a.flag in heldout]
        hstack = jnp.asarray(pad_repeat([heldout[f] for f in hflags]))
        fstack = jnp.asarray(pad_repeat(
            [np.asarray(a.fused_xyz, np.float32) for a in arts
             if a.flag in heldout]))
        d2h, _, _, _ = jax.jit(chamfer_nn)(hstack, fstack)
        hu = np.sqrt(np.maximum(np.asarray(d2h), 0.0)).max(axis=1)
        for i, f in enumerate(hflags):
            results[f]["holdout_uhd"] = float(hu[i])
    return results


# -------------------------------------------------------- batched stage 1

def _jnp_up_vector(eye):
    """calculate_up_vector in jnp (geometry/cameras.py host twin)."""
    gaze = -eye
    world_up = jnp.array([0.0, 1.0, 0.0])
    side = jnp.cross(gaze, world_up)
    degenerate = jnp.linalg.norm(side) < 1e-8
    up = jnp.cross(side, gaze)
    up = up / jnp.maximum(jnp.linalg.norm(up), 1e-12)
    return jnp.where(degenerate, jnp.array([0.0, 0.0, 1.0]), up)


def _project(eye, pts, fovy_rad):
    """Project pts [N,3] through a camera at eye looking at the origin."""
    from genpc_tpu.geometry.cameras import look_at_rotation
    up = _jnp_up_vector(eye)
    rot = look_at_rotation(eye, jnp.zeros(3), up)
    cam = (pts - eye) @ rot.T
    depth = -cam[:, 2]
    inv_tan = 1.0 / jnp.tan(fovy_rad * 0.5)
    safe = jnp.maximum(depth, 1e-8)
    return jnp.stack([cam[:, 0] / safe * inv_tan,
                      cam[:, 1] / safe * inv_tan, depth], axis=-1)


def make_stage1_core(cfg, viewpoints: np.ndarray, mesh=None):
    """Build the jitted batched Stage-1 core: (xyz, rgb) [B,N,3] ->
    (uv [B,N,2], viewpoint [B,3], raw_depth/depth/mask [B,3,res,res]).

    The whole stage — FPS, 1024-view z-buffer viewpoint selection,
    best-vs-opposite depth-sum heuristic, splatting, masks, diffusion
    inpaint — is one device program over the object batch.  With a mesh,
    the program runs under shard_map over 'dp' so the sequential
    per-object visibility scan iterates only the LOCAL object shard
    (B/dp steps per chip, chips in parallel).
    """
    import math
    from genpc_tpu.geometry.cameras import rescale_uvs
    from genpc_tpu.ops.hpr import (
        auto_zbuffer_res, select_best_view, visible_points_zbuffer)
    from genpc_tpu.render.inpaint import diffusion_inpaint
    from genpc_tpu.render.splat import raw_depth_images, uvs_to_pixels

    views = jnp.asarray(viewpoints, jnp.float32)
    fovy_rad = math.pi * float(cfg.fovy) / 180.0
    res = int(cfg.res)
    n_ds = int(cfg.downsample_num)
    point_size = int(cfg.point_size)
    mask_rate = int(cfg.mask_pixel_rate)
    padding = float(cfg.padding)
    inpaint_iters = int(cfg.get("inpaint_iters", 250))
    sel_coarse = int(cfg.get("select_coarse_points", 2500))
    sel_topk = int(cfg.get("select_topk", 48))

    def core(xyz, rgb):
        # viewpoint selection on an FPS downsample: coarse-to-exact
        # two-stage z-buffer (ops/hpr.py) — full-density scoring of all
        # 1024 views was the dominant batched-stage-1 cost
        sidx = batched_fps(xyz, n_ds)
        sampled = jnp.take_along_axis(xyz, sidx[..., None], axis=1)
        best = jax.vmap(lambda p: select_best_view(
            p, views, n_coarse=sel_coarse, topk=sel_topk))(sampled)  # [B]
        vp = views[best]                               # [B,3]

        def per_object(pts, cols, eye):
            cand = jnp.stack([eye, -eye])              # best + opposite
            t = jax.vmap(lambda e: _project(e, pts, fovy_rad))(cand)
            uv, d = rescale_uvs(t, padding)            # [2,N,2], [2,N]
            res_vis = auto_zbuffer_res(pts.shape[0])
            v2 = visible_points_zbuffer(pts, cand, res=res_vis)  # [2,N]
            sums = jnp.sum(jnp.where(v2, d, 0.0), axis=1)
            pick = jnp.argmax(sums)                    # reference heuristic
            uv_s, d_s, vis_s = uv[pick], d[pick], v2[pick]
            view_s = cand[pick]
            pixels = uvs_to_pixels(uv_s, res)
            sparse, raw, m1, m2 = raw_depth_images(
                pixels, d_s, cols, res=res, point_size=point_size,
                mask_pixel_rate=mask_rate, valid=vis_s)
            depth_img = diffusion_inpaint(raw, m1, iters=inpaint_iters)
            return uv_s, view_s, raw, depth_img, m1, m2

        return jax.vmap(per_object)(xyz, rgb, vp)

    if mesh is not None and "dp" in mesh.axis_names:
        from jax.sharding import PartitionSpec as P
        from jax.experimental.shard_map import shard_map
        core = shard_map(core, mesh=mesh,
                         in_specs=(P("dp"), P("dp")),
                         out_specs=(P("dp"),) * 6, check_rep=False)
    return jax.jit(core)


def batched_stage1(cfg, arts: List[ObjectArtifacts],
                   viewpoints: np.ndarray, core=None,
                   dp: Optional[DepthPrompting] = None, mesh=None) -> None:
    """Run the jitted Stage-1 core over a batch; fill art fields.

    The device core always computes the jax diffusion fill; for the
    neural / host inpainter backends (flux, DDNM, cv2 — reference:
    DepthPrompting.py:201-229) the per-object inpainter replaces it.
    """
    from genpc_tpu.parallel.mesh import dp_sharded
    core = core or make_stage1_core(cfg, viewpoints, mesh=mesh)
    xyz, rgb = dp_sharded(
        mesh, jnp.asarray(np.stack([a.xyz for a in arts]), jnp.float32),
        jnp.asarray(np.stack([a.rgb for a in arts]), jnp.float32))
    uv, vp, raw, depth, m1, m2 = core(xyz, rgb)
    uv, vp, raw, depth, m1, m2 = map(np.asarray,
                                     (uv, vp, raw, depth, m1, m2))
    inpainter = cfg.get("inpainter", "jax")
    for i, art in enumerate(arts):
        art.point_uv = uv[i]
        art.viewpoint = vp[i]
        art.raw_depth = raw[i]
        art.mask = m1[i] if inpainter != "DDNM" else m2[i]
        if inpainter == "flux":
            art.depth = np.asarray(dp.inpainter.paint(
                raw[i], m1[i], prompt="complete the depth map. ",
                size=int(cfg.res)))
        elif inpainter == "DDNM":
            art.depth = np.asarray(dp.inpainter.inpaint(raw[i], m2[i]))
        elif inpainter == "cv2":
            from genpc_tpu.render.inpaint import inpaint_image
            art.depth = np.asarray(inpaint_image(raw[i], m1[i],
                                                 backend="cv2"))
        else:
            art.depth = depth[i]
