"""7-DoF object pose optimization (rotation-6D + translation + log-scale).

TPU-native rebuild of the reference's Pulsar-based optimizer
(reference: optim_registration/diff_obj_pose.py:339-594):
  * render the partial cloud once from a fixed camera (eye (0,0,3),
    focal 4.0, 224², diff_obj_pose.py:108-134) -> reference image + mask;
  * 4 multi-starts with y-axis 0/90/180/270° initial rotations
    (diff_obj_pose.py:518-521), scale init 0.75 (log-scale param, :367);
  * per-step loss = soft-mask (MSE·30 + BCE) + 10·Dice
    + 3·(CD(result→partial) + 0.5·CD(partial→result))
    + 0.001·‖RRᵀ−I‖ ortho regularizer (diff_obj_pose.py:286-336,543-545);
  * Adam with per-parameter LRs (lr, 0.2·lr, 0.1·lr) (diff_obj_pose.py:524-528).

Differences by design: the four starts are one vmapped jitted program (the
reference runs them sequentially with a Python inner loop and a CUDA
chamfer call per step); rendering is the scatter-based soft splat
(render/point_renderer.py) instead of Pulsar; the reference's patience-300
early stop can never fire at iters=200, so we run the fixed budget.
Returns the final 4×4 [s·R | t] of the best start (complete -> partial
camera frame), like diff_obj_pose.py:585-594.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from genpc_tpu.geometry.transforms import (
    build_transform, rot6d_from_axis_angle, rotation_6d_to_matrix)
from genpc_tpu.metrics.losses import chamfer_partial_l1
from genpc_tpu.render.point_renderer import (
    RenderCamera, render_points, soft_mask, hard_mask)


def _normalize_images(ref_img, result_img):
    """Statistical color match of result to ref (diff_obj_pose.py:201-236)."""
    ref_mean = ref_img.mean(axis=(0, 1), keepdims=True)
    ref_std = ref_img.std(axis=(0, 1), keepdims=True) + 1e-6
    res_mean = result_img.mean(axis=(0, 1), keepdims=True)
    res_std = result_img.std(axis=(0, 1), keepdims=True) + 1e-6
    out = (result_img - res_mean) / res_std * ref_std + ref_mean
    return ref_img, jnp.clip(out, 0.0, 1.0)


def _dice_loss(pred, target, smooth=1e-6):
    inter = (pred * target).sum()
    return 1.0 - (2.0 * inter + smooth) / (pred.sum() + target.sum() + smooth)


def _bce(pred, target):
    p = jnp.clip(pred, 1e-7, 1.0 - 1e-7)
    return -(target * jnp.log(p) + (1 - target) * jnp.log(1 - p)).mean()


def _transform_points(params, vert_pos, center):
    R = rotation_6d_to_matrix(params["rot6d"])
    scale = jnp.exp(params["log_scale"])[0]
    local = (vert_pos - center) * scale
    local = local @ R.T
    return local + center + params["trans"], R, scale


# per-pixel depth slots for the slotted renderer inside the pose loss.
# The callers feed voxel-0.02 downsamples of range-normalized clouds
# (pipeline/registration.py:117-121), whose per-center-pixel occupancy at
# 224² stays under this bound; points beyond it are dropped silently, so
# denser inputs must raise it (ADVICE r2 #4: do not feed raw clouds).
POSE_RENDER_SLOTS = 6


def pose_loss(params, vert_pos, vert_col, center, partial_xyz,
              ref_img, ref_mask, camera, radius, gamma=1e-2,
              footprint=2, slots=POSE_RENDER_SLOTS):
    pts, R, scale = _transform_points(params, vert_pos, center)
    # 'slots' renderer: bitwise deterministic by construction (fixed
    # accumulation order) and ~1.6x faster than the scatter path on TPU
    # (Pallas tile kernel, render/splat_kernel.py)
    result = render_points(pts, vert_col, radius, camera, gamma=gamma,
                           footprint=footprint, method="slots",
                           slots=slots)
    ref_n, result_n = _normalize_images(ref_img, result)
    mask_result = soft_mask(result_n)
    mask_ref = soft_mask(ref_n)
    mask_loss = (jnp.mean((mask_result - mask_ref) ** 2) * 30.0
                 + _bce(mask_result, mask_ref)
                 + 10.0 * _dice_loss(mask_result, mask_ref))
    cd = (chamfer_partial_l1(pts, partial_xyz)
          + 0.5 * chamfer_partial_l1(partial_xyz, pts))
    # eps keeps the Frobenius-norm gradient finite at exact orthogonality
    # (Gram-Schmidt output makes the residual exactly zero at init)
    ortho = jnp.sqrt(jnp.sum((R @ R.T - jnp.eye(3)) ** 2) + 1e-12)
    return mask_loss + 3.0 * cd + 0.001 * ortho


def render_reference_image(partial_xyz, partial_col, radius, render_size):
    """Reference render + hard mask (diff_obj_pose.py:108-134)."""
    cam = RenderCamera.default(render_size)
    img = render_points(jnp.asarray(partial_xyz, jnp.float32),
                        jnp.asarray(partial_col, jnp.float32),
                        radius, cam, method="slots")
    return img, hard_mask(img), cam


def _make_tx(lr):
    return optax.multi_transform(
        {"rot": optax.adam(lr), "trans": optax.adam(lr * 0.2),
         "scale": optax.adam(lr * 0.1)},
        {"rot6d": "rot", "trans": "trans", "log_scale": "scale"},
    )


# A single device execution must stay well under the tunnel/runtime
# watchdog (~1 min kills the TPU worker, observed at 200 fused steps for
# a 13-object batch), so the optimization runs as host-chunked segments
# of one jitted program: same math as one fused loop (fori_loop segments
# compose), one compile, short executions.
POSE_CHUNK = 25


def pose_carry_init(vert_pos, vert_col, partial_xyz, partial_col,
                    radius, lr, render_size: int):
    """Initial optimization state for the 4 multi-starts (one object).

    The reference image/mask render once here and ride in the carry
    (the fused version re-rendered them per jit call).
    """
    camera = RenderCamera.default(render_size)
    ref_img = render_points(partial_xyz, partial_col, radius, camera,
                            footprint=2, method="slots")
    ref_mask = hard_mask(ref_img)
    init_rots = jnp.stack([rot6d_from_axis_angle("y", 90.0 * s)
                           for s in range(4)])
    tx = _make_tx(lr)

    def one_start(rot_init):
        params = {
            "rot6d": rot_init,
            "trans": jnp.zeros(3, jnp.float32),
            "log_scale": jnp.log(jnp.full((1,), 0.75, jnp.float32)),
        }
        return params, tx.init(params)

    params, opt_state = jax.vmap(one_start)(init_rots)
    return {"params": params, "opt": opt_state,
            "best": jnp.full((4,), jnp.inf, jnp.float32),
            "best_params": params,
            "ref_img": ref_img, "ref_mask": ref_mask}


def pose_carry_steps(carry, vert_pos, vert_col, partial_xyz,
                     radius, lr, steps: int, render_size: int):
    """Advance all 4 starts by `steps` Adam iterations (one object)."""
    camera = RenderCamera.default(render_size)
    center = vert_pos.mean(axis=0)
    tx = _make_tx(lr)
    ref_img, ref_mask = carry["ref_img"], carry["ref_mask"]

    def one_start(params, opt_state, best, best_params):
        # carry the best-loss PARAMS, not just the best loss: the
        # reference keeps best_transformation over the trajectory
        # (diff_obj_pose.py:547-567); returning the final params would
        # ship a worse pose whenever the trajectory degrades late.
        def step(_, c):
            params, opt_state, best, best_params = c
            loss, grads = jax.value_and_grad(pose_loss)(
                params, vert_pos, vert_col, center, partial_xyz,
                ref_img, ref_mask, camera, radius)
            better = loss < best
            best_params = jax.tree.map(
                lambda bp, p: jnp.where(better, p, bp), best_params, params)
            best = jnp.minimum(best, loss)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, best, best_params

        return jax.lax.fori_loop(0, steps, step,
                                 (params, opt_state, best, best_params))

    params, opt, best, best_params = jax.vmap(one_start)(
        carry["params"], carry["opt"], carry["best"], carry["best_params"])
    return {"params": params, "opt": opt, "best": best,
            "best_params": best_params,
            "ref_img": ref_img, "ref_mask": ref_mask}


_pose_init_jit = jax.jit(pose_carry_init, static_argnames=("render_size",))
_pose_steps_jit = jax.jit(pose_carry_steps,
                          static_argnames=("steps", "render_size"),
                          donate_argnums=(0,))


@functools.partial(jax.jit, static_argnames=("keep",))
def _prune_starts(lo, carry, keep: int):
    """Carry the `keep` best coarse starts into the full-res carry
    (single-object leaves are [S, ...]; see batched_runner._bpose_prune)."""
    idx = jnp.argsort(lo["best"])[:keep]
    take = lambda x: jnp.take(x, idx, axis=0)  # noqa: E731
    params = jax.tree.map(take, lo["params"])
    return {"params": params,
            "best_params": jax.tree.map(jnp.copy, params),
            "opt": jax.tree.map(take, lo["opt"]),
            "best": jnp.full((keep,), jnp.inf, jnp.float32),
            "ref_img": carry["ref_img"], "ref_mask": carry["ref_mask"]}


def _optimize_all_starts(vert_pos, vert_col, partial_xyz, partial_col,
                         radius, lr, iters: int, render_size: int,
                         chunk: int = POSE_CHUNK,
                         coarse_frac: float = 0.7,
                         prune_to: int = 1):
    """Host-chunked multi-start optimization; returns (best_params, best).

    Coarse-to-fine like the batched runner: the step cost is
    point-dominated (slot-table build + backward), so the first
    coarse_frac of the iterations runs at half resolution on a 4x FPS
    point subsample with sqrt-scaled radius; params + Adam moments
    transfer to the full phase, whose best-loss tracking alone picks
    the pose.  coarse_frac=0 reproduces the single-phase behavior.

    prune_to keeps only the best prune_to coarse starts for the full
    phase (the reference polishes all 4 starts for all 200 steps,
    diff_obj_pose.py:518-567; the basin ranking is decided by the
    coarse search).  0 or >=4 disables pruning.
    """
    def run(carry, n, vp, vc, px, rad, res):
        done = 0
        while done < n:
            k = min(chunk, n - done)
            carry = _pose_steps_jit(carry, vp, vc, px, rad, lr, k, res)
            done += k
        return carry

    n_coarse = int(iters * coarse_frac)
    if n_coarse >= chunk:
        from genpc_tpu.ops.fps import fps_indices
        n_pts = vert_pos.shape[0]
        nc = min(n_pts, max(512, n_pts // 4))
        res_c = max(64, render_size // 2)
        ci = fps_indices(vert_pos, nc)
        pi = fps_indices(partial_xyz, nc)
        vp_c, vc_c = vert_pos[ci], vert_col[ci]
        px_c, pc_c = partial_xyz[pi], partial_col[pi]
        rad_c = radius * jnp.sqrt(jnp.float32(n_pts) / nc)
        lo = _pose_init_jit(vp_c, vc_c, px_c, pc_c, rad_c, lr, res_c)
        lo = run(lo, n_coarse, vp_c, vc_c, px_c, rad_c, res_c)
        carry = _pose_init_jit(vert_pos, vert_col, partial_xyz,
                               partial_col, radius, lr, render_size)
        n_starts = int(carry["best"].shape[0])
        if 0 < prune_to < n_starts:
            carry = _prune_starts(lo, carry, prune_to)
        else:
            carry["params"] = lo["params"]
            carry["best_params"] = jax.tree.map(jnp.copy, lo["params"])
            carry["opt"] = lo["opt"]
        carry = run(carry, iters - n_coarse, vert_pos, vert_col,
                    partial_xyz, radius, render_size)
    else:
        carry = _pose_init_jit(vert_pos, vert_col, partial_xyz,
                               partial_col, radius, lr, render_size)
        carry = run(carry, iters, vert_pos, vert_col, partial_xyz,
                    radius, render_size)
    return carry["best_params"], carry["best"]


def object_pose_optimization(complete_xyz, complete_col,
                             partial_xyz, partial_col,
                             radius: float = 0.02, lr: float = 0.01,
                             iters: int = 200, render_size: int = 224,
                             coarse_frac: float = 0.7,
                             prune_to: int = 1,
                             ) -> np.ndarray:
    """Optimize complete->partial pose; returns the best 4x4 as numpy.

    Array-based equivalent of the reference entry point
    (diff_obj_pose.py:496-594); file loading lives in the pipeline layer.
    """
    params, best = _optimize_all_starts(
        jnp.asarray(complete_xyz, jnp.float32),
        jnp.asarray(complete_col, jnp.float32),
        jnp.asarray(partial_xyz, jnp.float32),
        jnp.asarray(partial_col, jnp.float32),
        jnp.float32(radius), jnp.float32(lr), int(iters),
        int(render_size), coarse_frac=float(coarse_frac),
        prune_to=int(prune_to))
    k = int(jnp.argmin(best))
    rot6d = params["rot6d"][k]
    trans = params["trans"][k]
    scale = jnp.exp(params["log_scale"][k])[0]
    R = rotation_6d_to_matrix(rot6d)
    T = build_transform(R, trans, scale)
    return np.asarray(T)
