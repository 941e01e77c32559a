"""Evaluation protocols: per-object CD/EMD, UHD, and suite drivers.

Rebuild of the reference's metric paths:
  * ``evaluate_pair`` ≡ main.py:11-36 — FPS both clouds to 16384, CD-ℓ1 =
    (mean√d1+mean√d2)/2 and auction EMD (eps 0.005, iters 50).
  * ``uhd`` ≡ metric.py:105-132 — unidirectional Hausdorff (one-sided
    95%/max NN distance from partial to completion).
  * ``evaluate_workspace`` ≡ metric.py:10-48 — scan a workspace dir for
    candidate fused clouds (with the optional x-180° GT rotation the
    reference's metric.py applies; main.py compares unrotated — both modes
    exposed).  The reference's metric.py calls an undefined
    ``fps_subsample`` (NameError, SURVEY §2 bug list); here the same FPS
    is used everywhere.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from genpc_tpu.categories import get_category
from genpc_tpu.geometry.transforms import get_rotate_matrix
from genpc_tpu.io.ply import load_ply
from genpc_tpu.metrics.losses import CompletionLoss
from genpc_tpu.ops.chamfer import nearest_neighbor
from genpc_tpu.ops.fps import farthest_point_sample


def evaluate_pair(pred: np.ndarray, gt: np.ndarray, num_points: int = 16384,
                  emd_eps: float = 0.005, emd_iters: int = 50,
                  with_emd: bool = True, mesh=None) -> Dict[str, float]:
    """FPS both to num_points, return {'cd': ..., 'emd': ...} (raw scale).

    With a device mesh that has an 'sp' axis, the large-N chamfer shards
    its point dimension across chips (parallel/mesh.sharded_chamfer_l1 —
    each chip scans the full opposite cloud against its row slice; no
    16384x16384 tensor on any one chip).  EMD's auction needs the dense
    bid matrix and stays single-device.
    """
    p, _ = farthest_point_sample(np.asarray(pred, np.float32), num_points)
    g, _ = farthest_point_sample(np.asarray(gt, np.float32), num_points)
    if mesh is not None and "sp" in mesh.axis_names:
        from genpc_tpu.parallel.mesh import sharded_chamfer_l1
        cd = float(sharded_chamfer_l1(jnp.asarray(p), jnp.asarray(g),
                                      mesh))
    else:
        cd = float(CompletionLoss("cd_l1").get_loss(p, g))
    out = {"cd": cd}
    if with_emd:
        emd = float(CompletionLoss("emd", emd_eps=emd_eps,
                                   emd_iters=emd_iters).get_loss(p, g))
        out["emd"] = emd
    return out


def uhd(partial: np.ndarray, completion: np.ndarray,
        percentile: float = 100.0) -> float:
    """Unidirectional Hausdorff distance partial -> completion
    (reference: metric.py:105-132, scipy cdist max-of-min)."""
    d2, _ = nearest_neighbor(jnp.asarray(partial, jnp.float32),
                             jnp.asarray(completion, jnp.float32))
    d = np.sqrt(np.maximum(np.asarray(d2), 0.0))
    if percentile >= 100.0:
        return float(d.max())
    return float(np.percentile(d, percentile))


def evaluate_workspace(flag: str, workspace_root: str, gt_dir: str,
                       generative_model: str = "synthetic",
                       rotate_gt_x180: bool = False,
                       with_emd: bool = True) -> Optional[Dict[str, float]]:
    """Score workspace/{flag}/{flag}_fused.ply against gt_dir/{flag}.ply."""
    fused_path = os.path.join(workspace_root, flag, f"{flag}_fused.ply")
    gt_path = os.path.join(gt_dir, f"{flag}.ply")
    if not (os.path.exists(fused_path) and os.path.exists(gt_path)):
        return None
    pred, _ = load_ply(fused_path)
    gt, _ = load_ply(gt_path)
    if rotate_gt_x180:
        gt = gt @ get_rotate_matrix("x", 180).T
    return evaluate_pair(pred.astype(np.float32), gt.astype(np.float32),
                         with_emd=with_emd)


def evaluate_mesh(pred_mesh, gt_points: np.ndarray,
                  num_points: int = 16384,
                  normalize_by_gt_bbox: bool = True,
                  with_emd: bool = False) -> Dict[str, float]:
    """Mesh-vs-cloud evaluation (reference: metric.py:49-94
    metric_sds_redwood): sample the predicted mesh, optionally rescale it
    into the GT's bounding box (the reference's GT-bbox normalization +
    ground-plane elevation), then run the standard CD/EMD protocol."""
    from genpc_tpu.io.glb import sample_mesh_surface
    pred, _ = sample_mesh_surface(pred_mesh, max(num_points * 2, 32768))
    gt = np.asarray(gt_points, np.float32)
    if normalize_by_gt_bbox:
        def fit(p, ref):
            p_c = (p.max(0) + p.min(0)) / 2
            r_c = (ref.max(0) + ref.min(0)) / 2
            scale = ((ref.max(0) - ref.min(0)).max()
                     / max((p.max(0) - p.min(0)).max(), 1e-9))
            out = (p - p_c) * scale + r_c
            # elevate so the floors coincide (world-plane elevation)
            out[:, 1] += ref[:, 1].min() - out[:, 1].min()
            return out
        pred = fit(pred.astype(np.float64), gt.astype(np.float64))
    return evaluate_pair(pred.astype(np.float32), gt,
                         num_points=num_points, with_emd=with_emd)


def summarize(results: Dict[str, Dict[str, float]]) -> Dict[str, float]:
    """Per-category print + averages (reference: main.py:70-78)."""
    if not results:
        return {}
    for flag, m in results.items():
        emd_txt = f", EMD: {m['emd']*100:.3f}" if "emd" in m else ""
        print(f"Category: {get_category(flag)}, CD: {m['cd']*100:.3f}{emd_txt}")
    avg = {k: float(np.mean([m[k] for m in results.values() if k in m]))
           for k in next(iter(results.values()))}
    print(f"Average CD: {avg['cd']*100:.6f}")
    if "emd" in avg:
        print(f"Average EMD: {avg['emd']*100:.6f}")
    return avg
