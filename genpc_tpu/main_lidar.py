"""Waymo LiDAR completion driver (reference: main_lidar.py).

Runs the pipeline over data/waymo/{CAR,PED,OTHER} scans.  The reference
splits Stage 1 from Stages 2-3 across two manual process runs to dodge a
GPU memory leak (reference: main_lidar.py:52-70, README.md:55); here the
stages share one process (artifacts are in-memory, device memory is
managed by XLA) but --stage lets you reproduce the split workflow.

LiDAR scans have no GT, so evaluation reports UHD (partial->completion
unidirectional Hausdorff) like the reference's metric options.

Usage:
  python -m genpc_tpu.main_lidar --config configs/lidar.yaml \
      --data-dir /root/reference/data/waymo --category CAR --limit 5
"""

from __future__ import annotations

import argparse
import os
import time
from typing import List, Optional

import numpy as np

from genpc_tpu.config import load_config
from genpc_tpu.io.ply import load_xyz
from genpc_tpu.metrics.metric import uhd
from genpc_tpu.pipeline.artifacts import ObjectArtifacts, Workspace
from genpc_tpu.pipeline.depth_prompting import DepthPrompting
from genpc_tpu.pipeline.registration import reg
from genpc_tpu.pipeline.scale_adapter import ScaleAdapter


def list_scans(data_dir: str, category: str, limit: Optional[int] = None
               ) -> List[str]:
    d = os.path.join(data_dir, category)
    flags = sorted(f[:-4] for f in os.listdir(d) if f.endswith(".ply"))
    return flags[:limit] if limit else flags


def run_lidar(cfg, flags: List[str], data_dir: str, category: str,
              stage: str = "all"):
    n_in = int(cfg.get("input_points", 65536))
    ws = Workspace(cfg.output_path, cfg.generative_model)
    results = {}

    arts = {}
    if stage in ("all", "1"):
        dp = DepthPrompting(cfg)
        for flag in flags:
            print(f"[stage 1] {flag}")
            xyz, rgb = load_xyz(os.path.join(data_dir, category,
                                             f"{flag}.ply"))
            rng = np.random.default_rng(0)
            idx = rng.choice(len(xyz), n_in, replace=len(xyz) < n_in)
            art = ObjectArtifacts(flag=flag, xyz=xyz[idx], rgb=rgb[idx])
            dp.get_image(art)
            arts[flag] = art

    if stage in ("all", "2"):
        sa = ScaleAdapter(cfg)
        for flag in flags:
            if flag not in arts:  # resume from workspace (split workflow)
                xyz, rgb = load_xyz(os.path.join(data_dir, category,
                                                 f"{flag}.ply"))
                rng = np.random.default_rng(0)
                idx = rng.choice(len(xyz), n_in, replace=len(xyz) < n_in)
                art = ObjectArtifacts(flag=flag, xyz=xyz[idx], rgb=rgb[idx])
                ws.load_stage1(flag, art)
                arts[flag] = art
            print(f"[stage 2+3] {flag}")
            art = arts[flag]
            sa.scale_adapter(art)
            # reference final loop: cd_inv_weight=0.5, diff_init=True,
            # reg_fine_xyz=True (main_lidar.py:87-89)
            reg(cfg, art, cd_inv_weight=0.5, diff_init=True,
                reg_fine_xyz=True)
            h = uhd(art.xyz, art.fused_xyz)
            results[flag] = h
            print(f"  UHD x100: {h * 100:.3f}")

    if results:
        print(f"\nAverage UHD x100 over {len(results)}: "
              f"{np.mean(list(results.values())) * 100:.3f}")
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description="genpc_tpu Waymo LiDAR pipeline")
    ap.add_argument("--config", default="configs/lidar.yaml")
    ap.add_argument("--data-dir", default="/root/reference/data/waymo")
    ap.add_argument("--category", default="CAR",
                    choices=["CAR", "PED", "OTHER"])
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--stage", default="all", choices=["all", "1", "2"])
    ap.add_argument("--output", default=None)
    args = ap.parse_args(argv)

    cfg = load_config(args.config if os.path.exists(args.config) else None)
    if args.category == "PED" and args.config == "configs/lidar.yaml" \
            and os.path.exists("configs/lidar_ped.yaml"):
        cfg = load_config("configs/lidar_ped.yaml")
    if args.output:
        cfg.output_path = args.output
    flags = list_scans(args.data_dir, args.category, args.limit)
    print(f"{len(flags)} {args.category} scans")
    start = time.time()
    run_lidar(cfg, flags, args.data_dir, args.category, args.stage)
    wall = time.time() - start
    print(f"{len(flags)} scans in {wall:.1f}s "
          f"({len(flags) / max(wall, 1e-9) * 60:.2f} objects/min)")


if __name__ == "__main__":
    main()
