"""Waymo PED quality diagnosis (VERDICT r4 #8) — one JSON line.

PED UHD×100 is ~4x CAR's (48.1 vs 11.6 in BENCH_local_r04).  This
driver attributes the partial->fused UHD per fusion sub-step
(batched_reg's fusion_debug: registration residual, FPS survival,
outlier-mask survival) for PED and CAR, then A/Bs the candidate causes:

  * denoise_std (statistical outlier removal aggressiveness — thin,
    ~400-point pedestrians lose sparse limbs to a filter tuned for
    dense clouds; reference std 2.5, reg_xyz.py:219);
  * point_size 2 vs 3 (the PED depth-render brush, reference
    config_lidar_ped.yaml:14);
  * removal_radius (HPR radius, reference 800 for PED vs 100 CAR).

Also benches the OTHER category (2 scans in the reference dataset,
enumerated by main_lidar.py:50-51 but never measured before).

Usage: python diag_waymo_ped.py [limit]   (default 12 scans/category)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _log(msg):
    print(f"[diag_ped] {msg}", file=sys.stderr, flush=True)


def run(category: str, yaml_name: str, limit: int, waymo_dir: str,
        **overrides) -> dict:
    from genpc_tpu.config import load_config
    from genpc_tpu.main_lidar import list_scans
    from genpc_tpu.parallel.batched_runner import run_batched_lidar

    here = os.path.dirname(os.path.abspath(__file__))
    cfg = load_config(
        os.path.join(here, "configs", yaml_name),
        trust_aligned_completion=False,
        output_path="/tmp/genpc_diag_ws", save=False,
        control_model="synthetic", rembg_model="synthetic",
        generative_model="synthetic", **overrides)
    flags = list_scans(waymo_dir, category, limit=limit)
    sizes = {}
    for f in flags:
        from genpc_tpu.io import load_xyz
        xyz, _ = load_xyz(os.path.join(waymo_dir, category, f"{f}.ply"))
        sizes[f] = len(xyz)
    dbg: dict = {}
    t0 = time.time()
    res = run_batched_lidar(cfg, flags, waymo_dir, category,
                            fusion_debug=dbg)
    wall = time.time() - t0
    uhds = {f: round(m["uhd"] * 100, 3) for f, m in res.items()}

    def mean(key):
        vals = [d[key] for d in dbg.values() if d.get(key) is not None]
        return round(float(np.mean(vals)), 3) if vals else None

    return {
        "category": category, "objects": len(flags),
        "overrides": overrides, "wall_s": round(wall, 1),
        "avg_uhd_x100": round(float(np.mean(list(uhds.values()))), 3),
        "avg_scan_points": int(np.mean(list(sizes.values()))),
        "stage_attribution_means": {
            "reg_residual_cd_x100": mean("reg_residual_cd_x100"),
            "uhd_partial_to_concat": mean("uhd_x100_partial_to_concat"),
            "uhd_partial_to_postfps": mean("uhd_x100_partial_to_postfps"),
            "uhd_partial_to_fused": mean("uhd_x100_partial_to_fused"),
            "partial_frac_after_fps": mean("partial_frac_after_fps"),
            "partial_kept_by_outlier_mask":
                mean("partial_kept_by_outlier_mask"),
            "generated_kept_by_outlier_mask":
                mean("generated_kept_by_outlier_mask"),
        },
        "worst_3": dict(sorted(uhds.items(), key=lambda kv: -kv[1])[:3]),
    }


def main():
    limit = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    data_dir = os.environ.get("GENPC_DATA", "/root/reference/data")
    waymo_dir = os.environ.get("GENPC_WAYMO",
                               os.path.join(data_dir, "waymo"))
    out = {}
    _log("baseline PED (shipped lidar_ped.yaml)")
    out["ped_baseline"] = run("PED", "lidar_ped.yaml", limit, waymo_dir)
    _log("control: CAR with the same instrumentation")
    out["car_control"] = run("CAR", "lidar.yaml", limit, waymo_dir)
    _log("A/B: PED denoise off (std 100)")
    out["ped_no_denoise"] = run("PED", "lidar_ped.yaml", limit, waymo_dir,
                                denoise_std=100.0)
    _log("A/B: PED denoise relaxed (std 5)")
    out["ped_denoise_std5"] = run("PED", "lidar_ped.yaml", limit,
                                  waymo_dir, denoise_std=5.0)
    _log("A/B: PED point_size 2 (CAR's brush)")
    out["ped_point_size2"] = run("PED", "lidar_ped.yaml", limit,
                                 waymo_dir, point_size=2)
    _log("A/B: PED removal_radius 100 (CAR's HPR radius)")
    out["ped_radius100"] = run("PED", "lidar_ped.yaml", limit, waymo_dir,
                               removal_radius=100)
    _log("OTHER category (never benched; 2 scans in the dataset)")
    try:
        out["other"] = run("OTHER", "lidar.yaml", limit, waymo_dir)
    except Exception as e:  # noqa: BLE001
        out["other"] = {"note": f"failed: {type(e).__name__}: {e}"}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
