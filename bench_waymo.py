"""Waymo LiDAR bench section (invoked by bench.py in a subprocess).

Runs >=20 scans per category (CAR + PED, reference: config_lidar.yaml /
config_lidar_ped.yaml) through the batched lidar runner and prints ONE
JSON line.  Process isolation means a wedged remote compile or a crash
here cannot take bench.py's headline JSON down.

Per category:
  * warm-up pass (compiles; CAR only — PED reuses the same programs),
  * timed pass -> objects/min + partial->fused UHD,
  * held-out-slice pass (a 60 deg azimuth wedge withheld from the
    pipeline; UHD from the held-out points to the completion) — the
    completion-quality proxy partial->fused UHD cannot give, since the
    fused cloud contains the partial by construction (VERDICT r2 #9).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _run_category(category: str, yaml_name: str, limit: int,
                  waymo_dir: str, warm: bool) -> dict:
    from genpc_tpu.config import load_config
    from genpc_tpu.main_lidar import list_scans
    from genpc_tpu.parallel.batched_runner import run_batched_lidar

    here = os.path.dirname(os.path.abspath(__file__))
    yaml_path = os.path.join(here, "configs", yaml_name)
    cfg = load_config(
        yaml_path if os.path.exists(yaml_path) else None,
        trust_aligned_completion=False,
        output_path=os.environ.get("GENPC_BENCH_WS", "/tmp/genpc_bench_ws"),
        save=False, control_model="synthetic", rembg_model="synthetic",
        generative_model="synthetic")
    flags = list_scans(waymo_dir, category, limit=limit)
    if warm:
        t0 = time.time()
        run_batched_lidar(cfg, flags, waymo_dir, category)
        print(f"warm-up (waymo {category}): {time.time()-t0:.1f}s",
              file=sys.stderr)
    t0 = time.time()
    uhds = run_batched_lidar(cfg, flags, waymo_dir, category)
    wall = time.time() - t0
    t0 = time.time()
    held = run_batched_lidar(cfg, flags, waymo_dir, category,
                             holdout_wedge_deg=60.0)
    held_wall = time.time() - t0
    hvals = [m["holdout_uhd"] for m in held.values() if "holdout_uhd" in m]
    return {
        "category": category, "objects": len(flags),
        "avg_uhd_x100": round(float(np.mean(
            [m["uhd"] for m in uhds.values()])) * 100, 3),
        "objects_per_min": round(len(flags) / wall * 60.0, 3),
        "wall_s": round(wall, 1),
        "holdout_uhd_x100": (round(float(np.mean(hvals)) * 100, 3)
                             if hvals else None),
        "holdout_objects": len(hvals),
        "holdout_wall_s": round(held_wall, 1),
        "note": "batched lidar runner, warm timed pass; holdout = 60deg "
                "azimuth wedge withheld, UHD(held-out -> fused)"}


def main():
    data_dir = os.environ.get("GENPC_DATA", "/root/reference/data")
    waymo_dir = os.environ.get("GENPC_WAYMO",
                               os.path.join(data_dir, "waymo"))
    limit = int(os.environ.get("GENPC_WAYMO_LIMIT", "20"))
    out = {"car": _run_category("CAR", "lidar.yaml", limit, waymo_dir,
                                warm=True)}
    try:
        out["ped"] = _run_category("PED", "lidar_ped.yaml", limit,
                                   waymo_dir, warm=False)
    except Exception as e:  # noqa: BLE001 — CAR numbers still count
        out["ped"] = {"note": f"failed: {type(e).__name__}: {e}"}
    # OTHER ships with the reference dataset (2 scans; enumerated by
    # main_lidar.py:50-51) but was never benched before round 5
    try:
        out["other"] = _run_category("OTHER", "lidar.yaml", limit,
                                     waymo_dir, warm=False)
    except Exception as e:  # noqa: BLE001
        out["other"] = {"note": f"failed: {type(e).__name__}: {e}"}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
