"""Waymo LiDAR bench section (invoked by bench.py in a subprocess).

Runs >=20 CAR scans through the batched lidar runner (warm-up + timed
pass) and prints ONE JSON line.  Process isolation means a wedged remote
compile or a crash here cannot take bench.py's headline JSON down.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    data_dir = os.environ.get("GENPC_DATA", "/root/reference/data")
    waymo_dir = os.environ.get("GENPC_WAYMO",
                               os.path.join(data_dir, "waymo"))
    from genpc_tpu.config import load_config
    from genpc_tpu.main_lidar import list_scans
    from genpc_tpu.parallel.batched_runner import run_batched_lidar

    here = os.path.dirname(os.path.abspath(__file__))
    lidar_yaml = os.path.join(here, "configs", "lidar.yaml")
    cfg = load_config(
        lidar_yaml if os.path.exists(lidar_yaml) else None,
        trust_aligned_completion=False,
        output_path=os.environ.get("GENPC_BENCH_WS", "/tmp/genpc_bench_ws"),
        save=False, control_model="synthetic", rembg_model="synthetic",
        generative_model="synthetic")
    flags = list_scans(waymo_dir, "CAR",
                       limit=int(os.environ.get("GENPC_WAYMO_LIMIT", "20")))
    t0 = time.time()
    run_batched_lidar(cfg, flags, waymo_dir, "CAR")
    print(f"warm-up (waymo batched): {time.time()-t0:.1f}s",
          file=sys.stderr)
    t0 = time.time()
    uhds = run_batched_lidar(cfg, flags, waymo_dir, "CAR")
    wall = time.time() - t0
    print(json.dumps({
        "category": "CAR", "objects": len(flags),
        "avg_uhd_x100": round(float(np.mean(
            [m["uhd"] for m in uhds.values()])) * 100, 3),
        "objects_per_min": round(len(flags) / wall * 60.0, 3),
        "wall_s": round(wall, 1),
        "note": "batched lidar runner, warm timed pass"}))


if __name__ == "__main__":
    main()
