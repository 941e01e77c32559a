"""End-to-end benchmark: objects/min/chip over the 13-object redwood set.

Runs the full pipeline (depth prompting -> depth-conditioned generation ->
image-to-3D -> differentiable registration -> fusion -> CD/EMD eval) with
the model-free synthetic generative backends on one TPU chip and reports
throughput against the BASELINE.md target of >= 5 objects/min/chip.

Prints exactly ONE JSON line to stdout; progress goes to stderr.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time


def main():
    data_dir = os.environ.get("GENPC_DATA", "/root/reference/data")
    out_dir = os.environ.get("GENPC_BENCH_WS", "/tmp/genpc_bench_ws")

    from genpc_tpu.categories import REDWOOD_FLAGS
    from genpc_tpu.config import load_config
    from genpc_tpu.main import run_pipeline

    flags = [f for f in REDWOOD_FLAGS
             if os.path.exists(os.path.join(data_dir, f"{f}.ply"))]
    cfg = load_config(
        output_path=out_dir, save=False,
        control_model="synthetic", rembg_model="synthetic",
        generative_model="synthetic")

    # warm-up object: pay every compile once, outside the timed window
    warm = io.StringIO()
    with contextlib.redirect_stdout(warm):
        run_pipeline(cfg, flags[:1], data_dir, with_metric=True,
                     with_emd=True)
    print("warm-up done", file=sys.stderr)

    start = time.time()
    log = io.StringIO()
    with contextlib.redirect_stdout(log):
        results = run_pipeline(cfg, flags, data_dir, with_metric=True,
                               with_emd=True)
    wall = time.time() - start
    print(log.getvalue(), file=sys.stderr)

    objects_per_min = len(flags) / wall * 60.0
    target = 5.0  # BASELINE.md: >=5 objects/min/chip on v5e-8 (per chip)
    avg_cd = (sum(m["cd"] for m in results.values()) / len(results)
              if results else float("nan"))
    print(json.dumps({
        "metric": "objects/min/chip end-to-end (synthetic backends, "
                  "13-object redwood, CD+EMD eval included)",
        "value": round(objects_per_min, 3),
        "unit": "objects/min/chip",
        "vs_baseline": round(objects_per_min / target, 3),
        "extra": {"avg_cd_x100": round(avg_cd * 100, 3),
                  "objects": len(flags), "wall_s": round(wall, 1)},
    }))


if __name__ == "__main__":
    main()
