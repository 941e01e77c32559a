"""End-to-end pipeline driver (reference: main.py).

Runs the three stages over a set of object flags and evaluates CD/EMD
against GT.  Unlike the reference — which loops stage constructors and
hands every intermediate through the filesystem — artifacts stay in memory
(with workspace persistence when cfg.save) and all stage models are built
once.

Usage:
  python -m genpc_tpu.main --config configs/redwood.yaml \
      --data-dir /root/reference/data --flags 01184 05117
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Dict, List, Optional

import numpy as np

from genpc_tpu.categories import REDWOOD_FLAGS
from genpc_tpu.config import Config, load_config
from genpc_tpu.io.ply import load_xyz
from genpc_tpu.metrics.metric import evaluate_pair, summarize
from genpc_tpu.pipeline.artifacts import ObjectArtifacts
from genpc_tpu.pipeline.depth_prompting import DepthPrompting
from genpc_tpu.pipeline.registration import reg
from genpc_tpu.pipeline.scale_adapter import ScaleAdapter


def run_pipeline(cfg: Config, flags: List[str], data_dir: str,
                 gt_dir: Optional[str] = None, with_metric: bool = True,
                 with_emd: bool = True,
                 timer: Optional["StageTimer"] = None
                 ) -> Dict[str, Dict[str, float]]:
    from genpc_tpu.tracing import StageTimer
    timer = timer or StageTimer()
    gt_dir = gt_dir or os.path.join(data_dir, "GT")
    dp = DepthPrompting(cfg)
    sa = ScaleAdapter(cfg)

    # resample every cloud to one fixed size so each jitted stage compiles
    # once for the whole object set (clouds are surface samples; exact-size
    # resampling preserves the geometry the stages consume)
    n_in = int(cfg.get("input_points", 65536))
    arts = {}
    for flag in flags:
        print(f"Processing {flag}...")
        with timer.span("load"):
            xyz, rgb = load_xyz(os.path.join(data_dir, f"{flag}.ply"))
            rng = np.random.default_rng(0)
            idx = rng.choice(len(xyz), n_in, replace=len(xyz) < n_in)
            art = ObjectArtifacts(flag=flag, xyz=xyz[idx], rgb=rgb[idx])
        with timer.span("stage1"):
            dp.get_image(art)
        arts[flag] = art

    results: Dict[str, Dict[str, float]] = {}
    for flag, art in arts.items():
        # per-object fault isolation: one bad scan must not kill the run
        # (reference batch drivers log-and-continue, camera_utils.py:634-645)
        try:
            with timer.span("stage2"):
                sa.scale_adapter(art)
            with timer.span("stage3"):
                reg(cfg, art, cd_inv_weight=0.5, diff_init=True,
                    reg_fine_xyz=True)
        except Exception as e:  # noqa: BLE001
            print(f"Flag: {flag} FAILED: {type(e).__name__}: {e}")
            continue
        if with_metric:
            gt_path = os.path.join(gt_dir, f"{flag}.ply")
            if os.path.exists(gt_path):
                with timer.span("metric"):
                    gt, _ = load_xyz(gt_path)
                    from genpc_tpu.metrics.frame_fixes import \
                        apply_frame_fix
                    gt = apply_frame_fix(flag, gt)
                    from genpc_tpu.parallel.mesh import get_mesh
                    m = evaluate_pair(art.fused_xyz, gt,
                                      num_points=int(cfg.metric_points),
                                      emd_eps=float(cfg.emd_eps),
                                      emd_iters=int(cfg.emd_iters),
                                      with_emd=with_emd,
                                      mesh=get_mesh(cfg))
                emd_txt = f", EMD: {m['emd']*100:.3f}" if "emd" in m else ""
                print(f"Flag: {flag}, CD: {m['cd']*100:.3f}{emd_txt}")
                results[flag] = m

    if with_metric and results:
        print("\n=== Results ===")
        summarize(results)
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description="genpc_tpu pipeline")
    ap.add_argument("--config", default=None, help="YAML config path")
    ap.add_argument("--data-dir", default="/root/reference/data")
    ap.add_argument("--gt-dir", default=None)
    ap.add_argument("--flags", nargs="*", default=None,
                    help="object flags (default: all redwood)")
    ap.add_argument("--output", default=None, help="workspace dir")
    ap.add_argument("--backend", default=None,
                    help="override all generative backends (e.g. synthetic)")
    ap.add_argument("--control-model", default=None,
                    help="depth->image backend (controlnet/adapter/flux/qwen)")
    ap.add_argument("--rembg-model", default=None,
                    help="background removal backend (rmbg/synthetic)")
    ap.add_argument("--generative-model", default=None,
                    help="image->3D backend (instantmesh/trellis/synthetic)")
    ap.add_argument("--model-size", default=None,
                    help="generative preset scale (tiny/base/full)")
    ap.add_argument("--quant-bits", type=int, default=None,
                    help="weight-only DiT quantization: 0=bf16, 8=int8, "
                         "4=int4 (default: auto — full flux int8 / qwen "
                         "int4, the single-chip deployment)")
    ap.add_argument("--no-metric", action="store_true")
    ap.add_argument("--no-emd", action="store_true")
    ap.add_argument("--batched", action="store_true",
                    help="object-batched runner (one device program per "
                         "stage over the whole set)")
    ap.add_argument("--mesh", default=None,
                    help="device mesh for the batched runner, e.g. dp=8 "
                         "(implies --batched)")
    ap.add_argument("--timings", action="store_true",
                    help="print the per-stage timing table")
    ap.add_argument("--profile", default=None,
                    help="jax profiler trace dir (TensorBoard/xprof)")
    args = ap.parse_args(argv)

    cfg = load_config(args.config)
    if args.output:
        cfg.output_path = args.output
    if args.backend:
        cfg.control_model = args.backend
        cfg.rembg_model = args.backend
        cfg.generative_model = args.backend
    if args.control_model:
        cfg.control_model = args.control_model
    if args.rembg_model:
        cfg.rembg_model = args.rembg_model
    if args.generative_model:
        cfg.generative_model = args.generative_model
    if args.model_size:
        cfg.model_size = args.model_size
    if args.quant_bits is not None:
        cfg.quant_bits = args.quant_bits
    if args.mesh:
        cfg.mesh_shape = {k: int(v) for k, v in
                          (kv.split("=") for kv in args.mesh.split(","))}
        args.batched = True
    flags = args.flags or [f for f in REDWOOD_FLAGS if os.path.exists(
        os.path.join(args.data_dir, f"{f}.ply"))]

    from genpc_tpu.tracing import StageTimer, trace
    timer = StageTimer()
    start = time.time()
    with trace(args.profile):
        if args.batched:
            from genpc_tpu.metrics.metric import summarize
            from genpc_tpu.parallel.batched_runner import run_batched
            results = run_batched(cfg, flags, args.data_dir, args.gt_dir,
                                  with_emd=not args.no_emd)
            if results:
                print("\n=== Results ===")
                summarize(results)
        else:
            run_pipeline(cfg, flags, args.data_dir, args.gt_dir,
                         with_metric=not args.no_metric,
                         with_emd=not args.no_emd, timer=timer)
    wall = time.time() - start
    if args.timings:
        print()
        timer.report()
    print(f"\n{len(flags)} objects in {wall:.1f}s "
          f"({len(flags) / wall * 60:.2f} objects/min)")


if __name__ == "__main__":
    main()
