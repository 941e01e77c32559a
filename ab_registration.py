"""Registration A/B harness: pose-start pruning + final-refine variants.

Completes the experiment VERDICT r3 #4/#6 asked for: the full 13-object
redwood set through the COMPLETE registration budget (synthetic
backends, trust_aligned_completion=False, the same protocol as bench.py)
under three arms:

  prune1_aniso  — the shipping default (pose_prune_starts=1,
                  final_refine='anisotropic')
  prune0_aniso  — the reference's budget: all 4 pose starts polished for
                  all 200 steps (reference: optim_registration/
                  diff_obj_pose.py:518-567)
  prune1_affine — opt-in general-affine final refine
                  (registration/icp.py:192-238)

Prints one JSON line; persists docs/registration_ab.json and a markdown
table docs/registration_ab.md.  Platform is recorded — quality (CD) is
platform-independent up to numeric noise; walls are only comparable
within one platform.

Usage: python ab_registration.py [arm ...]   (default: all three)
"""

from __future__ import annotations

import json
import os
import sys
import time

from bench import EXCLUDED_FLAGS, quality


def run_pass(cfg, flags, data_dir):
    """bench.run_pass minus EMD (CD is the A/B signal; EMD at 16384 is
    the single most expensive metric op and identical across arms)."""
    from genpc_tpu.parallel.batched_runner import run_batched
    start = time.time()
    results = run_batched(cfg, flags, data_dir, verbose=False,
                          with_emd=False)
    return results, time.time() - start

ARMS = {
    "prune1_aniso": dict(pose_prune_starts=1, final_refine="anisotropic"),
    "prune0_aniso": dict(pose_prune_starts=0, final_refine="anisotropic"),
    "prune2_aniso": dict(pose_prune_starts=2, final_refine="anisotropic"),
    "prune1_affine": dict(pose_prune_starts=1, final_refine="affine"),
}


def main():
    import jax
    from genpc_tpu.categories import REDWOOD_FLAGS
    from genpc_tpu.config import load_config

    data_dir = os.environ.get("GENPC_DATA", "/root/reference/data")
    out_dir = os.environ.get("GENPC_BENCH_WS", "/tmp/genpc_ab_ws")
    arms = sys.argv[1:] or list(ARMS)
    flags = [f for f in REDWOOD_FLAGS
             if os.path.exists(os.path.join(data_dir, f"{f}.ply"))]

    out = {"platform": jax.default_backend(),
           "objects": len(flags),
           "excluded": dict(EXCLUDED_FLAGS),
           "arms": {}}
    for arm in arms:
        cfg = load_config(output_path=out_dir, save=False,
                          control_model="synthetic",
                          rembg_model="synthetic",
                          generative_model="synthetic",
                          trust_aligned_completion=False, **ARMS[arm])
        print(f"[{arm}] warm-up...", file=sys.stderr, flush=True)
        run_pass(cfg, flags, data_dir)
        print(f"[{arm}] timed pass...", file=sys.stderr, flush=True)
        results, wall = run_pass(cfg, flags, data_dir)
        cd, _ = quality(results)
        out["arms"][arm] = {
            "avg_cd_x100": cd,
            "wall_s": round(wall, 1),
            "objects_per_min": round(len(flags) / wall * 60.0, 2),
            "per_object_cd_x100": {f: round(m["cd"] * 100, 3)
                                   for f, m in sorted(results.items())},
        }
        print(f"[{arm}] avg CD*100 = {cd}  wall {wall:.1f}s",
              file=sys.stderr, flush=True)
        jax.clear_caches()   # bound the live executable map count (1-core
        # box: vm.max_map_count hazard, see tests/conftest.py)

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "docs", "registration_ab.json"),
              "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    _write_table(out, os.path.join(here, "docs", "registration_ab.md"))
    print(json.dumps(out))


def _write_table(out, path):
    arms = out["arms"]
    per_obj = {}
    for arm, a in arms.items():
        for f, cd in a["per_object_cd_x100"].items():
            per_obj.setdefault(f, {})[arm] = cd
    lines = [
        "# Registration A/B: pose-start pruning and final refine",
        "",
        f"Platform: {out['platform']} — full registration budget, "
        f"synthetic backends, {out['objects']} redwood objects "
        f"(quality average excludes {', '.join(out['excluded'])}: "
        "dataset GT error).",
        "",
        "| arm | avg CD×100 | wall s | obj/min |",
        "|---|---|---|---|",
    ]
    for arm, a in arms.items():
        lines.append(f"| {arm} | {a['avg_cd_x100']} | {a['wall_s']} "
                     f"| {a['objects_per_min']} |")
    lines += ["", "Per object CD×100:", "",
              "| flag | " + " | ".join(arms) + " |",
              "|---|" + "---|" * len(arms)]
    for f in sorted(per_obj):
        ex = " (excl.)" if f in out["excluded"] else ""
        row = " | ".join(str(per_obj[f].get(a, "-")) for a in arms)
        lines.append(f"| {f}{ex} | {row} |")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
