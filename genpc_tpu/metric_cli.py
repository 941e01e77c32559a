"""Standalone metric evaluation CLI (reference: metric.py:173-196).

Scores fused clouds in a workspace directory against GT:
  python -m genpc_tpu.metric_cli --workspace workspace \
      --gt-dir /root/reference/data/GT --flags 01184 05117

Fixes the reference's NameError path (metric.py calls the undefined
``fps_subsample``) and exposes both GT conventions: main.py compares
unrotated, metric.py rotates GT 180° about x (--rotate-gt).
"""

from __future__ import annotations

import argparse
import os

from genpc_tpu.categories import REDWOOD_FLAGS
from genpc_tpu.metrics.metric import evaluate_workspace, summarize


def main(argv=None):
    ap = argparse.ArgumentParser(description="genpc_tpu metric evaluation")
    ap.add_argument("--workspace", default="workspace")
    ap.add_argument("--gt-dir", default="/root/reference/data/GT")
    ap.add_argument("--flags", nargs="*", default=None)
    ap.add_argument("--generative-model", default="synthetic")
    ap.add_argument("--rotate-gt", action="store_true",
                    help="rotate GT 180 deg about x (reference metric.py:11-14)")
    ap.add_argument("--no-emd", action="store_true")
    args = ap.parse_args(argv)

    flags = args.flags or REDWOOD_FLAGS
    results = {}
    for flag in flags:
        m = evaluate_workspace(flag, args.workspace, args.gt_dir,
                               generative_model=args.generative_model,
                               rotate_gt_x180=args.rotate_gt,
                               with_emd=not args.no_emd)
        if m is not None:
            results[flag] = m
    if not results:
        print("no fused clouds found")
        return
    summarize(results)


if __name__ == "__main__":
    main()
