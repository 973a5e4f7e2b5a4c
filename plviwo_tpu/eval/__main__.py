"""Evaluation CLI: `python -m plviwo_tpu.eval <cmd> ...`.

Consolidates the reference's 12 ov_eval binaries (error_singlerun,
error_comparison, error_dataset, timing_*, plot_trajectories,
format_converter...) into subcommands producing JSON (and markdown tables
for `compare`).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from .loader import load_timing, load_tum
from .metrics import Stats, ate, nees, rpe


def cmd_ate(args):
    t_e, p_e, q_e = load_tum(args.est)
    t_g, p_g, q_g = load_tum(args.gt)
    out = ate(t_e, p_e, q_e, t_g, p_g, q_g, method=args.align, tol=args.tol)
    print(json.dumps(out, indent=None))
    return 0


def cmd_rpe(args):
    t_e, p_e, q_e = load_tum(args.est)
    t_g, p_g, q_g = load_tum(args.gt)
    segs = tuple(float(s) for s in args.segments.split(","))
    out = rpe(t_e, p_e, q_e, t_g, p_g, q_g, segment_lengths=segs, tol=args.tol)
    print(json.dumps(out))
    return 0


def cmd_compare(args):
    """Multi-run x multi-algorithm ATE table (error_comparison equivalent)."""
    rows = []
    t_g, p_g, q_g = load_tum(args.gt)
    for est in args.est:
        t_e, p_e, q_e = load_tum(est)
        res = ate(t_e, p_e, q_e, t_g, p_g, q_g, method=args.align)
        pos = res.get("pos", {})
        rows.append((est, pos.get("rmse", float("nan")),
                     (res.get("ori_deg") or {}).get("rmse", float("nan"))))
    print("| run | ATE pos RMSE [m] | ATE ori RMSE [deg] |")
    print("|---|---|---|")
    for name, p, o in rows:
        print(f"| {name} | {p:.4f} | {o:.4f} |")
    return 0


def cmd_timing(args):
    names, rows = load_timing(args.file)
    out = {}
    for i, name in enumerate(names or []):
        if i == 0:
            continue  # timestamp column
        out[name] = Stats.from_values(rows[:, i]).as_dict()
    print(json.dumps(out))
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="plviwo_tpu.eval")
    sub = ap.add_subparsers(dest="cmd", required=True)

    a = sub.add_parser("ate", help="absolute trajectory error (error_singlerun)")
    a.add_argument("est"); a.add_argument("gt")
    a.add_argument("--align", default="posyaw", choices=["none", "posyaw", "se3", "sim3"])
    a.add_argument("--tol", type=float, default=0.02)
    a.set_defaults(fn=cmd_ate)

    r = sub.add_parser("rpe", help="relative pose error over segments")
    r.add_argument("est"); r.add_argument("gt")
    r.add_argument("--segments", default="8,16,24,32,48")
    r.add_argument("--align", default="posyaw")
    r.add_argument("--tol", type=float, default=0.02)
    r.set_defaults(fn=cmd_rpe)

    c = sub.add_parser("compare", help="multi-run ATE table (error_comparison)")
    c.add_argument("gt"); c.add_argument("est", nargs="+")
    c.add_argument("--align", default="posyaw")
    c.set_defaults(fn=cmd_compare)

    t = sub.add_parser("timing", help="timing-file statistics (timing_histogram)")
    t.add_argument("file")
    t.set_defaults(fn=cmd_timing)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
