#!/usr/bin/env python
"""Train-log statistics (reference: tools/analyze_logs.py — iter-time stats
and metric curves from the json train log)."""
import argparse, json, sys

p = argparse.ArgumentParser()
p.add_argument("task", choices=["cal_train_time", "plot_curve"])
p.add_argument("log", nargs="+")
p.add_argument("--keys", nargs="*", default=["loss"])
args = p.parse_args()

for path in args.log:
    rows = [json.loads(l) for l in open(path) if l.strip()]
    if args.task == "cal_train_time":
        ts = [r["wall_s"] / max(r.get("steps", 1), 1) for r in rows if "wall_s" in r]
        if ts:
            import statistics
            print(f"{path}: mean iter time {statistics.mean(ts):.4f}s "
                  f"(n={len(ts)})")
    else:
        for k in args.keys:
            vals = [r[k] for r in rows if k in r]
            print(f"{path} {k}: {vals}")
