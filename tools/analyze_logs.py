#!/usr/bin/env python
"""Train-log statistics (reference: tools/analyze_logs.py — iter-time stats
and metric curves from the json train log).

plot_curve renders the metric curves with matplotlib (Agg) exactly like the
reference's plot task: one line per (log, key), legend, optional --out png
(shown interactively when no --out is given and a display exists).
"""
import argparse
import json

p = argparse.ArgumentParser()
p.add_argument("task", choices=["cal_train_time", "plot_curve"])
p.add_argument("log", nargs="+")
p.add_argument("--keys", nargs="*", default=["loss"])
p.add_argument("--out", default=None, help="save the plot to this file")
p.add_argument("--title", default=None)
p.add_argument("--xlabel", default="iter")
args = p.parse_args()

if args.task == "plot_curve":
    import matplotlib

    if args.out:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

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
            pts = [(r.get("step", i), r[k]) for i, r in enumerate(rows)
                   if k in r]
            if not pts:
                print(f"{path}: no values for key {k!r}")
                continue
            xs, ys = zip(*pts)
            plt.plot(xs, ys, marker="o" if len(xs) < 50 else None,
                     label=f"{path} {k}")
            print(f"{path} {k}: {len(ys)} points, last={ys[-1]}")

if args.task == "plot_curve":
    plt.xlabel(args.xlabel)
    plt.legend()
    if args.title:
        plt.title(args.title)
    if args.out:
        plt.savefig(args.out, dpi=120, bbox_inches="tight")
        print(f"saved plot to {args.out}")
    else:
        plt.show()
