#!/usr/bin/env python
"""Analyze training json logs (reference `code/tools/analyze_logs.py`):
plot loss curves or compute average iteration time."""

import argparse
import json
import os
import sys


def load_log(path):
    records = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    return records


def cal_train_time(records):
    times = [r["time"] for r in records if r.get("mode") == "train"
             and "time" in r]
    if not times:
        print("no timing records")
        return
    import numpy as np
    arr = np.asarray(times)
    print(f"slowest iter: {arr.max():.4f}s, fastest: {arr.min():.4f}s, "
          f"mean: {arr.mean():.4f}s +/- {arr.std():.4f}")


def plot_curve(records, keys, out):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    train = [r for r in records if r.get("mode") == "train"]
    for key in keys:
        xs = [i for i, r in enumerate(train) if key in r]
        ys = [r[key] for r in train if key in r]
        plt.plot(xs, ys, label=key)
    plt.xlabel("log step")
    plt.legend()
    plt.savefig(out)
    print(f"saved {out}")


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="task", required=True)
    p1 = sub.add_parser("plot_curve")
    p1.add_argument("json_log")
    p1.add_argument("--keys", nargs="+", default=["loss"])
    p1.add_argument("--out", default="curve.png")
    p2 = sub.add_parser("cal_train_time")
    p2.add_argument("json_log")
    args = parser.parse_args()

    records = load_log(args.json_log)
    if args.task == "plot_curve":
        plot_curve(records, args.keys, args.out)
    else:
        cal_train_time(records)


if __name__ == "__main__":
    main()
