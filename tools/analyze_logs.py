"""Training-log analysis (reference: tools/analysis_tools/analyze_logs.py:
cal_train_time + plot_curve over .log.json). Operates on the trainer's
train_log.jsonl.

  python tools/analyze_logs.py cal_train_time work_dirs/x/train_log.jsonl
  python tools/analyze_logs.py plot_curve work_dirs/x/train_log.jsonl \
      --keys loss loss_cls --out curves.png
"""

import argparse
import json
import sys


def load(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def cal_train_time(records):
    times = [r["iter_time"] for r in records if "iter_time" in r]
    if not times:
        print("no iter_time records")
        return
    import numpy as np

    t = np.asarray(times)
    print(
        f"slowest iter_time: {t.max():.4f}s  fastest: {t.min():.4f}s  "
        f"mean: {t.mean():.4f}s  std: {t.std():.4f}s"
    )


def plot_curve(records, keys, out):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for k in keys:
        xs = [r["step"] for r in records if k in r]
        ys = [r[k] for r in records if k in r]
        plt.plot(xs, ys, label=k)
    plt.xlabel("step")
    plt.legend()
    plt.savefig(out, dpi=120)
    print(f"saved {out}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("task", choices=["cal_train_time", "plot_curve"])
    p.add_argument("log")
    p.add_argument("--keys", nargs="+", default=["loss"])
    p.add_argument("--out", default="curves.png")
    args = p.parse_args()
    records = load(args.log)
    if args.task == "cal_train_time":
        cal_train_time(records)
    else:
        plot_curve(records, args.keys, args.out)


if __name__ == "__main__":
    main()
