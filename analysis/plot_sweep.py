"""Heatmaps of EE error / solve time over goal sweeps — the reference's
plot_multiple.py / data_results analogue (ref: examples/plot_multiple.py:
15-73), fed by examples/batch_sweep.py --out results.csv."""

import argparse
import csv

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csv", help="output of examples/batch_sweep.py --out")
    ap.add_argument("--png", default=None)
    args = ap.parse_args()

    rows = list(csv.DictReader(open(args.csv)))
    gx = np.array([float(r["goal_x"]) for r in rows])
    gy = np.array([float(r["goal_y"]) for r in rows])
    err = np.array([float(r["ee_err"]) for r in rows])
    iters = np.array([int(r["iters"]) for r in rows])
    exits = np.array([int(r["exit"]) for r in rows])

    print(f"{len(rows)} solves | converged (exit=1): {(exits == 1).sum()} "
          f"| median err {np.median(err):.4f} m | mean iters {iters.mean():.1f}")
    worst = np.argsort(err)[-5:][::-1]
    for i in worst:
        print(f"  worst: goal ({gx[i]:+.2f},{gy[i]:+.2f}) err {err[i]:.3f} "
              f"exit {exits[i]} iters {iters[i]}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; text summary only")
        return
    fig, axes = plt.subplots(1, 2, figsize=(11, 5))
    for ax, vals, label in [(axes[0], err, "EE error [m]"),
                            (axes[1], iters, "SQP iterations")]:
        sc = ax.scatter(gx, gy, c=vals, s=60, cmap="viridis")
        ax.set_aspect("equal")
        ax.set_title(label)
        fig.colorbar(sc, ax=ax)
    out = args.png or args.csv.replace(".csv", ".png")
    fig.savefig(out, dpi=110, bbox_inches="tight")
    print("wrote", out)


if __name__ == "__main__":
    main()
