"""Animate a planar n-link trajectory (ref: examples/display_final_traj.py).

Reads an .npz recorded by example_helpers (record=True) or solves twolinks
fresh, then renders per-step frames with matplotlib (gated: prints a notice
if matplotlib is unavailable)."""

import argparse
import pathlib

import numpy as np

import _path  # noqa: F401


def link_points(q, link_length=1.0):
    """Joint positions of a planar z-revolute serial chain (links along the
    rotated +y axis, matching the URDF geometry)."""
    pts = [np.zeros(2)]
    th = 0.0
    for qi in np.asarray(q):
        th += qi
        # z-rotation of the +y unit vector
        step = link_length * np.array([-np.sin(th), np.cos(th)])
        pts.append(pts[-1] + step)
    return np.stack(pts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default=None, help="recorded trajectory .npz")
    ap.add_argument("--out", default="traj_frames", help="output directory")
    ap.add_argument("--goal", type=float, nargs=2, default=[0.5, 1.5])
    args = ap.parse_args()

    if args.npz:
        data = np.load(args.npz)
        X = data["x"]
    else:
        import jax
        import jax.numpy as jnp
        from trajoptmpcreference_tpu import (
            SQPOptions, URDFPlant, UrdfCost, make_sqp, serial_arm)
        plant = URDFPlant(robot=serial_arm(2))
        cost = UrdfCost(plant, jnp.eye(4), 100 * jnp.eye(4), 0.1 * jnp.eye(2),
                        jnp.array([args.goal[0], args.goal[1], 0.0, 0.0]))
        solver = make_sqp(plant, cost, None, 10, 0.1, method="S",
                          options=SQPOptions(expected_reduction_min=-100.0))
        res = jax.jit(solver.solve)(jnp.zeros((4, 10)), jnp.zeros((2, 9)))
        X = np.asarray(res.X)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib not available; printing joint angles instead")
        for k in range(X.shape[1]):
            print(f"step {k}: q = {X[:X.shape[0] // 2, k].round(4)}")
        return

    out = pathlib.Path(args.out)
    out.mkdir(exist_ok=True)
    n = X.shape[0] // 2
    for k in range(X.shape[1]):
        pts = link_points(X[:n, k])
        fig, ax = plt.subplots(figsize=(4, 4))
        ax.plot(pts[:, 0], pts[:, 1], "o-", lw=3)
        ax.plot(*args.goal, "r*", ms=15)
        lim = n + 0.5
        ax.set_xlim(-lim, lim)
        ax.set_ylim(-lim, lim)
        ax.set_aspect("equal")
        ax.set_title(f"step {k}")
        fig.savefig(out / f"frame_{k:03d}.png", dpi=80)
        plt.close(fig)
    print(f"wrote {X.shape[1]} frames to {out}/")


if __name__ == "__main__":
    main()
