"""SQP convergence traces across solver methods — the reference's
compare_traces.ipynb analogue, built on utils.trace.solve_traced (which
replaces the reference's RETURN_TRACE_SQP dict trace,
ref: TrajoptMPCReference.py:555-569)."""

import argparse

import numpy as np

import _path  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--links", type=int, default=2)
    ap.add_argument("--methods", nargs="+",
                    default=["N", "S", "PCG-J", "PCG-BJ", "PCG-SS"])
    ap.add_argument("--png", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from trajoptmpcreference_tpu import (
        SQPOptions, URDFPlant, UrdfCost, make_sqp, serial_arm)
    from trajoptmpcreference_tpu.utils import solve_traced

    n = args.links
    plant = URDFPlant(robot=serial_arm(n))
    k = min(3, n)
    cost = UrdfCost(plant, jnp.eye(k + n), 100.0 * jnp.eye(k + n),
                    0.1 * jnp.eye(n),
                    jnp.asarray([0.5, 1.5] + [0.0] * (k + n - 2)))
    traces = {}
    for m in args.methods:
        solver = make_sqp(plant, cost, None, 10, 0.1, method=m,
                          options=SQPOptions(expected_reduction_min=-100.0,
                                             max_iter=40))
        X, U, tr = jax.jit(lambda a, b: solve_traced(solver, a, b))(
            jnp.zeros((2 * n, 10)), jnp.zeros((n, 9)))
        live = np.asarray(tr.live)
        traces[m] = {
            "J": np.asarray(tr.J)[live],
            "c": np.asarray(tr.c)[live],
            "pcg": np.asarray(tr.pcg_iters)[live],
            "exit": int(tr.exit_code),
        }
        print(f"[{m:7s}] iters {live.sum():3d} exit {int(tr.exit_code)} "
              f"final J {traces[m]['J'][-1]:.8f} "
              f"mean PCG iters {traces[m]['pcg'].mean():.1f}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    fig, axes = plt.subplots(1, 2, figsize=(11, 4.5))
    for m, t in traces.items():
        axes[0].semilogy(t["J"] - min(tr["J"].min() for tr in traces.values())
                         + 1e-12, label=m)
        axes[1].semilogy(np.maximum(t["c"], 1e-16), label=m)
    axes[0].set_title("J - J* per iteration")
    axes[1].set_title("constraint violation")
    for ax in axes:
        ax.legend()
        ax.set_xlabel("SQP iteration")
    out = args.png or "trace_compare.png"
    fig.savefig(out, dpi=110, bbox_inches="tight")
    print("wrote", out)


if __name__ == "__main__":
    main()
