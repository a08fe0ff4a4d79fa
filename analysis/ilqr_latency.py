"""iLQR single-solve latency: sequential vs associative-scan Riccati.

The parallel backward pass (solvers/ilqr.backward_parallel) exists for
B=1 latency: the sequential reverse scan serializes N-1 dependent knot
steps per iteration, while the associative scan runs log2(N) combine
levels of batched block ops.  This measures a warm jitted solve at
several horizons on the live backend (axon TPU: only a host transfer is
a reliable completion barrier).

Run:  python analysis/ilqr_latency.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax

    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        # the axon sitecustomize latches the TPU plugin; the env var alone
        # does not override it — the config update does
        jax.config.update("jax_platforms", want)
    import jax.numpy as jnp

    from trajoptmpcreference_tpu import (
        PendulumPlant,
        QuadraticCost,
        SQPOptions,
        URDFPlant,
        serial_arm,
    )
    from trajoptmpcreference_tpu.solvers.ilqr import make_ilqr

    backend = jax.default_backend()
    dtype = jnp.float32 if backend == "tpu" else jnp.float64
    # the associative-scan combine cost scales with nx^3, so the pendulum
    # (nx=2) crossover does NOT transfer to the flagship arm (nx=12) —
    # measure both (VERDICT r3 weak item 5)
    which = os.environ.get("ILQR_PLANTS", "pendulum,arm6").split(",")
    plants = {}
    if "pendulum" in which:
        plants["pendulum (nx=2)"] = (PendulumPlant(), 2, 1,
                                     jnp.array([np.pi, 0.0], dtype=dtype))
    if "arm6" in which:
        plants["arm6 (nx=12)"] = (URDFPlant(robot=serial_arm(6)), 12, 6,
                                  jnp.zeros(12, dtype=dtype))
    all_rows = {}
    for label, (plant, nx, nu, xg) in plants.items():
        all_rows[label] = _sweep(jax, jnp, make_ilqr, QuadraticCost,
                                 SQPOptions, plant, nx, nu, xg, dtype,
                                 label)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"ilqr_latency_{backend}.md")
    with open(out, "w") as f:
        f.write(f"# iLQR warm single-solve latency ({backend}, 8 fixed "
                "iterations): sequential vs associative-scan Riccati\n")
        for label, rows in all_rows.items():
            f.write(f"\n## {label}\n\n"
                    "| N | sequential scan (ms) | associative scan (ms) | "
                    "speedup |\n|---|---|---|---|\n")
            for N, s, p in rows:
                f.write(f"| {N} | {s:.2f} | {p:.2f} | {s / p:.2f}x |\n")
    print("wrote", out)


def _sweep(jax, jnp, make_ilqr, QuadraticCost, SQPOptions, plant, nx, nu,
           xg, dtype, label):
    import time
    rows = []
    Ns = [int(s) for s in
          os.environ.get("ILQR_NS", "32,64,128,256").split(",")]
    for N in Ns:
        cost = QuadraticCost(jnp.eye(nx, dtype=dtype),
                             100.0 * jnp.eye(nx, dtype=dtype),
                             0.1 * jnp.eye(nu, dtype=dtype),
                             xg)
        opts = SQPOptions(max_iter=8, exit_tolerance=0.0)  # fixed work
        x0 = jnp.zeros((nx, N), dtype=dtype)
        u0 = jnp.zeros((nu, N - 1), dtype=dtype)
        res = {}
        for name, par in (("sequential", False), ("parallel", True)):
            s = make_ilqr(plant, cost, None, N, 0.1, options=opts,
                          parallel_riccati=par)

            def reps(r):
                # serialized solves (data-dependent carry) so the axon
                # dispatch round-trip (~30 ms) cancels in the two-rep slope
                def outer(_):
                    def body(i, t):
                        out = s.solve(x0 + t * jnp.asarray(1e-30, dtype),
                                      u0)
                        return t + out.J * jnp.asarray(1e-30, dtype) + 1.0
                    return jax.lax.fori_loop(0, r, body,
                                             jnp.asarray(0.0, dtype))
                f = jax.jit(outer)
                float(f(0))                        # compile + warm
                best = np.inf
                for _ in range(5):
                    t0 = time.perf_counter()
                    float(f(0))                    # host fetch = barrier
                    best = min(best, time.perf_counter() - t0)
                return best

            r1, r2 = 2, 12
            res[name] = (reps(r2) - reps(r1)) / (r2 - r1) * 1e3
        rows.append((N, res["sequential"], res["parallel"]))
        print(f"{label} N={N}: sequential {res['sequential']:.2f} ms, "
              f"parallel {res['parallel']:.2f} ms "
              f"({res['sequential'] / res['parallel']:.2f}x)", flush=True)
    return rows


if __name__ == "__main__":
    main()
