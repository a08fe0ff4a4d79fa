"""Shared example runners (the reference's exampleHelpers.py re-imagined).

runSQPExample / runMPCExample time jitted solves across solver methods and
optionally record results to .npz (the reference dumps ~25 tensors as pandas
pickles, ref: examples/exampleHelpers.py:61-170; here the solver returns its
state functionally so we record the result bundle + timing instead).
"""

from __future__ import annotations

import pathlib
import time
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from trajoptmpcreference_tpu import make_mpc, make_sqp
from trajoptmpcreference_tpu.solvers.mpc import MPC_METHODS


def runSQPExample(plant, cost, constraints, N, dt, methods: Sequence[str],
                  options=None, x0=None, u0=None, record: bool = False,
                  out_dir: str = "data", n_test: int = 0, verbose=True):
    """Run one SQP solve per method; returns {method: (result, wall_s)}.

    (ref: exampleHelpers.py:161-170 runSQPExample / :61-159 runSolversSQP)
    """
    nx, nu = plant.nx, plant.nu
    x0 = jnp.zeros((nx, N)) if x0 is None else x0
    u0 = jnp.zeros((nu, N - 1)) if u0 is None else u0
    out = {}
    for method in methods:
        solver = make_sqp(plant, cost, constraints, N, dt, method=method,
                          options=options)
        fn = jax.jit(solver.solve)
        res = fn(x0, u0)
        jax.block_until_ready(res.X)          # compile
        t0 = time.perf_counter()
        res = fn(x0, u0)
        jax.block_until_ready(res.X)
        wall = time.perf_counter() - t0
        out[method] = (res, wall)
        if verbose:
            print(f"[{method:8s}] exit=({int(res.exit_sqp)},{int(res.exit_soft)}) "
                  f"iters={int(res.sqp_iters)} J={float(res.J):.6f} "
                  f"viol={float(res.viol):.2e} wall={wall*1e3:.2f}ms")
        if record:
            d = pathlib.Path(out_dir) / str(n_test)
            d.mkdir(parents=True, exist_ok=True)
            np.savez(d / f"sqp_{method.replace('-', '_')}.npz",
                     x=np.asarray(res.X), u=np.asarray(res.U),
                     J=float(res.J), viol=float(res.viol),
                     exit_sqp=int(res.exit_sqp), exit_soft=int(res.exit_soft),
                     iters=int(res.sqp_iters), wall_s=wall)
    return out


def runMPCExample(plant, cost, constraints, N, dt, methods: Sequence[str],
                  steps: int = 50, options=None, x0=None, record=False,
                  out_dir="data", n_test=0, verbose=True):
    """Closed-loop MPC per method; returns {method: (MPCResult, wall_s)}.

    Restores the API the reference's pendulum example calls but never
    defines (ref: examples/pendulum.py:28)."""
    x0 = jnp.zeros(plant.nx) if x0 is None else x0
    out = {}
    for method in methods:
        assert method in MPC_METHODS, method
        ctrl = make_mpc(plant, cost, constraints, N, dt, method=method,
                        options=options)
        fn = jax.jit(lambda x: ctrl.run(x, steps=steps))
        res = fn(x0)
        jax.block_until_ready(res.X_applied)
        t0 = time.perf_counter()
        res = fn(x0)
        jax.block_until_ready(res.X_applied)
        wall = time.perf_counter() - t0
        out[method] = (res, wall)
        if verbose:
            print(f"[{method:9s}] {steps} steps in {wall*1e3:.1f}ms "
                  f"({steps/wall:.1f} steps/s)  final x = "
                  f"{np.asarray(res.X_applied[:, -1]).round(4)}")
        if record:
            d = pathlib.Path(out_dir) / str(n_test)
            d.mkdir(parents=True, exist_ok=True)
            np.savez(d / f"mpc_{method.replace('-', '_')}.npz",
                     x=np.asarray(res.X_applied), u=np.asarray(res.U_applied),
                     exit_codes=np.asarray(res.exit_codes), wall_s=wall)
    return out
