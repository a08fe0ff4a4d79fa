"""Scenario batching: vmap inside a chip, shard_map across the mesh.

This is the primary scale axis (BASELINE.json: thousands of batched
scenario solves per step).  The reference fans out independent experiment
configs with multiprocessing (ref: examples/test_multiple.py:123-131); here
a batch of (x0, u0, cost_params) pytrees is ONE jit program:

    solve_b = batch_solve(solver)          # vmap: (B, ...) on one chip
    solve_s = shard_solve(solver, mesh)    # shard_map over axis 'batch'

Batch-axis collectives never leave the chip; shard_solve's only cross-chip
traffic is the initial scatter / final gather XLA inserts around the
sharded program, riding ICI.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Sequence[int],
              axis_names: Sequence[str] = ("batch",),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh over the available devices (row-major)."""
    devices = jax.devices() if devices is None else devices
    n = int(np.prod(axis_sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(tuple(axis_sizes))
    return Mesh(arr, tuple(axis_names))


def batch_solve(solver, cost_params_batched: bool = True):
    """vmap a solver's ``solve`` over a leading scenario axis.

    Returns fn(X0s (B, nx, N), U0s (B, nu, N-1)[, cost_params (B, ...)]).
    """
    if cost_params_batched:
        return jax.vmap(lambda x0, u0, cp: solver.solve(x0, u0, cost_params=cp))
    return jax.vmap(lambda x0, u0: solver.solve(x0, u0))


def shard_solve(solver, mesh: Mesh, axis: str = "batch",
                cost_params_batched: bool = True):
    """Shard the scenario batch over ``axis`` of ``mesh``; each device runs
    the vmapped solver over its local shard.  The batch size must divide by
    the axis size.  Works identically on a multi-host mesh (jax.distributed)
    because shard_map only sees the global axis."""
    vsolve = batch_solve(solver, cost_params_batched)
    spec = P(axis)

    if cost_params_batched:
        def fn(x0s, u0s, cps):
            return jax.shard_map(
                vsolve, mesh=mesh, in_specs=(spec, spec, spec),
                out_specs=spec, check_vma=False)(x0s, u0s, cps)
    else:
        def fn(x0s, u0s):
            return jax.shard_map(
                vsolve, mesh=mesh, in_specs=(spec, spec),
                out_specs=spec, check_vma=False)(x0s, u0s)
    return fn


def shard_batch(arrs: Any, mesh: Mesh, axis: str = "batch"):
    """Device_put a pytree of batched arrays with the leading axis sharded
    over ``axis`` (so the scatter happens once, not per solve)."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), arrs)
