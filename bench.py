"""Headline benchmark: batched 6-DoF arm N=64 warm-started SQP-PCG MPC
solves/s per chip.

BASELINE.json's metric: "MPC solves/s/chip (6-DoF arm, N=64)"; the north
star is >= 10k solves/s on a 16-chip v5p-16 => 625 solves/s/chip.
vs_baseline = value / 625 (>= 1.0 beats the north-star per-chip rate).

Each "solve" is one warm-started SQP-PCG-SS solve inside the closed MPC
loop (trajectory + multiplier + AL-state shift between steps) — the regime
the metric names.  B scenarios (randomized goals and initial states) run
batched via vmap; the closed loop over S control steps is one lax.scan.

Prints exactly ONE JSON line.  Runs on the default JAX backend (the real
TPU chip under axon; CPU elsewhere).  f32: TPU has no f64.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    B = int(os.environ.get("BENCH_BATCH", "512" if backend == "tpu" else "8"))
    N = int(os.environ.get("BENCH_N", "64"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _flagship_mpc

    use_pallas = os.environ.get("BENCH_PALLAS", "0") == "1"
    plant, cost, ctrl = _flagship_mpc(N=N, use_pallas=use_pallas)
    nx = plant.nx
    dtype = jnp.float32

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(0.1 * rng.standard_normal((B, nx)), dtype=dtype)
    goals = jnp.asarray(
        np.concatenate([
            np.array([3.0, 2.0, 0.0]) + 0.3 * rng.standard_normal((B, 3)) * [1, 1, 0],
            np.zeros((B, 3))], axis=1), dtype=dtype)
    cps = jax.vmap(lambda g: cost.default_params._replace(xg=g))(goals)

    fn = jax.jit(jax.vmap(
        lambda x0, cp: ctrl.run(x0, steps=steps, cost_params=cp)))

    def run_once():
        res = fn(x0s, cps)
        # NB: on the axon remote-TPU backend block_until_ready returns
        # before remote execution finishes; a host transfer is the only
        # reliable completion barrier, so sync on a scalar reduction.
        float(jnp.sum(res.U_applied))
        return res

    res = run_once()             # warmup / compile

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        res = run_once()
        times.append(time.perf_counter() - t0)
    solves_per_s = B * steps / min(times)

    # sanity: the closed loop must actually track (median final EE error
    # over scenarios that stayed finite, plus the finite fraction)
    q_final = res.X_applied[:, :6, -1]
    ee = jax.vmap(lambda q: plant.kinematics.ee_pos_xyz(q)[:2])(q_final)
    err = np.asarray(jnp.linalg.norm(ee - goals[:, :2], axis=1))
    finite = np.isfinite(err)
    med_err = float(np.median(err[finite])) if finite.any() else float("nan")

    print(json.dumps({
        "metric": (f"6-DoF arm N={N} warm-started SQP-PCG MPC solves/s/chip "
                   f"({backend}, B={B}, median EE err {med_err:.3f} m, "
                   f"{int(finite.sum())}/{B} stable)"),
        "value": round(solves_per_s, 2),
        "unit": "solves/s/chip",
        "vs_baseline": round(solves_per_s / 625.0, 4),
    }))


if __name__ == "__main__":
    main()
