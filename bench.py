"""Headline benchmark: batched 6-DoF arm N=64 warm-started SQP-PCG MPC
solves/s per chip, with a real tracking gate and the BASELINE p50 per-step
latency metric.

BASELINE.json's metrics:
  * "MPC solves/s/chip (6-DoF arm, N=64)"; north star >= 10k solves/s on a
    16-chip v5p-16 => 625 solves/s/chip.  vs_baseline = value / 625.
  * p50 per-step solve latency vs the real-time budget (dt = 0.015 s =>
    66.7 Hz).  Measured as the scan-step slope (t(S2) - t(S1))/(S2 - S1),
    which cancels dispatch overhead (the axon remote round-trip is ~30 ms),
    at B = 1 and at the headline batch.

Each "solve" is one warm-started SQP-PCG-SS solve inside the closed MPC
loop (trajectory + multiplier + AL-state shift between steps).  B scenarios
(randomized goals and initial states) run batched via vmap; the closed loop
over S control steps is one lax.scan.

Quality gate (VERDICT r1: the 10-step gate was vacuous — the arm had
barely moved): the timed episode runs 150 steps (2.25 s sim from ~5 m
initial EE distance); "stable" = finite AND final EE error < 1.0 m, and
the gate asserts median error < 0.25x the initial distance.  A failing
gate marks the metric string; it never fakes the throughput number.

Prints exactly ONE JSON line.  Runs on the default JAX backend (the real
TPU chip under axon; CPU elsewhere).  f32: TPU has no f64.
"""

import json
import os
import sys
import time

import numpy as np


def _sync(x):
    """Host-transfer barrier (axon block_until_ready returns early)."""
    import jax.numpy as jnp
    return float(jnp.sum(x))


def main():
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    # f32 matmul precision: "highest" (full-f32 MXU passes) is the flagship
    # default — measured on the 150-step B=512 TPU bench, bf16-pass default
    # precision loses the closed loop (median EE err 3.63 m, 102/512
    # stable) while "highest" tracks (0.187 m, 482/512) at a 1% throughput
    # cost (2108.7 vs 2129.8 solves/s): the solver's 6-18-dim matmuls are
    # memory-bound, so the extra MXU passes are free.
    prec = os.environ.get("BENCH_MATMUL_PRECISION", "highest")
    if prec:
        jax.config.update("jax_default_matmul_precision", prec)
    B = int(os.environ.get("BENCH_BATCH", "512" if backend == "tpu" else "8"))
    N = int(os.environ.get("BENCH_N", "64"))
    steps = int(os.environ.get("BENCH_STEPS", "150"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _flagship_mpc

    # Pallas fd_grad is the TPU default: 2136.4 vs 2108.7 solves/s on
    # the 150-step bench, same tracking quality (off-TPU the lanes
    # path falls back to XLA automatically)
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    # fused Pallas PCG: default ON for PCG runs since the round-4 compiler
    # fixed the nesting CHECK failure — measured 13,737 vs 10,774 solves/s
    # AND better tracking (421 vs 375 stable) at the PCG-SS 4-iter config.
    # (The flagship method "S"/cr never touches it.)
    use_pallas_pcg = (os.environ.get(
        "BENCH_PALLAS_PCG", "1" if backend == "tpu" else "0") == "1")
    knobs = {}
    if "BENCH_PCG_ITERS" in os.environ:      # tuning sweeps (lockstep vmap
        knobs["pcg_iters"] = int(os.environ["BENCH_PCG_ITERS"])
    if "BENCH_SQP_ITERS" in os.environ:      # pays max trip counts)
        knobs["max_iter"] = int(os.environ["BENCH_SQP_ITERS"])
    if "BENCH_METHOD" in os.environ:         # PCG-SS (default) / S / ...
        knobs["method"] = os.environ["BENCH_METHOD"]
        if (knobs["method"] == "iLQR"
                and "BENCH_SQP_ITERS" not in os.environ):
            # iLQR needs a deeper per-step budget than SQP in the MPC
            # regime (its rollout line search has no KKT-exactness to
            # lean on): measured B=64 150-step rows — 5 iters 1,430
            # solves/s at 64/64 stable / 0.008 m, 8 iters 910 at equal
            # quality, while the SQP default (3) diverges
            # (bench_history_r5.md finding 11; r4 finding 7)
            knobs["max_iter"] = 5
    if "BENCH_EXACT_SCHUR" in os.environ:    # cr / thomas (method S)
        knobs["exact_schur"] = os.environ["BENCH_EXACT_SCHUR"]
    if "BENCH_ALPHA_MIN" in os.environ:      # line-search ladder depth
        knobs["alpha_min"] = float(os.environ["BENCH_ALPHA_MIN"])
    if "BENCH_ALPHA_FACTOR" in os.environ:   # line-search rung spacing
        knobs["alpha_factor"] = float(os.environ["BENCH_ALPHA_FACTOR"])
    if "BENCH_LS_GRAD_BASE" in os.environ:   # 1 = Armijo D at base point
        knobs["ls_grad_at_base"] = os.environ["BENCH_LS_GRAD_BASE"] == "1"
    if "BENCH_RTI_ALPHA" in os.environ:      # >0 = RTI fixed-step mode
        knobs["ls_fixed_alpha"] = float(os.environ["BENCH_RTI_ALPHA"])
    if "BENCH_RTI_LEAN" in os.environ:       # 1 = skip merit/exit metrics
        knobs["rti_lean"] = os.environ["BENCH_RTI_LEAN"] == "1"
    if "BENCH_RTI_CLIP" in os.environ:       # RTI trust-region step clip
        knobs["rti_step_clip"] = float(os.environ["BENCH_RTI_CLIP"])
    if "BENCH_TORQUE_LIMIT" in os.environ:   # constrained flagship variant
        knobs["torque_limit"] = float(os.environ["BENCH_TORQUE_LIMIT"])
        knobs["torque_mode"] = os.environ.get("BENCH_TORQUE_MODE",
                                              "AUGMENTED_LAGRANGIAN")
        if "BENCH_SQP_ITERS" not in os.environ:
            # constrained runs need one more iteration than the
            # unconstrained 3 (activity masks / AL multipliers lag the
            # plan by an iteration); 4 is the measured knee under the
            # condensed path — same two-seed stability as 5 at +24%
            # (bench_history_r5.md finding 15)
            knobs["max_iter"] = 4
    if "BENCH_SOFT_ITERS" in os.environ:     # AL outer rounds per solve
        knobs["max_iter_soft"] = int(os.environ["BENCH_SOFT_ITERS"])
    elif knobs.get("torque_mode", "").startswith(("AUGMENTED", "QUAD")) or             knobs.get("torque_mode", "").endswith("+AL"):
        # AL-in-MPC default: ONE multiplier update per control step (the
        # textbook scheme; the MPC shift carries the AL state).  Measured
        # (bench_history_r5.md finding 8): 12,289 solves/s at 256/256
        # stable vs 1,240 at 254/256 for the to-convergence default —
        # the per-solve 10-round loop is a one-shot-trajopt semantics
        # that the lockstep vmap pays batch-wide.  BENCH_SOFT_ITERS=10
        # reproduces the library default.
        knobs["max_iter_soft"] = 1
    if "BENCH_STEP_CLIP" in os.environ:      # trust-region max|dU| clip
        knobs["ls_step_clip"] = float(os.environ["BENCH_STEP_CLIP"])
    if "BENCH_RHO" in os.environ:            # Levenberg damping floor
        knobs["rho_init"] = float(os.environ["BENCH_RHO"])
        knobs["rho_min"] = float(os.environ["BENCH_RHO"])
    if "BENCH_PARALLEL_LS" in os.environ:    # 1 = one-pass alpha ladder
        knobs["parallel_ls"] = os.environ["BENCH_PARALLEL_LS"] == "1"
    if "BENCH_PALLAS_FD" in os.environ:      # 1 = fused fd in LS rollout
        knobs["use_pallas_fd"] = os.environ["BENCH_PALLAS_FD"] == "1"
    plant, cost, ctrl = _flagship_mpc(N=N, use_pallas=use_pallas,
                                      use_pallas_pcg=use_pallas_pcg,
                                      **knobs)
    # Iteration schedule (solvers/mpc.run_scheduled): a HIGH-budget phase
    # for the first BENCH_COLD_STEPS control steps (round-3 forensics,
    # analysis/unstable_scenarios.md: every unstable scenario diverges in
    # the cold-start transient and every one is fixed by a 6-iter/9-rung
    # budget), then the main config once the receding-horizon warm start
    # carries the solve.  0 = uniform budget.  (Round 2 tested the inverse
    # schedule — cheap steady state — and rejected it: warm 2-iter steps
    # drift.  BENCH_WARM_SQP_ITERS reproduces that experiment.)
    # default: cold = ONE step x 4 iters x 9-rung ladder (block-Thomas
    # exact solves), steady = the _flagship 3-iter/3-rung CR config.
    # History: round 4 adopted 4x4 (bench_history_r4.md finding 16);
    # round 5's cold-Thomas hybrid + batch-invariance freeze re-opened
    # the knee, and the full descent (bench_history_r5.md finding 17)
    # found the cliff: 1x4 holds 512/512 on ALL FIVE scenario seeds at
    # 19,289-19,318 solves/s, 1x3 cracks (511 on seed 0), and no cold
    # phase collapses (488/484) — ONE deep Thomas-cold step is the
    # load-bearing minimum.  0 disables.
    cold_steps = int(os.environ.get("BENCH_COLD_STEPS", "1"))
    ctrl_cold = ctrl_warm = None
    if cold_steps > 0 and "BENCH_WARM_SQP_ITERS" in os.environ:
        warm_iters = int(os.environ["BENCH_WARM_SQP_ITERS"])
        _, _, ctrl_warm = _flagship_mpc(N=N, use_pallas=use_pallas,
                                        use_pallas_pcg=use_pallas_pcg,
                                        **{**knobs, "max_iter": warm_iters})
    elif cold_steps > 0:
        cold_knobs = {
            **knobs,
            "max_iter": int(os.environ.get("BENCH_COLD_SQP_ITERS", "4")),
            "alpha_min": float(os.environ.get("BENCH_COLD_ALPHA_MIN",
                                              "0.005")),
            "alpha_factor": float(os.environ.get("BENCH_COLD_ALPHA_FACTOR",
                                                 "0.5")),
            # the cold phase ALWAYS line-searches: BENCH_RTI_ALPHA targets
            # the steady-state controller only (round-3 forensics: RTI
            # diverges exactly in the cold transient the deep ladder fixes)
            "ls_fixed_alpha": float(os.environ.get("BENCH_COLD_RTI_ALPHA",
                                                   "0.0")),
        }
        # precision-where-it-matters DEFAULT: block-Thomas (3x tighter
        # f32 tracking, bench_history_r4.md finding 19) for the 4 cold
        # solves, cyclic reduction for the throughput-critical steady
        # state.  Measured (finding 20): turns the 5-seed stable record
        # from 512/508/510/511/511 into 512/512 on EVERY seed at -1.4%
        # throughput (18,567 vs 18,823).  BENCH_COLD_EXACT_SCHUR=cr
        # reproduces the pure-CR schedule.
        cold_knobs["exact_schur"] = os.environ.get(
            "BENCH_COLD_EXACT_SCHUR", "thomas")
        _, _, ctrl_cold = _flagship_mpc(N=N, use_pallas=use_pallas,
                                        use_pallas_pcg=use_pallas_pcg,
                                        **cold_knobs)
    nx = plant.nx
    dtype = jnp.float32

    # scenario-distribution seed (robustness-margin studies; the headline
    # uses seed 0 — same scenarios every round, so rates are comparable)
    rng = np.random.default_rng(int(os.environ.get("BENCH_SEED", "0")))
    x0s = jnp.asarray(0.1 * rng.standard_normal((B, nx)), dtype=dtype)
    goals_np = np.concatenate([
        np.array([3.0, 2.0, 0.0]) + 0.3 * rng.standard_normal((B, 3)) * [1, 1, 0],
        np.zeros((B, 3))], axis=1)
    goals = jnp.asarray(goals_np, dtype=dtype)
    cps = jax.vmap(lambda g: cost.default_params._replace(xg=g))(goals)

    def episode(nsteps):
        # clamp the schedule to short runs: with nsteps <= cold_steps the
        # COLD controller runs the whole episode (the documented schedule's
        # prefix), rather than silently measuring the steady config alone
        nc = min(cold_steps, nsteps)
        if ctrl_warm is not None and nc > 0:
            from trajoptmpcreference_tpu.solvers.mpc import run_scheduled
            phases = [(ctrl, nc)] + (
                [(ctrl_warm, nsteps - nc)] if nsteps > nc else [])
            run = lambda x0, cp: run_scheduled(phases, x0, cost_params=cp)
        elif ctrl_cold is not None and nc > 0:
            from trajoptmpcreference_tpu.solvers.mpc import run_scheduled
            phases = [(ctrl_cold, nc)] + (
                [(ctrl, nsteps - nc)] if nsteps > nc else [])
            run = lambda x0, cp: run_scheduled(phases, x0, cost_params=cp)
        else:
            run = lambda x0, cp: ctrl.run(x0, steps=nsteps, cost_params=cp)
        if 0 < nsteps <= cold_steps:
            print(f"# note: nsteps={nsteps} <= BENCH_COLD_STEPS="
                  f"{cold_steps}; cold config runs the whole episode",
                  file=sys.stderr)
        return jax.jit(jax.vmap(run), static_argnums=()), nsteps

    # ---- headline throughput + tracking quality (one long episode)
    fn, _ = episode(steps)
    res = fn(x0s, cps)
    _sync(res.U_applied)                       # warmup / compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        res = fn(x0s, cps)
        _sync(res.U_applied)
        times.append(time.perf_counter() - t0)
    solves_per_s = B * steps / min(times)

    q_final = res.X_applied[:, :plant.nq, -1]
    ee = jax.vmap(lambda q: plant.kinematics.ee_pos_xyz(q)[:2])(q_final)
    err = np.asarray(jnp.linalg.norm(ee - goals[:, :2], axis=1),
                     dtype=np.float64)
    q0 = np.asarray(x0s[:, :plant.nq])
    ee0 = np.asarray(jax.vmap(lambda q: plant.kinematics.ee_pos_xyz(q)[:2])(
        jnp.asarray(q0)))
    dist0 = np.linalg.norm(ee0 - goals_np[:, :2], axis=1)
    finite = np.isfinite(err)
    stable = finite & (err < 1.0)
    med_err = float(np.median(np.where(finite, err, np.inf)))
    gate_ok = med_err < 0.25 * float(np.median(dist0))
    # stability-margin curve (stderr): the 1 m threshold is arbitrary —
    # show how the stable count moves with it (knife-edge diagnostics)
    for thr in (0.1, 0.25, 0.5, 1.0, 2.0):
        print(f"# stable-threshold: err<{thr} m -> "
              f"{int((finite & (err < thr)).sum())}/{B}", file=sys.stderr)

    # ---- p50 per-step latency via scan-step slope, B=1 and headline B
    def step_latency(batch):
        # p50 of the steady-state per-step cost: under an iteration schedule
        # the deployment-relevant number is the warm (at-control-rate)
        # solver's step, so the slope episodes use it uniformly.
        lat_ctrl = ctrl_warm if ctrl_warm is not None else ctrl
        def lat_episode(nsteps):
            return jax.jit(jax.vmap(
                lambda x0, cp: lat_ctrl.run(x0, steps=nsteps,
                                            cost_params=cp))), nsteps
        xb = x0s[:batch]
        cb = jax.tree_util.tree_map(lambda a: a[:batch], cps)
        lats = []
        s1, s2 = 8, 40
        f1, _ = lat_episode(s1)
        f2, _ = lat_episode(s2)
        _sync(f1(xb, cb).U_applied)
        _sync(f2(xb, cb).U_applied)
        for _ in range(max(reps, 5)):
            t0 = time.perf_counter()
            _sync(f1(xb, cb).U_applied)
            t1 = time.perf_counter()
            _sync(f2(xb, cb).U_applied)
            t2 = time.perf_counter()
            lats.append(((t2 - t1) - (t1 - t0)) / (s2 - s1))
        return float(np.median(lats) * 1e3)    # ms, p50 over reps

    budget_ms = ctrl.solver.dt * 1e3 if hasattr(ctrl, "solver") else 15.0
    frontier_b = -1
    frontier_ms = float("nan")
    if os.environ.get("BENCH_LATENCY", "1") == "1":
        p50_b1_ms = step_latency(1)
        p50_bb_ms = step_latency(B)
        # ---- real-time frontier: max batch whose p50 step fits the budget
        # (BASELINE's deployment metric).  Probe a coarse grid between the
        # largest batch known under budget and the smallest known over it;
        # each probe costs two episode compiles, so the grid stays small.
        if os.environ.get("BENCH_FRONTIER", "1") == "1":
            probes = {1: p50_b1_ms, B: p50_bb_ms}
            grid = [b for b in (64, 128, 256, 384) if 1 < b < B]
            lo = max(b for b, v in probes.items() if v <= budget_ms) \
                if any(v <= budget_ms for v in probes.values()) else 0
            hi = min((b for b, v in probes.items() if v > budget_ms),
                     default=B + 1)
            for b in grid:
                if not (lo < b < hi):
                    continue
                probes[b] = step_latency(b)
                if probes[b] <= budget_ms:
                    lo = max(lo, b)
                else:
                    hi = min(hi, b)
            under = {b: v for b, v in probes.items() if v <= budget_ms}
            if under:
                frontier_b = max(under)
                frontier_ms = under[frontier_b]
            # batch-scaling table (stderr; the JSON line stays single):
            # p50 step latency and implied solves/s at each probed batch
            for b in sorted(probes):
                print(f"# batch-scaling: B={b} p50_step_ms={probes[b]:.3f} "
                      f"solves/s={b / probes[b] * 1e3:.0f}",
                      file=sys.stderr)
    else:                         # A/B throughput runs skip the extra compiles
        p50_b1_ms = p50_bb_ms = float("nan")

    _m = knobs.get("method", "S")
    method_label = (_m if _m.startswith("PCG") or _m == "iLQR"
                    else f"{_m}/{knobs.get('exact_schur', 'cr')}")
    if knobs.get("torque_limit", 0) > 0:
        method_label += (f" torque±{knobs['torque_limit']:g} "
                         f"{knobs.get('torque_mode')}")
    if ctrl_cold is not None and not _m.startswith("PCG") and _m != "iLQR":
        _cold_es = cold_knobs.get("exact_schur", "cr")
        if _cold_es != knobs.get("exact_schur", "cr"):
            method_label += f" (cold {_cold_es})"
    quality = (f"median EE err {med_err:.3f} m from "
               f"{float(np.median(dist0)):.1f} m, {int(stable.sum())}/{B} "
               f"stable<1m" + ("" if gate_ok else " QUALITY-GATE-FAILED"))
    frontier = ("" if frontier_b < 0 else
                f"; real-time frontier B*={frontier_b} "
                f"({frontier_ms:.2f} ms p50 <= budget)")
    print(json.dumps({
        "metric": (f"6-DoF arm N={N} warm-started SQP-{method_label} "
                   f"MPC solves/s/chip "
                   f"({backend}, B={B}, {steps}-step episodes, {quality}; "
                   f"p50 step latency {p50_b1_ms:.2f} ms @B=1 / "
                   f"{p50_bb_ms:.2f} ms @B={B} vs {budget_ms:.1f} ms "
                   f"budget{frontier})"),
        "value": round(solves_per_s, 2),
        "unit": "solves/s/chip",
        "vs_baseline": round(solves_per_s / 625.0, 4),
    }))


if __name__ == "__main__":
    main()
