"""Horizon-scaling table for the sharded linear solvers (SURVEY §2.8 SP).

For N in {64, 256, 1024}: build the FLAGSHIP Schur complement (6-DoF arm,
task-space cost) at a rolled-out state, then solve S lam = gamma with the
two horizon-sharded paths over an 8-shard mesh and their unsharded
counterparts:

  * exact: SPIKE substructuring (parallel.horizon.sharded_btd_exact) vs
    block cyclic reduction (ops.btridiag.btd_cyclic_reduction);
  * iterative: sharded PCG-SS (halo matvecs + psum dots) vs the XLA PCG.

Reported per row: wall time (min over reps), PCG iteration counts, and the
relative true residual |S lam - gamma| / |gamma| of every path.

On the virtual CPU mesh (xla_force_host_platform_device_count=8) the wall
times are a HARNESS-level proxy — all 8 "devices" share the same physical
cores, so sharded-vs-unsharded wall ratios validate that the partitioned
algorithm does no redundant work, not real ICI scaling.  Iteration counts
and residuals are exact, mesh or not.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python analysis/horizon_scaling.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        jax.config.update("jax_platforms", want)
    # f64: the scaling question is iterations/latency vs N, and the
    # cold-start flagship Schur complement is too ill-conditioned for f32
    # residuals to discriminate solvers (kappa ~ 1e7+; see
    # __graft_entry__.dryrun_multichip).  f32 sharded-vs-unsharded behavior
    # is pinned separately (tests/test_parallel.py f32 parity + the bench).
    jax.config.update("jax_enable_x64", True)

    from __graft_entry__ import _flagship
    from trajoptmpcreference_tpu.ops.btridiag import (
        btd_cyclic_reduction,
        btd_matvec,
        pcg,
        preconditioner,
    )
    from trajoptmpcreference_tpu.parallel import make_mesh
    from trajoptmpcreference_tpu.parallel.horizon import (
        ShardedBTD,
        shard_btd,
        sharded_btd_exact,
        sharded_pcg,
    )

    nshards = int(os.environ.get("HSCALE_SHARDS", "8"))
    reps = int(os.environ.get("HSCALE_REPS", "5"))
    Ns = [int(s) for s in
          os.environ.get("HSCALE_NS", "64,256,1024").split(",")]
    pcg_tol = 1e-4
    pcg_iters = 200

    devs = jax.devices()
    assert len(devs) >= nshards, (len(devs), nshards)
    mesh = make_mesh((nshards,), ("horizon",), devices=devs[:nshards])
    spec = P("horizon")

    def sync(x):
        return float(jnp.sum(x))

    def timeit(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        sync(out[0] if isinstance(out, tuple) else out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out[0] if isinstance(out, tuple) else out)
            ts.append(time.perf_counter() - t0)
        return out, min(ts)

    rows = []
    for N in Ns:
        # flagship Schur complement at a rolled-out (non-cold) state: the
        # conditioning regime the MPC loop actually solves in
        plant, cost, solver = _flagship(N=N, max_iter=3, use_pallas=False,
                                        dtype=jnp.float64)
        dtype = jnp.float64
        rng = np.random.default_rng(0)
        nx, nu = plant.nx, plant.nu
        x = jnp.asarray(0.1 * rng.standard_normal(nx), dtype)
        # a bounded 64-step rollout tiled over the horizon: realistic
        # per-knot magnitudes without the unbounded spin-up a 1024-step
        # random-torque rollout produces
        nroll = min(N, 64)
        U64 = jnp.asarray(0.1 * rng.standard_normal((nu, nroll)), dtype)

        def roll(x0, Useq):
            def step(xk, uk):
                x1 = plant.step(xk, uk, solver.dt)
                return x1, x1
            _, Xs = jax.lax.scan(step, x0, Useq.T)
            return jnp.concatenate([x0[None], Xs], axis=0).T

        X64 = jax.jit(roll)(x, U64)            # (nx, nroll + 1)
        reps_h = -(-N // nroll)                # ceil
        X = jnp.tile(X64[:, :nroll], (1, reps_h))[:, :N]
        U = jnp.tile(U64, (1, reps_h))[:, :N - 1]
        cstate = solver.cset.init_state(dtype=dtype)
        blocks = jax.jit(lambda: solver.kkt.form_blocks(
            X, U, X[:, 0], cost.default_params, cstate))()
        rho = jnp.asarray(solver.options.rho_init, dtype)
        S, gam, _, _ = jax.jit(
            lambda b: solver.kkt._schur_blocks_split(b, rho))(blocks)
        bs = S.diag.shape[-1]
        gnorm = float(jnp.linalg.norm(gam))

        def rel_res(lam):
            return float(jnp.linalg.norm(gam - btd_matvec(S, lam))) / gnorm

        # --- unsharded exact (cyclic reduction: the flagship default)
        cr = jax.jit(lambda: btd_cyclic_reduction(S, gam))
        lam_cr, t_cr = timeit(cr)

        # --- sharded exact (SPIKE substructuring)
        sh = shard_btd(S, nshards)

        def f_exact(diag, upper, uprev, bl):
            return sharded_btd_exact(ShardedBTD(diag, upper, uprev), bl,
                                     "horizon")

        spike = jax.jit(jax.shard_map(
            f_exact, mesh=mesh, in_specs=(spec, spec, spec, spec),
            out_specs=spec, check_vma=False))
        lam_sp, t_sp = timeit(spike, sh.diag, sh.upper, sh.upper_prev, gam)

        # --- unsharded PCG-SS (relative exit, flagship tolerances)
        xla_pcg = jax.jit(lambda: pcg(
            S, gam, preconditioner(S, "SS"), exit_tolerance=pcg_tol,
            max_iter=pcg_iters, relative=True))
        res_x, t_px = timeit(xla_pcg)
        lam_px, it_px = res_x.x, int(res_x.iters)

        # --- sharded PCG-SS
        def f_pcg(diag, upper, uprev, bl):
            r = sharded_pcg(ShardedBTD(diag, upper, uprev), bl, "horizon",
                            precond="SS", exit_tolerance=pcg_tol,
                            max_iter=pcg_iters, relative=True)
            return r.x, r.iters

        sh_pcg = jax.jit(jax.shard_map(
            f_pcg, mesh=mesh, in_specs=(spec, spec, spec, spec),
            out_specs=(spec, P()), check_vma=False))
        (lam_ps, it_ps), t_ps = timeit(
            sh_pcg, sh.diag, sh.upper, sh.upper_prev, gam)

        row = {
            "N": N, "bs": bs, "shards": nshards,
            "t_cr_ms": round(t_cr * 1e3, 3),
            "t_spike_ms": round(t_sp * 1e3, 3),
            "t_pcg_ms": round(t_px * 1e3, 3),
            "t_pcg_sharded_ms": round(t_ps * 1e3, 3),
            "pcg_iters": it_px,
            "pcg_iters_sharded": int(np.asarray(it_ps)),
            "res_cr": f"{rel_res(lam_cr):.2e}",
            "res_spike": f"{rel_res(lam_sp):.2e}",
            "res_pcg": f"{rel_res(lam_px):.2e}",
            "res_pcg_sharded": f"{rel_res(lam_ps):.2e}",
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    backend = jax.default_backend()
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"horizon_scaling_{backend}.md")
    with open(out, "w") as f:
        f.write(f"# Horizon scaling ({backend}, {nshards}-shard mesh): "
                f"flagship Schur solve S lam = gamma\n\n")
        f.write("Exact SPIKE substructuring vs cyclic reduction, and "
                "sharded vs XLA PCG-SS, on the flagship 6-DoF Schur "
                f"complement (bs = {rows[0]['bs']}) at a rolled-out "
                "state.  Iteration counts and relative residuals are "
                "exact; wall times on a virtual CPU mesh are a "
                "harness-level proxy (shard processes oversubscribe the "
                "physical cores and collectives are emulated through host "
                "memory — sharded wall columns are pessimistic; compare "
                "iteration counts and residuals across rows).\n\n")
        f.write("| N | CR ms | SPIKE ms | PCG-SS ms (iters) | "
                "sharded PCG-SS ms (iters) | res CR | res SPIKE | "
                "res PCG | res shPCG |\n|---|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['N']} | {r['t_cr_ms']} | {r['t_spike_ms']} | "
                    f"{r['t_pcg_ms']} ({r['pcg_iters']}) | "
                    f"{r['t_pcg_sharded_ms']} ({r['pcg_iters_sharded']}) | "
                    f"{r['res_cr']} | {r['res_spike']} | {r['res_pcg']} | "
                    f"{r['res_pcg_sharded']} |\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
