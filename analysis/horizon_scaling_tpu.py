"""Single-chip horizon-scaling table on the REAL TPU (VERDICT r4 item 10).

For N in {64, 256, 1024} x B in {1, 32}: build the flagship Schur
complement (6-DoF arm, task-space cost, f32, rolled-out non-cold state,
batched over B scenario draws) and time every linear-solver regime the
README's menu offers on one chip:

  * exact block-Thomas (sequential scan — the precision option);
  * exact cyclic reduction (log-depth batched levels — the throughput
    default);
  * cr_refine (CR + one iterative-refinement step);
  * XLA PCG-SS (iteration counts reported);
  * fused Pallas PCG-SS (whole Krylov loop in VMEM).

This is the deployment-guidance table: where each regime wins as the
horizon grows.  Latency = min over reps of a host-fetch-synchronized
call (axon block_until_ready returns early; only a host transfer is a
real barrier).

Run (on the axon TPU):  python analysis/horizon_scaling_tpu.py
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

    from __graft_entry__ import _flagship
    from trajoptmpcreference_tpu.ops.btridiag import (
        BlockTridiag,
        btd_block_thomas,
        btd_cyclic_reduction,
        btd_matvec,
        pcg,
        preconditioner,
    )

    backend = jax.default_backend()
    reps = int(os.environ.get("HSCALE_REPS", "5"))
    Ns = [int(s) for s in
          os.environ.get("HSCALE_NS", "64,256,1024").split(",")]
    Bs = [int(s) for s in os.environ.get("HSCALE_BS", "1,32").split(",")]
    pcg_tol = 1e-4
    pcg_iters = 200
    dtype = jnp.float32

    def sync(x):
        return float(jnp.sum(x))

    # Per-solve latency by the CHAIN-SLOPE method: a single isolated call
    # measures the axon dispatch round-trip (~30 ms), not compute — the
    # same reason bench.py times scan-step slopes.  Chain K dependent
    # solves inside one jit (each rhs perturbed by the previous solution
    # at 1e-20 scale: numerically inert, but XLA cannot hoist the
    # loop-invariant solve) and report (t(K2) - t(K1)) / (K2 - K1).
    K1, K2 = 8, 64

    def chain(batch_fn, K):
        @jax.jit
        def f(Sd, So, gam):
            def body(_, lam):
                return batch_fn(Sd, So, gam + 1e-20 * lam)
            return jax.lax.fori_loop(0, K, body, jnp.zeros_like(gam))
        return f

    def timeit(batch_fn, Sd, So, gam):
        """Returns (one direct solve output, per-solve seconds)."""
        out = batch_fn(Sd, So, gam)
        sync(out[0] if isinstance(out, tuple) else out)
        f1, f2 = chain(batch_fn, K1), chain(batch_fn, K2)
        sync(f1(Sd, So, gam))
        sync(f2(Sd, So, gam))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(f1(Sd, So, gam))
            t1 = time.perf_counter()
            sync(f2(Sd, So, gam))
            t2 = time.perf_counter()
            ts.append(((t2 - t1) - (t1 - t0)) / (K2 - K1))
        return out, float(np.median(ts))

    rows = []
    for N in Ns:
        plant, cost, solver = _flagship(N=N, max_iter=3, dtype=dtype)
        rng = np.random.default_rng(0)
        nx, nu = plant.nx, plant.nu
        nroll = min(N, 64)

        def roll(x0, Useq):
            def step(xk, uk):
                x1 = plant.step(xk, uk, solver.dt)
                return x1, x1
            _, Xs = jax.lax.scan(step, x0, Useq.T)
            return jnp.concatenate([x0[None], Xs], axis=0).T

        Bmax = max(Bs)
        x0s = jnp.asarray(0.1 * rng.standard_normal((Bmax, nx)), dtype)
        U64 = jnp.asarray(0.1 * rng.standard_normal((Bmax, nu, nroll)),
                          dtype)
        X64 = jax.jit(jax.vmap(roll))(x0s, U64)     # (B, nx, nroll+1)
        reps_h = -(-N // nroll)
        X = jnp.tile(X64[:, :, :nroll], (1, 1, reps_h))[:, :, :N]
        U = jnp.tile(U64, (1, 1, reps_h))[:, :, :N - 1]
        cstate = solver.cset.init_state(dtype=dtype)
        rho = jnp.asarray(solver.options.rho_init, dtype)

        @jax.jit
        def build(X, U):
            def one(Xb, Ub):
                blocks = solver.kkt.form_blocks(
                    Xb, Ub, Xb[:, 0], cost.default_params, cstate)
                S, gam, _, _ = solver.kkt._schur_blocks_split(blocks, rho)
                return S.diag, S.upper, gam
            return jax.vmap(one)(X, U)

        Sd_all, So_all, gam_all = build(X, U)

        for B in Bs:
            Sd, So, gam = Sd_all[:B], So_all[:B], gam_all[:B]

            def vsolve(solver_fn, sol_only=False):
                def f(Sd, So, gam):
                    out = jax.vmap(
                        lambda d, o, g: solver_fn(BlockTridiag(d, o), g)
                    )(Sd, So, gam)
                    return out[0] if sol_only else out
                return jax.jit(f)

            row = {"N": N, "B": B, "backend": backend}

            def attempt(label, fn, *args):
                # every cell independently fault-tolerant: the remote
                # compiler can fail on individual graph shapes (transient
                # HTTP drops, the B=512-class CHECK crashes) and one dead
                # cell must not kill the table
                try:
                    return timeit(fn, *args)
                except Exception as e:
                    row[label] = f"FAIL:{type(e).__name__}"
                    return None, None

            out, t = attempt("thomas_ms", vsolve(btd_block_thomas),
                             Sd, So, gam)
            lam_t = out
            if t is not None:
                row["thomas_ms"] = round(t * 1e3, 3)

            out, t = attempt("cr_ms", vsolve(btd_cyclic_reduction),
                             Sd, So, gam)
            lam_c = out
            if t is not None:
                row["cr_ms"] = round(t * 1e3, 3)

            def cr_refine(S, g):
                lam = btd_cyclic_reduction(S, g)
                r = g - btd_matvec(S, lam)
                return lam + btd_cyclic_reduction(S, r)

            out, t = attempt("cr_refine_ms", vsolve(cr_refine), Sd, So, gam)
            lam_r = out
            if t is not None:
                row["cr_refine_ms"] = round(t * 1e3, 3)

            def pcg_ss(S, g):
                Pinv = preconditioner(S, "SS")
                res = pcg(S, g, Pinv, exit_tolerance=pcg_tol,
                          max_iter=pcg_iters, relative=True)
                return res.x, res.iters

            out, t = attempt("pcg_ss_ms", vsolve(pcg_ss, sol_only=True),
                             Sd, So, gam)
            if t is not None:
                row["pcg_ss_ms"] = round(t * 1e3, 3)
                iters_p = jax.jit(vsolve(pcg_ss))(Sd, So, gam)[1]
                row["pcg_iters_max"] = int(np.max(np.asarray(iters_p)))

            if backend == "tpu":
                from trajoptmpcreference_tpu.ops.pallas_pcg import (
                    make_batched_pcg,
                )
                bs = Sd.shape[-1]
                fp = make_batched_pcg(N, bs, precond="SS", tol=pcg_tol,
                                      max_iter=pcg_iters, relative=True)

                @jax.jit
                def fused_sol(Sd, So, gam):
                    return jax.vmap(lambda d, o, g: fp(
                        BlockTridiag(d, o), g, jnp.zeros_like(g))[0])(
                        Sd, So, gam)

                try:
                    _, t = timeit(fused_sol, Sd, So, gam)
                    row["fused_pcg_ms"] = round(t * 1e3, 3)
                    it_f = jax.jit(lambda Sd, So, gam: jax.vmap(
                        lambda d, o, g: fp(BlockTridiag(d, o), g,
                                           jnp.zeros_like(g))[1])(
                        Sd, So, gam))(Sd, So, gam)
                    row["fused_iters_max"] = int(np.max(np.asarray(it_f)))
                except Exception as e:  # compile/VMEM limits at huge N
                    row["fused_pcg_ms"] = f"FAIL: {type(e).__name__}"

            # quality: relative true residual of each exact path (batch max)
            def rres(lam):
                if lam is None:
                    return float("nan")
                r = jax.vmap(lambda d, o, g, l: jnp.linalg.norm(
                    g - btd_matvec(BlockTridiag(d, o), l))
                    / jnp.linalg.norm(g))(Sd, So, gam, lam)
                return float(jnp.max(r))

            row["thomas_rres"] = round(rres(lam_t), 6)
            row["cr_rres"] = round(rres(lam_c), 6)
            row["cr_refine_rres"] = round(rres(lam_r), 6)
            rows.append(row)
            print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"horizon_scaling_{backend}.md")
    with open(out, "w") as f:
        f.write(f"# Horizon scaling, single chip ({backend}), flagship "
                "Schur solves (f32)\n\n"
                "Conditioning regime: blocks built at a bounded random-"
                "torque rollout — cold-start-like, kappa(f32) ~ 1e7-1e9 "
                "(the dryrun's documented regime), so the rres columns "
                "show the f32 quality frontier (Thomas orders of "
                "magnitude tighter than CR; same-precision refinement "
                "AMPLIFIES at kappa*eps >= 1).  Latency = per-solve "
                "chain-slope (K dependent solves in one jit; isolated "
                "calls measure the ~30 ms axon dispatch floor), median "
                "over reps.  rres = batch-max relative true residual "
                "|S lam - gamma| / |gamma|.\n\n")
        f.write("| N | B | thomas ms | cr ms | cr_refine ms | PCG-SS ms "
                "(iters) | fused PCG ms (iters) | thomas rres | cr rres | "
                "cr_refine rres |\n|---|---|---|---|---|---|---|---|---|"
                "---|\n")
        for r in rows:
            fused = r.get("fused_pcg_ms", "n/a")
            fit = r.get("fused_iters_max", "")
            f.write(f"| {r['N']} | {r['B']} | {r.get('thomas_ms')} | "
                    f"{r.get('cr_ms')} | {r.get('cr_refine_ms')} | "
                    f"{r.get('pcg_ss_ms')} ({r.get('pcg_iters_max')}) | "
                    f"{fused} ({fit}) | {r['thomas_rres']} | "
                    f"{r['cr_rres']} | {r['cr_refine_rres']} |\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
