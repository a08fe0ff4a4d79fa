"""Per-iteration solver internals for one SQP solve — the analogue of the
reference's `specific_variables.ipynb` / `variables_analysis.ipynb` (which
plot the saved G/invG/Pinv/gradient/Hessian tensors per iteration,
ref: analysis/*.ipynb; saved-tensor lists at exampleHelpers.py:136-154).

Prints the per-iteration trace table (J, violation, merit, alpha, rho,
directional derivative, reduction ratio, PCG inner iterations, accepted)
from utils.trace.solve_traced — the same body the solver runs, so it
cannot drift — and saves the final-iterate KKT internals (blocks H/g/A/B,
Schur diagonal/off-diagonal, SS preconditioner diagonal) to an .npz for
offline inspection.

Run:  JAX_PLATFORMS=cpu python analysis/iteration_variables.py [out.npz]
"""

import sys

import numpy as np

import _path  # noqa: F401


def main(out="iteration_variables.npz"):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from trajoptmpcreference_tpu import (
        SQPOptions,
        URDFPlant,
        UrdfCost,
        make_sqp,
        serial_arm,
    )
    from trajoptmpcreference_tpu.ops.btridiag import preconditioner
    from trajoptmpcreference_tpu.utils.trace import solve_traced

    # the reference's working example config (twolinks.py): arm2, N=10
    plant = URDFPlant(robot=serial_arm(2))
    N, dt = 10, 0.1
    cost = UrdfCost(plant, jnp.eye(4), 100.0 * jnp.eye(4), 0.1 * jnp.eye(2),
                    jnp.array([0.5, 1.5, 0.0, 0.0]))
    opts = SQPOptions(expected_reduction_min=-100.0, max_iter=20)
    solver = make_sqp(plant, cost, None, N, dt, method="PCG-SS",
                      options=opts)

    x0 = jnp.zeros((plant.nx, N))
    u0 = jnp.zeros((plant.nu, N - 1))
    X, U, tr = solve_traced(solver, x0, u0)

    n_it = int(np.sum(np.asarray(tr.live)))
    print(f"exit={int(tr.exit_code)} after {n_it} iterations")
    print(f"{'it':>3} {'J':>12} {'viol':>10} {'merit':>12} {'alpha':>7} "
          f"{'rho':>9} {'D':>11} {'ratio':>8} {'pcg':>4} {'ok':>3}")
    for i in range(n_it):
        print(f"{i:>3} {float(tr.J[i]):>12.6f} {float(tr.c[i]):>10.2e} "
              f"{float(tr.merit[i]):>12.6f} {float(tr.alpha[i]):>7.4f} "
              f"{float(tr.rho[i]):>9.2e} {float(tr.D[i]):>11.4e} "
              f"{float(tr.reduction_ratio[i]):>8.4f} "
              f"{int(tr.pcg_iters[i]):>4} {str(bool(tr.accepted[i])):>3}")

    # final-iterate KKT internals (the tensors the reference pickles)
    kkt = solver.kkt
    cstate = solver.cset.init_state(dtype=x0.dtype)
    blocks = kkt.form_blocks(X, U, x0[:, 0], cost.default_params, cstate)
    S, gam, invG, E, F = kkt.schur_blocks(blocks, jnp.asarray(1e-3))
    Pinv = preconditioner(S, "SS")
    np.savez(out,
             trace_J=np.asarray(tr.J), trace_c=np.asarray(tr.c),
             trace_merit=np.asarray(tr.merit),
             trace_alpha=np.asarray(tr.alpha),
             trace_rho=np.asarray(tr.rho), trace_D=np.asarray(tr.D),
             trace_ratio=np.asarray(tr.reduction_ratio),
             trace_pcg_iters=np.asarray(tr.pcg_iters),
             H=np.asarray(blocks.H), g=np.asarray(blocks.g),
             A=np.asarray(blocks.A), B=np.asarray(blocks.B),
             defect=np.asarray(blocks.defect),
             invG=np.asarray(invG),
             S_diag=np.asarray(S.diag), S_upper=np.asarray(S.upper),
             gamma=np.asarray(gam),
             Pinv_diag=np.asarray(Pinv.diag),
             Pinv_upper=np.asarray(Pinv.upper),
             X=np.asarray(X), U=np.asarray(U))
    print(f"saved final-iterate KKT internals -> {out}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
