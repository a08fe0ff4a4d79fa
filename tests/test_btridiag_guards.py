"""PCG NaN guards: warm-starting at the exact solution must return it
unchanged (zero iterations), not divide 0/0 (found as NaN blowup in
300-step f32 MPC episodes)."""

import jax.numpy as jnp
import numpy as np
import pytest

from trajoptmpcreference_tpu.ops.btridiag import (
    BlockTridiag,
    btd_solve_dense,
    pcg,
    preconditioner,
)


pytestmark = pytest.mark.slow  # full-solver integration: jit-compiles whole SQP/MPC loops

def test_exact_warm_start_no_nan():
    rng = np.random.default_rng(0)
    N, bs = 6, 3
    diag = rng.standard_normal((N, bs, bs))
    diag = diag @ diag.transpose(0, 2, 1) + 4.0 * bs * np.eye(bs)
    A = BlockTridiag(jnp.asarray(diag),
                     jnp.asarray(0.2 * rng.standard_normal((N - 1, bs, bs))))
    b = jnp.asarray(rng.standard_normal((N, bs)))
    x_star = btd_solve_dense(A, b)
    res = pcg(A, b, preconditioner(A, "SS"), guess=x_star,
              exit_tolerance=1e-8, max_iter=50)
    assert np.isfinite(np.asarray(res.x)).all()
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_star),
                               atol=1e-10)
    assert int(res.iters) == 0


def test_schur_diag_exactly_symmetric_f32():
    """kkt.schur_blocks must return EXACTLY symmetric diagonal blocks in
    f32 (regression: the raw E invG E^T / F invG F^T products leave ~1e-4
    relative asymmetry, so the packed-symmetric Pallas PCG silently solved
    a different operator than the XLA path — CG assumes symmetry, make it
    explicit for every linear path)."""
    import jax
    import numpy as np2

    from trajoptmpcreference_tpu import URDFPlant, UrdfCost, make_sqp, serial_arm

    plant = URDFPlant(robot=serial_arm(6))
    N = 16
    cost = UrdfCost(plant,
                    jnp.eye(6, dtype=jnp.float32),        # task-space Q
                    100.0 * jnp.eye(6, dtype=jnp.float32),
                    0.01 * jnp.eye(6, dtype=jnp.float32),
                    jnp.asarray([3.0, 2.0, 0, 0, 0, 0], jnp.float32))
    solver = make_sqp(plant, cost, None, N, 0.015, method="PCG-SS")
    kkt = solver.kkt
    rng = np2.random.default_rng(0)
    x0 = jnp.asarray(0.1 * rng.standard_normal(plant.nx), jnp.float32)
    X = jnp.tile(x0[:, None], (1, N))
    U = jnp.asarray(0.01 * rng.standard_normal((plant.nu, N - 1)),
                    jnp.float32)
    blocks = kkt.form_blocks(X, U, x0, cost.default_params,
                             solver.cset.init_state(dtype=jnp.float32))
    S, gam, invG, E, F = jax.jit(kkt.schur_blocks)(
        blocks, jnp.asarray(1e-3, jnp.float32))
    asym = float(jnp.max(jnp.abs(S.diag - jnp.swapaxes(S.diag, 1, 2))))
    assert asym == 0.0, asym


def test_sqp_exact_schur_cr_matches_thomas():
    """Full SQP solves with method 'S' agree between the two exact Schur
    solvers (cyclic reduction vs block-Thomas) on the flagship-shaped
    problem — same controls, same exit code."""
    import jax
    import numpy as np2

    from trajoptmpcreference_tpu import URDFPlant, UrdfCost, make_sqp, serial_arm
    from trajoptmpcreference_tpu.solvers.sqp import SQPOptions

    plant = URDFPlant(robot=serial_arm(6))
    N = 12
    cost = UrdfCost(plant,
                    jnp.eye(6),
                    100.0 * jnp.eye(6),
                    0.01 * jnp.eye(6),
                    jnp.asarray([3.0, 2.0, 0, 0, 0, 0.0]))
    opts = SQPOptions(max_iter=6, expected_reduction_min=-100.0)
    rng = np2.random.default_rng(3)
    x0 = jnp.asarray(0.1 * rng.standard_normal(plant.nx))
    X = jnp.tile(x0[:, None], (1, N))
    U = jnp.zeros((plant.nu, N - 1))
    res = {}
    for es in ("thomas", "cr"):
        s = make_sqp(plant, cost, None, N, 0.015, method="S",
                     options=opts, exact_schur=es)
        res[es] = jax.jit(s.solve)(X, U)
    # both solvers are exact to ~1e-12 at the linear level; the full-solve
    # tolerance absorbs roundoff amplified through 6 SQP iterations
    np2.testing.assert_allclose(np2.asarray(res["cr"].U),
                                np2.asarray(res["thomas"].U),
                                rtol=0, atol=1e-6)
    assert int(res["cr"].exit_sqp) == int(res["thomas"].exit_sqp)
