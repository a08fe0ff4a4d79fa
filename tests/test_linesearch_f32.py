"""f32 line-search accuracy at large J (VERDICT round 1, item 1).

The failure mode: near convergence the merit improvement |delta_merit| is
many orders below J, and computing it as a subtraction of two separately
accumulated totals leaves no significant f32 bits — acceptance becomes
noise, rho escalates, the MPC loop destabilizes.  The fix is the
cancellation-safe per-stage difference path (Cost.stage_value_diff +
SQPSolver.total_cost_diff).  These tests pin that behavior:

* total_cost_diff matches an f64 oracle to ~1e-3 relative even when
  J ~ 1e6 and |dJ| ~ 1e-3 (the subtraction form has O(1) relative error
  there);
* line_search in f32 reaches the same accept/reject decision and step size
  as f64 on a near-converged large-J flagship-style problem;
* cost scaling s in {1, 1e-2, 1e-3} does not flip the f32 decision when
  tolerances are scaled along (exact-arithmetic scale equivalence).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajoptmpcreference_tpu import (
    SQPOptions,
    URDFPlant,
    UrdfCost,
    make_sqp,
    serial_arm,
)


pytestmark = pytest.mark.slow  # full-solver integration: jit-compiles whole SQP/MPC loops

def _problem(weight_scale=1.0, dtype=jnp.float64, N=16, max_iter=12):
    robot = serial_arm(6)
    plant = URDFPlant(robot=robot)
    nu = plant.nu
    s = weight_scale
    cost = UrdfCost(
        plant,
        s * jnp.diag(jnp.asarray([1.0, 1.0, 1.0, 0.1, 0.1, 0.1], dtype)),
        s * 100.0 * jnp.eye(6, dtype=dtype),
        s * 0.01 * jnp.eye(nu, dtype=dtype),
        jnp.asarray([3.0, 2.0, 0.0, 0.0, 0.0, 0.0], dtype),
    )
    opts = SQPOptions(expected_reduction_min=-100.0,
                      exit_tolerance=s * 1e-6,
                      max_iter=max_iter)
    solver = make_sqp(plant, cost, None, N, 0.015, method="S", options=opts)
    return plant, cost, solver


def _near_converged_point(solver, plant, dtype):
    """Run a short f64 solve, return (X, U) close to a solution."""
    nx, nu = plant.nx, plant.nu
    N = solver.N
    x0 = jnp.zeros((nx, N), jnp.float64)
    u0 = jnp.zeros((nu, N - 1), jnp.float64)
    res = jax.jit(solver.solve)(x0, u0)
    return res.X.astype(dtype), res.U.astype(dtype)


# amplify J so f32 totals have ~no bits left for small differences
WEIGHT = 1e4


@pytest.fixture(scope="module")
def wbase():
    """Shared heavy setup for the WEIGHT-scaled problem: both-precision
    solvers + ONE near-converged point (a full f64 solve) — the tests
    below only evaluate cheap functions at it."""
    _, _, sol64 = _problem(WEIGHT, jnp.float64)
    plant, _, sol32 = _problem(WEIGHT, jnp.float32)
    X64, U64 = _near_converged_point(sol64, plant, jnp.float64)
    return plant, sol64, sol32, X64, U64


@pytest.fixture(scope="module")
def ref1():
    """Scale-1 f64 reference + near-converged point + reference line
    search, shared by every scale-invariance parametrization."""
    plant, _, solver_ref = _problem(1.0, jnp.float64)
    X64, U64 = _near_converged_point(solver_ref, plant, jnp.float64)
    xs = X64[:, 0]
    p64 = solver_ref.cost.default_params
    guess = jnp.zeros((solver_ref.N, solver_ref.kkt.bs), jnp.float64)
    dxu, _, _, _ = solver_ref.solve_qp(X64, U64, xs, p64, (),
                                       jnp.asarray(1e-3), guess)
    J0 = solver_ref.total_cost(X64, U64, p64, ())
    c0 = solver_ref.total_violation(X64, U64, xs)
    mu = solver_ref.merit_weight(J0, c0)
    ls_ref = solver_ref.line_search(X64, U64, dxu, J0, c0, J0 + mu * c0,
                                    xs, p64, ())
    # ONE f32 solver reused at every scale: Q/QF/R live in the runtime
    # cost params, so scaling happens in the params, not the jit graph
    _, _, sol32 = _problem(1.0, jnp.float32)
    ls32_jit = jax.jit(sol32.line_search)
    tc32_jit = jax.jit(sol32.total_cost)
    tv32_jit = jax.jit(sol32.total_violation)
    return (X64, U64, xs, dxu, ls_ref, sol32, ls32_jit, tc32_jit, tv32_jit)


def test_total_cost_diff_f32_accuracy(wbase):
    plant, sol64, sol32, X64, U64 = wbase

    # perturb IN f32 (as the line search does), oracle-evaluate the exact
    # same f32 points upcast to f64 — isolates the accumulation error.
    # Single points are luck-sensitive (a naive subtraction can land close
    # by accident), so compare MEDIAN relative errors over an ensemble.
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    up = lambda a: jnp.asarray(a, jnp.float64)
    X32, U32 = f32(X64), f32(U64)
    p64 = sol64.cost.default_params
    p32 = sol32.cost.default_params
    J64 = float(sol64.total_cost(up(X32), up(U32), p64, ()))
    d32f = jax.jit(sol32.total_cost_diff)
    rels, rels_naive = [], []
    for seed in range(8):
        rng = np.random.default_rng(seed)
        # 1e-5..1e-4: the small-step line-search regime (alpha_min = 0.005
        # of a unit step); below ~1e-5 the residual difference itself
        # drowns in the f32 rounding of the kinematics chain
        eps = 1e-5 if seed % 2 else 1e-4
        Xc32 = X32 + f32(eps * rng.standard_normal(X64.shape))
        Uc32 = U32 + f32(eps * rng.standard_normal(U64.shape))
        d64 = float(sol64.total_cost_diff(
            up(X32), up(U32), up(Xc32), up(Uc32), p64, ()))
        # it IS the hard regime: >= 3 decimal orders below J, so f32
        # totals (~7 digits) keep <= 4 significant digits of the diff
        assert abs(d64) < 1e-3 * abs(J64)
        d32 = float(d32f(X32, U32, Xc32, Uc32, p32, ()))
        rels.append(abs(d32 - d64) / abs(d64))
    med = np.median(rels)
    # The diff path must stay usable (>= 2 significant digits) in this
    # regime.  NB: for UrdfCost the terminal residual dominates J, and its
    # f32 kinematics rounding hits diff and naive paths alike, so a
    # diff-vs-naive separation is NOT asserted here — that guarantee is
    # structural for stage-spread quadratic costs and is pinned in
    # test_quadratic_cost_diff_beats_subtraction below.
    assert med < 2e-2, (rels, med)


def test_quadratic_cost_diff_beats_subtraction():
    """For a stage-spread quadratic cost, the residual-form difference is
    provably cancellation-free (0.5 (rc-r)'Q(rc+r): the subtraction happens
    between O(step)-magnitude quantities) while subtracting two f32 totals
    carries ULP(J)-level noise.  Median over an ensemble must show a wide
    separation — this is the structural claim behind
    SQPSolver.total_cost_diff."""
    from trajoptmpcreference_tpu.solvers.costs import QuadraticCost

    nx, nu, N = 12, 6, 64
    W = 1e4
    cost64 = QuadraticCost(W * jnp.eye(nx, dtype=jnp.float64),
                           W * jnp.eye(nx, dtype=jnp.float64),
                           W * 0.1 * jnp.eye(nu, dtype=jnp.float64),
                           jnp.ones(nx, dtype=jnp.float64))
    cost32 = QuadraticCost(W * jnp.eye(nx, dtype=jnp.float32),
                           W * jnp.eye(nx, dtype=jnp.float32),
                           W * 0.1 * jnp.eye(nu, dtype=jnp.float32),
                           jnp.ones(nx, dtype=jnp.float32))

    def total(cost, p, X, U):
        J = sum(float(cost.stage_value(p, X[:, k], U[:, k], k))
                for k in range(N - 1))
        return J + float(cost.term_value(p, X[:, -1], N - 1))

    def total_diff(cost, p, X, U, Xc, Uc):
        d = sum(float(cost.stage_value_diff(p, X[:, k], U[:, k],
                                            Xc[:, k], Uc[:, k], k))
                for k in range(N - 1))
        return d + float(cost.term_value_diff(p, X[:, -1], Xc[:, -1], N - 1))

    rels, rels_naive = [], []
    for seed in range(6):
        rng = np.random.default_rng(seed)
        X = jnp.asarray(rng.standard_normal((nx, N)), jnp.float32)
        U = jnp.asarray(rng.standard_normal((nu, N - 1)), jnp.float32)
        Xc = X + jnp.asarray(1e-4 * rng.standard_normal((nx, N)), jnp.float32)
        Uc = U + jnp.asarray(1e-4 * rng.standard_normal((nu, N - 1)), jnp.float32)
        up = lambda a: jnp.asarray(a, jnp.float64)
        p64 = cost64.default_params
        p32 = cost32.default_params
        d64 = total_diff(cost64, p64, up(X), up(U), up(Xc), up(Uc))
        J64 = total(cost64, p64, up(X), up(U))
        assert abs(d64) < 1e-3 * abs(J64)     # the hard regime
        d32 = total_diff(cost32, p32, X, U, Xc, Uc)
        d32_naive = total(cost32, p32, Xc, Uc) - total(cost32, p32, X, U)
        rels.append(abs(d32 - d64) / abs(d64))
        rels_naive.append(abs(d32_naive - d64) / abs(d64))
    med, med_naive = np.median(rels), np.median(rels_naive)
    assert med < 1e-3, (rels, med)
    assert med_naive > 10 * med, (rels_naive, rels)


def test_line_search_f32_matches_f64_decision(wbase):
    plant, sol64, sol32, X64, U64 = wbase
    xs64 = X64[:, 0]
    p64 = sol64.cost.default_params

    J0 = sol64.total_cost(X64, U64, p64, ())
    c0 = sol64.total_violation(X64, U64, xs64)
    mu = sol64.merit_weight(J0, c0)
    merit0 = J0 + mu * c0
    guess = jnp.zeros((sol64.N, sol64.kkt.bs), jnp.float64)
    dxu, _, _, _ = sol64.solve_qp(X64, U64, xs64, p64, (),
                                  jnp.asarray(1e-3), guess)
    ls64 = sol64.line_search(X64, U64, dxu, J0, c0, merit0, xs64, p64, ())

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    p32 = sol32.cost.default_params
    J0_32 = sol32.total_cost(f32(X64), f32(U64), p32, ())
    c0_32 = sol32.total_violation(f32(X64), f32(U64), f32(xs64))
    mu32 = sol32.merit_weight(J0_32, c0_32)
    ls32 = jax.jit(sol32.line_search)(
        f32(X64), f32(U64), f32(dxu), J0_32, c0_32,
        J0_32 + mu32 * c0_32, f32(xs64), p32, ())

    assert bool(ls32.accepted) == bool(ls64.accepted)
    assert float(ls32.alpha) == pytest.approx(float(ls64.alpha))
    # the merit change itself must carry signal, not noise
    assert float(ls32.dJ) == pytest.approx(float(ls64.dJ), rel=2e-2, abs=1e-8)


@pytest.mark.parametrize("scale", [1.0, 1e-2, 1e-3])
def test_line_search_f32_scale_invariance(scale, ref1):
    """Cost scaling (Q,R,tol all x s) must not flip the f32 decision —
    round 1 found the subtraction-form line search rejecting every step at
    s = 1e-3 (zero-control drift misread as stability).  The scaling
    enters through the RUNTIME cost params (Q/QF/R), so all three
    parametrizations share one compiled f32 line search."""
    (X64, U64, xs, dxu, ls_ref, sol32, ls32_jit, tc32_jit,
     tv32_jit) = ref1

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    p1 = sol32.cost.default_params
    ps = p1._replace(Q=p1.Q * scale, QF=p1.QF * scale, R=p1.R * scale)
    J0s = tc32_jit(f32(X64), f32(U64), ps, ())
    c0s = tv32_jit(f32(X64), f32(U64), f32(xs))
    # scale-equivalent merit weight: mu scales with J so mu*c keeps its
    # relative weight (the constant mu=10 is NOT scale equivalent; pass
    # the scaled weight explicitly to test arithmetic, not semantics)
    mus = jnp.asarray(10.0 * scale, jnp.float32)
    ls_s = ls32_jit(
        f32(X64), f32(U64), f32(dxu), J0s, c0s, J0s + mus * c0s,
        f32(xs), ps, (), mu=mus)

    assert bool(ls_s.accepted) == bool(ls_ref.accepted), scale
    assert float(ls_s.alpha) == pytest.approx(float(ls_ref.alpha)), scale
    assert float(ls_s.dJ) == pytest.approx(scale * float(ls_ref.dJ),
                                           rel=5e-2, abs=1e-10), scale


def test_parallel_line_search_matches_sequential():
    """The one-pass alpha-ladder line search selects the same alpha,
    iterate, and ls_iter as the reference's sequential loop, for both an
    accepting and a rejecting search."""
    import dataclasses

    import jax
    import numpy as np2

    from trajoptmpcreference_tpu import URDFPlant, UrdfCost, make_sqp, serial_arm
    from trajoptmpcreference_tpu.solvers.sqp import SQPOptions

    plant = URDFPlant(robot=serial_arm(3))
    N = 8
    cost = UrdfCost(plant, jnp.eye(6), 50.0 * jnp.eye(6),
                    0.01 * jnp.eye(3),
                    jnp.asarray([1.0, 1.5, 0, 0, 0, 0.0]))
    rng = np2.random.default_rng(5)
    x0 = jnp.asarray(0.2 * rng.standard_normal(plant.nx))
    X = jnp.tile(x0[:, None], (1, N))
    U = jnp.asarray(0.1 * rng.standard_normal((plant.nu, N - 1)))

    # the QP step and base metrics don't depend on the acceptance gate —
    # build them ONCE (jitted) and share across both gate settings
    base = make_sqp(plant, cost, None, N, 0.05, method="S",
                    options=SQPOptions())
    xs = X[:, 0]
    cp = cost.default_params
    cstate = base.cset.init_state(dtype=X.dtype)

    @jax.jit
    def setup_step(X, U):
        blocks = base.kkt.form_blocks(X, U, xs, cp, cstate)
        dxu, _, _ = base.kkt.solve_schur(blocks, 1e-3)
        J, c = base.base_metrics(X, U, xs, cp, cstate)
        return dxu, J, c

    dxu, J, c = setup_step(X, U)
    for reduction_min in (0.05, -100.0):   # strict gate rejects more alphas
        opts = SQPOptions(expected_reduction_min=reduction_min)
        seq = make_sqp(plant, cost, None, N, 0.05, method="S", options=opts)
        par = make_sqp(plant, cost, None, N, 0.05, method="S",
                       options=dataclasses.replace(
                           opts, parallel_line_search=True))
        mu = seq.merit_weight(J, c)
        merit = J + mu * c
        a = jax.jit(seq.line_search)(X, U, dxu, J, c, merit, xs, cp, cstate)
        b = jax.jit(par.line_search)(X, U, dxu, J, c, merit, xs, cp, cstate)
        assert float(a.alpha) == float(b.alpha), reduction_min
        assert bool(a.accepted) == bool(b.accepted)
        assert int(a.ls_iter) == int(b.ls_iter)
        np2.testing.assert_allclose(np2.asarray(b.Xc), np2.asarray(a.Xc),
                                    rtol=0, atol=1e-12)
        np2.testing.assert_allclose(float(b.merit_new), float(a.merit_new),
                                    rtol=1e-12)

    # full solves agree end-to-end
    r_seq = jax.jit(seq.solve)(X, U)
    r_par = jax.jit(par.solve)(X, U)
    np2.testing.assert_allclose(np2.asarray(r_par.U), np2.asarray(r_seq.U),
                                rtol=0, atol=1e-9)
    assert int(r_par.exit_sqp) == int(r_seq.exit_sqp)
