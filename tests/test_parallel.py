"""Distributed-layer tests on the 8-virtual-device CPU mesh.

The conftest forces XLA_FLAGS=--xla_force_host_platform_device_count=8, so
these exercise real shard_map/ppermute/psum lowering without TPU hardware
(the capability the reference lacks entirely — SURVEY.md §2.8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from trajoptmpcreference_tpu.models.plants import PendulumPlant
from trajoptmpcreference_tpu.ops.btridiag import (
    BlockTridiag,
    btd_matvec,
    btd_solve_dense,
    pcg,
    preconditioner,
)
from trajoptmpcreference_tpu.parallel import (
    batch_solve,
    make_mesh,
    shard_solve,
    sharded_btd_matvec,
    sharded_pcg,
)
from trajoptmpcreference_tpu.parallel.horizon import shard_btd
from trajoptmpcreference_tpu.solvers.costs import QuadraticCost
from trajoptmpcreference_tpu.solvers.sqp import make_sqp


pytestmark = pytest.mark.slow  # full-solver integration: jit-compiles whole SQP/MPC loops

def _random_spd_btd(N, bs, seed=0):
    rng = np.random.default_rng(seed)
    diag = rng.standard_normal((N, bs, bs))
    diag = diag @ diag.transpose(0, 2, 1) + 4.0 * bs * np.eye(bs)
    upper = 0.3 * rng.standard_normal((N - 1, bs, bs))
    return BlockTridiag(jnp.asarray(diag), jnp.asarray(upper))


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh((8,), ("horizon",))


def test_sharded_matvec_matches_dense(mesh8):
    N, bs = 16, 4
    A = _random_spd_btd(N, bs)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((N, bs)))
    y_ref = btd_matvec(A, x)
    sh = shard_btd(A, 8)

    def f(diag, upper, uprev, xs):
        from trajoptmpcreference_tpu.parallel.horizon import ShardedBTD
        return sharded_btd_matvec(ShardedBTD(diag, upper, uprev), xs, "horizon")

    spec = P("horizon")
    y = jax.jit(jax.shard_map(
        f, mesh=mesh8, in_specs=(spec, spec, spec, spec), out_specs=spec,
        check_vma=False))(sh.diag, sh.upper, sh.upper_prev, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-12)


@pytest.mark.parametrize("precond", ["0", "J", "BJ", "SS"])
def test_sharded_pcg_matches_single_device(mesh8, precond):
    N, bs = 16, 4
    A = _random_spd_btd(N, bs, seed=3)
    b = jnp.asarray(np.random.default_rng(4).standard_normal((N, bs)))
    # single-device result
    res1 = pcg(A, b, preconditioner(A, precond), exit_tolerance=1e-10,
               max_iter=200)
    x_exact = btd_solve_dense(A, b)
    sh = shard_btd(A, 8)

    def f(diag, upper, uprev, bs_):
        from trajoptmpcreference_tpu.parallel.horizon import ShardedBTD
        r = sharded_pcg(ShardedBTD(diag, upper, uprev), bs_, "horizon",
                        precond=precond, exit_tolerance=1e-10, max_iter=200)
        return r.x, jnp.broadcast_to(r.iters, (2,))

    spec = P("horizon")
    x, iters = jax.jit(jax.shard_map(
        f, mesh=mesh8, in_specs=(spec, spec, spec, spec),
        out_specs=(spec, spec), check_vma=False))(
            sh.diag, sh.upper, sh.upper_prev, b)
    x = np.asarray(x)
    np.testing.assert_allclose(x, np.asarray(x_exact), atol=1e-6)
    # same iterates up to psum reduction-order roundoff near the threshold
    assert abs(int(np.asarray(iters)[0]) - int(res1.iters)) <= 1


def test_batch_and_shard_solve():
    plant = PendulumPlant()
    N, dt = 12, 0.1
    cost = QuadraticCost(jnp.eye(2), 50.0 * jnp.eye(2), 0.1 * jnp.eye(1),
                         jnp.array([np.pi, 0.0]))
    solver = make_sqp(plant, cost, None, N, dt, method="S")
    B = 16
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(np.tile(rng.standard_normal((B, 2, 1)) * 0.1, (1, 1, N)))
    u0s = jnp.zeros((B, 1, N - 1))
    goals = jnp.asarray(
        np.tile(np.array([np.pi, 0.0]), (B, 1))
        + 0.1 * rng.standard_normal((B, 2)))
    cps = jax.vmap(lambda g: cost.default_params._replace(xg=g))(goals)

    res_v = jax.jit(batch_solve(solver))(x0s, u0s, cps)
    assert res_v.X.shape == (B, 2, N)

    mesh = make_mesh((8,), ("batch",))
    res_s = jax.jit(shard_solve(solver, mesh))(x0s, u0s, cps)
    np.testing.assert_allclose(np.asarray(res_s.U), np.asarray(res_v.U),
                               atol=1e-10)


def test_horizon_sharded_sqp_solve_matches_unsharded():
    """FULL SQP solve with the Schur/PCG phase horizon-sharded over an
    8-device mesh axis (kkt.solve_schur_sharded inside the solver loop, the
    reference's solveKKTSystem_Schur integration point,
    ref: TrajoptMPCReference.py:437-445) vs the single-device solver:
    controls must match to 1e-6."""
    from trajoptmpcreference_tpu.models.plants import URDFPlant
    from trajoptmpcreference_tpu.models.urdf import serial_arm
    from trajoptmpcreference_tpu.solvers.costs import UrdfCost
    from trajoptmpcreference_tpu.solvers.sqp import SQPOptions

    N, dt = 16, 0.05
    plant = URDFPlant(robot=serial_arm(2))
    cost = UrdfCost(plant, jnp.eye(4), 100.0 * jnp.eye(4), 0.1 * jnp.eye(2),
                    jnp.array([0.5, 1.5, 0.0, 0.0]))
    opts = SQPOptions(expected_reduction_min=-100.0, max_iter=12,
                      exit_tolerance_linSys=1e-10, max_iter_linSys=60)
    base = make_sqp(plant, cost, None, N, dt, method="PCG-SS", options=opts)
    mesh = make_mesh((8,), ("horizon",))
    sharded = make_sqp(plant, cost, None, N, dt, method="PCG-SS",
                       options=opts, mesh=mesh)

    x0 = jnp.zeros((4, N))
    u0 = jnp.zeros((2, N - 1))
    res_b = jax.jit(base.solve)(x0, u0)
    res_s = jax.jit(sharded.solve)(x0, u0)
    assert int(res_s.exit_sqp) == int(res_b.exit_sqp)
    assert int(res_s.sqp_iters) == int(res_b.sqp_iters)
    np.testing.assert_allclose(np.asarray(res_s.U), np.asarray(res_b.U),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(res_s.X), np.asarray(res_b.X),
                               atol=1e-6)


def test_horizon_sharded_solve_with_hard_constraints():
    """Sharded Schur path with active-set rows in the KKT (bs = nx + m)."""
    from trajoptmpcreference_tpu.models.plants import URDFPlant
    from trajoptmpcreference_tpu.models.urdf import serial_arm
    from trajoptmpcreference_tpu.solvers.constraints import ConstraintSet
    from trajoptmpcreference_tpu.solvers.costs import UrdfCost
    from trajoptmpcreference_tpu.solvers.sqp import SQPOptions

    N, dt = 16, 0.05
    plant = URDFPlant(robot=serial_arm(2))
    cost = UrdfCost(plant, jnp.eye(4), 100.0 * jnp.eye(4), 0.1 * jnp.eye(2),
                    jnp.array([0.5, 1.5, 0.0, 0.0]))
    cset = ConstraintSet(2, 2, 2, N).with_torque_limits(
        0.5, -0.5, "ACTIVE_SET")
    opts = SQPOptions(expected_reduction_min=-100.0, max_iter=10,
                      exit_tolerance_linSys=1e-10, max_iter_linSys=80)
    base = make_sqp(plant, cost, cset, N, dt, method="PCG-SS", options=opts)
    mesh = make_mesh((4,), ("horizon",))
    sharded = make_sqp(plant, cost, cset, N, dt, method="PCG-SS",
                       options=opts, mesh=mesh)
    x0 = jnp.zeros((4, N))
    u0 = jnp.zeros((2, N - 1))
    res_b = jax.jit(base.solve)(x0, u0)
    res_s = jax.jit(sharded.solve)(x0, u0)
    np.testing.assert_allclose(np.asarray(res_s.U), np.asarray(res_b.U),
                               atol=1e-6)


def test_sharded_exact_matches_thomas(mesh8):
    """SPIKE substructured direct solve (sharded_btd_exact) == the
    replicated block-Thomas on a random SPD block-tridiagonal system."""
    from trajoptmpcreference_tpu.ops.btridiag import btd_block_thomas
    from trajoptmpcreference_tpu.parallel.horizon import (
        ShardedBTD,
        sharded_btd_exact,
    )

    N, bs = 32, 4                       # L = 4 local rows per shard
    A = _random_spd_btd(N, bs)
    b = jnp.asarray(np.random.default_rng(5).standard_normal((N, bs)))
    x_ref = btd_block_thomas(A, b)
    sh = shard_btd(A, 8)

    def f(diag, upper, uprev, bl):
        return sharded_btd_exact(ShardedBTD(diag, upper, uprev), bl,
                                 "horizon")

    spec = P("horizon")
    x = jax.jit(jax.shard_map(
        f, mesh=mesh8, in_specs=(spec, spec, spec, spec), out_specs=spec,
        check_vma=False))(sh.diag, sh.upper, sh.upper_prev, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-9)


def test_sharded_exact_matches_thomas_f32(mesh8):
    """f32 parity of the SPIKE path on a WELL-conditioned SPD system —
    the flagship runs this solver in f32, where the ill-conditioned
    cold-start QPs only admit residual-based comparison; this test pins
    the solver itself (not the QP) so f32 regressions in
    sharded_btd_exact are caught directly (ADVICE r3)."""
    from trajoptmpcreference_tpu.ops.btridiag import btd_block_thomas
    from trajoptmpcreference_tpu.parallel.horizon import (
        ShardedBTD,
        sharded_btd_exact,
    )

    N, bs = 32, 4
    A64 = _random_spd_btd(N, bs)
    A = BlockTridiag(jnp.asarray(A64.diag, jnp.float32),
                     jnp.asarray(A64.upper, jnp.float32))
    b = jnp.asarray(np.random.default_rng(5).standard_normal((N, bs)),
                    jnp.float32)
    x_ref = btd_block_thomas(A, b)
    sh = shard_btd(A, 8)

    def f(diag, upper, uprev, bl):
        return sharded_btd_exact(ShardedBTD(diag, upper, uprev), bl,
                                 "horizon")

    spec = P("horizon")
    x = jax.jit(jax.shard_map(
        f, mesh=mesh8, in_specs=(spec, spec, spec, spec), out_specs=spec,
        check_vma=False))(sh.diag, sh.upper, sh.upper_prev, b)
    assert x.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               atol=5e-5, rtol=5e-5)


def test_horizon_sharded_exact_sqp_matches_unsharded():
    """FULL SQP solve with method 'S' horizon-sharded (the flagship's exact
    Schur method, solved by SPIKE substructuring across the mesh) vs the
    single-device exact solver."""
    from trajoptmpcreference_tpu.models.plants import URDFPlant
    from trajoptmpcreference_tpu.models.urdf import serial_arm
    from trajoptmpcreference_tpu.solvers.costs import UrdfCost
    from trajoptmpcreference_tpu.solvers.sqp import SQPOptions

    N, dt = 32, 0.05
    plant = URDFPlant(robot=serial_arm(2))
    cost = UrdfCost(plant, jnp.eye(4), 100.0 * jnp.eye(4), 0.1 * jnp.eye(2),
                    jnp.array([0.5, 1.5, 0.0, 0.0]))
    opts = SQPOptions(expected_reduction_min=-100.0, max_iter=12)
    base = make_sqp(plant, cost, None, N, dt, method="S", options=opts)
    mesh = make_mesh((8,), ("horizon",))
    sharded = make_sqp(plant, cost, None, N, dt, method="S",
                       options=opts, mesh=mesh)

    x0 = jnp.zeros((4, N))
    u0 = jnp.zeros((2, N - 1))
    res_b = jax.jit(base.solve)(x0, u0)
    res_s = jax.jit(sharded.solve)(x0, u0)
    assert int(res_s.exit_sqp) == int(res_b.exit_sqp)
    np.testing.assert_allclose(np.asarray(res_s.U), np.asarray(res_b.U),
                               atol=1e-8)

    # too few local rows for substructuring is a loud error
    with pytest.raises(ValueError, match="3 local block rows"):
        make_sqp(plant, cost, None, 16, dt, method="S", options=opts,
                 mesh=mesh)


@pytest.mark.slow
def test_solve_batch_invariance():
    """A scenario's solve must not depend on its batchmates.

    Under vmap a while_loop runs to the batch-MAX trip count; before
    round 5 the solver loop bodies kept iterating scenarios that had
    already exited (rho drift, active-set chatter, AL escalation), so
    the same scenario produced different results at different batch
    sizes (measured on the stacked-AS+AL flagship: which scenario
    diverges changed with the batch).  The freeze gates in
    sqp_round/solve must make batched and single solves bit-identical."""
    import numpy as np

    from trajoptmpcreference_tpu import (
        ConstraintSet, PendulumPlant, QuadraticCost, SQPOptions, make_sqp,
    )

    plant = PendulumPlant()
    N = 20
    cost = QuadraticCost(jnp.eye(2), 100.0 * jnp.eye(2), 0.1 * jnp.eye(1),
                         jnp.array([np.pi, 0.0]))
    cset = (ConstraintSet(1, 1, 1, N)
            .with_torque_limits([7.0], [-7.0], "ACTIVE_SET")
            .with_torque_limits([7.0], [-7.0], "AUGMENTED_LAGRANGIAN"))
    solver = make_sqp(plant, cost, cset, N, 0.1, method="S",
                      options=SQPOptions(expected_reduction_min=-100.0))
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(0.3 * rng.standard_normal((4, 2)))

    def one(x0):
        X0 = jnp.tile(x0[:, None], (1, N))
        return solver.solve(X0, jnp.zeros((1, N - 1), X0.dtype))

    batched = jax.jit(jax.vmap(one))(x0s)
    for i in range(4):
        single = jax.jit(one)(x0s[i])
        np.testing.assert_array_equal(np.asarray(batched.U[i]),
                                      np.asarray(single.U))
        assert int(batched.sqp_iters[i]) == int(single.sqp_iters)
        assert int(batched.outer_iters[i]) == int(single.outer_iters)
