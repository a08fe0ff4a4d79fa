"""Fused Pallas PCG vs the XLA block-tridiagonal solver (interpreter mode
on CPU; the compiled path is exercised by bench.py on real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajoptmpcreference_tpu.ops.btridiag import (
    BlockTridiag,
    btd_solve_dense,
    pcg,
    preconditioner,
)
from trajoptmpcreference_tpu.ops.pallas_pcg import make_batched_pcg


pytestmark = pytest.mark.slow  # full-solver integration: jit-compiles whole SQP/MPC loops

def _random_spd_btd(N, bs, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    diag = rng.standard_normal((N, bs, bs))
    diag = diag @ diag.transpose(0, 2, 1) + 4.0 * bs * np.eye(bs)
    upper = 0.3 * rng.standard_normal((N - 1, bs, bs))
    return BlockTridiag(jnp.asarray(diag, dtype), jnp.asarray(upper, dtype))


@pytest.mark.parametrize("precond", ["BJ", "SS"])
def test_matches_reference_pcg(precond):
    N, bs = 8, 4
    A = _random_spd_btd(N, bs, seed=1)
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal((N, bs)), jnp.float32)
    guess = jnp.zeros_like(b)
    solve = make_batched_pcg(N, bs, precond=precond, tol=1e-8, max_iter=100,
                             interpret=True)
    x, iters = solve(A, b, guess)
    ref = pcg(A, b, preconditioner(A, precond), exit_tolerance=1e-8,
              max_iter=100)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x), atol=1e-4)
    x_exact = btd_solve_dense(A, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_exact), atol=1e-3)


def test_vmap_folds_into_lanes():
    N, bs, B = 8, 4, 4
    solve = make_batched_pcg(N, bs, precond="BJ", tol=1e-8, max_iter=100,
                             block_b=2, interpret=True)
    As = [_random_spd_btd(N, bs, seed=10 + i) for i in range(B)]
    diag = jnp.stack([A.diag for A in As])
    upper = jnp.stack([A.upper for A in As])
    rng = np.random.default_rng(3)
    bvec = jnp.asarray(rng.standard_normal((B, N, bs)), jnp.float32)
    guess = jnp.zeros_like(bvec)

    xs, its = jax.vmap(lambda d, u, bb, g: solve(BlockTridiag(d, u), bb, g))(
        diag, upper, bvec, guess)
    for i in range(B):
        x_exact = btd_solve_dense(As[i], bvec[i])
        np.testing.assert_allclose(np.asarray(xs[i]), np.asarray(x_exact),
                                   atol=1e-3)


def test_warm_start_converges_faster():
    N, bs = 8, 4
    A = _random_spd_btd(N, bs, seed=5)
    b = jnp.asarray(np.random.default_rng(6).standard_normal((N, bs)),
                    jnp.float32)
    solve = make_batched_pcg(N, bs, precond="SS", tol=1e-6, max_iter=100,
                             interpret=True)
    x_cold, it_cold = solve(A, b, jnp.zeros_like(b))
    x_warm, it_warm = solve(A, b, x_cold)
    assert int(it_warm) < int(it_cold)
    assert int(it_warm) <= 1


def test_sqp_solve_with_pallas_pcg_matches_xla():
    """Full SQP solve routed through the fused Pallas PCG
    (make_sqp(use_pallas_pcg=True), interpreter off-TPU) vs the XLA
    btridiag path: same exit, same controls to f32 tolerance."""
    from trajoptmpcreference_tpu import (
        SQPOptions,
        URDFPlant,
        UrdfCost,
        make_sqp,
        serial_arm,
    )

    plant = URDFPlant(robot=serial_arm(2))
    N = 16
    cost = UrdfCost(plant, jnp.eye(4), 100.0 * jnp.eye(4), 0.1 * jnp.eye(2),
                    jnp.array([0.5, 1.5, 0.0, 0.0]))
    opts = SQPOptions(expected_reduction_min=-100.0, max_iter=12,
                      exit_tolerance_linSys=1e-10, max_iter_linSys=60)
    base = make_sqp(plant, cost, None, N, 0.05, method="PCG-SS",
                    options=opts)
    fused = make_sqp(plant, cost, None, N, 0.05, method="PCG-SS",
                     options=opts, use_pallas_pcg=True)
    x0 = jnp.zeros((4, N))
    u0 = jnp.zeros((2, N - 1))
    rb = jax.jit(base.solve)(x0, u0)
    rf = jax.jit(fused.solve)(x0, u0)
    assert int(rf.exit_sqp) == int(rb.exit_sqp)
    np.testing.assert_allclose(np.asarray(rf.U), np.asarray(rb.U),
                               atol=1e-5)
