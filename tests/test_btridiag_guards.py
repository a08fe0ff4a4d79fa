"""PCG NaN guards: warm-starting at the exact solution must return it
unchanged (zero iterations), not divide 0/0 (found as NaN blowup in
300-step f32 MPC episodes)."""

import jax.numpy as jnp
import numpy as np

from trajoptmpcreference_tpu.ops.btridiag import (
    BlockTridiag,
    btd_solve_dense,
    pcg,
    preconditioner,
)


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
