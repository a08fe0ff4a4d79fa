"""Batched block-tridiagonal operators, preconditioners, and PCG.

The reference materializes the Schur complement S as one dense
(N*bs, N*bs) matrix and runs dense matvecs inside PCG (ref:
GBD-PCG-Python/PCG.py:66-212, TrajoptMPCReference.py:417-445).  Here S lives
as its blocks:

  diag: (N, bs, bs)   off-diag (upper): (N-1, bs, bs), lower = transpose

so the PCG matvec is three batched (N, bs, bs) @ (N, bs) contractions — the
shape XLA tiles onto the MXU — and the preconditioners are batched small
inverses.  Preconditioner semantics match the reference exactly:
'0' identity, 'J' Jacobi, 'BJ' block-Jacobi (ref: PCG.py:168-179),
'SS' symmetric stair (ref: PCG.py:181-212, the MPCGPU parallel-friendly
stair inverse).

All functions are single-system; vmap for scenario batches.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

# Force the Gauss-Jordan path on CPU too (tests exercise the TPU codepath
# without a chip; see tests/test_btridiag_guards.py).
_FORCE_GJ = os.environ.get("TMR_FORCE_GJ", "0") == "1"


def _bmv(A, x):
    """Batched block matvec [..., i, j] @ [..., j] via broadcast-sum.

    Written as multiply+reduce (not einsum/dot_general) so XLA lowers to
    fused VPU ops instead of per-block padded MXU matmuls — the small block
    sizes here (bs ~ 12-18) waste >90% of an MXU tile."""
    return jnp.sum(A * x[..., None, :], axis=-1)


def _bmv_T(A, x):
    """[..., j, i]^T @ [..., j] -> [..., i]."""
    return jnp.sum(A * x[..., :, None], axis=-2)


def _bmm(A, B):
    """[..., i, k] @ [..., k, j] via broadcast-sum."""
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


class BlockTridiag(NamedTuple):
    """Symmetric block-tridiagonal matrix.

    diag: (N, bs, bs); upper: (N-1, bs, bs) with A[k, k+1] = upper[k] and
    A[k+1, k] = upper[k]^T.
    """

    diag: jnp.ndarray
    upper: jnp.ndarray

    @property
    def nblocks(self) -> int:
        return self.diag.shape[0]

    @property
    def bs(self) -> int:
        return self.diag.shape[1]


def btd_matvec(A: BlockTridiag, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x with x as (N, bs)."""
    y = _bmv(A.diag, x)
    # upper: y_k += U_k x_{k+1}
    y = y.at[:-1].add(_bmv(A.upper, x[1:]))
    # lower: y_{k+1} += U_k^T x_k
    y = y.at[1:].add(_bmv_T(A.upper, x[:-1]))
    return y


def btd_dense(A: BlockTridiag) -> jnp.ndarray:
    """Materialize (for tests / dense fallback)."""
    N, bs = A.nblocks, A.bs
    M = jnp.zeros((N * bs, N * bs), dtype=A.diag.dtype)
    for k in range(N):
        M = M.at[k * bs:(k + 1) * bs, k * bs:(k + 1) * bs].set(A.diag[k])
    for k in range(N - 1):
        M = M.at[k * bs:(k + 1) * bs, (k + 1) * bs:(k + 2) * bs].set(A.upper[k])
        M = M.at[(k + 1) * bs:(k + 2) * bs, k * bs:(k + 1) * bs].set(A.upper[k].T)
    return M


def _inv_blocks(blocks, spd: bool = False):
    """Batched small-matrix inverse via solve (TPU-safe for f32/f64)."""
    bs = blocks.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(bs, dtype=blocks.dtype), blocks.shape)
    return _solve_batched(blocks, eye, spd=spd)


def _solve_batched(A, B, spd: bool = False):
    """Batched linear solve for small blocks.

    On TPU, XLA's batched LU (jnp.linalg.solve) is catastrophically slow for
    many small systems (~120 ms for 16k 18x18 solves on v5e) and f64 LU is
    unsupported; explicit Gauss-Jordan elimination lowers to fusible
    elementwise ops instead.  CPU keeps LAPACK.

    ``spd=True`` asserts the blocks are symmetric definite (positive OR
    negative — e.g. regularized cost Hessians, Schur-complement diagonal
    blocks and their cyclic-reduction / Thomas eliminations, which are
    symmetric quasi-definite with uniform-sign pivots per row group): the
    Gauss-Jordan elimination then pivots on the diagonal, dropping the
    per-step argmax + two take_along_axis gathers + two row-swap selects of
    partial pivoting — the dominant cost of the batched solve phase on TPU
    (diagonal elimination of symmetric quasi-definite systems is
    unconditionally factorizable; Vanderbei 1995)."""
    if jax.default_backend() == "tpu" or _FORCE_GJ:
        return _gauss_jordan_solve(A, B, diag_pivot=spd)
    return jnp.linalg.solve(A, B)


def _gauss_jordan_solve(A, B, diag_pivot: bool = False):
    """Vectorized Gauss-Jordan on the last two dims; partial pivoting by
    default, diagonal pivoting when the caller asserts definiteness."""
    n = A.shape[-1]
    M = jnp.concatenate([A, B], axis=-1)
    idx = jnp.arange(n)

    def body(i, M):
        if not diag_pivot:
            col = jnp.abs(M[..., :, i])
            col = jnp.where(idx >= i, col, -jnp.inf)
            p = jnp.argmax(col, axis=-1)
            rows = jnp.take_along_axis(M, p[..., None, None], axis=-2)
            Mi = jnp.take_along_axis(M, jnp.full_like(p, i)[..., None, None], axis=-2)
            M = jnp.where((idx == p[..., None])[..., None], jnp.broadcast_to(Mi, M.shape), M)
            M = jnp.where((idx == i)[..., None], jnp.broadcast_to(rows, M.shape), M)
        pivot_row = M[..., i, :] / M[..., i, i][..., None]
        factors = M[..., :, i]
        upd = M - factors[..., None] * pivot_row[..., None, :]
        upd = jnp.where((idx == i)[..., None], pivot_row[..., None, :], upd)
        return upd

    # NOTE (r3, measured): unrolling the pivot loop for the diag_pivot
    # path cuts the isolated CR-solve phase only 2.04 -> 1.84 ms but
    # balloons the full MPC graph's compile past the 28-min bench budget
    # — the fori_loop stays.
    M = jax.lax.fori_loop(0, n, body, M)
    return M[..., :, n:]


# ------------------------------------------------------------ preconditioners

def preconditioner(A: BlockTridiag, ptype: str) -> BlockTridiag:
    """Return Pinv as a block-tridiagonal operator (off blocks zero for
    '0'/'J'/'BJ')."""
    N, bs = A.nblocks, A.bs
    zero_off = jnp.zeros_like(A.upper)
    if ptype == "0":
        eye = jnp.broadcast_to(jnp.eye(bs, dtype=A.diag.dtype), A.diag.shape)
        return BlockTridiag(eye, zero_off)
    if ptype == "J":
        d = jnp.einsum("kii->ki", A.diag)
        Pd = jax.vmap(jnp.diag)(1.0 / d)
        return BlockTridiag(Pd, zero_off)
    if ptype == "BJ":
        return BlockTridiag(_inv_blocks(A.diag, spd=True), zero_off)
    if ptype == "SS":
        return _symmetric_stair(A)
    raise ValueError(
        "Invalid preconditioner; options are [0: none, J: Jacobi, "
        "BJ: Block-Jacobi, SS: Symmetric Stair] (ref: PCG.py:52-55)")


def _symmetric_stair(A: BlockTridiag) -> BlockTridiag:
    """Symmetric-stair preconditioner (ref: PCG.py:181-212).

    Stair inverse: diagonal blocks are inv(D_k); for odd k the left off-diag
    block is -inv(D_k) A[k,k-1] inv(D_{k-1}); then symmetrized by copying the
    odd blocks' off-diagonals to their transposes.  In block-tridiagonal
    storage the result has upper blocks only at even positions
    U[k] = -inv(D_k) A[k,k+1] inv(D_{k+1}) for even k (and zero at odd k),
    exactly reproducing the dense reference pattern.
    """
    N, bs = A.nblocks, A.bs
    Dinv = _inv_blocks(A.diag, spd=True)
    # Pinv upper block at position k (between blocks k and k+1):
    #   the reference sets, for odd j = k+1:
    #     Pinv[j, j-1] = -Dinv_j A[j, j-1] Dinv_{j-1}
    #   and symmetrize copies Pinv[j-1, j] = Pinv[j, j-1]^T
    #     = -Dinv_{j-1} A[j-1, j] Dinv_j          (A symmetric blocks)
    # so upper[k] = -Dinv_k A.upper[k] Dinv_{k+1} for even k, else:
    #   for odd j the symmetrize step also copies Pinv[j, j+1]^T to
    #   Pinv[j+1, j] where Pinv[j, j+1] came from the stair ("elif k > 0"
    #   branch) = -Dinv_j A[j, j+1] Dinv_{j+1}  -> same formula.
    # Net: every off-diagonal block pair gets -Dinv_k A_k,k+1 Dinv_{k+1};
    # the even/odd distinction only affects *which* copy is primary.
    U = -_bmm(_bmm(Dinv[:-1], A.upper), Dinv[1:])
    # Reference detail: with an odd number of blocks the final even block's
    # right off-diagonal is never produced by an odd row (no odd j = N), but
    # the "elif k > 0" branch fills Pinv[N-2, N-1] when N-1 is even... the
    # dense loops cover all pairs for every N >= 2, matching U above.
    return BlockTridiag(Dinv, U)


# ---------------------------------------------------------------------- PCG

class PCGResult(NamedTuple):
    x: jnp.ndarray            # (N, bs) solution
    iters: jnp.ndarray        # scalar int
    nu_trace: jnp.ndarray     # (max_iter+1,) |r^T Pinv r| history (0-padded)
    converged: jnp.ndarray    # bool
    # (max_iter+1,) TRUE residual |b - A x| history, recomputed from x per
    # iteration when trace_residual=True (the reference's dual trace,
    # ref: PCG.py:82-95 trace2) — None in the untraced hot path
    res_trace: Optional[jnp.ndarray] = None


def pcg(A: BlockTridiag, b: jnp.ndarray, Pinv: BlockTridiag,
        guess: Optional[jnp.ndarray] = None,
        exit_tolerance: float = 1e-6, max_iter: int = 100,
        relative: bool = False, trace_residual: bool = False) -> PCGResult:
    """Preconditioned conjugate gradient on a block-tridiagonal system.

    Loop semantics match the reference (ref: PCG.py:66-111): nu = r^T Pinv r,
    exit on |nu'| < tol, fixed max_iter bound, warm start via ``guess``
    (ref: PCG.py:33, the MPC warm-start hook).

    relative: exit on |nu'| < tol * |nu_0| instead of the reference's
    absolute test — scale-invariant, essential in f32 when residual norms
    range over many decades (an absolute 1e-4 exit produces garbage
    directions at |gamma| ~ 1e6 and the SQP line search wedges).

    trace_residual: also record the TRUE residual |b - A x| per iteration
    (recomputed from x, one extra matvec per iteration — the reference's
    trace2, ref: PCG.py:83,95), exposing f32 recursion-residual drift.
    Off by default; the hot path never pays the matvec.
    """
    dtype = b.dtype
    x0 = jnp.zeros_like(b) if guess is None else guess
    r0 = b - btd_matvec(A, x0)
    rt0 = btd_matvec(Pinv, r0)
    p0 = rt0
    nu0 = jnp.vdot(r0, rt0)
    trace0 = jnp.zeros(max_iter + 1, dtype=dtype).at[0].set(jnp.abs(nu0))
    rtrace0 = (jnp.zeros(max_iter + 1, dtype=dtype)
               .at[0].set(jnp.linalg.norm(r0)) if trace_residual else None)
    thr = (exit_tolerance * jnp.abs(nu0) if relative
           else jnp.asarray(exit_tolerance, dtype))
    # already-converged warm start: without this the first iteration divides
    # by pAp = 0 and poisons the solve with NaN.  NB with a warm start
    # |nu0| is already small, so the relative threshold keeps a floor.
    if relative:
        thr = jnp.maximum(thr, 1e-30)
    done0 = jnp.abs(nu0) <= thr

    def cond(state):
        _, _, _, nu, it, done, _, _ = state
        return (~done) & (it < max_iter)

    def body(state):
        x, r, p, nu, it, done, trace, rtrace = state
        Ap = btd_matvec(A, p)
        pAp = jnp.vdot(p, Ap)
        alpha = nu / jnp.where(pAp != 0, pAp, 1.0)
        r_new = r - alpha * Ap
        x_new = x + alpha * p
        rt = btd_matvec(Pinv, r_new)
        nu_new = jnp.vdot(r_new, rt)
        trace = trace.at[it + 1].set(jnp.abs(nu_new))
        if trace_residual:
            true_r = jnp.linalg.norm(b - btd_matvec(A, x_new))
            rtrace = rtrace.at[it + 1].set(true_r)
        done_new = jnp.abs(nu_new) <= thr
        beta = nu_new / nu
        p_new = rt + beta * p
        new = (x_new, r_new, p_new, nu_new, it + 1, done_new, trace, rtrace)
        # batch-invariance freeze: under vmap the loop runs to the
        # batch-max iteration count; a converged lane must stop updating
        # (extra Krylov steps change its x with the batch composition —
        # see solvers.sqp.sqp_round)
        return jax.tree_util.tree_map(
            lambda n, o: jnp.where(done, o, n), new, state)

    init = (x0, r0, p0, nu0, jnp.array(0), done0, trace0, rtrace0)
    x, r, p, nu, it, done, trace, rtrace = jax.lax.while_loop(cond, body, init)
    return PCGResult(x=x, iters=it, nu_trace=trace, converged=done,
                     res_trace=rtrace)


def btd_solve_dense(A: BlockTridiag, b: jnp.ndarray) -> jnp.ndarray:
    """Exact solve by materializing (small N) — validation fallback
    (ref: PCG parity test GBD-PCG-Python/test.py:18-36)."""
    M = btd_dense(A)
    return jnp.linalg.solve(M, b.reshape(-1)).reshape(b.shape)


def btd_cyclic_reduction(A: BlockTridiag, b: jnp.ndarray) -> jnp.ndarray:
    """Direct block cyclic-reduction solve — the parallel exact solver.

    Same system as btd_block_thomas, but organized as log2(N) *levels* of
    batched block ops instead of N sequential scan steps: each level
    eliminates the odd-indexed blocks of the current (halved) system with
    one round of batched 18-ish-dim matmuls/inverses, then back-substitutes
    level by level.  On TPU every level is a handful of fused kernels over
    all remaining blocks, so the solve reads the block data O(log N) times
    with no sequential-over-N dependency chain — where PCG re-reads every
    block per Krylov iteration and block-Thomas serializes N small solves.

    Total block work is ~2x Thomas (the classic cyclic-reduction tradeoff);
    elimination is unpivoted *between* blocks (stable for the symmetric
    quasi-definite Schur complements solved here — same pivot order as the
    reference's own stair/Thomas eliminations), with partial pivoting
    *inside* each block inverse (_solve_batched).

    N need not be a power of two: the system is padded with decoupled
    identity blocks (zero rhs), which cyclic reduction eliminates exactly.
    """
    N, bs = A.nblocks, A.bs
    dtype = A.diag.dtype
    Np = 1 << max(0, (N - 1).bit_length())
    D = A.diag
    # U_full[k] = A[k, k+1], zero-padded so U_full[n-1] = 0 at every level
    U = jnp.concatenate(
        [A.upper, jnp.zeros((Np - N + 1, bs, bs), dtype=dtype)], axis=0)
    rhs = b
    if Np != N:
        eye = jnp.broadcast_to(jnp.eye(bs, dtype=dtype), (Np - N, bs, bs))
        D = jnp.concatenate([D, eye], axis=0)
        rhs = jnp.concatenate(
            [rhs, jnp.zeros((Np - N, bs), dtype=dtype)], axis=0)

    zero1 = jnp.zeros((1, bs, bs), dtype=dtype)
    stack = []
    n = Np
    while n > 1:
        D_even = D[0::2]                   # (n/2, bs, bs)
        Dinv_odd = _inv_blocks(D[1::2], spd=True)    # inv(D[2m+1])
        b_even, b_odd = rhs[0::2], rhs[1::2]
        UR = U[0::2]                       # A[2m, 2m+1]
        Uodd = U[1::2]                     # A[2m+1, 2m+2] (last block zero)
        # left odd neighbor of even 2m is 2m-1 with coupling block
        # A[2m-1, 2m] = U_full[2m-1] = Uodd[m-1]; shift the odd arrays so
        # the m = 0 row (no left neighbor) multiplies by an exact zero block
        ULp = jnp.concatenate([zero1, Uodd[:-1]], axis=0)
        Dinv_prev = jnp.concatenate([zero1, Dinv_odd[:-1]], axis=0)
        b_odd_prev = jnp.concatenate(
            [jnp.zeros((1, bs), dtype=dtype), b_odd[:-1]], axis=0)

        # D'_m = D[2m] - U[2m-1]^T inv(D[2m-1]) U[2m-1]
        #              - U[2m]   inv(D[2m+1]) U[2m]^T
        ULt = jnp.swapaxes(ULp, -1, -2)
        D_new = (D_even
                 - _bmm(_bmm(ULt, Dinv_prev), ULp)
                 - _bmm(_bmm(UR, Dinv_odd), jnp.swapaxes(UR, -1, -2)))
        # U'_m = -U[2m] inv(D[2m+1]) U[2m+1]; zero-pad keeps length n/2
        U_new = -_bmm(_bmm(UR, Dinv_odd), Uodd)
        U_new = U_new.at[-1].set(jnp.zeros((bs, bs), dtype=dtype))
        # b'_m = b[2m] - U[2m-1]^T inv(D[2m-1]) b[2m-1]
        #              - U[2m]   inv(D[2m+1]) b[2m+1]
        b_new = (b_even
                 - _bmv_T(ULp, _bmv(Dinv_prev, b_odd_prev))
                 - _bmv(UR, _bmv(Dinv_odd, b_odd)))
        stack.append((Dinv_odd, UR, Uodd, b_odd))
        D, U, rhs = D_new, U_new, b_new
        n //= 2

    x = _solve_batched(D[0], rhs[0][:, None], spd=True)[:, 0][None]  # (1, bs)

    # back substitution: x[2m+1] = inv(D[2m+1]) (b[2m+1]
    #   - U[2m]^T x[2m] - U[2m+1] x[2m+2])
    for Dinv_odd, UR, Uodd, b_odd in reversed(stack):
        x_next = jnp.concatenate(
            [x[1:], jnp.zeros((1, bs), dtype=dtype)], axis=0)
        x_odd = _bmv(Dinv_odd,
                     b_odd - _bmv_T(UR, x) - _bmv(Uodd, x_next))
        n2 = 2 * x.shape[0]
        x = jnp.zeros((n2, bs), dtype=dtype).at[0::2].set(x).at[1::2].set(x_odd)

    return x[:N]


def btd_block_thomas_multi(A: BlockTridiag, B: jnp.ndarray) -> jnp.ndarray:
    """Block-Thomas with a stacked right-hand side B (N, bs, m) — the LU
    factorization is shared across the m columns (used by the SPIKE-style
    sharded exact solve, whose interior solves carry 2 bs + 1 RHS)."""
    N, bs = A.nblocks, A.bs
    m = B.shape[-1]
    upper_pad = jnp.concatenate(
        [A.upper, jnp.zeros((1, bs, bs), dtype=A.diag.dtype)], axis=0)

    # forward elimination as a scan: carry (C_{k-1}, d_{k-1})
    def fwd(carry, inp):
        Cprev, dprev, first = carry
        Dk, Uk, Lk, bk = inp  # Lk = A.upper[k-1]^T (garbage at k=0, masked)
        Dt = jnp.where(first, Dk, Dk - Lk @ Cprev)
        dt = jnp.where(first, bk, bk - Lk @ dprev)
        sol = _solve_batched(Dt, jnp.concatenate([Uk, dt], axis=1),
                             spd=True)
        Ck = sol[:, :bs]
        dk = sol[:, bs:]
        return (Ck, dk, jnp.zeros((), bool)), (Ck, dk)

    lower_pad = jnp.concatenate(
        [jnp.zeros((1, bs, bs), dtype=A.diag.dtype),
         jnp.swapaxes(A.upper, 1, 2)], axis=0)
    init = (jnp.zeros((bs, bs), dtype=A.diag.dtype),
            jnp.zeros((bs, m), dtype=A.diag.dtype), jnp.ones((), bool))
    _, (C, d) = jax.lax.scan(fwd, init, (A.diag, upper_pad, lower_pad, B))

    # back substitution: x_k = d_k - C_k x_{k+1}
    def bwd(x_next, inp):
        Ck, dk, last = inp
        xk = jnp.where(last, dk, dk - Ck @ x_next)
        return xk, xk

    last = jnp.arange(N) == N - 1
    _, xs = jax.lax.scan(bwd, jnp.zeros((bs, m), dtype=A.diag.dtype),
                         (C, d, last), reverse=True)
    return xs


def btd_block_thomas(A: BlockTridiag, b: jnp.ndarray) -> jnp.ndarray:
    """Direct block-Thomas (block LU) solve, sequential over N via scan.

    O(N bs^3) — the exact-solve workhorse for the Schur complement when PCG
    is not requested (replaces the reference's dense np.linalg.solve of S,
    ref: TrajoptMPCReference.py:432).
    """
    return btd_block_thomas_multi(A, b[..., None])[..., 0]
