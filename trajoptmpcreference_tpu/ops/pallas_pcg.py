"""Fused batched block-tridiagonal PCG as a single Pallas TPU kernel.

The XLA path (ops/btridiag.pcg under vmap) launches ~6 kernels per Krylov
iteration with HBM round-trips between them; this kernel runs the ENTIRE
iteration loop on-chip: the Schur blocks, preconditioner, and Krylov
vectors live in VMEM for the whole solve, the batch rides the 128-wide
vector lanes (batch-minor layout), and each lane runs its own system in
lockstep with per-lane scalars (alpha, beta, nu).

Loop semantics match ops/btridiag.pcg (ref: GBD-PCG-Python/PCG.py:66-111):
nu = r^T Pinv r, exit when every lane in the tile satisfies |nu| < tol.

Layout: all block arrays batch-minor —
  diag (N, bs, bs, B), upper (N, bs, bs, B) (last knot zero-padded),
  b/guess/x (N, bs, B) — with a grid over batch tiles of BT lanes.

``batched_pcg`` wraps the kernel in a custom_vmap that folds vmapped axes
into the lane dimension (the ops/lanes.py strategy), so per-sample solver
code picks it up transparently; on non-TPU backends it falls back to the
interpreter for correctness tests.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trajoptmpcreference_tpu.ops.btridiag import BlockTridiag, preconditioner


def _matvec(diag, upper, x):
    """Block-tridiag matvec in batch-minor layout inside the kernel.

    diag (N, bs, bs, BT), upper (N, bs, bs, BT) with upper[N-1] = 0,
    x (N, bs, BT) -> y (N, bs, BT).
    """
    y = jnp.sum(diag * x[:, None, :, :], axis=2)
    # upper coupling: y_k += U_k x_{k+1}
    x_next = jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)
    y = y + jnp.sum(upper * x_next[:, None, :, :], axis=2)
    # lower coupling: y_k += U_{k-1}^T x_{k-1}
    x_prev = jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)
    u_prev = jnp.concatenate([jnp.zeros_like(upper[:1]), upper[:-1]], axis=0)
    y = y + jnp.sum(u_prev * x_prev[:, :, None, :], axis=1)
    return y


def _pcg_kernel(diag_ref, upper_ref, pdiag_ref, b_ref, guess_ref,
                x_ref, iters_ref, *, max_iter: int, tol: float,
                precond: str):
    diag = diag_ref[:]
    upper = upper_ref[:]
    pdiag = pdiag_ref[:]
    b = b_ref[:]
    x0 = guess_ref[:]

    def apply_P(r):
        # VMEM budget: the SS off-diagonal blocks are never materialized —
        # Pinv_off_k = -Dinv_k U_k Dinv_{k+1}, so with s = Dinv r:
        #   (Pinv r)_k = s_k - Dinv_k (U_k s_{k+1} + U_{k-1}^T s_{k-1})
        s = jnp.sum(pdiag * r[:, None, :, :], axis=2)
        if precond != "SS":
            return s
        s_next = jnp.concatenate([s[1:], jnp.zeros_like(s[:1])], axis=0)
        off = jnp.sum(upper * s_next[:, None, :, :], axis=2)
        s_prev = jnp.concatenate([jnp.zeros_like(s[:1]), s[:-1]], axis=0)
        u_prev = jnp.concatenate(
            [jnp.zeros_like(upper[:1]), upper[:-1]], axis=0)
        off = off + jnp.sum(u_prev * s_prev[:, :, None, :], axis=1)
        return s - jnp.sum(pdiag * off[:, None, :, :], axis=2)

    def dot(a, c):
        return jnp.sum(a * c, axis=(0, 1))          # per-lane (BT,)

    r0 = b - _matvec(diag, upper, x0)
    rt0 = apply_P(r0)
    nu0 = dot(r0, rt0)
    done0 = jnp.all(jnp.abs(nu0) < tol)     # NaN guard (see btridiag.pcg)

    def cond(state):
        _, _, _, nu, it, done = state
        return jnp.logical_and(~done, it < max_iter)

    def body(state):
        x, r, p, nu, it, _ = state
        Ap = _matvec(diag, upper, p)
        pAp = dot(p, Ap)
        alpha = nu / jnp.where(pAp != 0, pAp, 1.0)   # (BT,)
        x = x + alpha[None, None, :] * p
        r = r - alpha[None, None, :] * Ap
        rt = apply_P(r)
        nu_new = dot(r, rt)
        done = jnp.all(jnp.abs(nu_new) < tol)
        beta = nu_new / nu
        p = rt + beta[None, None, :] * p
        return (x, r, p, nu_new, it + 1, done)

    init = (x0, r0, rt0, nu0, jnp.zeros((), jnp.int32), done0)
    x, r, p, nu, it, done = jax.lax.while_loop(cond, body, init)
    x_ref[:] = x
    iters_ref[:] = jnp.full(iters_ref.shape, it, jnp.int32)  # (1, BT)


def _pallas_pcg_lanes(diag, upper, pdiag, b, guess,
                      tol: float, max_iter: int, block_b: int,
                      interpret: bool, precond: str):
    """Launch the kernel over batch tiles.  All args batch-minor.

    Compiled-path constraints: the lane tile must be 128 (Mosaic requires
    the minor block dim divisible by 128) and the three resident block
    arrays (diag, upper, Pinv diag) must fit VMEM:
    3 * N * bs * roundup(bs, 8) * 128 * 4 bytes (f32) <~ 13 MB.
    """
    N, bs, _, B = diag.shape
    BT = min(block_b, B)
    if B % BT:
        raise ValueError(f"batch {B} must divide by lane tile {BT}")
    grid = (B // BT,)

    block_spec = pl.BlockSpec((N, bs, bs, BT), lambda g: (0, 0, 0, g),
                              memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((N, bs, BT), lambda g: (0, 0, g),
                            memory_space=pltpu.VMEM)
    x, iters = pl.pallas_call(
        functools.partial(_pcg_kernel, max_iter=max_iter, tol=tol,
                          precond=precond),
        grid=grid,
        in_specs=[block_spec, block_spec, block_spec, vec_spec, vec_spec],
        out_specs=[vec_spec,
                   pl.BlockSpec((1, BT), lambda g: (0, g),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((N, bs, B), b.dtype),
                   jax.ShapeDtypeStruct((1, B), jnp.int32)],
        interpret=interpret,
    )(diag, upper, pdiag, b, guess)
    return x, iters[0]


def make_batched_pcg(N: int, bs: int, precond: str = "SS",
                     tol: float = 1e-4, max_iter: int = 40,
                     block_b: int = 128,
                     interpret: Optional[bool] = None):
    """Per-sample-signature PCG backed by the fused Pallas kernel.

    Returns fn(S: BlockTridiag, gam (N, bs), guess (N, bs)) -> (x, iters);
    vmapped axes fold into the kernel's lane dimension.  The block-Jacobi
    inverse (Pinv diagonal) is computed OUTSIDE the kernel (once per solve,
    XLA) and streamed in; SS off-diagonals are applied algebraically inside
    (see _pcg_kernel.apply_P), halving the resident block arrays.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    from trajoptmpcreference_tpu.ops.btridiag import _inv_blocks

    from trajoptmpcreference_tpu.ops.lanes import _fold, _unfold

    @custom_vmap
    def pcg_L(diag, upper, pdiag, b, guess):
        # lane-carrying signature: trailing axis L on every arg; the rule
        # folds vmapped axes into it (recursively, like ops/lanes.py)
        L = diag.shape[-1]
        BT = min(block_b, L) if L % 128 == 0 else L
        itp = interpret or (L % 128 != 0)
        return _pallas_pcg_lanes(diag, upper, pdiag, b, guess,
                                 tol=tol, max_iter=max_iter,
                                 block_b=BT, interpret=itp, precond=precond)

    @pcg_L.def_vmap
    def _rule(axis_size, in_batched, *args):
        folded = [
            _fold(a if bt else jnp.broadcast_to(a[None], (axis_size,) + a.shape))
            for a, bt in zip(args, in_batched)]
        x, it = pcg_L(*folded)
        return (_unfold(x, axis_size), _unfold(it, axis_size)), (True, True)

    def solve(S: BlockTridiag, gam, guess):
        if precond == "J":
            d = jnp.einsum("kii->ki", S.diag)
            pdiag = jax.vmap(jnp.diag)(1.0 / d)
        else:   # BJ and SS both need the block-diagonal inverse
            pdiag = _inv_blocks(S.diag)
        upper_pad = jnp.concatenate(
            [S.upper, jnp.zeros_like(S.upper[:1])], axis=0)
        x, it = pcg_L(S.diag[..., None], upper_pad[..., None],
                      pdiag[..., None], gam[..., None], guess[..., None])
        return x[..., 0], it[0]

    return solve
