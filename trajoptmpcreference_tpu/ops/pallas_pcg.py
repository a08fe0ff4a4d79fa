"""Fused batched block-tridiagonal PCG as a single Pallas TPU kernel.

The XLA path (ops/btridiag.pcg under vmap) launches ~6 kernels per Krylov
iteration with HBM round-trips between them; this kernel runs the ENTIRE
iteration loop on-chip: the Schur blocks, preconditioner, and Krylov
vectors live in VMEM for the whole solve, the batch rides the 128-wide
vector lanes (batch-minor layout), and each lane runs its own system in
lockstep with per-lane scalars (alpha, beta, nu).

Loop semantics match ops/btridiag.pcg (ref: GBD-PCG-Python/PCG.py:66-111):
nu = r^T Pinv r, exit when every lane in the tile satisfies |nu| < tol.

VMEM fit at the flagship config (N=64, bs=12, 128 lanes) — three tricks,
worth ~2.6x over the naive layout (18.9 MB -> ~12 MB, under the v5e's
16 MB):
  * block-leading layout (bs, bs, N, BT): the minor tile dims are (N, BT),
    both already aligned (8, 128), so bs = 12 costs no sublane padding
    (the old (N, bs, bs, BT) layout padded 12 -> 16: 6.3 MB/array);
  * symmetric packing: PCG requires a symmetric operator, so the diagonal
    blocks and their inverses are symmetric — stored as the 78-entry
    lower triangle (78, N, BT), applied by a statically unrolled
    multiply-add ladder (no gather: Mosaic has none);
  * no grid: Pallas double-buffers gridded inputs (2x resident blocks), so
    each 128-lane tile is its own grid=() pallas_call and the batch walks
    tiles with an outer lax.map.

``batched_pcg`` wraps the kernel in a custom_vmap that folds vmapped axes
into the lane dimension (the ops/lanes.py strategy), so per-sample solver
code picks it up transparently; on non-TPU backends it falls back to the
interpreter for correctness tests.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trajoptmpcreference_tpu.ops.btridiag import BlockTridiag


def _tri_indices(bs: int):
    """Row/col index arrays of the packed lower triangle, and the static
    (i, j) -> packed-position table."""
    rows, cols = np.tril_indices(bs)
    pos = {}
    for k, (i, j) in enumerate(zip(rows, cols)):
        pos[(int(i), int(j))] = k
    return rows, cols, pos


def _pack_sym(blocks, rows, cols):
    """(..., bs, bs) symmetric -> (..., T) packed lower triangle."""
    return blocks[..., rows, cols]


def _sym_apply(P, x, bs: int, pos):
    """y = D x per knot/lane with D packed symmetric.

    P (T, N, BT) packed, x (bs, N, BT) -> (bs, N, BT).  Statically
    unrolled: each term is one multiply-add on an aligned (N, BT) tile.
    """
    ys = []
    for i in range(bs):
        acc = None
        for j in range(bs):
            k = pos[(i, j)] if i >= j else pos[(j, i)]
            t = P[k] * x[j]
            acc = t if acc is None else acc + t
        ys.append(acc)
    return jnp.stack(ys)


def _shift_next(x):
    """x_{k+1} along the knot axis (axis 1), zero at the tail."""
    return jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)


def _shift_prev(x):
    """x_{k-1} along the knot axis, zero at the head."""
    return jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)


def _block_apply(U, x, bs: int, transpose: bool = False):
    """y_i = sum_j U[i,j] x_j (or U^T when transpose) per knot/lane,
    statically unrolled: a broadcast einsum over the (bs, bs, N, BT)
    array would materialize the full 4.5 MB elementwise product before
    reducing — the single biggest VMEM temp in the kernel; the unrolled
    ladder peaks at one (N, BT) tile instead."""
    ys = []
    for i in range(bs):
        acc = None
        for j in range(bs):
            t = (U[j, i] if transpose else U[i, j]) * x[j]
            acc = t if acc is None else acc + t
        ys.append(acc)
    return jnp.stack(ys)


def _matvec(diag_p, upper, x, bs, pos):
    """Block-tridiag matvec, block-leading layout.

    diag_p (T, N, BT) packed symmetric, upper (bs, bs, N, BT) with
    upper[..., N-1, :] = 0, x (bs, N, BT) -> y (bs, N, BT).
    """
    y = _sym_apply(diag_p, x, bs, pos)
    # y_k += U_k x_{k+1}
    y = y + _block_apply(upper, _shift_next(x), bs)
    # y_k += U_{k-1}^T x_{k-1}  ==  shift_prev_k(U_k^T x_k): shift the
    # SMALL (bs, N, BT) product, never a copy of the 4.7 MB upper array
    y = y + _shift_prev(_block_apply(upper, x, bs, transpose=True))
    return y


def _pcg_kernel(diag_ref, upper_ref, pdiag_ref, r0_ref,
                x_ref, iters_ref=None, *, bs: int, pos, max_iter: int,
                tol: float, precond: str, relative: bool,
                true_residual_exit: bool = False):
    # CG is translation-invariant, so the kernel solves S dx = r0 from a
    # ZERO initial iterate; the caller precomputes r0 = b - A x0 (one XLA
    # btd_matvec) and adds x = x0 + dx outside.  This keeps both the b and
    # the guess buffers out of VMEM — the flagship config is ~100-400 KB
    # from the scoped limit when nested in the full MPC graph.
    diag_p = diag_ref[:]
    upper = upper_ref[:]
    pdiag_p = pdiag_ref[:]

    def apply_P(r):
        # VMEM budget: the SS off-diagonal blocks are never materialized —
        # Pinv_off_k = -Dinv_k U_k Dinv_{k+1}, so with s = Dinv r:
        #   (Pinv r)_k = s_k - Dinv_k (U_k s_{k+1} + U_{k-1}^T s_{k-1})
        s = _sym_apply(pdiag_p, r, bs, pos)
        if precond != "SS":
            return s
        off = _block_apply(upper, _shift_next(s), bs)
        # U_{k-1}^T s_{k-1} via the shifted small product (see _matvec)
        off = off + _shift_prev(_block_apply(upper, s, bs, transpose=True))
        return s - _sym_apply(pdiag_p, off, bs, pos)

    def dot(a, c):
        # per-lane (BT,); unrolled over block rows — the fused form
        # jnp.sum(a * c, axis=(0, 1)) materializes a (bs, N, BT) product
        # first, and the flagship config is ~100 KB from the VMEM limit
        acc = None
        for i in range(bs):
            t = jnp.sum(a[i] * c[i], axis=0)
            acc = t if acc is None else acc + t
        return acc

    r0 = r0_ref[:]
    x0 = jnp.zeros_like(r0)
    rt0 = apply_P(r0)
    nu0 = dot(r0, rt0)
    # Exit metric: nu = r'Pinv r (reference semantics) by default.  With a
    # low-precision preconditioner store, nu is measured through the
    # perturbed Pinv and exits too early — measured closed-loop collapse
    # (median EE err 3.25 m vs 0.19 m) — so bf16 mode gates the exit on
    # the TRUE residual |r|^2 instead: preconditioner precision then
    # affects only the Krylov path, never the delivered solution quality.
    m0 = dot(r0, r0) if true_residual_exit else nu0
    # per-lane threshold; relative = scale-invariant exit with a floor for
    # already-converged warm starts (see ops/btridiag.pcg)
    if relative:
        thr = jnp.maximum(tol * jnp.abs(m0), 1e-30)
    else:
        thr = jnp.full_like(m0, tol)
    lane_done0 = jnp.abs(m0) <= thr         # (BT,) NaN guard (see btridiag.pcg)

    def cond(state):
        _, _, _, nu, it, lane_done = state
        return jnp.logical_and(~jnp.all(lane_done), it < max_iter)

    def body(state):
        x, r, p, nu, it, lane_done = state
        Ap = _matvec(diag_p, upper, p, bs, pos)
        pAp = dot(p, Ap)
        alpha = nu / jnp.where(pAp != 0, pAp, 1.0)   # (BT,)
        # per-lane freeze: the tile iterates until EVERY lane converges,
        # so a converged lane must stop stepping — extra Krylov updates
        # would make its solution depend on its tile-mates (the same
        # batch-invariance rule as ops/btridiag.pcg)
        step = jnp.where(lane_done, 0.0, alpha).astype(alpha.dtype)
        x = x + step[None, None, :] * p
        r = r - step[None, None, :] * Ap
        rt = apply_P(r)
        nu_new = jnp.where(lane_done, nu, dot(r, rt))
        m = dot(r, r) if true_residual_exit else nu_new
        lane_done = lane_done | (jnp.abs(m) <= thr)
        beta = nu_new / nu
        p_new = rt + beta[None, None, :] * p
        p = jnp.where(lane_done[None, None, :], p, p_new)
        return (x, r, p, nu_new, it + 1, lane_done)

    init = (x0, r0, rt0, nu0, jnp.zeros((), jnp.int32), lane_done0)
    x, r, p, nu, it, done = jax.lax.while_loop(cond, body, init)
    x_ref[:] = x
    if iters_ref is not None:
        iters_ref[:] = jnp.full(iters_ref.shape, it, jnp.int32)  # (1, BT)


def _pallas_pcg_lanes(diag_p, upper, pdiag_p, r0, bs: int, pos,
                      tol: float, max_iter: int, block_b: int,
                      interpret: bool, precond: str, relative: bool,
                      true_residual_exit: bool = False):
    """Launch one grid=() kernel per 128-lane batch tile (lax.map outside —
    a Pallas grid would double-buffer the resident blocks).

    Layouts: diag_p/pdiag_p (T, N, L) packed symmetric, upper
    (bs, bs, N, L) tail-padded, r0 (bs, N, L).  Returns dx from a zero
    initial iterate (see _pcg_kernel).
    """
    N, L = r0.shape[1], r0.shape[2]
    BT = min(block_b, L)
    if L % BT:
        raise ValueError(f"lane count {L} must divide by tile {BT}")
    n_tiles = L // BT

    vmem = pltpu.VMEM
    whole = lambda a: pl.BlockSpec(a.shape, lambda: (0,) * a.ndim,
                                   memory_space=vmem)

    # probe knob for the memory-space-assignment CHECK failure: drop the
    # (1, BT) int32 iteration-count output from the kernel entirely
    no_iters = os.environ.get("TMR_PCG_NO_ITERS", "0") == "1"

    def one_tile(args):
        dp, up, pp, bb = args
        out_specs = [whole(bb)]
        out_shape = [jax.ShapeDtypeStruct((bs, N, BT), r0.dtype)]
        if not no_iters:
            out_specs.append(pl.BlockSpec((1, BT), lambda: (0, 0),
                                          memory_space=vmem))
            out_shape.append(jax.ShapeDtypeStruct((1, BT), jnp.int32))
        out = pl.pallas_call(
            functools.partial(_pcg_kernel, bs=bs, pos=pos,
                              max_iter=max_iter, tol=tol, precond=precond,
                              relative=relative,
                              true_residual_exit=true_residual_exit),
            in_specs=[whole(dp), whole(up), whole(pp), whole(bb)],
            out_specs=out_specs,
            out_shape=out_shape,
            # NB: no input_output_aliases — inside the full MPC
            # scan/while graph an alias trips an XLA memory-space CHECK
            # failure ("conflicting pending required assignment").
            interpret=interpret,
        )(dp, up, pp, bb)
        if no_iters:
            return out[0], jnp.full((1, BT), max_iter, jnp.int32)
        return out

    if n_tiles == 1:
        x, iters = one_tile((diag_p, upper, pdiag_p, r0))
        return x, iters[0]

    if os.environ.get("TMR_PCG_UNROLL_TILES", "0") == "1":
        # Unrolled tile loop: structurally different from lax.map for the
        # XLA memory-space-assignment pass (workaround probe for the
        # copy-conflict CHECK failure documented in make_batched_pcg).
        take = lambda a, i: a[..., i * BT:(i + 1) * BT]
        outs = [one_tile((take(diag_p, i), take(upper, i),
                          take(pdiag_p, i), take(r0, i)))
                for i in range(n_tiles)]
        x = jnp.concatenate([o[0] for o in outs], axis=-1)
        it = jnp.concatenate([o[1] for o in outs], axis=-1)
        return x, it[0]
    tiles = lambda a: jnp.moveaxis(
        a.reshape(a.shape[:-1] + (n_tiles, BT)), -2, 0)
    x_t, it_t = jax.lax.map(
        one_tile, (tiles(diag_p), tiles(upper), tiles(pdiag_p),
                   tiles(r0)))
    untile = lambda a: jnp.moveaxis(a, 0, -2).reshape(
        a.shape[1:-1] + (n_tiles * a.shape[-1],))
    return untile(x_t), untile(it_t)[0]


def make_batched_pcg(N: int, bs: int, precond: str = "SS",
                     tol: float = 1e-4, max_iter: int = 40,
                     block_b: int = 128, relative: bool = False,
                     precond_dtype=None, operator_dtype=None,
                     interpret: Optional[bool] = None):
    """Per-sample-signature PCG backed by the fused Pallas kernel.

    Returns fn(S: BlockTridiag, gam (N, bs), guess (N, bs)) -> (x, iters);
    vmapped axes fold into the kernel's lane dimension.  The block-Jacobi
    inverse (Pinv diagonal) is computed OUTSIDE the kernel (once per solve,
    XLA) and streamed in; SS off-diagonals are applied algebraically inside
    (see _pcg_kernel.apply_P).  Diagonal blocks must be symmetric (PCG
    already requires a symmetric operator); they and their inverses are
    stored packed (see module docstring).

    precond_dtype: storage dtype of the packed preconditioner blocks
    (compute stays f32 via promotion).  bf16 halves their VMEM residency —
    the margin that lets the flagship config compile NESTED in the full
    MPC graph (XLA charges the kernel ~200 KB extra scoped VMEM there) —
    and is mathematically safe for the SOLUTION: preconditioner precision
    perturbs the Krylov path and iteration count, never the fixed point.
    It does perturb iterate parity with the XLA path, so the default
    (None) auto-selects: operator dtype when the f32 residency estimate
    fits comfortably, bf16 only at sizes measured to need it.
    """
    operator_dtype_in = operator_dtype
    tri = bs * (bs + 1) // 2
    # f32 residency estimate per 128-lane tile: packed diag + packed Pinv
    # + full upper + ~8 live vectors; Mosaic adds ~3 MB of stack on top at
    # the flagship config (measured), hence the 12.5 MB cutoff.
    resident_f32 = 4 * 128 * N * (2 * tri + bs * bs + 8 * bs)
    auto_bf16 = resident_f32 > 12_500_000
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    from trajoptmpcreference_tpu.ops.btridiag import _inv_blocks
    from trajoptmpcreference_tpu.ops.lanes import _fold, _unfold

    rows, cols, pos = _tri_indices(bs)

    @custom_vmap
    def pcg_L(diag_p, upper, pdiag_p, r0):
        # lane-carrying signature: trailing axis L on every arg; the rule
        # folds vmapped axes into it (recursively, like ops/lanes.py)
        L = r0.shape[-1]
        itp = interpret or (L % 128 != 0)
        return _pallas_pcg_lanes(diag_p, upper, pdiag_p, r0,
                                 bs=bs, pos=pos, tol=tol,
                                 max_iter=max_iter, block_b=block_b,
                                 interpret=itp, precond=precond,
                                 relative=relative,
                                 true_residual_exit=(pdiag_p.dtype
                                                     != r0.dtype))

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
            pdiag = _inv_blocks(S.diag, spd=True)
        upper_pad = jnp.concatenate(
            [S.upper, jnp.zeros_like(S.upper[:1])], axis=0)
        # initial residual outside the kernel (see _pcg_kernel VMEM note)
        from trajoptmpcreference_tpu.ops.btridiag import btd_matvec
        r0 = gam - btd_matvec(S, guess)
        # to block-leading lane layout: (N, bs, bs) -> (bs, bs, N, 1) etc.
        diag_p = jnp.moveaxis(_pack_sym(S.diag, rows, cols), 0, -1)
        pdiag_p = jnp.moveaxis(_pack_sym(pdiag, rows, cols), 0, -1)
        # MEASURED: bf16 storage of EITHER block array destroys the solve
        # on the real (ill-conditioned) Schur systems — entries span
        # ~1e2..1e6 and the 8-bit mantissa wipes the structure PCG needs
        # (lam error ~100% of scale vs 17% for f32; closed-loop collapse).
        # f32 everywhere; the VMEM fit comes from the zero-init dx form.
        if operator_dtype_in is not None:
            diag_p = diag_p.astype(operator_dtype_in)
        if precond_dtype is not None:
            pdiag_p = pdiag_p.astype(precond_dtype)
        upper_l = jnp.moveaxis(upper_pad, 0, -1)
        # KNOWN UPSTREAM ISSUE (2026-08-17): the axon remote TPU compiler
        # currently CHECK-fails in memory-space assignment ("conflicting
        # pending required assignment for: copy.NNNN") when this kernel is
        # nested in the full MPC scan/while graph — for every variant
        # tried, including the exact config previously measured at 2229
        # solves/s and with optimization_barrier fences on all operands.
        # Standalone solves and the CPU interpreter path are unaffected;
        # see analysis/bench_history_r2.md for the bisection matrix.
        dx, it = pcg_L(diag_p[..., None], upper_l[..., None],
                       pdiag_p[..., None], r0.T[..., None])
        return guess + dx[..., 0].T, it[0]

    return solve
