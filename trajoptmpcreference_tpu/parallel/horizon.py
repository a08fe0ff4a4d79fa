"""Horizon-sharded block-tridiagonal operators and PCG.

The sequence-parallel analogue for trajectory optimization (SURVEY.md §2.8):
the Schur complement S is block-tridiagonal over the horizon (N block rows
of size bs = nx + m), so for long horizons the PCG solve shards the block
rows over a 'horizon' mesh axis:

  * matvec: each chip owns L = N/P consecutive block rows; the coupling
    terms need exactly one halo block vector from each neighbor, exchanged
    with ``lax.ppermute`` over ICI;
  * dot products / exit tests: local partial + ``lax.psum``;
  * preconditioners: J/BJ are chip-local; SS needs one neighbor Dinv at
    setup (one extra ppermute), after which its application has the same
    halo pattern as the matvec.

Semantics match ops.btridiag.pcg exactly (same iterates in exact
arithmetic) — reference behavior: GBD-PCG-Python/PCG.py:66-212.

All ``sharded_*`` functions must be called INSIDE a shard_map whose mesh has
the named axis; use ``shard_btd`` outside to lay out the global operator.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from trajoptmpcreference_tpu.ops.btridiag import (
    BlockTridiag,
    _bmm,
    _bmv,
    _bmv_T,
    _inv_blocks,
    btd_block_thomas,
    btd_block_thomas_multi,
)


class ShardedBTD(NamedTuple):
    """Shard (or global layout) of a symmetric block-tridiagonal operator.

    Inside shard_map (local view, L = N / axis_size):
      diag: (L, bs, bs) local diagonal blocks (global rows g0..g0+L-1)
      upper: (L, bs, bs) with upper[k] = A[g0+k, g0+k+1]; the last global
          row's entry is zero padding
      upper_prev: (1, bs, bs) = A[g0-1, g0] (zero on the first device)

    Outside (as built by shard_btd, to be passed with in_specs
    P('horizon') on every leaf's leading axis):
      diag: (N, bs, bs), upper: (N, bs, bs), upper_prev: (nshards, bs, bs)
    """

    diag: jnp.ndarray
    upper: jnp.ndarray
    upper_prev: jnp.ndarray


def shard_btd(A: BlockTridiag, nshards: int) -> ShardedBTD:
    """Lay out a global operator for a 'horizon' axis of size ``nshards``;
    every returned leaf is sharded over its leading axis."""
    N, bs = A.nblocks, A.bs
    if N % nshards:
        raise ValueError(f"N={N} must divide by horizon shards {nshards}")
    dtype = A.diag.dtype
    L = N // nshards
    upper = jnp.concatenate(
        [A.upper, jnp.zeros((1, bs, bs), dtype=dtype)], axis=0)
    # A[g0-1, g0] for each shard = global upper index (p*L - 1)
    idx = jnp.arange(1, nshards) * L - 1
    upper_prev = jnp.concatenate(
        [jnp.zeros((1, bs, bs), dtype=dtype), A.upper[idx]], axis=0)
    return ShardedBTD(A.diag, upper, upper_prev)


def _halo_exchange(x: jnp.ndarray, ax: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (x_from_left, x_from_right): the left neighbor's LAST block row
    and the right neighbor's FIRST block row (zeros at the boundary)."""
    P = jax.lax.axis_size(ax)
    if P == 1:
        z = jnp.zeros_like(x[0])
        return z, z
    # right-shift: device p receives from p-1 (its left neighbor's last row)
    from_left = jax.lax.ppermute(
        x[-1], ax, [(p, p + 1) for p in range(P - 1)])
    # left-shift: device p receives from p+1 (its right neighbor's first row)
    from_right = jax.lax.ppermute(
        x[0], ax, [(p + 1, p) for p in range(P - 1)])
    return from_left, from_right


def sharded_btd_matvec(A: ShardedBTD, x: jnp.ndarray, ax: str) -> jnp.ndarray:
    """y = S @ x with x the local (L, bs) shard; two ppermutes of one block
    row each per call."""
    x_left, x_right = _halo_exchange(x, ax)
    y = _bmv(A.diag, x)
    # upper coupling: y_k += U_k x_{k+1}
    x_next = jnp.concatenate([x[1:], x_right[None]], axis=0)
    y = y + _bmv(A.upper, x_next)
    # lower coupling: y_k += U_{k-1}^T x_{k-1}
    x_prev = jnp.concatenate([x_left[None], x[:-1]], axis=0)
    U_prev = jnp.concatenate([A.upper_prev, A.upper[:-1]], axis=0)
    y = y + _bmv_T(U_prev, x_prev)
    return y


def _pvdot(a, b, ax):
    return jax.lax.psum(jnp.vdot(a, b), ax)


def sharded_preconditioner(A: ShardedBTD, ptype: str, ax: str) -> ShardedBTD:
    """Pinv with the same ShardedBTD layout (off blocks zero for 0/J/BJ).

    Preconditioner semantics per the reference (ref: PCG.py:113-212)."""
    L, bs = A.diag.shape[0], A.diag.shape[1]
    dtype = A.diag.dtype
    zero_u = jnp.zeros_like(A.upper)
    zero_p = jnp.zeros_like(A.upper_prev)
    if ptype == "0":
        eye = jnp.broadcast_to(jnp.eye(bs, dtype=dtype), A.diag.shape)
        return ShardedBTD(eye, zero_u, zero_p)
    if ptype == "J":
        d = jnp.einsum("kii->ki", A.diag)
        return ShardedBTD(jax.vmap(jnp.diag)(1.0 / d), zero_u, zero_p)
    if ptype == "BJ":
        return ShardedBTD(_inv_blocks(A.diag, spd=True), zero_u, zero_p)
    if ptype == "SS":
        Dinv = _inv_blocks(A.diag, spd=True)
        # need Dinv of the right neighbor's first row and the left
        # neighbor's last row for the boundary off-diagonal blocks
        Dinv_left, Dinv_right = _halo_exchange(Dinv, ax)
        Dinv_next = jnp.concatenate([Dinv[1:], Dinv_right[None]], axis=0)
        U = -_bmm(_bmm(Dinv, A.upper), Dinv_next)
        U_prev = -(Dinv_left @ A.upper_prev[0] @ Dinv[0])[None]
        return ShardedBTD(Dinv, U, U_prev)
    raise ValueError(
        "Invalid preconditioner; options are [0, J, BJ, SS] "
        "(ref: PCG.py:52-55)")


class ShardedPCGResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray
    converged: jnp.ndarray


def sharded_btd_exact(A: ShardedBTD, b: jnp.ndarray, ax: str) -> jnp.ndarray:
    """Direct solve of the horizon-sharded block-tridiagonal system by
    substructuring (the SPIKE / domain-decomposition algorithm):

      1. each shard eliminates its L-2 INTERIOR block rows with one local
         multi-RHS block-Thomas factorization (shared across the 2 bs + 1
         right-hand sides: b plus the two interface coupling columns);
      2. the surviving unknowns — each shard's first and last block rows —
         form a reduced symmetric block-tridiagonal system of 2 P rows,
         all_gather'd (tiny: 2 P bs^2 floats) and solved redundantly on
         every shard with the sequential Thomas;
      3. interior rows back-substitute locally.

    One all_gather total; everything else is shard-local.  This is the
    exact-solve (method "S") counterpart of sharded_pcg — same answer as
    the replicated btd_block_thomas up to float reassociation.  Requires
    L = N/P >= 3 local rows.
    """
    P = jax.lax.axis_size(ax)
    L, bs = A.diag.shape[0], A.diag.shape[1]
    if L < 3:
        raise ValueError(
            f"sharded_btd_exact needs >= 3 local block rows (got L = {L}); "
            "use fewer shards or the PCG path")
    dtype = A.diag.dtype
    p = jax.lax.axis_index(ax)

    # interior system: rows 1..L-2
    A_int = BlockTridiag(A.diag[1:-1], A.upper[1:-1 - 1] if L > 3
                         else jnp.zeros((0, bs, bs), dtype=dtype))
    # RHS stack: [b_I | C0 | Cl] — C0 first block = upper[0]^T (coupling to
    # x_0), Cl last block = upper[L-2] (coupling to x_{L-1})
    nI = L - 2
    Bst = jnp.zeros((nI, bs, 1 + 2 * bs), dtype=dtype)
    Bst = Bst.at[:, :, 0].set(b[1:-1])
    Bst = Bst.at[0, :, 1:1 + bs].set(A.upper[0].T)
    Bst = Bst.at[-1, :, 1 + bs:].set(A.upper[L - 2])
    sol = btd_block_thomas_multi(A_int, Bst)
    yb = sol[:, :, 0]                       # A_II^-1 b_I        (nI, bs)
    Y0 = sol[:, :, 1:1 + bs]                # A_II^-1 C0         (nI, bs, bs)
    Yl = sol[:, :, 1 + bs:]                 # A_II^-1 Cl

    # reduced interface rows for this shard:
    #  row 0:   (Sd0 - U0 Y0[0]) x_0 + (-U0 Yl[0]) x_l
    #           + upper_prev^T x_l^(p-1)               = b_0 - U0 yb[0]
    #  row L-1: (-U_{L-2}^T Y0[-1]) x_0
    #           + (Sd_{L-1} - U_{L-2}^T Yl[-1]) x_l
    #           + U_{L-1} x_0^(p+1)                    = b_{L-1} - U^T yb[-1]
    U0, Ul = A.upper[0], A.upper[L - 2]
    d0 = A.diag[0] - U0 @ Y0[0]
    dl = A.diag[-1] - Ul.T @ Yl[-1]
    fill = -(U0 @ Yl[0])                    # x_0 <-> x_l within-shard block
    r0 = b[0] - U0 @ yb[0]
    rl = b[-1] - Ul.T @ yb[-1]

    # reduced global system over (x_0^(0), x_l^(0), x_0^(1), ...):
    # diag (2P), upper (2P-1): upper[2p] = fill_p, upper[2p+1] = U_{L-1}^(p)
    red_diag = jax.lax.all_gather(
        jnp.stack([d0, dl]), ax, tiled=True)                 # (2P, bs, bs)
    red_upper_full = jax.lax.all_gather(
        jnp.stack([fill, A.upper[L - 1]]), ax, tiled=True)   # (2P, bs, bs)
    red_rhs = jax.lax.all_gather(jnp.stack([r0, rl]), ax,
                                 tiled=True)                 # (2P, bs)
    red = BlockTridiag(red_diag, red_upper_full[:-1])
    z = btd_block_thomas(red, red_rhs)                       # (2P, bs)

    x0 = jax.lax.dynamic_slice_in_dim(z, 2 * p, 1, 0)[0]
    xl = jax.lax.dynamic_slice_in_dim(z, 2 * p + 1, 1, 0)[0]
    x_int = yb - _bmv(Y0, jnp.broadcast_to(x0, (nI, bs))) \
        - _bmv(Yl, jnp.broadcast_to(xl, (nI, bs)))
    return jnp.concatenate([x0[None], x_int, xl[None]], axis=0)


def sharded_schur_solve(E, F, rhs, D, G, g, guess, ax: str, *,
                        precond: str = "SS",
                        exit_tolerance: float = 1e-6,
                        max_iter: int = 100,
                        relative: bool = False,
                        exact: bool = False):
    """Horizon-sharded Schur-complement solve — the SQP integration point
    (ref: solveKKTSystem_Schur, TrajoptMPCReference.py:417-455), partitioned
    over the 'ax' mesh axis.

    Must run INSIDE shard_map with every input REPLICATED (the KKT blocks
    are O(N (n^2 + bs n)) — cheap to replicate); the O(N n^3) inverse /
    assembly work and the PCG iterations are partitioned: each device owns
    L = N/P consecutive knots, neighbor coupling moves over single-block
    ppermute halos, dot products psum over ICI.

    Layout (see kkt.KKTSystem._EF): row group k has jacobian E_k over knot
    k-1 vars and F_k over knot k vars; S_kk = D_k - E_k invG_{k-1} E_k^T -
    F_k invG_k F_k^T, S_{k,k+1} = -F_k invG_k E_{k+1}^T,
    gamma_k = rhs_k - E_k invG_{k-1} g_{k-1} - F_k invG_k g_k.

    Returns replicated (dxu (N, n), lam (N, bs), iters, converged).
    """
    P = jax.lax.axis_size(ax)
    p = jax.lax.axis_index(ax)
    N = G.shape[0]
    assert N % P == 0, (N, P)
    L = N // P
    g0 = p * L
    loc = lambda a: jax.lax.dynamic_slice_in_dim(a, g0, L, 0)
    Gl, gl, El, Fl, rhsl, Dl, guessl = map(
        loc, (G, g, E, F, rhs, D, guess))

    invGl = _inv_blocks(Gl, spd=True)
    # neighbor halos: left neighbor's last (invG, g) row; right neighbor's
    # first E row (zeros at the global boundaries)
    invG_left, _ = _halo_exchange(invGl, ax)
    g_left, _ = _halo_exchange(gl, ax)
    _, E_right = _halo_exchange(El, ax)
    invG_prev = jnp.concatenate([invG_left[None], invGl[:-1]], axis=0)
    g_prev = jnp.concatenate([g_left[None], gl[:-1]], axis=0)
    E_next = jnp.concatenate([El[1:], E_right[None]], axis=0)

    ElT = jnp.swapaxes(El, -1, -2)
    FlT = jnp.swapaxes(Fl, -1, -2)
    E_nextT = jnp.swapaxes(E_next, -1, -2)
    # E_0 = 0 globally, so the k=0 row's EiE/gamma terms vanish on device 0
    EiE = _bmm(_bmm(El, invG_prev), ElT)
    FiF = _bmm(_bmm(Fl, invGl), FlT)
    Sd = jax.vmap(jnp.diag)(Dl) - FiF - EiE
    # explicit symmetrization, same as kkt.schur_blocks: the f32 products
    # leave rounding asymmetry and every linear path must solve the SAME
    # operator
    Sd = 0.5 * (Sd + jnp.swapaxes(Sd, -1, -2))
    So = -_bmm(_bmm(Fl, invGl), E_nextT)   # zero at the last global row
    So_left, _ = _halo_exchange(So, ax)
    S_sh = ShardedBTD(Sd, So, So_left[None])
    gam = (rhsl - _bmv(Fl, _bmv(invGl, gl))
           - _bmv(El, _bmv(invG_prev, g_prev)))

    if exact:
        # method "S": direct substructured solve (sharded_btd_exact)
        lam_l = sharded_btd_exact(S_sh, gam, ax)
        iters = jnp.array(0)
        converged = jnp.array(True)
    else:
        res = sharded_pcg(S_sh, gam, ax, precond=precond, guess=guessl,
                          exit_tolerance=exit_tolerance, max_iter=max_iter,
                          relative=relative)
        lam_l = res.x
        iters, converged = res.iters, res.converged
    # dxu_k = invG_k (g_k - F_k^T lam_k - E_{k+1}^T lam_{k+1})
    _, lam_right = _halo_exchange(lam_l, ax)
    lam_next = jnp.concatenate([lam_l[1:], lam_right[None]], axis=0)
    dxu_l = _bmv(invGl, gl - _bmv_T(Fl, lam_l) - _bmv_T(E_next, lam_next))
    dxu = jax.lax.all_gather(dxu_l, ax, tiled=True)
    lam = jax.lax.all_gather(lam_l, ax, tiled=True)
    return dxu, lam, iters, converged


def sharded_pcg(A: ShardedBTD, b: jnp.ndarray, ax: str,
                precond: str = "SS",
                guess: Optional[jnp.ndarray] = None,
                exit_tolerance: float = 1e-6,
                max_iter: int = 100,
                relative: bool = False) -> ShardedPCGResult:
    """Horizon-sharded PCG: identical iterates to ops.btridiag.pcg, with
    halo-exchange matvecs and psum dot products (ref loop semantics:
    PCG.py:66-111).  ``relative`` matches ops.btridiag.pcg's
    scale-invariant exit (essential in f32)."""
    Pinv = sharded_preconditioner(A, precond, ax)
    x0 = jnp.zeros_like(b) if guess is None else guess
    r0 = b - sharded_btd_matvec(A, x0, ax)
    rt0 = sharded_btd_matvec(Pinv, r0, ax)
    nu0 = _pvdot(r0, rt0, ax)
    thr = (exit_tolerance * jnp.abs(nu0) if relative
           else jnp.asarray(exit_tolerance, b.dtype))
    if relative:
        thr = jnp.maximum(thr, 1e-30)
    done0 = jnp.abs(nu0) <= thr   # NaN/warm-start guard (see btridiag.pcg)

    def cond(state):
        _, _, _, nu, it, done = state
        return (~done) & (it < max_iter)

    def body(state):
        x, r, p, nu, it, done = state
        Ap = sharded_btd_matvec(A, p, ax)
        pAp = _pvdot(p, Ap, ax)
        alpha = nu / jnp.where(pAp != 0, pAp, 1.0)
        r_new = r - alpha * Ap
        x_new = x + alpha * p
        rt = sharded_btd_matvec(Pinv, r_new, ax)
        nu_new = _pvdot(r_new, rt, ax)
        done_new = jnp.abs(nu_new) <= thr
        p_new = rt + (nu_new / nu) * p
        return (x_new, r_new, p_new, nu_new, it + 1, done_new)

    init = (x0, r0, rt0, nu0, jnp.array(0), done0)
    x, r, p, nu, it, done = jax.lax.while_loop(cond, body, init)
    return ShardedPCGResult(x=x, iters=it, converged=done)
