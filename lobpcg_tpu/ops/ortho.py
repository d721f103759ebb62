"""Robust basis maintenance: ortho_drop / ortho_indefinite (+_mat).

Reference: `src/ortho/ortho_drop_impl.inc:43-125`,
`src/ortho/ortho_indefinite_impl.inc:71-169`,
`src/ortho/ortho_indefinite_mat_impl.inc:52-123`.

The outer/inner iteration structure (project against V, SVQB-orthonormalize,
check Frobenius errors, early-exit) is kept, expressed as
`lax.while_loop`s with the early-exit tolerance checks in the loop
condition — so converged calls really do stop early on device.  Column
counts travel as i32 scalars (see ops.masking).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lobpcg_tpu.ops import masking
from lobpcg_tpu.ops.gram import (
    _hdot,
    apply_block_op,
    as_blocks,
    b_mm,
    bh_dot,
    frob_norm,
    gram_blocks,
    gram_cross_mat,
    gram_self_mat,
    mm,
    ortho_err,
)
from lobpcg_tpu.ops.svqb import _svqb_transform, svqb_mat
from lobpcg_tpu.operators.linop import LinearOperator


def _guard(x, eps):
    """Reference pattern: norms below eps are replaced by 1 to avoid
    dividing by ~0 (`ortho_drop_impl.inc:69`)."""
    return jnp.where(x < eps, jnp.ones_like(x), x)


def _bnorm(B, vb):
    """||B V||_F over V's column blocks — one [n, m] B-application
    transient at a time."""
    total = None
    for b in vb:
        Bb = apply_block_op(B, b)
        t = jnp.sum(jnp.abs(Bb) ** 2).real
        total = t if total is None else total + t
    return jnp.sqrt(total)


def _svqb_inner_loop(
    U, G0, nu, B, eps_ortho, eps_drop, max_inner, *, indefinite,
    rr_dtype=None
):
    """Shared inner loop: repeat svqb until ||U^H B U - I_sig|| is small.

    The k x k Gram G = U^H B U is carried through the loop (initialized
    by the caller from its own B application), so each iteration costs
    ONE operator application — the incoming U's Gram is already in hand,
    and the freshly applied BU serves both the convergence check and the
    next iteration.  Carrying the tiny Gram instead of the [n, m] BU
    block keeps the while-loop carry small (a BU carry measurably tipped
    capacity-bound solves over the HBM limit).

    ortho_drop normalizes by ||B*U||*||U|| (`ortho_drop_impl.inc:97-110`);
    ortho_indefinite by ||U||^2 (`ortho_indefinite_impl.inc:141-151`).
    Returns (U, nu).
    """

    def cond(carry):
        _, _, _, i, done = carry
        return (i < max_inner) & ~done

    def body(carry):
        U, G, nu, i, _ = carry
        T, nu2 = _svqb_transform(G, nu, eps_drop, True, U.dtype)
        U2 = masking.mask_cols(mm(U, T), nu2)
        BU2 = apply_block_op(B, U2)
        G2 = _hdot(U2, BU2, rr_dtype)
        err = ortho_err(G2, nu2)
        U_norm = _guard(frob_norm(U2), eps_ortho)
        if indefinite:
            denom = U_norm * U_norm
        else:
            BU_norm = U_norm if B is None else frob_norm(BU2)
            denom = BU_norm * U_norm
        done = err / denom < eps_ortho
        return U2, G2, nu2, i + 1, done

    U, _, nu, _, _ = jax.lax.while_loop(
        cond, body, (U, G0, nu, jnp.int32(0), jnp.bool_(False))
    )
    return U, nu


def ortho_drop(
    U: jax.Array,
    nu,
    V: jax.Array,
    nv,
    B: Optional[LinearOperator] = None,
    *,
    eps_ortho: float,
    eps_drop: float,
    max_outer: int = 3,
    max_inner: int = 3,
    rr_dtype=None,
):
    """B-orthogonalize U against V (B positive semi-definite), with
    column dropping.  Returns (U_new, retained_count).

    V is the external basis — a [n, kv] array or a tuple of blocks
    (X, P); dead V columns are exactly zero by the driver invariant
    (soft locking writes zero-masked P), so no tall masking copy is
    needed (`nv` stays in the signature for the contract).
    Reference: `src/ortho/ortho_drop_impl.inc:43-125`.
    """
    nu = jnp.int32(nu)
    del nv
    vb = as_blocks(V, U.shape[1])
    U = masking.mask_cols(U, nu)

    BV_norm = _guard(_bnorm(B, vb), eps_ortho)

    def cond(carry):
        _, _, outer, done = carry
        return (outer < max_outer) & ~done

    def body(carry):
        U, nu, outer, _ = carry
        # Project: U -= V (V^H B U), then one more application of the
        # projected U seeds the inner loop's Gram — two B applications
        # per outer step plus one per inner step plus the final check.
        BU = apply_block_op(B, U)
        coef = bh_dot(vb, BU)
        U = masking.mask_cols(U - b_mm(vb, coef), nu)
        BU = apply_block_op(B, U)
        G0 = _hdot(U, BU, rr_dtype)
        U, nu = _svqb_inner_loop(
            U, G0, nu, B, eps_ortho, eps_drop, max_inner, indefinite=False,
            rr_dtype=rr_dtype,
        )
        # Check ||V^H B U||_F.
        coef2 = bh_dot(vb, apply_block_op(B, U))
        U_norm = _guard(frob_norm(U), eps_ortho)
        rerr = frob_norm(coef2) / (BV_norm * U_norm)
        return U, nu, outer + 1, rerr < eps_ortho

    U, nu, _, _ = jax.lax.while_loop(
        cond, body, (U, nu, jnp.int32(0), jnp.bool_(False))
    )
    return U, nu


def ortho_indefinite(
    U: jax.Array,
    nu,
    V: jax.Array,
    nv,
    B: Optional[LinearOperator] = None,
    sig: Optional[jax.Array] = None,
    *,
    eps_ortho: float,
    eps_drop: float,
    max_outer: int = 3,
    max_inner: int = 3,
    rr_dtype=None,
):
    """Signature-weighted B-orthogonalization of U against V (B indefinite).

    Projection uses the B-orthogonal projector V sig (V^H B U) where
    sig = V^H B V (computed when not supplied).  V may be a tuple of
    blocks (X, P); dead V columns are exactly zero (driver invariant).
    Reference: `src/ortho/ortho_indefinite_impl.inc:71-169`.
    """
    nu = jnp.int32(nu)
    del nv
    vb = as_blocks(V, U.shape[1])
    U = masking.mask_cols(U, nu)

    if sig is None:
        # sig = V^H B V; dead V columns give exactly-zero rows/cols, which
        # makes the projector vanish on them — no injection needed.
        sig = gram_blocks(vb, B)

    BV_norm = _guard(_bnorm(B, vb), eps_ortho)

    def cond(carry):
        _, _, outer, done = carry
        return (outer < max_outer) & ~done

    def body(carry):
        U, nu, outer, _ = carry
        BU = apply_block_op(B, U)
        coef = bh_dot(vb, BU)
        tmp = mm(sig, coef)
        U = masking.mask_cols(U - b_mm(vb, tmp), nu)
        BU = apply_block_op(B, U)
        G0 = _hdot(U, BU, rr_dtype)
        U, nu = _svqb_inner_loop(
            U, G0, nu, B, eps_ortho, eps_drop, max_inner, indefinite=True,
            rr_dtype=rr_dtype,
        )
        coef2 = bh_dot(vb, apply_block_op(B, U))
        U_norm = _guard(frob_norm(U), eps_ortho)
        rerr = frob_norm(coef2) / (BV_norm * U_norm)
        return U, nu, outer + 1, rerr < eps_ortho

    U, nu, _, _ = jax.lax.while_loop(
        cond, body, (U, nu, jnp.int32(0), jnp.bool_(False))
    )
    return U, nu


def ortho_indefinite_mat(
    U: jax.Array,
    V: jax.Array,
    mat: jax.Array,
    *,
    eps_ortho: float,
    eps_drop: float,
    max_outer: int = 3,
    max_inner: int = 3,
) -> jax.Array:
    """Coefficient-space orthogonalization against an explicit dense
    indefinite metric, with double projection
    U -= V (V^H mat V) (V^H mat U) applied as two single projections
    (reference computes it right-to-left the same way,
    `src/ortho/ortho_indefinite_mat_impl.inc:77-98`).  No dropping.
    """
    MV_norm = _guard(
        frob_norm(mm(mat, V)),
        eps_ortho,
    )

    def inner(U):
        def cond(c):
            _, i, done = c
            return (i < max_inner) & ~done

        def body(c):
            U, i, _ = c
            U = svqb_mat(U, mat, tau=eps_drop)
            G = gram_self_mat(U, mat)
            err = ortho_err(G)
            U_norm = _guard(frob_norm(U), eps_ortho)
            return U, i + 1, err / (U_norm * U_norm) < eps_ortho

        U, _, _ = jax.lax.while_loop(cond, body, (U, jnp.int32(0), jnp.bool_(False)))
        return U

    def cond(carry):
        _, outer, done = carry
        return (outer < max_outer) & ~done

    def body(carry):
        U, outer, _ = carry
        # Double projection, right to left.
        c1 = gram_cross_mat(V, U, mat)
        t1 = mm(V, c1)
        c2 = gram_cross_mat(V, t1, mat)
        U = U - mm(V, c2)
        U = inner(U)
        c3 = gram_cross_mat(V, U, mat)
        U_norm = _guard(frob_norm(U), eps_ortho)
        rerr = frob_norm(c3) / (MV_norm * U_norm)
        return U, outer + 1, rerr < eps_ortho

    U, _, _ = jax.lax.while_loop(cond, body, (U, jnp.int32(0), jnp.bool_(False)))
    return U
