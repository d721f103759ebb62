"""Rayleigh-Ritz projected eigensolves (standard family).

Reference: `src/rayleigh/rayleigh_ritz_impl.inc:37-99` (initial RR) and
`src/rayleigh/rayleigh_ritz_modified_impl.inc:42-269` (per-iteration RR
with the Cholesky/ortho dual path, trcon condition check, and the
Duersch Alg. 7 Cp extraction).

On-device design notes:
- Cholesky runs via `jnp.linalg.cholesky`; failure is detected by NaN
  (XLA potrf emits NaN instead of an info code) and signalled with the
  reference's `useOrtho = 2` retry flag.
- The triangular condition check replaces LAPACK's `trcon` 1-norm
  *estimator* with the exact 1-norm condition number — the matrix is a
  tiny k x k triangle, so an exact triangular solve is cheaper on TPU
  than a host round-trip.
- Dead subspace coordinates (masked P/W columns, see ops.masking) carry
  identity in the B-Gram and a large sentinel in the (transformed) A-Gram
  so their Ritz pairs sort to the top end and never pollute the lowest nx.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from lobpcg_tpu.ops import masking
from lobpcg_tpu.ops.gram import (
    _hdot,
    as_blocks,
    blocks_dtype,
    frob_norm,
    gram_blocks,
    gram_blocks_pre,
    gram_self,
    mm,
    scale_diag as _scale_diag,
)
from lobpcg_tpu.operators.linop import LinearOperator


class RRResult(NamedTuple):
    Cx: jax.Array  # [k, nx]
    Cp: jax.Array  # [k, nx] — columns >= p_count are zero
    lam: jax.Array  # [nx] real
    flag: jax.Array  # i32: 0/1 = ok (value of useOrtho), 2 = retry needed
    p_count: jax.Array  # i32 — number of valid Cp columns (the
    # reference's nretain bookkeeping, `rayleigh_ritz_modified_impl.inc:56`)


def _dinv_r(L, D):
    """D_inv_R = D * inv(R) with R = L^H (the reference's trsm_run step,
    `rayleigh_ritz_impl.inc:67-75`).  Computed as (inv(L) @ diag(D))^H."""
    rhs = jnp.diag(D).astype(L.dtype)
    return solve_triangular(L, rhs, lower=True).conj().T


def _rcond_upper_from_L(L):
    """Exact 1-norm reciprocal condition of R = L^H (replaces trcon's
    estimator, `rayleigh_ritz_modified_impl.inc:168-178`)."""
    k = L.shape[0]
    eye = jnp.eye(k, dtype=L.dtype)
    Linv = solve_triangular(L, eye, lower=True)
    # ||R||_1 = max column abs-sum of L^H = max row abs-sum of L.
    norm_R = jnp.max(jnp.sum(jnp.abs(L), axis=1))
    norm_Rinv = jnp.max(jnp.sum(jnp.abs(Linv), axis=1))
    return 1.0 / (norm_R * norm_Rinv)


def _sentinel(H, live):
    """Inject big*I into dead coordinates; big > any live eigenvalue."""
    big = 2.0 * frob_norm(H) + 1.0
    return masking.inject_diag(H, live, big.astype(H.dtype))


def _cp_extract(Z, nx: int, DiR: Optional[jax.Array], n_live):
    """Duersch Alg. 7: Cp = [D_inv_R] V_perp Q, Q = QR-basis of Z1_perp^T.

    Z1_perp^T is the plain transpose (no conjugate — parity with the C
    code's element copy, `rayleigh_ritz_modified_impl.inc:228-235`).

    Only the *live* unwanted eigenvectors participate: eigenvalues are
    sorted ascending and dead-coordinate sentinels carry the largest
    values, so live unwanted eigenvectors are the first (n_live - nx)
    columns of Z_perp.  Sentinel columns are masked before the QR and the
    result is truncated to p_count = clip(n_live - nx, 0, nx) columns —
    otherwise QR's orthonormal-complement columns are pure sentinel
    directions, Cp picks them up, and the next iteration's basis gets
    numerically-zero live P columns whose Ritz pairs are spurious
    (lambda ~ 0, residual ~ 0, falsely converged).  This is the
    fixed-shape analog of the reference's shrinking `nretain`
    (`rayleigh_ritz_modified_impl.inc:56`).

    Returns (Cp [k, nx], p_count i32).
    """
    k = Z.shape[0]
    Zp = Z[:, nx:]  # [k, k-nx] unwanted eigenvectors
    zp_live = jnp.clip(n_live - nx, 0, k - nx)
    p_count = jnp.clip(n_live - nx, 0, nx).astype(jnp.int32)
    Zp = masking.mask_cols(Zp, zp_live)
    Z1t = jnp.swapaxes(Zp[:nx, :], 0, 1)  # [k-nx, nx]
    Q, _ = jnp.linalg.qr(Z1t)
    Cp = mm(Zp, Q)
    if DiR is not None:
        Cp = mm(DiR, Cp)
    return masking.mask_cols(Cp, p_count), p_count


def rayleigh_ritz(
    X: jax.Array,
    A: LinearOperator,
    B: Optional[LinearOperator] = None,
    rr_dtype=None,
):
    """Initial RR on a full-width block: returns (Cx [m,m], lam [m]).

    Reference: `rayleigh_ritz_impl.inc:37-99` — B-Gram, D-scaling,
    Cholesky, congruence transform, eigh, back-transform.
    Mixed precision: Grams accumulate in rr_dtype and the projected solve
    runs in it; Cx is cast back to X's dtype, lam stays high.
    """
    G = gram_self(X, B, out_dtype=rr_dtype)
    D, Gs = _scale_diag(G)
    L = jnp.linalg.cholesky(Gs)
    DiR = _dinv_r(L, D)
    Ap = gram_self(X, A, out_dtype=rr_dtype)
    T1 = mm(Ap, DiR)
    H = mm(DiR.conj().T, T1)
    w, V = jnp.linalg.eigh(H)
    Cx = mm(DiR, V)
    return Cx.astype(X.dtype), w


def _a_gram(blocks, AX, A, out_dtype=None, pack=True):
    """G_A = S^H A S assembled per column block of S = [X | P | W];
    reuses the AX cache for the X block (`rayleigh_ritz_modified_impl.inc:
    71-78, 189-196`).  S is never concatenated and only upper-triangle
    tall contractions run (A Hermitian; see ops.gram.herm_tile_gram —
    the lower tiles are mirrored, 6 MXU dots instead of 9).  With
    ``pack`` (and an operator whose fast path needs the combined lane-
    aligned width, e.g. the stencil at size_sub 64), the A@P and A@W
    applications fuse into one [n, 2m] kernel-rate call
    (ops.gram.applied_blocks); otherwise applications stay one block at
    a time so only a single [n, m] transient is live.
    """
    from lobpcg_tpu.ops.gram import applied_blocks, herm_tile_gram

    pre = {0: AX} if AX is not None else {}
    applied = applied_blocks(A, blocks, pre, pack=pack)
    return herm_tile_gram(blocks, applied, out_dtype)


def rayleigh_ritz_modified(
    S: jax.Array,
    AX: Optional[jax.Array],
    np_act,
    nw_act,
    use_ortho,
    A: LinearOperator,
    B: Optional[LinearOperator] = None,
    *,
    nx: int,
    tol_skip: float = 5e-3,
    rr_dtype=None,
    Bblocks=None,
    pack=True,
) -> RRResult:
    """Per-iteration RR over the masked [X|P|W] subspace.

    S is the search subspace, either a materialized [n, 3m] array or a
    tuple of blocks (X, P, W) — the driver passes blocks so S never
    exists in HBM.  np_act / nw_act are the live P / W column counts; X
    is always fully live.  `use_ortho` (traced i32) selects the branch;
    the Cholesky branch reports flag=2 when potrf fails or
    rcond < tol_skip, matching `rayleigh_ritz_modified_impl.inc:144-178`.

    ``Bblocks``: optional pre-applied (B@X, B@P, B@W) matching the S
    blocks — the Cholesky branch's B-Gram then costs zero operator
    applications (gram_blocks_pre).
    """
    blocks = as_blocks(S, nx)
    k = sum(b.shape[1] for b in blocks)
    m = nx
    live = masking.blocks_mask((m, m, k - 2 * m), (m, np_act, nw_act))
    n_live = m + np_act + nw_act
    # No tall [n, 3m] masking copy: dead-coordinate exclusion happens on
    # the k x k Grams via inject_diag (zeroing dead rows/cols exactly),
    # which costs O(k^2) instead of two resident n x 3m buffers — the
    # single largest HBM consumer at capacity-bound sizes.
    GA = masking.inject_diag(
        _a_gram(blocks, AX, A, out_dtype=rr_dtype, pack=pack), live, 0.0
    )
    sdt = blocks_dtype(S)

    def ortho_branch(_):
        H = _sentinel(GA, live)
        w, Z = jnp.linalg.eigh(H)
        Cx = Z[:, :nx]
        lam = w[:nx]
        Cp, p_cnt = _cp_extract(Z, nx, None, n_live)
        return RRResult(
            Cx.astype(sdt), Cp.astype(sdt), lam, jnp.int32(1), p_cnt
        )

    def chol_branch(_):
        GB = (
            gram_blocks(blocks, B, out_dtype=rr_dtype) if Bblocks is None
            else gram_blocks_pre(blocks, Bblocks, out_dtype=rr_dtype)
        )
        GB = masking.inject_diag(GB, live, 1.0)
        D, Gs = _scale_diag(GB)
        L = jnp.linalg.cholesky(Gs)
        chol_ok = ~jnp.any(jnp.isnan(L))
        # Guard NaNs out of the triangular solves so rcond stays finite.
        L_safe = jnp.where(chol_ok, L, jnp.eye(k, dtype=L.dtype))
        rcond = _rcond_upper_from_L(L_safe)
        ok = chol_ok & (rcond >= tol_skip)

        DiR = _dinv_r(L_safe, D)
        T1 = mm(GA, DiR)
        H = mm(DiR.conj().T, T1)
        H = _sentinel(H, live)
        w, Z = jnp.linalg.eigh(H)
        Cx = mm(DiR, Z[:, :nx])
        lam = w[:nx]
        Cp, p_cnt = _cp_extract(Z, nx, DiR, n_live)
        flag = jnp.where(ok, jnp.int32(0), jnp.int32(2))
        return RRResult(Cx.astype(sdt), Cp.astype(sdt), lam, flag, p_cnt)

    return jax.lax.cond(use_ortho >= 1, ortho_branch, chol_branch, None)
