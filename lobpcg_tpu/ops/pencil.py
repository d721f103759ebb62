"""Projected generalized (nonsymmetric pencil) eigensolve for the
indefinite Rayleigh-Ritz: GA v = lambda GB v on a tiny k x k pair.

The reference calls LAPACK GGEV (`src/rayleigh/indefinite_rr_impl.inc:82-95`).
XLA has no nonsymmetric generalized eigensolver, so (SURVEY.md §7 hard
part 1) this module provides:

- 'cholesky' (default): the Kressner-Pandur-Shao reduction for a
  Hermitian-definite GA — GA = L L^H, M = L^{-1} GB L^{-H} (Hermitian),
  eigh(M) = (mu, Q), then lambda = 1/mu, v = L^{-H} Q, and
  v^H GB v = mu so the signature is sign(mu) for free.  Fully on-device:
  potrf + 2 trsm + eigh, no host round-trip inside the solver loop.
- 'qz': scipy.linalg.eig (QZ) via `jax.pure_callback` — handles
  indefinite/singular GA; serializes at each iteration but the matrix is
  only (3*size_sub)^2.
- 'auto': cholesky, with a QZ fallback selected by `lax.cond` when
  potrf produces NaN.

Eigenvalue guard: |beta| (resp. |mu|) below `tiny` maps to +-1e30
sentinels, matching `indefinite_rr_impl.inc:99-108`.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular

from lobpcg_tpu.ops.gram import mm

BIG = 1e30


def _sentinel_lambda(num, den, tiny, rdt):
    """lambda = num/den, guarded: |den| <= tiny -> +-BIG by sign(Re num)."""
    ok = jnp.abs(den) > tiny
    lam = jnp.where(ok, (num / jnp.where(ok, den, 1.0)).real, 0.0)
    sent = jnp.where(num.real >= 0, BIG, -BIG)
    return jnp.where(ok, lam, sent).astype(rdt)


def pencil_eig_cholesky(GA: jax.Array, GB: jax.Array, tiny: float):
    """KPS reduction.  Returns (lam [k] real, V [k,k], ok scalar bool).

    Requires GA Hermitian positive definite (true for the BdG family:
    GA = S^H A S with A SPD and S full column rank).
    """
    rdt = jnp.zeros((), GA.dtype).real.dtype
    GAh = 0.5 * (GA + GA.conj().T)
    GBh = 0.5 * (GB + GB.conj().T)
    L = jnp.linalg.cholesky(GAh)
    ok = ~jnp.any(jnp.isnan(L))
    L_safe = jnp.where(ok, L, jnp.eye(GA.shape[0], dtype=GA.dtype))
    Y = solve_triangular(L_safe, GBh, lower=True)  # L^-1 GB
    M = solve_triangular(L_safe, Y.conj().T, lower=True).conj().T
    M = 0.5 * (M + M.conj().T)
    mu, Q = jnp.linalg.eigh(M)
    # v = L^-H q;  GA v = (1/mu) GB v;  v^H GB v = mu.
    V = solve_triangular(L_safe, Q.astype(GA.dtype), lower=True, trans=2)
    lam = _sentinel_lambda(
        jnp.ones_like(mu).astype(GA.dtype), mu.astype(GA.dtype), tiny, rdt
    )
    # A failed potrf must not masquerade as a valid solve: poison the
    # outputs so residuals go NaN and the failure is visible (callers of
    # method='cholesky' opted out of the QZ fallback that 'auto' takes).
    nan = jnp.asarray(jnp.nan, rdt)
    lam = jnp.where(ok, lam, nan)
    V = jnp.where(ok, V, jnp.asarray(jnp.nan, V.dtype))
    return lam, V, ok


def _qz_host(GA: np.ndarray, GB: np.ndarray):
    """Host QZ via scipy; returns (alpha, beta, VR) with VR cast back to
    the input dtype (for real dtypes the reference's dggev also produces
    real VR columns up to conjugate-pair packing, which the C code reads
    as real — same caveat here)."""
    import scipy.linalg as sla

    w, vr = sla.eig(GA, GB, homogeneous_eigvals=True)
    alpha, beta = np.asarray(w)[0], np.asarray(w)[1]
    dt = GA.dtype
    cdt = np.result_type(dt, np.complex64)
    return (
        alpha.astype(cdt),
        beta.astype(cdt),
        vr.real.astype(dt) if np.isrealobj(np.zeros((), dt)) else vr.astype(dt),
    )


def pencil_eig_qz(GA: jax.Array, GB: jax.Array, tiny: float):
    """GGEV parity path: QZ on host through pure_callback."""
    k = GA.shape[0]
    dt = GA.dtype
    rdt = jnp.zeros((), dt).real.dtype
    cdt = jnp.result_type(dt, jnp.complex64)
    shapes = (
        jax.ShapeDtypeStruct((k,), cdt),
        jax.ShapeDtypeStruct((k,), cdt),
        jax.ShapeDtypeStruct((k, k), dt),
    )
    alpha, beta, VR = jax.pure_callback(_qz_host, shapes, GA, GB, vmap_method="sequential")
    lam = _sentinel_lambda(alpha, beta, tiny, rdt)
    return lam, VR, jnp.bool_(True)


def pencil_eig(
    GA: jax.Array, GB: jax.Array, *, method: str, tiny: float
) -> Tuple[jax.Array, jax.Array]:
    """Dispatch: returns (lam [k] real, V [k,k] raw eigenvectors)."""
    if method == "cholesky":
        lam, V, _ = pencil_eig_cholesky(GA, GB, tiny)
        return lam, V
    if method == "qz":
        lam, V, _ = pencil_eig_qz(GA, GB, tiny)
        return lam, V
    if method == "auto":
        lam_c, V_c, ok = pencil_eig_cholesky(GA, GB, tiny)

        def fallback(_):
            lam_q, V_q, _ = pencil_eig_qz(GA, GB, tiny)
            return lam_q, V_q

        return jax.lax.cond(ok, lambda _: (lam_c, V_c), fallback, None)
    raise ValueError(f"unknown pencil method {method!r}")
