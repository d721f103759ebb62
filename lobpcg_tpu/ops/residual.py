"""Residuals, residual norms, and operator-norm estimation.

Reference: `src/residual/residual_impl.inc:32-99` and
`src/residual/estimate_norm_impl.inc:19-57`.

The residual W = A X - B X diag(lambda) is one fused SpMM +
broadcast-scale-subtract; XLA fuses the scale/subtract into the operator
application epilogue.  `estimate_norm` keeps the reference's 10-step power
iteration but with an explicit PRNG key (the reference's wall-clock
seeding is a reproducibility defect its own CODE_REVIEW flags).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lobpcg_tpu.ops.gram import apply_block_op
from lobpcg_tpu.operators.linop import LinearOperator
from lobpcg_tpu.utils.prng import fill_random


def get_residual(
    X: jax.Array,
    AX: Optional[jax.Array],
    lam: jax.Array,
    A: LinearOperator,
    B: Optional[LinearOperator] = None,
    BX: Optional[jax.Array] = None,
) -> jax.Array:
    """W = A X - B X diag(lam).  AX may be a cached A@X (the reference's
    AX field, `residual_impl.inc:38-41`); BX likewise a pre-applied B@X
    (the ilobpcg recovery path reuses its top-of-iteration application)."""
    W = A.matmat(X) if AX is None else AX
    if BX is None:
        BX = apply_block_op(B, X)
    return W - BX * lam[None, :].astype(BX.dtype)


def get_residual_norm(
    W: jax.Array,
    lam: jax.Array,
    a_norm,
    b_norm,
    nev: int,
) -> jax.Array:
    """Backward-error style relative norms for the first nev columns:
    resNorm[i] = ||W[:, i]||_2 / (||A|| + |lam_i| * ||B||).
    Reference: `residual_impl.inc:77-99` (note: it uses the 2-norm even
    with B present; we keep that behavior for parity)."""
    nom = jnp.sqrt(jnp.sum(jnp.abs(W[:, :nev]) ** 2, axis=0))
    b_norm = jnp.where(b_norm > 0, b_norm, 1.0)
    # lam may be high precision (mixed-precision RR); norms stay in the
    # storage real dtype so the solver carry keeps a fixed dtype.
    denom = a_norm + jnp.abs(lam[:nev]).astype(nom.dtype) * b_norm
    return (nom / denom).astype(nom.dtype)


def estimate_norm(
    A: LinearOperator,
    key: jax.Array,
    iters: int = 10,
) -> jax.Array:
    """||A|| estimate via power iteration from a random start vector.
    Reference: `estimate_norm_impl.inc:38-57`."""
    n = A.shape[0]
    v = fill_random(key, (n, 1), A.dtype)
    nrm0 = jnp.sqrt(jnp.sum(jnp.abs(v) ** 2))
    v = v / nrm0.astype(v.dtype)

    def body(_, carry):
        v, _ = carry
        w = A.matmat(v)
        nrm = jnp.sqrt(jnp.sum(jnp.abs(w) ** 2))
        w = jnp.where(nrm > 0, w / nrm.astype(w.dtype), w)
        return w, nrm

    _, nrm = jax.lax.fori_loop(0, iters, body, (v, nrm0))
    return nrm
