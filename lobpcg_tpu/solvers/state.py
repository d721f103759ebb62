"""Solver result containers."""

from __future__ import annotations

from typing import NamedTuple

import jax


class LOBPCGResult(NamedTuple):
    """Outputs matching the reference's exit contract
    (`src/core/lobpcg_impl.inc:54-58`): eigenvectors in the first nev
    columns of X, eigenvalues, residual norms, converged count, iterations.
    """

    eigenvalues: jax.Array  # [nev] real
    eigenvectors: jax.Array  # [n, nev]
    residual_norms: jax.Array  # [nev] real
    converged: jax.Array  # i32 — number of converged eigenpairs (prefix)
    iterations: jax.Array  # i32


class ILOBPCGResult(NamedTuple):
    eigenvalues: jax.Array  # [nev] real
    eigenvectors: jax.Array  # [n, nev]
    residual_norms: jax.Array  # [nev] real
    signature: jax.Array  # [nev] i32 (+1/-1 per eigenpair)
    converged: jax.Array  # i32
    iterations: jax.Array  # i32
