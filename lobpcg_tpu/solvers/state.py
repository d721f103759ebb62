"""Solver result containers."""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax


class SolveHistory(NamedTuple):
    """Per-iteration trace (recorded when SolverConfig.record_history).

    Rows >= `iterations` are zero.  The reference only *prints* these
    under its verbosity flag (`src/core/lobpcg_impl.inc:118-124,230-238`);
    here they are first-class outputs for convergence studies.
    """

    eigenvalues: jax.Array  # [max_iter, m] real
    residual_norms: jax.Array  # [max_iter, nev] real
    converged: jax.Array  # [max_iter] i32
    # Per-iteration solver status word (reference behavior surfaced as
    # data instead of stderr prints, `ilobpcg_impl.inc:228-256`):
    #   lobpcg:  RR path flag — 0 Cholesky ok, 1 ortho path, 2 Cholesky/
    #            rcond failure (ortho retry fired this iteration)
    #   ilobpcg: quality flag (1 good / 5 dual-basis projection)
    #            + 8 if the projected pencil solve failed (rr_failed)
    flags: jax.Array  # [max_iter] i32


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
    # Full [n, size_sub] X block — LOBPCG warm-restarts from X alone
    # (reference: caller-provided S is reused when nonzero,
    # `src/core/lobpcg_impl.inc:92-96`), so this is the checkpoint payload.
    basis: Optional[jax.Array] = None
    # P block at exit — optional warm-restart momentum (pass as P0).
    momentum: Optional[jax.Array] = None
    history: Optional[SolveHistory] = None
    # Times the Cholesky-path RR failed (rcond/potrf) and the ortho
    # retry fired (`lobpcg_impl.inc:180-196` counted, not just printed).
    ortho_retries: Optional[jax.Array] = None  # i32


class ILOBPCGResult(NamedTuple):
    eigenvalues: jax.Array  # [nev] real
    eigenvectors: jax.Array  # [n, nev]
    residual_norms: jax.Array  # [nev] real
    signature: jax.Array  # [nev] i32 (+1/-1 per eigenpair)
    converged: jax.Array  # i32
    iterations: jax.Array  # i32
    basis: Optional[jax.Array] = None  # full [n, size_sub] X block
    momentum: Optional[jax.Array] = None  # P block (warm-restart extra)
    history: Optional[SolveHistory] = None
    # Failure/quality observability (`ilobpcg_impl.inc:228-256` made
    # countable): iterations that took the quality=5 dual-basis path,
    # and projected pencil solves that failed outright (NaN-poisoned
    # eigenvalues; with rr_method='cholesky' this means no definite
    # combination of (GA, GB) was found).
    quality5_count: Optional[jax.Array] = None  # i32
    rr_fail_count: Optional[jax.Array] = None  # i32
