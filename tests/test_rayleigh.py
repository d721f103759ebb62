"""Rayleigh-Ritz tests — oracles from
`/root/reference/tests/test_rayleigh_ritz.c` (fixed 4x4/6x6 dsyev
eigenvalues, B-orthonormality, both branches, mult=2/3)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lobpcg_tpu.ops.rayleigh import rayleigh_ritz, rayleigh_ritz_modified
from lobpcg_tpu.ops.svqb import svqb
from tests.fixtures import A4, A6, EIGVALS_4, EIGVALS_6, dense_op, rand_block


def test_rayleigh_ritz_full_space_4x4():
    # S spanning the full space reproduces dsyev eigenvalues exactly.
    A = dense_op(A4, jnp.float64)
    S = rand_block(41, 4, 4, jnp.float64)
    Cx, lam = rayleigh_ritz(S, A, None)
    np.testing.assert_allclose(np.asarray(lam), EIGVALS_4, atol=1e-12)
    X = np.asarray(S @ Cx)
    # B-orthonormal (B=I)
    np.testing.assert_allclose(X.T @ X, np.eye(4), atol=1e-10)
    # Rayleigh quotient diagonal
    G = X.T @ A4 @ X
    np.testing.assert_allclose(G, np.diag(EIGVALS_4), atol=1e-10)


def test_rayleigh_ritz_b_metric():
    rng = np.random.RandomState(42)
    n = 6
    M = rng.randn(n, n)
    Bm = M @ M.T + n * np.eye(n)
    A = dense_op(A6, jnp.float64)
    B = dense_op(Bm, jnp.float64)
    S = rand_block(43, n, n, jnp.float64)
    Cx, lam = rayleigh_ritz(S, A, B)
    import scipy.linalg as sla

    exact = sla.eigh(A6, Bm, eigvals_only=True)
    np.testing.assert_allclose(np.asarray(lam), exact, atol=1e-10)
    X = np.asarray(S @ Cx)
    np.testing.assert_allclose(X.T @ Bm @ X, np.eye(n), atol=1e-9)


@pytest.mark.parametrize("use_ortho", [0, 1])
def test_rrm_full_subspace_6x6(use_ortho):
    """[X|P|W] spanning R^6 with nx=2: lowest 2 Ritz values = dsyev."""
    n, m = 6, 2
    A = dense_op(A6, jnp.float64)
    S = rand_block(44, n, 3 * m, jnp.float64)
    if use_ortho:
        S, _ = svqb(S, 3 * m, None, tau=1e-12, drop=False)
    AX = jnp.asarray(A6) @ S[:, :m]
    rr = rayleigh_ritz_modified(
        S, AX, jnp.int32(m), jnp.int32(m), jnp.int32(use_ortho), A, None, nx=m
    )
    assert int(rr.flag) != 2
    np.testing.assert_allclose(np.asarray(rr.lam), EIGVALS_6[:m], atol=1e-9)
    X = np.asarray(S @ rr.Cx)
    np.testing.assert_allclose(X.T @ X, np.eye(m), atol=1e-8)
    # P = S Cp is orthonormal and orthogonal to X (Duersch Alg. 7 gives
    # an orthonormal complement basis in the B-inner product).
    P = np.asarray(S @ rr.Cp)
    np.testing.assert_allclose(P.T @ P, np.eye(m), atol=1e-8)
    np.testing.assert_allclose(X.T @ P, np.zeros((m, m)), atol=1e-8)


def test_rrm_masked_w_matches_smaller_problem():
    """Masking W columns must equal solving on the smaller subspace."""
    n, m = 12, 2
    A = dense_op(np.diag(np.arange(1.0, n + 1)), jnp.float64)
    Sfull = rand_block(45, n, 3 * m, jnp.float64)
    AX = np.diag(np.arange(1.0, n + 1)) @ Sfull[:, :m]
    # live: X(2) + P(2) + W(1)
    S_masked = Sfull.at[:, 5].set(0.0)
    rr = rayleigh_ritz_modified(
        S_masked, jnp.asarray(AX), jnp.int32(m), jnp.int32(1),
        jnp.int32(0), A, None, nx=m,
    )
    # reference computation: direct eigendecomposition of the projected
    # problem on the 5 live columns
    Sl = np.asarray(Sfull)[:, :5]
    GA = Sl.T @ np.diag(np.arange(1.0, n + 1)) @ Sl
    GB = Sl.T @ Sl
    import scipy.linalg as sla

    exact = sla.eigh(GA, GB, eigvals_only=True)[:m]
    np.testing.assert_allclose(np.asarray(rr.lam), exact, atol=1e-9)


def test_rrm_chol_failure_flags_retry():
    """Rank-deficient S must trip the rcond/Cholesky check -> flag 2
    (`rayleigh_ritz_modified_impl.inc:162-178`)."""
    n, m = 9, 1
    A = dense_op(np.eye(n), jnp.float64)
    v = rand_block(46, n, 1, jnp.float64)
    S = jnp.concatenate([v, v, v], axis=1)  # X=P=W: singular B-Gram
    rr = rayleigh_ritz_modified(
        S, None, jnp.int32(1), jnp.int32(1), jnp.int32(0), A, None, nx=m
    )
    assert int(rr.flag) == 2
