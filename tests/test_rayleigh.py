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


def test_block_dinv_r_whitening_invariants():
    """The spectral block whitening must (a) whiten the full Gram,
    (b) be exactly block-upper-triangular at the nx boundary (the
    structural property Duersch's Cp extraction needs), and (c) report
    a 2-norm-scale rcond."""
    from lobpcg_tpu.ops.rayleigh import _block_dinv_r
    from lobpcg_tpu.ops import masking

    rng = np.random.RandomState(3)
    k, nx = 15, 5
    M = rng.randn(k, k)
    G = M @ M.T + k * np.eye(k)
    live = masking.blocks_mask((5, 5, 5), (5, 2, 4))  # partial P/W masks
    G = np.asarray(masking.inject_diag(jnp.asarray(G), live, 1.0))
    DiR, ok, rcond = _block_dinv_r(jnp.asarray(G), nx)
    DiR = np.asarray(DiR)
    assert bool(ok)
    np.testing.assert_allclose(DiR.T @ G @ DiR, np.eye(k), atol=1e-12)
    np.testing.assert_array_equal(DiR[nx:, :nx], 0.0)
    s = np.linalg.eigvalsh((G * np.outer(1/np.sqrt(np.diag(G)),
                                         1/np.sqrt(np.diag(G)))))
    assert 0.1 * np.sqrt(s[0] / s[-1]) < float(rcond) < 10.0


def test_chol_branch_pencil_sentinels_keep_dead_out():
    """With dead P/W coordinates, the chol branch's pencil-form
    sentinels must keep dead directions out of the lowest-nx Ritz
    pairs (no spurious near-zero eigenvalues), even though the
    spectral whitening may mix dead coordinates."""
    from lobpcg_tpu.ops.rayleigh import rayleigh_ritz_modified
    from fixtures import dense_op

    rng = np.random.RandomState(4)
    n, m = 60, 5
    Am = rng.randn(n, n)
    Am = Am @ Am.T + n * np.eye(n)
    A = dense_op(Am, jnp.float64)
    X = np.linalg.qr(rng.randn(n, m))[0]
    P = np.zeros((n, m))
    P[:, :2] = np.linalg.qr(rng.randn(n, 2))[0]  # 2 live P cols, 3 dead
    W = np.zeros((n, m))
    W[:, :4] = rng.randn(n, 4)  # 4 live W cols, 1 dead
    rr = rayleigh_ritz_modified(
        (jnp.asarray(X), jnp.asarray(P), jnp.asarray(W)),
        None, jnp.int32(2), jnp.int32(4), jnp.int32(0), A, None, nx=m,
    )
    lam = np.asarray(rr.lam)
    exact = np.linalg.eigvalsh(Am)
    # All nx Ritz values are genuine (within the matrix spectrum and
    # above the smallest true eigenvalue), none are dead-coordinate
    # artifacts at ~0 or at the sentinel magnitude.
    assert int(rr.flag) in (0, 1)
    assert np.all(lam >= exact[0] - 1e-8), lam
    assert np.all(lam <= exact[-1] + 1e-8), lam
