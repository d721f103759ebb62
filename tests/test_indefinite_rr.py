"""Indefinite RR unit tests — oracles from
`/root/reference/tests/test_indefinite_rr.c` (analytic eigenvalues for
diagonal/permutation B, B-normalization, signature sort)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg as sla

from lobpcg_tpu.ops.indefinite import (
    indefinite_rayleigh_ritz,
    indefinite_rayleigh_ritz_modified,
    signature_sort,
)
from lobpcg_tpu.ops.pencil import pencil_eig_cholesky, pencil_eig_qz
from tests.fixtures import dense_op, diag_op, rand_block


def _ref_pencil(GA, GB):
    w, vr = sla.eig(GA, GB)
    return np.real(w)


def test_signature_sort_order():
    lam = jnp.array([3.0, -1.0, 1.0, -5.0, 2.0])
    sig = jnp.array([1, -1, 1, -1, 0], dtype=jnp.int32)
    perm = signature_sort(lam, sig)
    # positives ascending: 1, 3; negatives descending: -1, -5; zeros last
    np.testing.assert_array_equal(
        np.asarray(lam[perm]), [1.0, 3.0, -1.0, -5.0, 2.0]
    )
    np.testing.assert_array_equal(np.asarray(sig[perm]), [1, 1, -1, -1, 0])


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_pencil_cholesky_matches_qz(dtype):
    k = 8
    rng = np.random.RandomState(61)
    Ma = rng.randn(k, k)
    GA = Ma @ Ma.T + k * np.eye(k)  # HPD
    Mb = rng.randn(k, k)
    GB = Mb + Mb.T  # Hermitian indefinite
    if jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating):
        Za = rng.randn(k, k) * 1j
        GA = GA + Za - Za.conj().T  # keep Hermitian: GA + (Z - Z^H) is not
        GA = 0.5 * (GA + GA.conj().T)
        GB = GB + 1j * (Mb - Mb.T)
        GB = 0.5 * (GB + GB.conj().T)
    GAj, GBj = jnp.asarray(GA, dtype), jnp.asarray(GB, dtype)
    lam_c, V_c, ok = pencil_eig_cholesky(GAj, GBj, 1e-30)
    assert bool(ok)
    lam_q, V_q, _ = pencil_eig_qz(GAj, GBj, 1e-30)
    np.testing.assert_allclose(
        np.sort(np.asarray(lam_c)), np.sort(np.asarray(lam_q)), rtol=1e-8
    )
    # residual check on the cholesky path: GA v = lam GB v
    for i in range(k):
        v = np.asarray(V_c)[:, i]
        r = GA @ v - float(lam_c[i]) * (GB @ v)
        assert np.abs(r).max() < 1e-7 * max(1.0, abs(float(lam_c[i])))


@pytest.mark.parametrize(
    "dtype,tol",
    [
        (jnp.float64, 1e-10),
        (jnp.complex128, 1e-10),
        (jnp.float32, 2e-5),
        (jnp.complex64, 2e-5),
    ],
)
def test_indefinite_rr_diag_b(dtype, tol):
    """B = diag(+-1), A diagonal: analytic eigenvalues a_i / b_i
    with signature sign(b_i) — all four scalar types, matching the
    reference's s/d/c/z instantiation tests
    (`test_indefinite_rr.c:229-476`)."""
    n = 8
    a = np.array([4.0, 3.0, 2.0, 1.0, 5.0, 6.0, 7.0, 8.0])
    b = np.array([1, 1, 1, 1, -1, -1, -1, -1], dtype=np.float64)
    A = dense_op(np.diag(a), dtype)
    B = dense_op(np.diag(b), dtype)
    X = jnp.eye(n, dtype=dtype)  # full space
    Cx, lam, sig, ok = indefinite_rayleigh_ritz(
        X, A, B, method="cholesky", tiny=1e-30
    )
    assert bool(ok)
    # positive eigenvalues ascending: 1,2,3,4 (sig +1); negative
    # descending: -5,-6,-7,-8 (sig -1)
    np.testing.assert_allclose(
        np.asarray(lam), [1, 2, 3, 4, -5, -6, -7, -8], atol=tol
    )
    np.testing.assert_array_equal(np.asarray(sig), [1, 1, 1, 1, -1, -1, -1, -1])
    # B-normalized columns: |v^H B v| = 1
    V = np.asarray(X @ Cx)
    d = np.diag(V.conj().T @ np.diag(b) @ V).real
    np.testing.assert_allclose(np.abs(d), np.ones(n), atol=10 * tol)


def _pair_swap(n):
    P = np.zeros((n, n))
    for i in range(n // 2):
        P[2 * i, 2 * i + 1] = 1.0
        P[2 * i + 1, 2 * i] = 1.0
    if n % 2:
        P[n - 1, n - 1] = 1.0
    return P


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_indefinite_rr_perm(dtype):
    """A = diag(1..6), B = adjacent-pair swap permutation: analytic
    eigenvalues +-sqrt(a_{2i} a_{2i+1}) = +-{sqrt2, sqrt12, sqrt30}
    with sig [1,1,1,-1,-1,-1] (`test_indefinite_rr.c:701-818`)."""
    n = 6
    A = dense_op(np.diag(np.arange(1.0, n + 1)), dtype)
    Bm = _pair_swap(n)
    B = dense_op(Bm, dtype)
    X = jnp.eye(n, dtype=dtype)
    Cx, lam, sig, ok = indefinite_rayleigh_ritz(
        X, A, B, method="cholesky", tiny=1e-30
    )
    assert bool(ok)
    e = [np.sqrt(2.0), np.sqrt(12.0), np.sqrt(30.0)]
    np.testing.assert_allclose(np.asarray(lam), e + [-x for x in e],
                               atol=1e-10)
    np.testing.assert_array_equal(np.asarray(sig), [1, 1, 1, -1, -1, -1])
    # B-sig-orthonormality: X^H B X = diag(sig)
    V = np.asarray(X @ Cx)
    G = V.conj().T @ Bm @ V
    np.testing.assert_allclose(G, np.diag(np.asarray(sig)), atol=1e-10)


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_indefinite_rr_dense(dtype):
    """Dense A (the 6x6 reference fixture), B = diag(+-1): structural
    checks — Rayleigh diagonality X^H A X = diag(sig_i lam_i),
    B-sig-orthonormality, and the signature sort order
    (`test_indefinite_rr.c:948-1081`)."""
    from tests.fixtures import A6

    n = 6
    Bd = np.diag([1.0, 1, 1, -1, -1, -1])
    A = dense_op(A6, dtype)
    B = dense_op(Bd, dtype)
    X = jnp.eye(n, dtype=dtype)
    Cx, lam, sig, ok = indefinite_rayleigh_ritz(
        X, A, B, method="cholesky", tiny=1e-30
    )
    assert bool(ok)
    lam = np.asarray(lam)
    sig = np.asarray(sig)
    V = np.asarray(X @ Cx)
    # Rayleigh diagonality: V^H A V = diag(sig * lam)
    np.testing.assert_allclose(
        V.conj().T @ A6 @ V, np.diag(sig * lam), atol=1e-8
    )
    # B-sig-orthonormality
    np.testing.assert_allclose(
        V.conj().T @ Bd @ V, np.diag(sig.astype(float)), atol=1e-8
    )
    # Sort: positives ascending then negatives descending
    n_pos = int((sig == 1).sum())
    assert np.all(np.diff(lam[:n_pos]) >= 0)
    assert np.all(np.diff(lam[n_pos:]) <= 0)


def test_indefinite_rr_modified_mult3_diag():
    """mult=3 identity-S case: A = diag(1..9), B = diag(1x5, -1x4),
    S = I_9 -> eigenvalues {1, 2, 3} (`test_indefinite_rr.c:553-619`
    d_indef_rr_modified_diag_mult3)."""
    n, m = 9, 3
    A = dense_op(np.diag(np.arange(1.0, n + 1)), jnp.float64)
    B = dense_op(np.diag([1.0] * 5 + [-1.0] * 4), jnp.float64)
    S = jnp.eye(n)
    AX = jnp.asarray(np.diag(np.arange(1.0, n + 1))) @ S[:, :m]
    rr = indefinite_rayleigh_ritz_modified(
        S, AX, jnp.int32(m), jnp.int32(n - 2 * m), A, B,
        nx=m, method="cholesky", tiny=1e-30, quality_tol=1e-12,
        eps_ortho=1e-12, eps_drop=1e-12,
    )
    np.testing.assert_allclose(np.asarray(rr.lam), [1.0, 2.0, 3.0],
                               atol=1e-10)


@pytest.mark.parametrize("method", ["cholesky", "qz", "auto"])
def test_indefinite_rr_modified_full_space(method):
    """[X|P|W] spanning the space: first nx sorted pencil eigenvalues."""
    n, m = 6, 2
    rng = np.random.RandomState(62)
    Ma = rng.randn(n, n)
    Am = Ma @ Ma.T + n * np.eye(n)
    Bm = np.diag([1.0, 1, 1, -1, -1, -1])
    A, B = dense_op(Am, jnp.float64), dense_op(Bm, jnp.float64)
    S = rand_block(63, n, 3 * m, jnp.float64)
    AX = jnp.asarray(Am) @ S[:, :m]
    rr = indefinite_rayleigh_ritz_modified(
        S, AX, jnp.int32(m), jnp.int32(m), A, B,
        nx=m, method=method, tiny=1e-30, quality_tol=1e-12,
        eps_ortho=1e-12, eps_drop=1e-12,
    )
    # oracle: scipy eig on the projected pencil, positives ascending
    Sn = np.asarray(S)
    w = np.real(sla.eig(Sn.T @ Am @ Sn, Sn.T @ Bm @ Sn)[0])
    pos = np.sort(w[w > 0])
    np.testing.assert_allclose(np.asarray(rr.lam), pos[:m], rtol=1e-8)
    assert int(rr.quality) in (1, 5)
    # Cp top rows are outputs of coefficient ortho — P stays inside the
    # complement: S @ Cp must be B-orthogonal to S @ Cx.
    X = Sn @ np.asarray(rr.Cx_ortho)
    P = Sn @ np.asarray(rr.Cp)
    assert np.abs(X.T @ Bm @ P).max() < 1e-6


def test_indefinite_rr_modified_masked_w():
    """Masked W column must not change the live projected spectrum."""
    n, m = 9, 2
    rng = np.random.RandomState(64)
    Ma = rng.randn(n, n)
    Am = Ma @ Ma.T + n * np.eye(n)
    Bm = np.diag(np.concatenate([np.ones(5), -np.ones(4)]))
    A, B = dense_op(Am, jnp.float64), dense_op(Bm, jnp.float64)
    S = rand_block(65, n, 3 * m, jnp.float64)
    S = S.at[:, 5].set(0.0)  # one dead W column
    AX = jnp.asarray(Am) @ S[:, :m]
    rr = indefinite_rayleigh_ritz_modified(
        S, AX, jnp.int32(m), jnp.int32(1), A, B,
        nx=m, method="cholesky", tiny=1e-30, quality_tol=1e-12,
        eps_ortho=1e-12, eps_drop=1e-12,
    )
    Sl = np.asarray(S)[:, :5]
    w = np.real(sla.eig(Sl.T @ Am @ Sl, Sl.T @ Bm @ Sl)[0])
    pos = np.sort(w[w > 0])
    np.testing.assert_allclose(np.asarray(rr.lam), pos[:m], rtol=1e-8)
    # sentinels carry signature 0 and sort last
    assert int(rr.sig[-1]) == 0
