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


def test_indefinite_rr_diag_b():
    """B = diag(+-1), A diagonal: analytic eigenvalues a_i / b_i
    with signature sign(b_i) (`test_indefinite_rr.c` diag cases)."""
    n = 8
    a = np.array([4.0, 3.0, 2.0, 1.0, 5.0, 6.0, 7.0, 8.0])
    b = np.array([1, 1, 1, 1, -1, -1, -1, -1], dtype=np.float64)
    A = diag_op(n, jnp.float64)
    A = dense_op(np.diag(a), jnp.float64)
    B = dense_op(np.diag(b), jnp.float64)
    X = jnp.eye(n)  # full space
    Cx, lam, sig, ok = indefinite_rayleigh_ritz(
        X, A, B, method="cholesky", tiny=1e-30
    )
    assert bool(ok)
    # positive eigenvalues ascending: 1,2,3,4 (sig +1); negative
    # descending: -5,-6,-7,-8 (sig -1)
    np.testing.assert_allclose(
        np.asarray(lam), [1, 2, 3, 4, -5, -6, -7, -8], atol=1e-10
    )
    np.testing.assert_array_equal(np.asarray(sig), [1, 1, 1, 1, -1, -1, -1, -1])
    # B-normalized columns: |v^H B v| = 1
    V = np.asarray(X @ Cx)
    d = np.diag(V.T @ np.diag(b) @ V)
    np.testing.assert_allclose(np.abs(d), np.ones(n), atol=1e-10)


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
