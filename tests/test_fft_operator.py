"""Complex Hermitian matrix-free operator applied via FFT — the
BASELINE.json config 4 workload ("Complex-double Hermitian matrix-free
operator (FFT-applied), 50 eigenpairs").

A circulant operator A = F^H diag(s) F with a real symbol s is Hermitian
with eigenvalues exactly s (eigenvectors = Fourier modes).  The operator
and its Fourier-space preconditioner flow through CallableOperator — the
matrix-free interface of the reference (`include/lobpcg/linop.h:13-53`)
— as jittable block functions.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lobpcg_tpu import CallableOperator, SolverConfig, lobpcg
from fixtures import rand_block


def _circulant_ops(n, dtype, shift=1.0):
    """(A, T): A x = ifft(s * fft(x)) with strictly increasing real
    symbol s; T = Fourier-space Jacobi (A + shift)^-1."""
    rdt = jnp.zeros((), dtype).real.dtype
    s = 0.5 + jnp.arange(n, dtype=rdt)  # distinct, positive, spacing 1

    def apply_A(X, s):
        return jnp.fft.ifft(
            s[:, None] * jnp.fft.fft(X, axis=0), axis=0
        ).astype(dtype)

    def apply_T(X, s):
        return jnp.fft.ifft(
            jnp.fft.fft(X, axis=0) / (s[:, None] + shift), axis=0
        ).astype(dtype)

    A = CallableOperator(args=(s,), fn=apply_A, n=n, _dtype=dtype)
    T = CallableOperator(args=(s,), fn=apply_T, n=n, _dtype=dtype)
    return A, T, np.asarray(s)


def test_z_fft_circulant_50_eigenpairs():
    """50 smallest eigenpairs of a 512-dim complex-double circulant."""
    n, nev, ss = 512, 50, 60
    A, T, s = _circulant_ops(n, jnp.complex128)
    X0 = rand_block(17, n, ss, jnp.complex128)
    r = lobpcg(A, X0, T=T, nev=nev, size_sub=ss, tol=1e-8, max_iter=200)
    assert int(r.converged) == nev
    np.testing.assert_allclose(
        np.asarray(r.eigenvalues), s[:nev], rtol=1e-6
    )
    # Eigenvectors are orthonormal.
    V = np.asarray(r.eigenvectors)
    G = V.conj().T @ V
    np.testing.assert_allclose(G, np.eye(nev), atol=1e-6)


def test_c_fft_circulant_f32():
    """complex64 run of the same workload (reference c32 parity)."""
    n, nev, ss = 256, 8, 12
    A, T, s = _circulant_ops(n, jnp.complex64)
    X0 = rand_block(23, n, ss, jnp.complex64)
    r = lobpcg(A, X0, T=T, nev=nev, size_sub=ss, tol=1e-4, max_iter=200)
    got = np.sort(np.asarray(r.eigenvalues))
    np.testing.assert_allclose(got, s[:nev], rtol=1e-2)


def test_z_fft_circulant_mixed_precision():
    """complex64 storage + complex128 RR (mixed precision, complex)."""
    n, nev, ss = 256, 8, 12
    A, T, s = _circulant_ops(n, jnp.complex64)
    X0 = rand_block(29, n, ss, jnp.complex64)
    cfg = SolverConfig(nev=nev, size_sub=ss, tol=1e-4, max_iter=200,
                       rr_dtype="float64")
    r = lobpcg(A, X0, T=T, config=cfg)
    assert r.eigenvalues.dtype == jnp.float64
    np.testing.assert_allclose(
        np.sort(np.asarray(r.eigenvalues)), s[:nev], rtol=1e-2
    )


def test_callable_operator_hermitian_check():
    n = 64
    A, _, _ = _circulant_ops(n, jnp.complex128)
    X = rand_block(5, n, 3, jnp.complex128)
    Y = rand_block(6, n, 3, jnp.complex128)
    lhs = np.asarray(Y).conj().T @ np.asarray(A.matmat(X))
    rhs = (np.asarray(X).conj().T @ np.asarray(A.matmat(Y))).conj().T
    np.testing.assert_allclose(lhs, rhs, atol=1e-10)
