"""Chebyshev approximate-inverse preconditioner (operators/chebyshev.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from lobpcg_tpu import lobpcg
from lobpcg_tpu.operators.chebyshev import ChebyshevFilter
from lobpcg_tpu.ops.residual import estimate_norm
from fixtures import laplacian_exact, laplacian_op, rand_block


def _eigvec(n, k):
    x = np.arange(1, n + 1) / (n + 1)
    v = np.sin(k * np.pi * x)
    return v / np.linalg.norm(v)


def _eigval(n, k):
    h = 1.0 / (n + 1)
    return 4.0 / h**2 * np.sin(k * np.pi * h / 2) ** 2


def test_filter_approximates_inverse_on_interval():
    """On eigenvectors with lambda in [lo, hi]: T v ~ v / lambda."""
    n, d = 200, 12
    A = laplacian_op(n, jnp.float64)
    hi = 4.0 * (n + 1) ** 2
    lo = hi / 30
    T = ChebyshevFilter(op=A, lo=jnp.float64(lo), hi=jnp.float64(hi),
                        degree=d)
    for k in (60, 120, 199):  # eigenvalues inside [lo, hi]
        lam = _eigval(n, k)
        assert lam >= lo
        v = jnp.asarray(_eigvec(n, k)[:, None])
        Tv = np.asarray(T.matmat(v))[:, 0]
        np.testing.assert_allclose(Tv, np.asarray(v)[:, 0] / lam,
                                   atol=5e-2 / lam)


def test_filter_positive_gains():
    """p(lambda) > 0 across the whole spectrum — T is SPD, as LOBPCG
    requires."""
    n = 150
    A = laplacian_op(n, jnp.float64)
    hi = 4.0 * (n + 1) ** 2
    T = ChebyshevFilter(op=A, lo=jnp.float64(hi / 30),
                        hi=jnp.float64(hi), degree=10)
    for k in (1, 5, 20, 75, 150):
        v = jnp.asarray(_eigvec(n, k)[:, None])
        p_lam = float((np.asarray(v).T @ np.asarray(T.matmat(v))).item())
        assert p_lam > 0, (k, p_lam)


def test_filter_amplifies_low_relative_to_high():
    n = 100
    A = laplacian_op(n, jnp.float64)
    hi = 4.0 * (n + 1) ** 2
    T = ChebyshevFilter(op=A, lo=jnp.float64(hi / 20),
                        hi=jnp.float64(hi), degree=10)
    g = {}
    for k in (1, 100):
        v = jnp.asarray(_eigvec(n, k)[:, None])
        g[k] = float(jnp.linalg.norm(T.matmat(v)))
    assert g[1] > 20 * g[100]


def test_chebyshev_accelerates_lobpcg():
    """Stiff 1/h^2 Laplacian: the filter converges where the plain run
    cannot within the same budget."""
    n, nev, ss = 1000, 3, 6
    A = laplacian_op(n, jnp.float64)
    X0 = rand_block(9, n, ss, jnp.float64)
    key = jax.random.PRNGKey(0)

    plain = lobpcg(A, X0, nev=nev, size_sub=ss, tol=1e-7, max_iter=300,
                   key=key)

    hi = float(estimate_norm(A, jax.random.PRNGKey(1), 20)) * 1.05
    T = ChebyshevFilter(op=A, lo=jnp.float64(hi / 50),
                        hi=jnp.float64(hi), degree=12)
    fast = lobpcg(A, X0, T=T, nev=nev, size_sub=ss, tol=1e-7, max_iter=300,
                  key=key)

    assert int(fast.converged) == nev
    exact = laplacian_exact(np.arange(1, nev + 1))
    rel = np.abs(np.asarray(fast.eigenvalues) - exact) / exact
    assert np.all(rel < 1e-2), rel
    assert int(fast.iterations) < int(plain.iterations) or (
        int(plain.converged) < nev
    )
    assert int(fast.iterations) <= 100
