"""Shared test fixtures: the reference suite's oracle matrices and
operators, re-expressed for JAX.

Sources: `/root/reference/tests/test_lobpcg.c:88-114` (dense 4x4/6x6 with
dsyev eigenvalues), `tests/test_lobpcg.c:48-62` (1-D Dirichlet Laplacian
with analytic (k*pi)^2 spectrum), `tests/test_ilobpcg.c:28-90` (BdG-style
block operators).
"""

import numpy as np
import jax.numpy as jnp

from lobpcg_tpu.operators.linop import (
    BlockAntiDiagOperator,
    BlockDiagOperator,
    DenseOperator,
    DiagonalOperator,
    Laplacian1D,
)

# Column-major in C == symmetric here, so plain reshape is fine.
A4 = np.array(
    [
        [4.0, 1.0, 2.0, 0.0],
        [1.0, 3.0, 0.0, 1.0],
        [2.0, 0.0, 5.0, 2.0],
        [0.0, 1.0, 2.0, 6.0],
    ]
)

A6 = np.array(
    [
        [4.0, 1.0, 2.0, 0.0, 1.0, 0.5],
        [1.0, 3.0, 0.0, 1.0, 0.5, 0.0],
        [2.0, 0.0, 5.0, 2.0, 1.0, 1.0],
        [0.0, 1.0, 2.0, 6.0, 1.5, 0.0],
        [1.0, 0.5, 1.0, 1.5, 5.0, 2.0],
        [0.5, 0.0, 1.0, 0.0, 2.0, 4.0],
    ]
)

EIGVALS_4 = np.array(
    [
        1.338399579631295e00,
        3.463077212970466e00,
        5.000000000000000e00,
        8.198523207398235e00,
    ]
)

EIGVALS_6 = np.array(
    [
        1.208742643127633e00,
        2.230197331224639e00,
        3.615464945758393e00,
        4.717703764957660e00,
        5.517221003524097e00,
        9.710670311407574e00,
    ]
)


def dense_op(Amat, dtype):
    return DenseOperator(jnp.asarray(Amat, dtype))


def laplacian_op(n, dtype):
    """1-D Dirichlet Laplacian on (0,1) with n interior points."""
    h = 1.0 / (n + 1)
    return Laplacian1D(scale=jnp.asarray(1.0 / (h * h), dtype), n=n)


def laplacian_exact(k):
    """Continuum eigenvalues (k*pi)^2 (tests use 1% tolerance vs these)."""
    return (k * np.pi) ** 2


def diag_op(n, dtype):
    """A = diag(1, 2, ..., n) — soft-locking fixture."""
    return DiagonalOperator(jnp.arange(1, n + 1, dtype=dtype))


def bdg_ops(m, dtype, r=None):
    """BdG-style pencil: A = diag(K, K), B = antidiag(D, D).

    D = I when r is None (block permutation), else D = diag(r^i)
    (ill-conditioned, the quality=5 trigger).  Spectrum: +-(k*pi)^2.
    """
    K = laplacian_op(m, dtype)
    A = BlockDiagOperator(inner=K, copies=2)
    if r is None:
        d = jnp.ones((m,), dtype)
    else:
        d = jnp.asarray(r ** np.arange(m), dtype)
    B = BlockAntiDiagOperator(d=d)
    return A, B


def bdg_positive_init(key_seed, m, size_sub, dtype):
    """B-positive initialization X_k = [u; u] (test_ilobpcg.c:194-204)."""
    rng = np.random.RandomState(key_seed)
    u = rng.uniform(-0.5, 0.5, size=(m, size_sub))
    X = np.concatenate([u, u], axis=0)
    return jnp.asarray(X, dtype)


def rand_block(seed, n, k, dtype):
    rng = np.random.RandomState(seed)
    x = rng.uniform(-0.5, 0.5, size=(n, k))
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        x = x + 1j * rng.uniform(-0.5, 0.5, size=(n, k))
    return jnp.asarray(x, dtype)
