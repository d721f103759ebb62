"""Gram kernel tests — oracles from `/root/reference/tests/test_gram.c`."""

import jax.numpy as jnp
import numpy as np
import pytest

from lobpcg_tpu.ops.gram import (
    gram_cross,
    gram_cross_mat,
    gram_self,
    gram_self_mat,
    ortho_err,
)
from tests.fixtures import dense_op, rand_block

DTYPES = [jnp.float32, jnp.float64, jnp.complex64, jnp.complex128]


@pytest.mark.parametrize("dtype", DTYPES)
def test_gram_self_identity_metric(dtype):
    U = rand_block(0, 20, 4, dtype)
    G = gram_self(U)
    np.testing.assert_allclose(
        np.asarray(G), np.asarray(U).conj().T @ np.asarray(U), rtol=1e-5
    )


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_gram_self_operator_metric(dtype):
    rng = np.random.RandomState(3)
    n = 12
    M = rng.randn(n, n)
    Bm = M @ M.T + n * np.eye(n)
    B = dense_op(Bm, dtype)
    U = rand_block(1, n, 3, dtype)
    G = gram_self(U, B)
    expect = np.asarray(U).conj().T @ Bm @ np.asarray(U)
    np.testing.assert_allclose(np.asarray(G), expect, rtol=1e-10)


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_gram_cross_rectangular(dtype):
    n = 15
    V = rand_block(2, n, 5, dtype)
    U = rand_block(3, n, 3, dtype)
    G = gram_cross(V, U)
    assert G.shape == (5, 3)
    np.testing.assert_allclose(
        np.asarray(G), np.asarray(V).conj().T @ np.asarray(U), rtol=1e-10
    )


def test_gram_mat_variants():
    n, k = 8, 3
    rng = np.random.RandomState(7)
    mat = rng.randn(n, n)
    mat = mat + mat.T
    U = rand_block(4, n, k, jnp.float64)
    V = rand_block(5, n, k, jnp.float64)
    np.testing.assert_allclose(
        np.asarray(gram_self_mat(U, jnp.asarray(mat))),
        np.asarray(U).T @ mat @ np.asarray(U),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(gram_cross_mat(V, U, jnp.asarray(mat))),
        np.asarray(V).T @ mat @ np.asarray(U),
        rtol=1e-10,
    )


def test_ortho_err_signature_diag():
    # |G_jj| - 1 handles +-1 signature diagonals
    # (reference `ortho_err_upper_impl.inc:2-13`).
    G = jnp.diag(jnp.array([1.0, -1.0, 1.0]))
    assert float(ortho_err(G)) < 1e-14
    G2 = G.at[0, 1].set(0.3)
    assert abs(float(ortho_err(G2)) - 0.3) < 1e-12


def test_ortho_err_respects_mask():
    G = jnp.eye(4).at[3, 3].set(7.0).at[2, 3].set(5.0)
    assert float(ortho_err(G, 3)) < 1e-14
