"""SVQB tests — oracles from `/root/reference/tests/test_svqb.c`,
`test_svqb_drop.c` (drop counts on duplicate/dependent/zero columns), and
`test_svqb_mat.c`."""

import jax.numpy as jnp
import numpy as np
import pytest

from lobpcg_tpu.config import eps_tol
from lobpcg_tpu.ops.gram import gram_self, ortho_err
from lobpcg_tpu.ops.svqb import svqb, svqb_mat
from tests.fixtures import dense_op, rand_block

TOL = {jnp.dtype(jnp.float64): 1e-12, jnp.dtype(jnp.float32): 1e-5,
       jnp.dtype(jnp.complex128): 1e-12, jnp.dtype(jnp.complex64): 1e-5}


def _ortho_error(U, count, B=None):
    G = gram_self(U, B)
    return float(ortho_err(G, count))


@pytest.mark.parametrize(
    "dtype", [jnp.float32, jnp.float64, jnp.complex64, jnp.complex128]
)
def test_svqb_orthonormalizes(dtype):
    n, k = 30, 5
    U = rand_block(11, n, k, dtype)
    Uo, kept = svqb(U, k, None, tau=eps_tol(dtype), drop=False)
    assert int(kept) == k
    assert _ortho_error(Uo, kept) < 50 * TOL[jnp.dtype(dtype)]


def test_svqb_b_metric():
    n, k = 16, 4
    rng = np.random.RandomState(5)
    M = rng.randn(n, n)
    Bm = M @ M.T + n * np.eye(n)
    B = dense_op(Bm, jnp.float64)
    U = rand_block(12, n, k, jnp.float64)
    Uo, kept = svqb(U, k, B, tau=1e-12, drop=False)
    assert int(kept) == k
    assert _ortho_error(Uo, kept, B) < 1e-10


def test_svqb_drop_duplicate_column():
    # Duplicate columns are rank-deficient: drop='y' must retain k-1
    # (`tests/test_svqb_drop.c:75-146` semantics).
    n, k = 20, 4
    U = np.asarray(rand_block(13, n, k, jnp.float64)).copy()
    U[:, 3] = U[:, 0]
    Uo, kept = svqb(jnp.asarray(U), k, None, tau=1e-10, drop=True)
    assert int(kept) == k - 1
    assert _ortho_error(Uo, kept) < 1e-10
    # dropped tail columns are exactly zero
    assert float(jnp.abs(Uo[:, int(kept):]).max()) == 0.0


def test_svqb_drop_zero_column():
    n, k = 20, 4
    U = np.asarray(rand_block(14, n, k, jnp.float64)).copy()
    U[:, 2] = 0.0
    Uo, kept = svqb(jnp.asarray(U), k, None, tau=1e-10, drop=True)
    assert int(kept) == k - 1


def test_svqb_respects_active_count():
    n, k = 20, 5
    U = rand_block(15, n, k, jnp.float64)
    Uo, kept = svqb(U, 3, None, tau=1e-12, drop=False)
    assert int(kept) == 3
    assert float(jnp.abs(Uo[:, 3:]).max()) == 0.0
    assert _ortho_error(Uo, 3) < 1e-10


def test_svqb_mat_permutation_metric():
    # +-1 permutation-like metrics (`tests/test_svqb_mat.c:117-212`).
    n, k = 10, 3
    rng = np.random.RandomState(8)
    mat = np.eye(n)
    mat[0, 0] = -1.0  # signature metric
    U = rand_block(16, n, k, jnp.float64)
    Uo = svqb_mat(U, jnp.asarray(mat), tau=1e-12)
    G = np.asarray(U := Uo).T @ mat @ np.asarray(U)
    # diagonal is +-1, off-diagonal ~0
    assert np.abs(np.abs(np.diag(G)) - 1).max() < 1e-10
    assert np.abs(G - np.diag(np.diag(G))).max() < 1e-8
