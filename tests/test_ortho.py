"""ortho_drop / ortho_indefinite tests — oracles from
`/root/reference/tests/test_ortho_drop.c` (V-orthogonality + retained
counts) and `tests/test_ortho_indefinite.c` (signature metrics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lobpcg_tpu.ops.gram import gram_cross, gram_self, ortho_err
from lobpcg_tpu.ops.ortho import ortho_drop, ortho_indefinite, ortho_indefinite_mat
from lobpcg_tpu.ops.svqb import svqb
from lobpcg_tpu.operators.linop import DiagonalOperator
from tests.fixtures import dense_op, rand_block


def _fro(X):
    return float(jnp.sqrt(jnp.sum(jnp.abs(X) ** 2)))


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_ortho_drop_identity_metric(dtype):
    n, ku, kv = 40, 3, 4
    V = rand_block(21, n, kv, dtype)
    V, _ = svqb(V, kv, None, tau=1e-12, drop=False)
    U = rand_block(22, n, ku, dtype)
    Uo, kept = ortho_drop(U, ku, V, kv, None, eps_ortho=1e-12, eps_drop=1e-12)
    assert int(kept) == ku
    # U orthonormal
    assert float(ortho_err(gram_self(Uo), kept)) < 1e-10
    # U perp V
    assert _fro(gram_cross(V, Uo)) < 1e-10


def test_ortho_drop_b_metric():
    n, ku, kv = 30, 2, 3
    rng = np.random.RandomState(31)
    M = rng.randn(n, n)
    Bm = M @ M.T + n * np.eye(n)
    B = dense_op(Bm, jnp.float64)
    V = rand_block(23, n, kv, jnp.float64)
    V, _ = svqb(V, kv, B, tau=1e-12, drop=False)
    U = rand_block(24, n, ku, jnp.float64)
    Uo, kept = ortho_drop(U, ku, V, kv, B, eps_ortho=1e-12, eps_drop=1e-12)
    assert int(kept) == ku
    assert float(ortho_err(gram_self(Uo, B), kept)) < 1e-9
    assert _fro(gram_cross(V, Uo, B)) < 1e-8


def test_ortho_drop_duplicate_column_dropped():
    # U with a duplicated column drops to n_u - 1
    # (`tests/test_ortho_drop.c:313-345`).
    n, ku, kv = 100, 5, 3
    V = rand_block(25, n, kv, jnp.float64)
    V, _ = svqb(V, kv, None, tau=1e-12, drop=False)
    U = np.asarray(rand_block(26, n, ku, jnp.float64)).copy()
    U[:, 4] = U[:, 0]
    Uo, kept = ortho_drop(
        jnp.asarray(U), ku, V, kv, None, eps_ortho=1e-12, eps_drop=1e-12
    )
    assert int(kept) == ku - 1
    assert float(ortho_err(gram_self(Uo), kept)) < 1e-9
    assert _fro(gram_cross(V, Uo)) < 1e-9


def test_ortho_drop_zero_column_dropped():
    # `tests/test_ortho_drop.c:347-379`.
    n, ku, kv = 100, 5, 3
    V = rand_block(125, n, kv, jnp.float64)
    V, _ = svqb(V, kv, None, tau=1e-12, drop=False)
    U = np.asarray(rand_block(126, n, ku, jnp.float64)).copy()
    U[:, 2] = 0.0
    Uo, kept = ortho_drop(
        jnp.asarray(U), ku, V, kv, None, eps_ortho=1e-12, eps_drop=1e-12
    )
    assert int(kept) == ku - 1
    assert _fro(gram_cross(V, Uo)) < 1e-9


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_ortho_indefinite_signature_diag(dtype):
    # B = diag(1...1, -1...-1): indefinite diagonal
    # (`tests/test_ortho_indefinite.c:27-30`).
    n, ku, kv = 40, 3, 3
    d = jnp.concatenate([jnp.ones(n // 2), -jnp.ones(n // 2)]).astype(dtype)
    B = DiagonalOperator(d)
    rng_V = rand_block(27, n, kv, dtype)
    V, _ = svqb(rng_V, kv, B, tau=1e-12, drop=False)
    U = rand_block(28, n, ku, dtype)
    Uo, kept = ortho_indefinite(
        U, ku, V, kv, B, eps_ortho=1e-12, eps_drop=1e-12
    )
    assert int(kept) == ku
    # B-orthonormal with +-1 diagonal (loop caps at max_inner=3, so the
    # achievable error matches the reference's behavior, not eps_ortho)
    G = gram_self(Uo, B)
    assert float(ortho_err(G, kept)) < 1e-8
    # B-orthogonal to V
    assert _fro(gram_cross(V, Uo, B)) < 1e-8


def test_ortho_indefinite_none_b():
    # B=None degenerates to standard orthogonalization
    # (`tests/test_ortho_indefinite.c` B=NULL cases).
    n, ku, kv = 30, 2, 3
    V = rand_block(29, n, kv, jnp.float64)
    V, _ = svqb(V, kv, None, tau=1e-12, drop=False)
    U = rand_block(30, n, ku, jnp.float64)
    Uo, kept = ortho_indefinite(
        U, ku, V, kv, None, eps_ortho=1e-12, eps_drop=1e-12
    )
    assert int(kept) == ku
    assert _fro(gram_cross(V, Uo)) < 1e-10


def _indef_diag_b(n, n_pos, dtype):
    """B = diag(1...1, -1...-1) with n_pos positive entries
    (`tests/test_ortho_indefinite.c:58-78` create_indef_B)."""
    d = jnp.concatenate([jnp.ones(n_pos), -jnp.ones(n - n_pos)])
    return DiagonalOperator(d.astype(dtype))


def _pair_swap_b(n, dtype):
    """B swapping adjacent pairs: y[2i] = x[2i+1], y[2i+1] = x[2i]
    (`tests/test_ortho_indefinite.c:198-216` perm_blk)."""
    P = np.zeros((n, n))
    for i in range(n // 2):
        P[2 * i, 2 * i + 1] = 1.0
        P[2 * i + 1, 2 * i] = 1.0
    if n % 2:
        P[n - 1, n - 1] = 1.0
    return dense_op(P, dtype)


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_ortho_indefinite_explicit_sig(dtype):
    """Basic case with the signature matrix passed by the caller
    (`tests/test_ortho_indefinite.c:275-333`): m=100, n_v=5, n_u=8,
    60 positive B entries."""
    n, ku, kv, n_pos = 100, 8, 5, 60
    B = _indef_diag_b(n, n_pos, dtype)
    V = rand_block(41, n, kv, dtype)
    V, _ = svqb(V, kv, B, tau=1e-14, drop=False)
    sig = gram_self(V, B)
    U = rand_block(42, n, ku, dtype)
    Uo, kept = ortho_indefinite(
        U, ku, V, kv, B, sig, eps_ortho=1e-12, eps_drop=1e-14
    )
    assert int(kept) == ku
    assert float(ortho_err(gram_self(Uo, B), kept)) < 1e-8
    assert _fro(gram_cross(V, Uo, B)) < 1e-8


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
@pytest.mark.parametrize("pass_sig", [False, True])
def test_ortho_indefinite_perm(dtype, pass_sig):
    """Pair-swap permutation B (indefinite, non-diagonal)
    (`tests/test_ortho_indefinite.c:465-615` perm cases, with and
    without caller-passed sig)."""
    n, ku, kv = 60, 4, 3
    B = _pair_swap_b(n, dtype)
    V = rand_block(43, n, kv, dtype)
    V, _ = svqb(V, kv, B, tau=1e-14, drop=False)
    sig = gram_self(V, B) if pass_sig else None
    U = rand_block(44, n, ku, dtype)
    Uo, kept = ortho_indefinite(
        U, ku, V, kv, B, sig, eps_ortho=1e-12, eps_drop=1e-14
    )
    assert int(kept) == ku
    assert float(ortho_err(gram_self(Uo, B), kept)) < 1e-8
    assert _fro(gram_cross(V, Uo, B)) < 1e-8


def test_ortho_indefinite_drop_duplicate():
    """Duplicated U column under indefinite B drops to n_u - 1
    (`tests/test_ortho_indefinite.c:691-727`)."""
    n, ku, kv, n_pos = 100, 5, 3, 60
    B = _indef_diag_b(n, n_pos, jnp.float64)
    V = rand_block(45, n, kv, jnp.float64)
    V, _ = svqb(V, kv, B, tau=1e-14, drop=False)
    U = np.asarray(rand_block(46, n, ku, jnp.float64)).copy()
    U[:, 4] = U[:, 0]
    Uo, kept = ortho_indefinite(
        jnp.asarray(U), ku, V, kv, B, eps_ortho=1e-12, eps_drop=1e-12
    )
    assert int(kept) == ku - 1
    assert float(ortho_err(gram_self(Uo, B), kept)) < 1e-8
    assert _fro(gram_cross(V, Uo, B)) < 1e-8


def test_ortho_indefinite_drop_zero():
    """Zero U column under indefinite B drops to n_u - 1
    (`tests/test_ortho_indefinite.c:729-765`)."""
    n, ku, kv, n_pos = 100, 5, 3, 60
    B = _indef_diag_b(n, n_pos, jnp.float64)
    V = rand_block(47, n, kv, jnp.float64)
    V, _ = svqb(V, kv, B, tau=1e-14, drop=False)
    U = np.asarray(rand_block(48, n, ku, jnp.float64)).copy()
    U[:, 2] = 0.0
    Uo, kept = ortho_indefinite(
        jnp.asarray(U), ku, V, kv, B, eps_ortho=1e-12, eps_drop=1e-12
    )
    assert int(kept) == ku - 1
    assert _fro(gram_cross(V, Uo, B)) < 1e-8


def test_ortho_indefinite_drop_independent_keeps_all():
    """Independent columns: nothing dropped
    (`tests/test_ortho_indefinite.c:767-805`)."""
    n, ku, kv, n_pos = 100, 5, 3, 60
    B = _indef_diag_b(n, n_pos, jnp.float64)
    V = rand_block(49, n, kv, jnp.float64)
    V, _ = svqb(V, kv, B, tau=1e-14, drop=False)
    U = rand_block(50, n, ku, jnp.float64)
    Uo, kept = ortho_indefinite(
        U, ku, V, kv, B, eps_ortho=1e-12, eps_drop=1e-12
    )
    assert int(kept) == ku
    assert float(ortho_err(gram_self(Uo, B), kept)) < 1e-8
    assert _fro(gram_cross(V, Uo, B)) < 1e-8


def test_ortho_indefinite_none_b_complex():
    """complex128 B=None degenerates to standard orthogonalization
    (`tests/test_ortho_indefinite.c:650-683` z_ortho_indefinite_no_B)."""
    n, ku, kv = 80, 6, 4
    V = rand_block(51, n, kv, jnp.complex128)
    V, _ = svqb(V, kv, None, tau=1e-14, drop=False)
    U = rand_block(52, n, ku, jnp.complex128)
    Uo, kept = ortho_indefinite(
        U, ku, V, kv, None, eps_ortho=1e-12, eps_drop=1e-14
    )
    assert int(kept) == ku
    assert float(ortho_err(gram_self(Uo), kept)) < 1e-10
    assert _fro(gram_cross(V, Uo)) < 1e-10


def test_ortho_indefinite_mat_coefficient_space():
    # Coefficient-space variant with an indefinite dense metric.
    k, nu, nv = 12, 2, 2
    rng = np.random.RandomState(33)
    Q = np.linalg.qr(rng.randn(k, k))[0]
    mat = Q @ np.diag(np.concatenate([np.ones(8), -np.ones(4)])) @ Q.T
    mat_j = jnp.asarray(mat)
    V = rand_block(31, k, nv, jnp.float64)
    from lobpcg_tpu.ops.svqb import svqb_mat

    V = svqb_mat(V, mat_j, tau=1e-12)
    U = rand_block(32, k, nu, jnp.float64)
    Uo = ortho_indefinite_mat(U, V, mat_j, eps_ortho=1e-10, eps_drop=1e-12)
    # V^H mat U ~ 0
    err = np.asarray(V).T @ mat @ np.asarray(Uo)
    assert np.abs(err).max() < 1e-7
