"""Residual + norm + estimate_norm tests — oracles from
`/root/reference/tests/test_residual.c` and `test_estimate_norm.c`."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lobpcg_tpu.ops.residual import estimate_norm, get_residual, get_residual_norm
from tests.fixtures import dense_op, diag_op, rand_block


def test_exact_eigenvector_zero_residual():
    n = 10
    A = diag_op(n, jnp.float64)
    X = jnp.eye(n)[:, :3]
    lam = jnp.array([1.0, 2.0, 3.0])
    W = get_residual(X, None, lam, A, None)
    assert float(jnp.abs(W).max()) < 1e-14


def test_residual_uses_ax_cache():
    n = 8
    A = diag_op(n, jnp.float64)
    X = rand_block(51, n, 2, jnp.float64)
    lam = jnp.array([1.5, 2.5])
    AX = A.matmat(X)
    W1 = get_residual(X, AX, lam, A, None)
    W2 = get_residual(X, None, lam, A, None)
    np.testing.assert_allclose(np.asarray(W1), np.asarray(W2), atol=1e-14)


def test_residual_with_b():
    n = 8
    rng = np.random.RandomState(52)
    Am = rng.randn(n, n)
    Am = Am + Am.T
    Bm = np.diag(rng.uniform(1, 2, n))
    A, B = dense_op(Am, jnp.float64), dense_op(Bm, jnp.float64)
    X = rand_block(53, n, 2, jnp.float64)
    lam = jnp.array([0.3, -0.7])
    W = get_residual(X, None, lam, A, B)
    expect = Am @ np.asarray(X) - Bm @ np.asarray(X) * np.array([0.3, -0.7])
    np.testing.assert_allclose(np.asarray(W), expect, atol=1e-12)


def test_residual_norm_formula():
    # resNorm[i] = ||W_i|| / (||A|| + |lam_i|*||B||), `residual_impl.inc:77-99`
    W = jnp.array([[3.0, 0.0], [4.0, 0.0]])  # norms 5, 0
    lam = jnp.array([2.0, -1.0])
    rn = get_residual_norm(W, lam, 10.0, 5.0, 2)
    np.testing.assert_allclose(np.asarray(rn), [5.0 / 20.0, 0.0], atol=1e-14)


def test_residual_norm_bnorm_guard():
    W = jnp.ones((4, 1))
    rn = get_residual_norm(W, jnp.array([3.0]), 1.0, 0.0, 1)
    # BNorm <= 0 treated as 1
    np.testing.assert_allclose(np.asarray(rn), [2.0 / 4.0], atol=1e-14)


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_estimate_norm_power_iteration(dtype):
    n = 50
    d = np.concatenate([np.linspace(1.0, 5.0, n - 1), [10.0]])
    A = dense_op(np.diag(d), dtype)
    nrm = estimate_norm(A, jax.random.PRNGKey(5), iters=50)
    assert abs(float(nrm) - 10.0) / 10.0 < 1e-3


def test_residual_norm_b_seminorm():
    """residual_norm="b" numerator: sqrt(|w^H B w|) (fixes the reference
    defect SURVEY SS2.7 flags, `residual_impl.inc:83-91`)."""
    n = 8
    rng = np.random.RandomState(60)
    Bd = rng.uniform(0.5, 2.0, n)
    W = jnp.asarray(rng.randn(n, 2))
    BW = Bd[:, None] * W
    lam = jnp.array([2.0, -1.0])
    rn = get_residual_norm(W, lam, 10.0, 5.0, 2, BW=BW)
    expect = np.sqrt(np.sum(Bd[:, None] * np.asarray(W) ** 2, axis=0))
    expect = expect / (10.0 + np.abs([2.0, -1.0]) * 5.0)
    np.testing.assert_allclose(np.asarray(rn), expect, rtol=1e-12)


def test_residual_norm_b_identity_matches_2norm():
    """With B = I the B-seminorm equals the 2-norm."""
    W = jnp.array([[3.0, 1.0], [4.0, 2.0]])
    lam = jnp.array([1.0, 1.0])
    r2 = get_residual_norm(W, lam, 1.0, 1.0, 2)
    rb = get_residual_norm(W, lam, 1.0, 1.0, 2, BW=W)
    np.testing.assert_allclose(np.asarray(rb), np.asarray(r2), rtol=1e-12)


@pytest.mark.parametrize("block", [1, 8])
def test_estimate_norm_blocked(block):
    """Blocked power iteration converges to the same norm; block=1 is
    the reference's single-vector path (`estimate_norm_impl.inc:38-57`)."""
    n = 50
    d = np.concatenate([np.linspace(1.0, 5.0, n - 1), [10.0]])
    A = dense_op(np.diag(d), jnp.float64)
    nrm = estimate_norm(A, jax.random.PRNGKey(7), iters=50, block=block)
    assert abs(float(nrm) - 10.0) / 10.0 < 1e-3


def test_estimate_norm_blocked_clustered_beats_single():
    """A blocked estimate is a max over independent starts, so it can
    only improve on (never fall below) the single-vector estimate from
    any one of its columns; on a clustered spectrum it converges with
    fewer steps.  Both must underestimate at most (power iteration is a
    lower bound)."""
    n = 200
    # Clustered top of spectrum: slow single-vector convergence.
    d = np.concatenate([np.linspace(0.1, 9.4, n - 3), [9.7, 9.9, 10.0]])
    A = dense_op(np.diag(d), jnp.float64)
    few = 4
    single = float(estimate_norm(A, jax.random.PRNGKey(3), iters=few))
    blocked = float(
        estimate_norm(A, jax.random.PRNGKey(3), iters=few, block=8)
    )
    assert blocked <= 10.0 + 1e-9 and single <= 10.0 + 1e-9
    assert blocked >= single - 1e-12
