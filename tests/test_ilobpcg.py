"""Indefinite solver integration tests — ports of
`/root/reference/tests/test_ilobpcg.c`: BdG-style block pencils with
+-(k*pi)^2 spectrum, B-positive initialization, the ill-conditioned
quality=5 stress, f32 run, and soft locking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lobpcg_tpu import ilobpcg
from tests.fixtures import bdg_ops, bdg_positive_init, laplacian_exact


def _check_bdg(r, nev, rel_tol=0.01):
    assert int(r.converged) == nev
    for k in range(1, nev + 1):
        lam = float(r.eigenvalues[k - 1])
        exact = laplacian_exact(k)
        assert lam > 0
        assert abs(lam - exact) / exact < rel_tol, (k, lam, exact)


def test_d_ilobpcg_block_laplacian():
    """test_ilobpcg.c Test 1: m=50, nev=3, sizeSub=5, tol=1e-4."""
    m, nev, ss = 50, 3, 5
    A, B = bdg_ops(m, jnp.float64)
    X0 = bdg_positive_init(42, m, ss, jnp.float64)
    r = ilobpcg(A, X0, B, nev=nev, size_sub=ss, tol=1e-4, max_iter=500)
    _check_bdg(r, nev)
    np.testing.assert_array_equal(np.asarray(r.signature), [1, 1, 1])


def test_z_ilobpcg_block_laplacian():
    """test_ilobpcg.c Test 2: complex double."""
    m, nev, ss = 50, 3, 5
    A, B = bdg_ops(m, jnp.complex128)
    X0 = bdg_positive_init(42, m, ss, jnp.complex128)
    r = ilobpcg(A, X0, B, nev=nev, size_sub=ss, tol=1e-4, max_iter=500)
    _check_bdg(r, nev)


def test_d_ilobpcg_quality5():
    """test_ilobpcg.c Test 3: ill-conditioned B = antidiag(D,D),
    D = diag(0.1^i) — forces the quality=5 dual-basis path, which must
    also be visible in the quality5_count observability counter."""
    m, nev, ss = 30, 2, 4
    A, B = bdg_ops(m, jnp.float64, r=0.1)
    X0 = bdg_positive_init(99, m, ss, jnp.float64)
    r = ilobpcg(A, X0, B, nev=nev, size_sub=ss, tol=1e-3, max_iter=500)
    assert int(r.converged) == nev
    for k in range(nev):
        assert float(r.eigenvalues[k]) > 0
    # The ill-conditioning must actually exercise the dual-basis path.
    assert int(r.quality5_count) > 0
    assert int(r.rr_fail_count) == 0


def test_quality5_flag_in_history():
    """The per-iteration flags word records quality=5 iterations."""
    from lobpcg_tpu import SolverConfig

    m, nev, ss = 30, 2, 4
    A, B = bdg_ops(m, jnp.float64, r=0.1)
    X0 = bdg_positive_init(99, m, ss, jnp.float64)
    cfg = SolverConfig(nev=nev, size_sub=ss, tol=1e-3, max_iter=500,
                       record_history=True)
    r = ilobpcg(A, X0, B, config=cfg)
    flags = np.asarray(r.history.flags)[: int(r.iterations)]
    assert int(r.quality5_count) == int((flags % 8 == 5).sum())


def test_s_ilobpcg_block_laplacian():
    """test_ilobpcg.c Test 4: float32, tol=1e-3."""
    m, nev, ss = 50, 3, 5
    A, B = bdg_ops(m, jnp.float32)
    X0 = bdg_positive_init(42, m, ss, jnp.float32)
    r = ilobpcg(A, X0, B, nev=nev, size_sub=ss, tol=1e-3, max_iter=500)
    _check_bdg(r, nev)


def test_c_ilobpcg_block_laplacian():
    """complex64 solver-level run — the reference instantiates and
    tests all four scalar types (c32 == complex64 here)."""
    m, nev, ss = 50, 3, 5
    A, B = bdg_ops(m, jnp.complex64)
    X0 = bdg_positive_init(42, m, ss, jnp.complex64)
    r = ilobpcg(A, X0, B, nev=nev, size_sub=ss, tol=1e-3, max_iter=500)
    _check_bdg(r, nev)


def test_d_ilobpcg_softlock():
    """test_ilobpcg.c Test 5: m=100, nev=5, sizeSub=10 — P/W compaction."""
    m, nev, ss = 100, 5, 10
    A, B = bdg_ops(m, jnp.float64)
    X0 = bdg_positive_init(77, m, ss, jnp.float64)
    r = ilobpcg(A, X0, B, nev=nev, size_sub=ss, tol=1e-4, max_iter=500)
    _check_bdg(r, nev)


def test_ilobpcg_qz_method():
    """QZ host-callback path produces the same spectrum."""
    from lobpcg_tpu import SolverConfig

    m, nev, ss = 50, 3, 5
    A, B = bdg_ops(m, jnp.float64)
    X0 = bdg_positive_init(42, m, ss, jnp.float64)
    cfg = SolverConfig(nev=nev, size_sub=ss, tol=1e-4, max_iter=500,
                       rr_method="qz")
    r = ilobpcg(A, X0, B, nev=nev, config=cfg)
    _check_bdg(r, nev)


def test_ilobpcg_requires_b():
    from tests.fixtures import laplacian_op

    with pytest.raises(ValueError, match="B operator"):
        ilobpcg(laplacian_op(30, jnp.float64), nev=2, size_sub=3)


def test_no_dual_basis_matches_on_well_conditioned():
    """dual_basis=False (quality=5 branch compiled out for peak-HBM
    headroom) must not change results when quality never degrades."""
    from lobpcg_tpu import SolverConfig

    m, nev, ss = 50, 3, 5
    A, B = bdg_ops(m, jnp.float64)
    X0 = bdg_positive_init(42, m, ss, jnp.float64)
    r1 = ilobpcg(A, X0, B, nev=nev, size_sub=ss, tol=1e-4, max_iter=500)
    cfg = SolverConfig(nev=nev, size_sub=ss, tol=1e-4, max_iter=500,
                       dual_basis=False)
    r2 = ilobpcg(A, X0, B, config=cfg)
    assert int(r1.quality5_count) == 0
    np.testing.assert_allclose(
        np.asarray(r1.eigenvalues), np.asarray(r2.eigenvalues),
        rtol=1e-12,
    )


def test_b_cache_matches_reapply():
    """use_b_cache=False (re-apply B at every site, the reference's
    behavior) must agree with the cached default: on a well-conditioned
    pencil the two contraction orders — (B X)^H U vs X^H (B U) — differ
    only at f64 round-off, so the converged spectra match tightly."""
    from lobpcg_tpu import SolverConfig

    m, nev, ss = 50, 3, 5
    A, B = bdg_ops(m, jnp.float64)
    X0 = bdg_positive_init(42, m, ss, jnp.float64)
    r1 = ilobpcg(A, X0, B, nev=nev, size_sub=ss, tol=1e-6, max_iter=500)
    cfg = SolverConfig(nev=nev, size_sub=ss, tol=1e-6, max_iter=500,
                       use_b_cache=False)
    r2 = ilobpcg(A, X0, B, config=cfg)
    _check_bdg(r1, nev)
    _check_bdg(r2, nev)
    np.testing.assert_allclose(
        np.asarray(r1.eigenvalues), np.asarray(r2.eigenvalues),
        rtol=1e-8,
    )


def test_b_cache_off_quality5():
    """The re-apply mode also drives the ill-conditioned quality=5
    dual-basis path correctly (covers the Bblocks=None branches)."""
    from lobpcg_tpu import SolverConfig

    m, nev, ss = 30, 2, 4
    A, B = bdg_ops(m, jnp.float64, r=0.1)
    X0 = bdg_positive_init(99, m, ss, jnp.float64)
    cfg = SolverConfig(nev=nev, size_sub=ss, tol=1e-3, max_iter=500,
                       use_b_cache=False)
    r = ilobpcg(A, X0, B, config=cfg)
    assert int(r.converged) == nev
    assert int(r.quality5_count) > 0
    for k in range(nev):
        assert float(r.eigenvalues[k]) > 0


def _guarded_antidiag(X, d):
    """B = antidiag(D, D) that NaN-poisons its output when the input
    block carries out-of-range values — a deterministic stand-in for the
    NaN cascade observed on hardware near the f32 convergence floor
    (garbage in the carried momentum poisons the Grams)."""
    m = d.shape[0]
    Y = jnp.concatenate([d[:, None] * X[m:], d[:, None] * X[:m]], axis=0)
    bad = jnp.max(jnp.abs(X)) > 1e4
    return jnp.where(bad, jnp.asarray(jnp.nan, Y.dtype), Y)


def test_rr_fail_recovery_mid_solve():
    """Regression for the rr_failed recovery (`solvers/ilobpcg.py`
    do_recover): a poisoned momentum block makes iteration 0's projected
    pencil solve fail (GA/GB NaN -> no definite combination); the driver
    must discard that iteration, reset P, rebuild W from X, and then
    converge cleanly.  The reference prints to stderr and carries garbage
    instead (`indefinite_rr_impl.inc:88-95`)."""
    from lobpcg_tpu import SolverConfig
    from lobpcg_tpu.operators.linop import CallableOperator

    m, nev, ss = 50, 3, 5
    dtype = jnp.float64
    A, _ = bdg_ops(m, dtype)
    B = CallableOperator(args=(jnp.ones((m,), dtype),),
                         fn=_guarded_antidiag, n=2 * m, _dtype=dtype)
    X0 = bdg_positive_init(42, m, ss, dtype)
    # Warm-start momentum with an out-of-range spike in two live columns.
    P0 = np.zeros((2 * m, ss))
    P0[0, :2] = 1e6
    cfg = SolverConfig(nev=nev, size_sub=ss, tol=1e-4, max_iter=500,
                       record_history=True)
    r = ilobpcg(A, X0, B, P0=jnp.asarray(P0, dtype), config=cfg)

    assert int(r.rr_fail_count) == 1
    flags = np.asarray(r.history.flags)[: int(r.iterations)]
    assert flags[0] >= 8, flags[:5]  # failure flagged on the poisoned it
    assert (flags[1:] < 8).all(), flags  # recovery held: no more failures
    # rr-failed iterations must not double-count as quality=5 usage.
    assert int(r.quality5_count) == int((flags % 8 == 5)[flags < 8].sum())
    _check_bdg(r, nev)  # finite, converged, accurate vs the oracle
