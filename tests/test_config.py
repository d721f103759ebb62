"""SolverConfig validation + misc public API contracts."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import lobpcg_tpu
from lobpcg_tpu import SolverConfig, lobpcg
from lobpcg_tpu.config import eps_tol, quality_tol, tiny, validate_problem
from lobpcg_tpu.ops.residual import estimate_norm
from fixtures import dense_op, laplacian_op, rand_block


def test_nev_gt_size_sub_rejected():
    with pytest.raises(ValueError, match="nev"):
        SolverConfig(nev=5, size_sub=3)


def test_unknown_rr_method_rejected():
    with pytest.raises(ValueError, match="rr_method"):
        SolverConfig(nev=2, size_sub=2, rr_method="lapack")


def test_problem_size_validation():
    cfg = SolverConfig(nev=4, size_sub=4)
    with pytest.raises(ValueError, match="size_sub"):
        validate_problem(10, cfg)  # 3*4 > 10
    validate_problem(12, cfg)


def test_per_dtype_constants():
    assert eps_tol(jnp.float32) == 1e-5
    assert eps_tol(jnp.float64) == 1e-12
    assert eps_tol(jnp.complex64) == 1e-5
    assert tiny(jnp.float64) < tiny(jnp.float32)
    assert quality_tol(jnp.float64) < quality_tol(jnp.float32)


def test_x0_column_mismatch_rejected():
    A = laplacian_op(30, jnp.float64)
    X0 = rand_block(1, 30, 4, jnp.float64)
    with pytest.raises(ValueError, match="columns"):
        lobpcg(A, X0, nev=3, size_sub=6)


def test_nev_or_config_required():
    A = laplacian_op(30, jnp.float64)
    with pytest.raises(ValueError, match="nev or config"):
        lobpcg(A)


def test_klobpcg_alias():
    """Reference parity: klobpcg is a pure alias of lobpcg
    (`lobpcg.h:561-580`)."""
    assert lobpcg_tpu.klobpcg is lobpcg_tpu.lobpcg


def test_estimate_norm_power_iteration():
    """3x3 known-norm oracle (reference `test_estimate_norm.c`)."""
    A_np = np.diag([1.0, 2.0, 10.0])
    A = dense_op(A_np, jnp.float64)
    nrm = float(estimate_norm(A, jax.random.PRNGKey(0), 30))
    assert abs(nrm - 10.0) < 1e-6

    C = np.asarray([[2.0, 1j], [-1j, 2.0]])
    op = dense_op(C, jnp.complex128)
    nrm = float(estimate_norm(op, jax.random.PRNGKey(1), 50))
    assert abs(nrm - 3.0) < 1e-6  # eigenvalues 1 and 3


def test_fill_random_reproducible():
    from lobpcg_tpu.utils.prng import fill_random

    a = fill_random(jax.random.PRNGKey(7), (4, 3), jnp.float32)
    b = fill_random(jax.random.PRNGKey(7), (4, 3), jnp.float32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = fill_random(jax.random.PRNGKey(8), (4, 3), jnp.complex128)
    assert np.asarray(c).imag.any()
    assert np.abs(np.asarray(c).real).max() <= 0.5


def test_operator_composition_sugar():
    from lobpcg_tpu import DiagonalOperator

    d = DiagonalOperator(jnp.asarray([1.0, 2.0]))
    X = jnp.asarray([[1.0], [1.0]])
    s = (d + d).matmat(X)
    np.testing.assert_allclose(np.asarray(s)[:, 0], [2.0, 4.0])
    m = (2.0 * d).matmat(X)
    np.testing.assert_allclose(np.asarray(m)[:, 0], [2.0, 4.0])
    c = (d @ d).matmat(X)
    np.testing.assert_allclose(np.asarray(c)[:, 0], [1.0, 4.0])


def test_gram_precision_validated():
    import pytest

    from lobpcg_tpu import SolverConfig

    with pytest.raises(ValueError, match="gram_precision"):
        SolverConfig(nev=2, size_sub=4, gram_precision="fast")
    SolverConfig(nev=2, size_sub=4, gram_precision="high")


def test_rr_dtype_auto_escalation():
    """Wide projected pencils (3*size_sub > 512) auto-escalate f32 Gram/RR
    math to float64 (the f32 KPS reduction misconverges at width 768 —
    benchmarks/README.md); narrow pencils and double dtypes do not."""
    wide = SolverConfig(nev=150, size_sub=256)
    assert wide.resolved_rr_dtype(jnp.float32) == jnp.dtype(jnp.float64)
    assert wide.resolved_rr_dtype(jnp.complex64) == jnp.dtype(jnp.complex128)
    # Double precision never escalates.
    assert wide.resolved_rr_dtype(jnp.float64) is None
    assert wide.resolved_rr_dtype(jnp.complex128) is None
    # Narrow pencil: no escalation.
    narrow = SolverConfig(nev=150, size_sub=160)
    assert narrow.resolved_rr_dtype(jnp.float32) is None
    # Explicit rr_dtype (even the storage precision) opts out of auto.
    optout = SolverConfig(nev=150, size_sub=256, rr_dtype="float32")
    assert optout.resolved_rr_dtype(jnp.float32) == jnp.dtype(jnp.float32)


def test_rr_dtype_auto_escalation_warns_without_x64():
    """When x64 is off the escalation cannot engage: warn, stay single."""
    import warnings

    wide = SolverConfig(nev=150, size_sub=256)
    jax.config.update("jax_enable_x64", False)
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            assert wide.resolved_rr_dtype(jnp.float32) is None
        assert any("x64" in str(w.message) for w in caught)
    finally:
        jax.config.update("jax_enable_x64", True)


def test_it_cap_validation_and_clamp():
    """A Python-int it_cap > max_iter is rejected host-side; a traced
    it_cap is clamped so history scatters stay in bounds."""
    A = laplacian_op(30, jnp.float64)
    X0 = rand_block(1, 30, 4, jnp.float64)
    with pytest.raises(ValueError, match="it_cap"):
        lobpcg(A, X0, nev=2, size_sub=4, max_iter=10, it_cap=20)
    # Traced cap beyond max_iter: runs at most max_iter iterations.
    r = lobpcg(A, X0, nev=2, size_sub=4, tol=0.0, max_iter=3,
               it_cap=jnp.int32(50))
    assert int(r.iterations) == 3
