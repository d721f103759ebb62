"""Real-TPU kernel checks — skipped on the CPU test backend.

The main suite forces JAX_PLATFORMS=cpu (conftest), so the Pallas paths
are exercised there only in interpret mode.  Run this module directly on
a TPU machine (from the repo root, no JAX_PLATFORMS override):

    python tests/test_tpu_kernels.py

(pytest imports tests/conftest.py, which forces the CPU backend — the
script form bypasses it).
"""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires a real TPU backend"
)


def _stencil_check():
    import jax.numpy as jnp

    from lobpcg_tpu.ops.pallas.stencil import (
        stencil_matmat_pallas,
        stencil_supported,
    )

    n = 8192
    # k = 64 runs through the kernel when called directly (the operator
    # gate requires k % 128 == 0 to avoid XLA's padded-layout copy of
    # sub-128-lane pallas operands).
    for k in (64, 128, 256):
        X = jax.random.uniform(
            jax.random.PRNGKey(0), (n, k), jnp.float32, -1, 1
        )
        assert stencil_supported(X, 2) == (k % 128 == 0)
        Y = np.asarray(
            stencil_matmat_pallas(X, jnp.float32(1.7), num_segments=2)
        )
        Xs = np.asarray(X).reshape(2, n // 2, k)
        Xp = np.pad(Xs, ((0, 0), (1, 1), (0, 0)))
        ref = (1.7 * (2 * Xs - Xp[:, 2:] - Xp[:, :-2])).reshape(n, k)
        np.testing.assert_allclose(Y, ref, atol=1e-4)


def _bsr_check():
    import jax.numpy as jnp

    from lobpcg_tpu.operators.sparse import BSROperator
    from lobpcg_tpu.ops.pallas.bsr import bsr_matmat_pallas, bsr_supported

    rng = np.random.RandomState(0)
    n = 128
    A = np.zeros((n, n))
    for d in (-8, 0, 8):
        v = rng.randn(n - abs(d))
        A += np.diag(v, d)
    op = BSROperator.from_dense(A, block_size=8, dtype=jnp.float32)
    X = jnp.asarray(rng.randn(n, 128), jnp.float32)
    assert bsr_supported(op.blocks, X)
    Y = np.asarray(bsr_matmat_pallas(op.block_cols, op.blocks, X))
    np.testing.assert_allclose(Y, A @ np.asarray(X), rtol=1e-4, atol=1e-3)


def _solver_check():
    import jax.numpy as jnp

    from lobpcg_tpu import Laplacian1D, lobpcg

    n = 256
    h = 1.0 / (n + 1)
    A = Laplacian1D(scale=jnp.float32(1 / h / h), n=n)
    r = lobpcg(A, nev=3, size_sub=6, tol=1e-6, max_iter=300,
               key=jax.random.PRNGKey(0))
    exact = (np.arange(1, 4) * np.pi) ** 2
    rel = np.abs(np.asarray(r.eigenvalues) - exact) / exact
    assert np.all(rel < 1e-2), rel


def test_tpu_stencil_kernel():
    _stencil_check()


def test_tpu_bsr_kernel():
    _bsr_check()


def test_tpu_solver_f32():
    _solver_check()


if __name__ == "__main__":
    if jax.default_backend() != "tpu":
        print("no TPU backend — nothing to check")
    else:
        _stencil_check()
        print("stencil kernel ok")
        _bsr_check()
        print("bsr kernel ok")
        _solver_check()
        print("solver ok")
