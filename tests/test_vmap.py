"""Batched eigensolves: jax.vmap over a family of problems.

A capability with no reference analog (the C library is one-solve-per-
call): because the whole solver is a pure jitted function over pytree
operators, `vmap` maps it across stacked operator data — one fused XLA
program solving the entire batch, while_loop iterations masked per
problem.  Useful for parameter sweeps (e.g. BdG spectra vs interaction
strength) on one chip.
"""

import numpy as np
import jax
import jax.numpy as jnp

from lobpcg_tpu import DenseOperator, DiagonalOperator, lobpcg
from fixtures import rand_block


def test_vmap_dense_batch():
    rng = np.random.RandomState(0)
    batch, n, nev, ss = 4, 24, 2, 4
    mats = []
    for _ in range(batch):
        M = rng.randn(n, n)
        mats.append(M @ M.T + n * np.eye(n))
    A_batch = jnp.asarray(np.stack(mats))
    X0 = rand_block(1, n, ss, jnp.float64)

    def solve(A_mat):
        r = lobpcg(DenseOperator(A_mat), X0, nev=nev, size_sub=ss,
                   tol=1e-9, max_iter=200)
        return r.eigenvalues, r.converged

    lam, conv = jax.vmap(solve)(A_batch)
    assert lam.shape == (batch, nev)
    for b in range(batch):
        exact = np.sort(np.linalg.eigvalsh(mats[b]))[:nev]
        np.testing.assert_allclose(np.asarray(lam[b]), exact, rtol=1e-7)
        assert int(conv[b]) == nev


def test_vmap_parameter_sweep():
    """Sweep a diagonal shift — eigenvalues track the parameter."""
    n, nev, ss = 30, 2, 4
    base = jnp.arange(1.0, n + 1)
    shifts = jnp.asarray([0.0, 5.0, 11.0])
    X0 = rand_block(2, n, ss, jnp.float64)

    def solve(shift):
        r = lobpcg(DiagonalOperator(base + shift), X0, nev=nev,
                   size_sub=ss, tol=1e-10, max_iter=200)
        return r.eigenvalues

    lam = jax.vmap(solve)(shifts)
    for i, s in enumerate(np.asarray(shifts)):
        np.testing.assert_allclose(
            np.asarray(lam[i]), np.arange(1, nev + 1) + s, rtol=1e-8
        )
