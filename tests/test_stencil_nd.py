"""N-D Laplacian stencil operator (operators/stencil_nd.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lobpcg_tpu import lobpcg
from lobpcg_tpu.operators.sparse import BSROperator, laplacian_3d_csr
from lobpcg_tpu.operators.stencil_nd import LaplacianND, laplacian_nd_eigs
from lobpcg_tpu.parallel import row_mesh, shard_problem
from fixtures import rand_block


def test_3d_matches_csr():
    nx = 6
    h = 1.0 / (nx + 1)
    A = LaplacianND(scale=jnp.asarray(1.0 / (h * h), jnp.float64),
                    grid=(nx, nx, nx))
    ip, ix, v = laplacian_3d_csr(nx, nx, nx)
    import scipy.sparse as sp

    M = sp.csr_matrix((v, ix, ip), shape=(nx**3, nx**3))
    X = rand_block(1, nx**3, 4, jnp.float64)
    np.testing.assert_allclose(
        np.asarray(A.matmat(X)), M @ np.asarray(X), atol=1e-10
    )


def test_2d_solver_analytic():
    nx, ny = 24, 16
    h = 1.0 / (nx + 1)
    A = LaplacianND(scale=jnp.asarray(1.0 / (h * h), jnp.float64),
                    grid=(nx, ny))
    nev, ss = 4, 8
    r = lobpcg(A, rand_block(2, nx * ny, ss, jnp.float64), nev=nev,
               size_sub=ss, tol=1e-8, max_iter=400)
    assert int(r.converged) == nev
    exact = laplacian_nd_eigs((nx, ny), 1.0 / (h * h), nev)
    np.testing.assert_allclose(np.asarray(r.eigenvalues), exact, rtol=1e-8)


def test_3d_solver_matches_bsr_solve():
    nx = 8
    ip, ix, v = laplacian_3d_csr(nx, nx, nx)
    n = nx**3
    h = 1.0 / (nx + 1)
    A_st = LaplacianND(scale=jnp.asarray(1.0 / (h * h), jnp.float64),
                       grid=(nx, nx, nx))
    A_sp = BSROperator.from_csr(ip, ix, v, block_size=8, dtype=jnp.float64)
    X0 = rand_block(3, n, 6, jnp.float64)
    r1 = lobpcg(A_st, X0, nev=3, size_sub=6, tol=1e-8, max_iter=300)
    r2 = lobpcg(A_sp, X0, nev=3, size_sub=6, tol=1e-8, max_iter=300)
    np.testing.assert_allclose(
        np.asarray(r1.eigenvalues), np.asarray(r2.eigenvalues), rtol=1e-9
    )


def test_3d_sharded():
    """Row-sharded 3-D stencil: the leading grid axis partitions over the
    mesh; inner axes stay local."""
    nx = 8
    h = 1.0 / (nx + 1)
    A = LaplacianND(scale=jnp.asarray(1.0 / (h * h), jnp.float64),
                    grid=(nx, nx, nx))
    X0 = rand_block(5, nx**3, 6, jnp.float64)
    ref = lobpcg(A, X0, nev=3, size_sub=6, tol=1e-8, max_iter=300)

    mesh = row_mesh(4)
    As, X0s, _, _ = shard_problem(mesh, A, X0)
    with mesh:
        r = lobpcg(As, X0s, nev=3, size_sub=6, tol=1e-8, max_iter=300)
        lam = np.asarray(r.eigenvalues)
    np.testing.assert_allclose(lam, np.asarray(ref.eigenvalues), rtol=1e-9)


def test_sharded_rewrite_forces_jnp():
    """shard_problem must disable the Pallas per-axis dispatch for
    LaplacianND (pallas_call has no SPMD partitioning rule)."""
    nx = 8
    A = LaplacianND(scale=jnp.asarray(1.0, jnp.float64), grid=(nx, nx, nx))
    mesh = row_mesh(4)
    As, _, _, _ = shard_problem(mesh, A)
    assert As.force_jnp


def test_fused_3d_kernel_interpret_matches_separable():
    """Fused single-pass 7-point kernel (interpret mode) == the
    separable jnp formulation, including all Dirichlet faces."""
    from lobpcg_tpu.ops.pallas.stencil3d import stencil3d_matmat_pallas

    for (g, k, By) in [((6, 16, 4), 32, 16), ((5, 32, 2), 64, 16),
                       ((3, 16, 1), 128, 8), ((4, 16, 8), 128, 8),
                       ((3, 24, 16), 64, 8)]:
        n = g[0] * g[1] * g[2]
        X = rand_block(9, n, k, jnp.float32)
        Y = stencil3d_matmat_pallas(
            X, jnp.float32(1.3), grid_shape=g, By=By, interpret=True
        )
        ref = LaplacianND(
            scale=jnp.float32(1.3), grid=g, force_jnp=True
        ).matmat(X)
        np.testing.assert_allclose(
            np.asarray(Y), np.asarray(ref), atol=1e-4
        )
