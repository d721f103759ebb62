"""Sparse operator (BSR/ELL) and native preprocessing tests."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from lobpcg_tpu.operators.sparse import BSROperator, laplacian_3d_csr
from lobpcg_tpu.utils import native


def _rand_sparse(n, density, seed):
    rng = np.random.RandomState(seed)
    M = sp.random(n, n, density=density, random_state=rng, format="csr")
    M = M + M.T
    M.sort_indices()
    return M


def test_coo_to_csr_matches_scipy():
    rng = np.random.RandomState(1)
    n, nnz = 100, 800
    rows, cols = rng.randint(0, n, nnz), rng.randint(0, n, nnz)
    vals = rng.randn(nnz)
    indptr, indices, v = native.coo_to_csr(n, rows, cols, vals)
    ref = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    ref.sum_duplicates()
    ref.sort_indices()
    np.testing.assert_array_equal(indptr, ref.indptr)
    np.testing.assert_array_equal(indices, ref.indices)
    np.testing.assert_allclose(v, ref.data)


def test_csr_to_bsr_matches_scipy():
    M = _rand_sparse(128, 0.05, 2)
    bip, bix, bv = native.csr_to_bsr(
        128, 8, M.indptr, M.indices, M.data
    )
    ref = M.tobsr((8, 8))
    ref.sort_indices()
    np.testing.assert_array_equal(bip, ref.indptr)
    np.testing.assert_array_equal(bix, ref.indices)
    np.testing.assert_allclose(bv, ref.data)


def test_rcm_reduces_bandwidth():
    M = _rand_sparse(200, 0.02, 3)
    perm = native.rcm_order(200, M.indptr, M.indices)
    assert sorted(perm) == list(range(200))
    Mp = M[perm][:, perm].tocoo()
    bw_after = np.abs(Mp.row - Mp.col).max()
    Mo = M.tocoo()
    bw_before = np.abs(Mo.row - Mo.col).max()
    assert bw_after <= bw_before


def test_partition_and_halo():
    ip, ix, v = laplacian_3d_csr(8, 8, 8)
    n = 512
    off = native.partition_rows(n, ip, 4)
    assert off[0] == 0 and off[-1] == n
    nnz_per = [ip[off[p + 1]] - ip[off[p]] for p in range(4)]
    assert max(nnz_per) / max(1, min(nnz_per)) < 1.5  # balanced
    h = native.halo_rows(int(off[1]), int(off[2]), ip, ix)
    assert len(h) > 0
    assert np.all((h < off[1]) | (h >= off[2]))


def test_bsr_operator_matches_dense():
    M = _rand_sparse(96, 0.08, 4)
    A = M.toarray()
    op = BSROperator.from_dense(A, block_size=8, dtype=jnp.float64)
    X = jnp.asarray(np.random.RandomState(5).randn(96, 7))
    Y = op.matmat(X)
    np.testing.assert_allclose(np.asarray(Y), A @ np.asarray(X), atol=1e-10)


def test_bsr_in_lobpcg_solver():
    """3-D Laplacian (stencil CSR) through BSR inside the solver — the
    BASELINE.json config 1 workload."""
    from lobpcg_tpu import lobpcg
    from tests.fixtures import rand_block

    nx = 8
    ip, ix, v = laplacian_3d_csr(nx, nx, nx)
    n = nx**3
    op = BSROperator.from_csr(ip, ix, v, block_size=8, dtype=jnp.float64)
    X0 = rand_block(301, n, 6, jnp.float64)
    r = lobpcg(op, X0, nev=3, size_sub=6, tol=1e-6, max_iter=300)
    assert int(r.converged) == 3
    # oracle: h = 1/(nx+1); eigenvalues = sum of 1-D Dirichlet eigenvalues
    h = 1.0 / (nx + 1)
    oned = 4.0 / (h * h) * np.sin(np.arange(1, nx + 1) * np.pi * h / 2) ** 2
    combos = np.sort(
        (oned[:, None, None] + oned[None, :, None] + oned[None, None, :])
        .ravel()
    )
    np.testing.assert_allclose(
        np.asarray(r.eigenvalues), combos[:3], rtol=1e-8
    )


def test_bsr_3d_laplacian_10_eigenpairs():
    """Full BASELINE.json config 1: standard LOBPCG, double, 3-D
    Laplacian stencil CSR, 10 smallest eigenpairs, no preconditioner."""
    from lobpcg_tpu import lobpcg
    from tests.fixtures import rand_block

    nx = 10
    ip, ix, v = laplacian_3d_csr(nx, nx, nx)
    n = nx**3
    op = BSROperator.from_csr(ip, ix, v, block_size=8, dtype=jnp.float64)
    nev, ss = 10, 15
    X0 = rand_block(302, n, ss, jnp.float64)
    r = lobpcg(op, X0, nev=nev, size_sub=ss, tol=1e-6, max_iter=500)
    assert int(r.converged) == nev
    h = 1.0 / (nx + 1)
    oned = 4.0 / (h * h) * np.sin(np.arange(1, nx + 1) * np.pi * h / 2) ** 2
    combos = np.sort(
        (oned[:, None, None] + oned[None, :, None] + oned[None, None, :])
        .ravel()
    )
    np.testing.assert_allclose(
        np.asarray(r.eigenvalues), combos[:nev], rtol=1e-7
    )


def test_bsr_pallas_interpret_matches_reference():
    """Pallas BSR kernel in interpreter mode == gather/einsum reference."""
    from lobpcg_tpu.ops.pallas.bsr import (
        bsr_matmat_pallas,
        bsr_matmat_reference,
    )

    M = _rand_sparse(64, 0.1, 6)
    op = BSROperator.from_dense(M.toarray(), block_size=8, dtype=jnp.float32)
    X = jnp.asarray(np.random.RandomState(7).randn(64, 128), jnp.float32)
    Y_ref = bsr_matmat_reference(op.block_cols, op.blocks, X)
    Y_pal = bsr_matmat_pallas(op.block_cols, op.blocks, X, interpret=True)
    np.testing.assert_allclose(
        np.asarray(Y_pal), np.asarray(Y_ref), rtol=1e-5, atol=1e-4
    )


def test_strip_ell_interpret_matches_reference():
    """Strip-ELL conversion + kernel (interpret) == gather/einsum
    reference, over block sizes and a non-multiple-of-128 n."""
    from lobpcg_tpu.ops.pallas.bsr import (
        bsr_matmat_reference,
        bsr_strip_matmat_pallas,
        ell_to_strip_ell,
    )

    rng = np.random.RandomState(3)
    for (n, bs) in [(256, 8), (256, 16), (200, 8)]:
        M = _rand_sparse(n, 0.08, 4)
        op = BSROperator.from_dense(
            M.toarray(), block_size=bs, dtype=jnp.float32
        )
        X = jnp.asarray(rng.randn(n, 128), jnp.float32)
        Y_ref = bsr_matmat_reference(op.block_cols, op.blocks, X)
        sc, sv = ell_to_strip_ell(op.block_cols, op.blocks)
        Y = bsr_strip_matmat_pallas(
            jnp.asarray(sc), jnp.asarray(sv), X, bs=bs, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(Y), np.asarray(Y_ref), rtol=1e-5, atol=1e-4
        )


def test_bsr_operator_carries_window_format():
    """Constructors build the strip-window fast-path arrays for
    windowable (banded-ish) matrices."""
    M = _rand_sparse(128, 0.1, 9)
    op = BSROperator.from_dense(M.toarray(), block_size=8,
                                dtype=jnp.float32)
    assert op.win_lo is not None and op.win_vals is not None
    assert op.win_vals.shape[1] == 256  # default strip (r3 sweep)


def test_strip_window_interpret_matches_reference():
    """Strip-window conversion + kernel (interpret) == gather/einsum
    reference, banded and scattered-but-windowable cases."""
    from lobpcg_tpu.ops.pallas.bsr import (
        bsr_matmat_reference,
        bsr_window_matmat_pallas,
        ell_to_strip_window,
    )

    rng = np.random.RandomState(5)
    for (n, bs, band) in [(256, 8, 8), (384, 8, 24), (256, 16, 16),
                          (200, 8, 16)]:
        A = np.zeros((n, n))
        for d in range(-band, band + 1):
            A += np.diag(rng.randn(n - abs(d)), d)
        op = BSROperator.from_dense(A, block_size=bs, dtype=jnp.float32)
        lo, wv = ell_to_strip_window(op.block_cols, op.blocks)
        X = jnp.asarray(rng.randn(n, 128), jnp.float32)
        Y = bsr_window_matmat_pallas(
            jnp.asarray(lo), jnp.asarray(wv), X, bs=bs, interpret=True
        )
        Y_ref = bsr_matmat_reference(op.block_cols, op.blocks, X)
        np.testing.assert_allclose(
            np.asarray(Y), np.asarray(Y_ref), rtol=1e-5, atol=1e-4
        )


@pytest.mark.parametrize("bs", [8, 24, 64])
def test_bsr_strip_rounds_to_block_multiple(bs):
    """The window strip defaults to ~256 rows rounded UP to a block-row
    multiple; block sizes that don't divide 256 (bs=24 -> strip 264)
    must still construct and match dense (regression: ell_to_strip_window
    raised `block size must divide strip` for bs=24)."""
    rng = np.random.RandomState(bs)
    nb = 24
    n = nb * bs
    dense = np.zeros((n, n))
    for i in range(nb):
        for j in range(max(0, i - 2), min(nb, i + 3)):
            dense[i * bs:(i + 1) * bs, j * bs:(j + 1) * bs] = rng.randn(
                bs, bs)
    dense = dense + dense.T + 10 * np.eye(n)
    op = BSROperator.from_dense(jnp.asarray(dense), block_size=bs,
                                dtype=jnp.float64)
    if op.win_vals is not None:
        strip = op.win_vals.shape[1]
        assert strip % bs == 0 and strip >= 256
    X = jnp.asarray(rng.randn(n, 8))
    ref = dense @ np.asarray(X)
    np.testing.assert_allclose(np.asarray(op.matmat(X)), ref,
                               rtol=1e-12, atol=1e-9 * np.abs(ref).max())
