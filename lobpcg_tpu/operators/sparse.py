"""Materialized sparse operators: BSR/ELL on TPU.

Covers the reference's "sparse operator through the LinearOperator
interface" capability (`README.md:14`, dense/sparse/matrix-free all flow
through matvec) the TPU way: the host-side native library
(native/sparse_prep.cpp via utils.native) assembles COO -> CSR -> BSR,
optionally RCM-reorders for bandwidth, pads to ELL, and the device sees a
block-ELL SpMM (Pallas MXU kernel on TPU f32; gather+einsum elsewhere).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from lobpcg_tpu.operators.linop import LinearOperator, operator
from lobpcg_tpu.utils import native


def _bsr_to_ell(bip: np.ndarray, bix: np.ndarray, bv: np.ndarray):
    """Pad BSR rows to uniform width R (ELL).  Padding blocks are zero
    with block-column 0."""
    nb = len(bip) - 1
    counts = np.diff(bip)
    R = max(1, int(counts.max()))
    bs = bv.shape[-1]
    cols = np.zeros((nb, R), np.int32)
    vals = np.zeros((nb, R, bs, bs), bv.dtype)
    for i in range(nb):
        c = int(counts[i])
        cols[i, :c] = bix[bip[i] : bip[i + 1]]
        vals[i, :c] = bv[bip[i] : bip[i + 1]]
    return cols, vals


@operator(
    data_fields=("block_cols", "blocks", "win_lo", "win_vals"),
    meta_fields=("n",),
)
class BSROperator(LinearOperator):
    """Block-ELL sparse operator with a strip-window fast path.

    block_cols: [nb, R] int32 block-column indices (padding -> 0)
    blocks:     [nb, R, bs, bs] dense blocks (padding -> zeros)
    win_lo/win_vals: optional strip-window re-expansion (built by the
    constructors for windowable — banded / RCM-reordered — matrices;
    see ops/pallas/bsr.ell_to_strip_window): per 128-row strip one
    contiguous block-column window, applied as a single gather DMA +
    one [128, W] x [W, k] MXU contraction on TPU.
    """

    block_cols: jax.Array
    blocks: jax.Array
    win_lo: jax.Array = None
    win_vals: jax.Array = None
    n: int = 0

    def apply_width_ok(self, k):
        if jax.default_backend() != "tpu":
            return True
        if self.blocks.dtype != jnp.float32 or self.blocks.shape[2] % 8:
            return True  # no kernel at any width
        return k % 128 == 0  # both Pallas paths need lane alignment

    def matmat(self, X):
        from lobpcg_tpu.ops.pallas.bsr import (
            bsr_matmat_pallas,
            bsr_matmat_reference,
            bsr_supported,
            bsr_window_matmat_pallas,
            bsr_window_supported,
        )

        bs = self.blocks.shape[2]
        if self.win_vals is not None and bsr_window_supported(
            self.win_vals, X, bs
        ):
            return bsr_window_matmat_pallas(
                self.win_lo, self.win_vals, X, bs=bs
            )
        if bsr_supported(self.blocks, X):
            return bsr_matmat_pallas(self.block_cols, self.blocks, X)
        return bsr_matmat_reference(self.block_cols, self.blocks, X)

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def dtype(self):
        return self.blocks.dtype

    # -- constructors -------------------------------------------------

    @classmethod
    def from_csr(cls, indptr, indices, vals, *, block_size: int,
                 dtype=jnp.float32) -> "BSROperator":
        n = len(indptr) - 1
        if n % block_size:
            raise ValueError(
                f"n={n} not divisible by block_size={block_size}"
            )
        bip, bix, bv = native.csr_to_bsr(
            n, block_size, np.asarray(indptr), np.asarray(indices),
            np.asarray(vals, np.float64),
        )
        cols, blocks = _bsr_to_ell(bip, bix, bv)
        from lobpcg_tpu.ops.pallas.bsr import (
            ell_to_strip_window,
            bsr_window_widths,
        )

        # Build the strip-window fast path when the matrix is windowable:
        # padding every strip to the max column span must not blow up
        # storage (cap the window chunks at ~4x the ELL bytes).
        # strip ~256: the r3 strip sweep (benchmarks/results_r3.jsonl
        # 8a-c) measured 256-row strips 6.5% faster than 128 at the
        # banded 1M/bs=8/k=128 shape — halving the ~1 us/grid-step
        # overhead beats the wider window's extra bytes; 512 loses.
        # The strip must be a block-row multiple (the converter and the
        # kernel slice whole blocks), so round 256 up to one for block
        # sizes that don't divide it (e.g. 24 -> 264).
        win_lo = win_vals = None
        strip = block_size * (-(-256 // block_size))
        Wb = bsr_window_widths(cols, blocks, strip=strip)
        nb, R = cols.shape
        if Wb * block_size <= 4096 and Wb <= 4 * R + 16:
            lo, wv = ell_to_strip_window(
                cols, blocks.astype(dtype), strip=strip
            )
            win_lo = jnp.asarray(lo)
            win_vals = jnp.asarray(wv, dtype)
        return cls(
            block_cols=jnp.asarray(cols),
            blocks=jnp.asarray(blocks, dtype),
            win_lo=win_lo,
            win_vals=win_vals,
            n=n,
        )

    @classmethod
    def from_coo(cls, n, rows, cols, vals, *, block_size: int,
                 dtype=jnp.float32) -> "BSROperator":
        indptr, indices, v = native.coo_to_csr(
            n, np.asarray(rows), np.asarray(cols),
            np.asarray(vals, np.float64),
        )
        return cls.from_csr(indptr, indices, v, block_size=block_size,
                            dtype=dtype)

    @classmethod
    def from_dense(cls, A, *, block_size: int, dtype=jnp.float32,
                   tol: float = 0.0) -> "BSROperator":
        A = np.asarray(A)
        rows, cols = np.nonzero(np.abs(A) > tol)
        return cls.from_coo(
            A.shape[0], rows, cols, A[rows, cols], block_size=block_size,
            dtype=dtype,
        )


def laplacian_3d_csr(nx: int, ny: int, nz: int, h: float = None):
    """7-point 3-D Dirichlet Laplacian as CSR (host assembly) — the
    BASELINE.json config "3D Laplacian (stencil CSR)".  Returns
    (indptr, indices, vals) with eigenvalues sum of per-axis (k pi)^2
    terms under Dirichlet BCs."""
    import scipy.sparse as sp

    if h is None:
        h = 1.0 / (max(nx, ny, nz) + 1)

    def lap1d(m):
        return sp.diags(
            [-np.ones(m - 1), 2 * np.ones(m), -np.ones(m - 1)],
            [-1, 0, 1],
        )

    Ix, Iy, Iz = (sp.identity(m) for m in (nx, ny, nz))
    L = (
        sp.kron(sp.kron(lap1d(nx), Iy), Iz)
        + sp.kron(sp.kron(Ix, lap1d(ny)), Iz)
        + sp.kron(sp.kron(Ix, Iy), lap1d(nz))
    ) / (h * h)
    L = L.tocsr()
    L.sort_indices()
    return L.indptr.astype(np.int64), L.indices.astype(np.int64), L.data
