"""N-dimensional Dirichlet Laplacian stencils (2-D / 3-D).

The reference's sparse flagship is the "3D Laplacian (stencil CSR)"
(BASELINE.json config 1), which it would funnel through the generic
matvec callback.  The TPU-native fast path for structured grids skips
the sparse machinery entirely: a 7-point (3-D) or 5-point (2-D) stencil
is a handful of shifted adds on a [nx, ny, nz, k] view — one fused XLA
pass, and under row sharding of the flattened leading axis the leading
dimension's neighbor exchange lowers to collective-permutes while the
inner dimensions stay local.

Matches `operators.sparse.laplacian_3d_csr` numerically (same h and
Dirichlet BCs), without materializing any sparse structure.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from lobpcg_tpu.operators.linop import LinearOperator, operator


def _axis_pass(X: jax.Array, grid, axis: int, k: int,
               force_jnp: bool = False) -> jax.Array:
    """tridiag[-1, 2, -1] along one grid axis of flattened X, returned
    flat [n, k].

    Separable dispatch (measured on v5e, 160^3 x 128 f32): viewing the
    pass as a segmented 1-D stencil on [prod(grid[:axis+1]),
    prod(grid[axis+1:]) * k] runs through the Pallas streaming kernel at
    300-400 GB/s for the inner axes; the leading axis (rows too wide for
    VMEM tiles) uses a jnp pad+slice that XLA lowers at ~280 GB/s.  The
    all-jnp N-D formulation runs the whole operator at ~12 GB/s, ~7x
    slower end to end.
    """
    from lobpcg_tpu.ops.pallas.stencil import (
        stencil_matmat_pallas,
        stencil_supported,
    )

    rows = int(np.prod(grid[: axis + 1]))
    width = (int(np.prod(grid)) // rows) * k
    segments = rows // grid[axis]
    Xv = X.reshape(rows, width)
    # VMEM bound: the kernel holds ~4 tiles of (>=24, width) f32.
    fits_vmem = width * 4 * 24 * 4 <= 12 * (1 << 20)
    if not force_jnp and fits_vmem and stencil_supported(Xv, segments):
        return stencil_matmat_pallas(
            Xv, jnp.ones((), X.dtype), num_segments=segments
        ).reshape(X.shape)
    Xg = X.reshape(*grid, k)
    return _lap_along(Xg, axis).reshape(X.shape)


def _lap_along(Xg: jax.Array, axis: int) -> jax.Array:
    """tridiag[-1, 2, -1] along `axis` of a grid-shaped array (Dirichlet)."""
    pad = [(0, 0)] * Xg.ndim
    pad[axis] = (1, 1)
    Xp = jnp.pad(Xg, pad)

    def sl(lo, hi):
        idx = [slice(None)] * Xg.ndim
        idx[axis] = slice(lo, hi)
        return tuple(idx)

    n = Xg.shape[axis]
    return 2.0 * Xg - Xp[sl(2, n + 2)] - Xp[sl(0, n)]


@operator(data_fields=("scale",), meta_fields=("grid", "force_jnp"))
class LaplacianND(LinearOperator):
    """Dirichlet Laplacian on a structured grid, flattened C-order.

    grid: (nx,) / (nx, ny) / (nx, ny, nz); n = prod(grid).
    scale: 1/h^2 (uniform spacing).  Eigenvalues are sums of per-axis
    4*scale*sin^2(k*pi/(2*(n_axis+1))) terms — the same oracle as
    `laplacian_3d_csr`.
    """

    scale: jax.Array
    grid: tuple = ()
    # Under row sharding the Pallas per-axis dispatch cannot partition
    # (pallas_call has no SPMD rule); shard_problem rewrites the operator
    # with force_jnp=True so GSPMD derives halos from the pad/slice form.
    force_jnp: bool = False

    def matmat(self, X):
        k = X.shape[1]
        n = int(np.prod(self.grid))
        if not self.force_jnp and len(self.grid) == 3:
            # Fused single-pass 7-point kernel: X streamed once (ring of
            # i-planes in VMEM) instead of three separable passes.
            from lobpcg_tpu.ops.pallas.stencil3d import (
                stencil3d_matmat_pallas,
                stencil3d_supported,
            )

            if stencil3d_supported(X, self.grid):
                return stencil3d_matmat_pallas(
                    X, self.scale, grid_shape=tuple(self.grid)
                )
        Y = None
        for ax in range(len(self.grid)):
            p = _axis_pass(X, self.grid, ax, k, force_jnp=self.force_jnp)
            Y = p if Y is None else Y + p
        return (self.scale * Y).reshape(n, k)

    @property
    def shape(self):
        n = int(np.prod(self.grid))
        return (n, n)

    @property
    def dtype(self):
        return self.scale.dtype


def laplacian_nd_eigs(grid, scale: float, count: int) -> np.ndarray:
    """The `count` smallest exact eigenvalues of LaplacianND."""
    per_axis = [
        4.0 * scale * np.sin(np.arange(1, n + 1) * np.pi / (2 * (n + 1))) ** 2
        for n in grid
    ]
    acc = per_axis[0]
    for a in per_axis[1:]:
        acc = (acc[:, None] + a[None, :]).ravel()
        acc = np.sort(acc)[: max(count * 4, 64)]  # keep the low tail only
    return np.sort(acc)[:count]
