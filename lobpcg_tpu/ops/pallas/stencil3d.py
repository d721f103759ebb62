"""Pallas TPU kernel: fused single-pass 3-D 7-point Laplacian stencil.

The separable per-axis dispatch (operators/stencil_nd.py) applies three
1-D passes, reading and writing X three times (~58 ms at 160^3 x 128 on
v5e).  This kernel computes

    Y[i,j,l] = scale * (6 X[i,j,l] - X[i+-1,j,l] - X[i,j+-1,l]
                        - X[i,j,l+-1])        (Dirichlet boundaries)

in ONE pass over X viewed as [nx, ny, nz*k]:

- The i (leading-plane) neighbours come from a ring of 4 VMEM-resident
  [By, nz*k] strips streamed by manual double-buffered DMA down the i
  axis — each strip is read from HBM exactly once.
- The j neighbours are sublane rolls within the strip, with the two
  boundary rows supplied by a thin pre-gathered halo side input
  (2/By of X in extra reads).
- The l neighbours are lane rolls by k within each row, with the
  wrapped segment masked to zero (the first/last z-position of each
  (i, j) row is a Dirichlet edge).

Traffic: X once + 2/By halo + Y once ~= 2.3x n*k*4 bytes at By=16,
vs ~6x for the separable form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(scale_smem, x_hbm, halo_hbm, o_hbm, *, nx: int, By: int,
            nzk: int, k: int):
    jb = pl.program_id(0)
    j0 = pl.multiple_of(jb * By, By)

    def scoped(xs, hs, ys, in_sems, h_sems, out_sems):
        NB = 4  # center-strip ring: compute i needs i-1, i, i+1 resident

        def in_dma(i):
            s = jax.lax.rem(i, NB)
            return pltpu.make_async_copy(
                x_hbm.at[i, pl.ds(j0, By), :], xs.at[s], in_sems.at[s]
            )

        def h_dma(i):
            s = jax.lax.rem(i, NB)
            return pltpu.make_async_copy(
                halo_hbm.at[i, jb], hs.at[s], h_sems.at[s]
            )

        def out_dma(i):
            s = jax.lax.rem(i, 2)
            return pltpu.make_async_copy(
                ys.at[s], o_hbm.at[i, pl.ds(j0, By), :], out_sems.at[s]
            )

        in_dma(0).start()
        h_dma(0).start()

        @pl.when(nx > 1)
        def _():
            in_dma(1).start()
            h_dma(1).start()

        in_dma(0).wait()
        h_dma(0).wait()

        c = scale_smem[0]
        row = jax.lax.broadcasted_iota(jnp.int32, (By, nzk), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (By, nzk), 1)

        def body(i, _):
            @pl.when(i + 2 < nx)
            def _():
                in_dma(i + 2).start()
                h_dma(i + 2).start()

            @pl.when(i + 1 < nx)
            def _():
                in_dma(i + 1).wait()
                h_dma(i + 1).wait()

            s = jax.lax.rem(i, NB)
            x = xs[s]
            h = hs[s]

            # i neighbours: resident ring strips, zeroed at the faces
            # (where, not multiply: the unused face slot holds garbage
            # and garbage * 0 can be NaN).
            zeros = jnp.zeros_like(x)
            up_i = jnp.where(i > 0, xs[jax.lax.rem(i + NB - 1, NB)], zeros)
            dn_i = jnp.where(i < nx - 1, xs[jax.lax.rem(i + 1, NB)], zeros)

            # j neighbours: sublane rolls + halo-row fixups (halo rows
            # are pre-zeroed at the global j faces by the gather).
            prev_j = jnp.where(
                row == 0, h[0:1, :], pltpu.roll(x, 1, axis=0)
            )
            next_j = jnp.where(
                row == By - 1, h[1:2, :], pltpu.roll(x, By - 1, axis=0)
            )

            # l neighbours: lane rolls by k, wrapped segment -> Dirichlet.
            prev_l = jnp.where(lane < k, zeros, pltpu.roll(x, k, axis=1))
            next_l = jnp.where(
                lane >= nzk - k, zeros, pltpu.roll(x, nzk - k, axis=1)
            )

            @pl.when(i >= 2)
            def _():
                out_dma(i - 2).wait()

            ys[jax.lax.rem(i, 2)] = c * (
                6.0 * x - up_i - dn_i - prev_j - next_j - prev_l - next_l
            )
            out_dma(i).start()
            return ()

        jax.lax.fori_loop(0, nx, body, (), unroll=False)

        @pl.when(nx >= 2)
        def _():
            out_dma(nx - 2).wait()

        out_dma(nx - 1).wait()

    pl.run_scoped(
        scoped,
        xs=pltpu.VMEM((4, By, nzk), x_hbm.dtype),
        hs=pltpu.VMEM((4, 2, nzk), x_hbm.dtype),
        ys=pltpu.VMEM((2, By, nzk), x_hbm.dtype),
        in_sems=pltpu.SemaphoreType.DMA((4,)),
        h_sems=pltpu.SemaphoreType.DMA((4,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(
    jax.jit, static_argnames=("grid_shape", "By", "interpret")
)
def stencil3d_matmat_pallas(
    X: jax.Array,
    scale: jax.Array,
    *,
    grid_shape: tuple[int, int, int],
    By: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Y = scale * (7-point Dirichlet Laplacian) X on a 3-D grid.

    X: [nx*ny*nz, k] flattened C-order.  Requires ny % By == 0,
    (nz*k) % 128 == 0, f32/bf16.
    """
    nx, ny, nz = grid_shape
    n, k = X.shape
    assert n == nx * ny * nz
    nzk = nz * k
    X3 = X.reshape(nx, ny, nzk)
    njb = ny // By

    # j-halo side input [nx, njb, 2, nzk]: the row above and below each
    # strip, zeroed at the global j faces.
    jbs = jnp.arange(njb)
    j_up = jnp.clip(jbs * By - 1, 0, ny - 1)
    j_dn = jnp.clip(jbs * By + By, 0, ny - 1)
    w_up = (jbs > 0)[None, :, None].astype(X.dtype)
    w_dn = (jbs < njb - 1)[None, :, None].astype(X.dtype)
    halo = jnp.stack(
        [X3[:, j_up] * w_up, X3[:, j_dn] * w_dn], axis=2
    )

    scale_arr = jnp.asarray([scale], X.dtype)
    out = pl.pallas_call(
        functools.partial(_kernel, nx=nx, By=By, nzk=nzk, k=k),
        grid=(njb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nzk), X.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * (1 << 20),
        ),
        interpret=interpret,
    )(scale_arr, X3, halo)
    return out.reshape(n, k)


def stencil3d_supported(X: jax.Array, grid_shape, By: int = 16) -> bool:
    """Static gate for the fused 3-D path."""
    if len(grid_shape) != 3:
        return False
    if X.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    nx, ny, nz = grid_shape
    n, k = X.shape
    if n != nx * ny * nz or nx < 3:
        return False
    if ny % By or (nz * k) % 128:
        return False
    # VMEM: 4 center strips + 2 out strips + 4 thin halos.
    if (6 * By + 8) * nz * k * 4 > 14 * (1 << 20):
        return False
    return jax.default_backend() == "tpu"
