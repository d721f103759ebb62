"""Pallas TPU kernel: fused single-pass 3-D 7-point Laplacian stencil.

The separable per-axis dispatch (operators/stencil_nd.py) applies three
1-D passes (~58 ms at 160^3 x 128 on v5e), and a kernel over a
[nx, ny, nz*k] view pays two physical relayouts, because reshaping the
solver's [n, k] block to 3-D regroups the (8, 128) tiles (measured: the
relayouts alone cost more than the whole stencil).  This kernel
therefore streams the FLAT [n, k] array (n = nx*ny*nz, C-order):

- one contiguous DMA of (By+2)*nz rows per strip — the j-halo row
  blocks are simply the nz rows before/after the strip in flat order;
- i neighbours come from a ring of 4 VMEM-resident strips streamed down
  the (jb, i) loop (each strip is read from HBM once + 2/By halo);
- j and z neighbours are sublane-shifted slices of the strip buffer
  (offsets nz +- 1 around the center), exactly like the 1-D kernel;
- z Dirichlet faces (every nz-th row) are repaired with two masked
  corrections; global j/i faces with conditional slice patches and
  scalar face weights.

    Y[i,j,l] = scale * (6 X[i,j,l] - X[i+-1,j,l] - X[i,j+-1,l]
                        - X[i,j,l+-1])        (Dirichlet boundaries)

Traffic: X * (By+2)/By + Y once ~= 2.1x n*k*4 bytes at By=16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vmem_bytes(By: int, nz: int, k: int) -> int:
    # ring of 4 fetched strips + 2 out strips
    return (4 * (By + 2) + 2 * By) * nz * k * 4


def _pick_by(ny: int, nz: int, k: int) -> int:
    """Largest multiple-of-8 divisor of ny whose buffers fit VMEM."""
    for b in (32, 24, 16, 8):
        if ny % b == 0 and _vmem_bytes(b, nz, k) <= 13 * (1 << 20):
            return b
    return 0


def _kernel(scale_smem, x_hbm, o_hbm, *, nx: int, ny: int, nz: int,
            k: int, By: int):
    njb = ny // By
    Wc = By * nz  # center rows per strip
    W = (By + 2) * nz  # fetched rows (strip + j-halo row blocks)
    n = nx * ny * nz
    T = nx * njb  # total strips, looped as (jb, i) with i fastest

    def scoped(xs, ys, in_sems, out_sems):
        NB = 4  # ring: compute t needs strips t-1, t, t+1 resident

        # Zero once: face steps read ring slots no DMA has written, and
        # the first strip's missing left halo stays zero.
        xs[...] = jnp.zeros_like(xs)

        def coords(t):
            t = jnp.asarray(t, jnp.int32)
            i = jax.lax.rem(t, jnp.int32(nx))
            jb = jax.lax.div(t, jnp.int32(nx))
            c0 = (i * ny + jb * By) * nz  # first center row, global
            return i, jb, c0

        def in_dma(t):
            t = jnp.asarray(t, jnp.int32)
            s = jax.lax.rem(t, jnp.int32(NB))
            _, _, c0 = coords(t)

            def mk(src, size, dst):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(src, size), :],
                    xs.at[s, pl.ds(dst, size), :],
                    in_sems.at[s],
                )

            first = t == 0
            last = t == T - 1

            def dma_first():
                mk(0, W - nz, nz).start()

            def dma_last():
                mk(pl.multiple_of(c0 - nz, 8), W - nz, 0).start()

            def dma_mid():
                mk(pl.multiple_of(c0 - nz, 8), W, 0).start()

            class _Chain:
                def start(self):
                    jax.lax.cond(
                        first,
                        dma_first,
                        lambda: jax.lax.cond(last, dma_last, dma_mid),
                    )

                def wait(self):
                    jax.lax.cond(
                        first,
                        lambda: mk(0, W - nz, nz).wait(),
                        lambda: jax.lax.cond(
                            last,
                            lambda: mk(0, W - nz, 0).wait(),
                            lambda: mk(0, W, 0).wait(),
                        ),
                    )

            return _Chain()

        def out_dma(t):
            t = jnp.asarray(t, jnp.int32)
            q = jax.lax.rem(t, jnp.int32(2))
            _, _, c0 = coords(t)
            return pltpu.make_async_copy(
                ys.at[q],
                o_hbm.at[pl.ds(pl.multiple_of(c0, 8), Wc), :],
                out_sems.at[q],
            )

        in_dma(0).start()

        @pl.when(T > 1)
        def _():
            in_dma(1).start()

        in_dma(0).wait()

        c = scale_smem[0]
        # z-face masks (loop-invariant): every nz-th row is a Dirichlet
        # edge in l; the shifted slice brought the neighbouring (i,j)
        # row's far end there, which the correction adds back.
        row = jax.lax.broadcasted_iota(jnp.int32, (Wc, k), 0)
        lmod = jax.lax.rem(row, jnp.int32(nz))
        m_l0 = (lmod == 0).astype(x_hbm.dtype)
        m_l1 = (lmod == nz - 1).astype(x_hbm.dtype)

        def body(t, _):
            t = jnp.asarray(t, jnp.int32)

            @pl.when(t + 2 < T)
            def _():
                in_dma(t + 2).start()

            @pl.when(t + 1 < T)
            def _():
                in_dma(t + 1).wait()

            i, jb, _ = coords(t)
            s = jax.lax.rem(t, jnp.int32(NB))

            # Stale data where the last strip's right halo would be.
            @pl.when(t == T - 1)
            def _():
                xs[s, W - nz : W, :] = jnp.zeros((nz, k), x_hbm.dtype)

            x = xs[s, nz : nz + Wc, :]
            jprev = xs[s, 0:Wc, :]
            jnext = xs[s, 2 * nz : 2 * nz + Wc, :]
            zprev = xs[s, nz - 1 : nz - 1 + Wc, :]
            znext = xs[s, nz + 1 : nz + 1 + Wc, :]

            # i neighbours: ring strips with scalar face weights
            # (slots are zero-initialized, so 0.0 * slot is exact).
            w_up = (i > 0).astype(x.dtype)
            w_dn = (i < nx - 1).astype(x.dtype)
            up = xs[jax.lax.rem(t + NB - 1, jnp.int32(NB)), nz : nz + Wc, :]
            dn = xs[jax.lax.rem(t + 1, jnp.int32(NB)), nz : nz + Wc, :]

            t_val = (
                6.0 * x
                - w_up * up
                - w_dn * dn
                - jprev
                - jnext
                - zprev
                - znext
                # z Dirichlet repair: at l = 0 the zprev slice holds the
                # previous (i,j) row's l = nz-1 entry; add it back.
                + m_l0 * zprev
                + m_l1 * znext
            )

            @pl.when(t >= 2)
            def _():
                out_dma(t - 2).wait()

            q = jax.lax.rem(t, jnp.int32(2))
            ys[q] = c * t_val

            # Global j faces: the halo row block belongs to a different
            # i-plane (or is absent); its contribution must be zero.
            @pl.when(jb == 0)
            def _():
                ys[q, 0:nz, :] += c * xs[s, 0:nz, :]

            @pl.when(jb == njb - 1)
            def _():
                ys[q, Wc - nz : Wc, :] += c * xs[
                    s, W - nz : W, :
                ]

            out_dma(t).start()
            return ()

        # i32 bounds: under jax_enable_x64 Python-int bounds make the
        # loop index i64, and the kernel's i64->i32 conversions hit a
        # RecursionError in the Mosaic lowering (observed x64 compile).
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(T), body, (),
                          unroll=False)

        @pl.when(T >= 2)
        def _():
            out_dma(T - 2).wait()

        out_dma(T - 1).wait()

    pl.run_scoped(
        scoped,
        xs=pltpu.VMEM((4, W, k), x_hbm.dtype),
        ys=pltpu.VMEM((2, Wc, k), x_hbm.dtype),
        in_sems=pltpu.SemaphoreType.DMA((4,)),
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
    By: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Y = scale * (7-point Dirichlet Laplacian) X on a 3-D grid.

    X: [nx*ny*nz, k] flattened C-order — consumed directly, no 3-D
    reshape (which would physically relayout the block).  Requires
    ny % By == 0, nz % 8 == 0, k % 128 == 0, f32/bf16.
    """
    nx, ny, nz = grid_shape
    n, k = X.shape
    assert n == nx * ny * nz
    if By == 0:
        By = _pick_by(ny, nz, k)
    scale_arr = jnp.asarray([scale], X.dtype)
    return pl.pallas_call(
        functools.partial(
            _kernel, nx=nx, ny=ny, nz=nz, k=k, By=By
        ),
        in_specs=[
            # Explicit i32 index map: the auto-generated map for a bare
            # SMEM spec returns 0 : i64 under jax_enable_x64 and Mosaic
            # fails to legalize it (see ops/pallas/stencil.py).
            pl.BlockSpec((1,), lambda: (np.int32(0),),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n, k), X.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * (1 << 20),
        ),
        interpret=interpret,
    )(scale_arr, X)


def stencil3d_supported(X: jax.Array, grid_shape, By: int = 0) -> bool:
    """Static gate for the fused 3-D path."""
    if len(grid_shape) != 3:
        return False
    if X.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    nx, ny, nz = grid_shape
    n, k = X.shape
    if n != nx * ny * nz or nx < 3:
        return False
    if By == 0:
        By = _pick_by(ny, nz, k)
    if not By or ny % By:
        return False
    if nz % 8 or k % 128:
        return False
    if _vmem_bytes(By, nz, k) > 13 * (1 << 20):
        return False
    return jax.default_backend() == "tpu"
