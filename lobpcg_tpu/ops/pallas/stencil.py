"""Pallas TPU kernel: segmented 1-D tridiagonal stencil SpMM.

The hot operator application of the reference's flagship workloads
(`tests/test_lobpcg.c:48-62` 1-D Dirichlet Laplacian;
`tests/test_ilobpcg.c:28-52` BdG block-Laplacian A = diag(K, ..., K))
is Y = scale * (2 X - up(X) - down(X)) applied independently on
`num_segments` equal row segments.

XLA's pad/slice fusion reads X ~3x from HBM (~16% of roofline measured
on v5e).  This kernel streams X once: one
double-buffered DMA of (tile + 2*halo) rows per tile, VPU stencil in
VMEM, double-buffered DMA of the result back out.  Segment boundaries (where the stencil must
not couple, e.g. between the two BdG blocks) land on tile boundaries and
are handled by zeroing the halo row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(seg_rows: int, max_tile: int = 1024) -> int:
    """Largest divisor of the segment length <= max_tile, preferring
    multiples of 8 (f32 sublane tiling)."""
    best_any, best_8 = 1, 0
    for t in range(1, min(seg_rows, max_tile) + 1):
        if seg_rows % t == 0:
            best_any = t
            if t % 8 == 0:
                best_8 = t
    return best_8 or best_any


def _stencil_kernel(x_hbm, scale_smem, o_hbm, tile: int, n: int, seg: int):
    """Grid-free kernel body: double-buffered stream over row tiles."""
    k = x_hbm.shape[1]
    num_tiles = n // tile
    T = tile

    def scoped(xs, ys, in_sems, out_sems):
        H = 8  # sublane-aligned halo margin

        def in_dma(slot, t):
            # One DMA of T+2H rows covering the tile plus both halo
            # rows: src [t*T - H, t*T + T + H).  First/last tile clamp
            # the range; the out-of-range halo rows are zeroed later by
            # the segment-boundary fixup (tile 0 starts a segment and
            # the last tile ends one).
            def mk(src_start, size, dst_lo):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(src_start, size), :],
                    xs.at[slot, dst_lo : dst_lo + size, :],
                    in_sems.at[slot],
                )

            first = t == 0
            last = t == num_tiles - 1
            if num_tiles == 1:
                return mk(0, T, H)

            def dma_first():
                mk(0, T + H, H).start()

            def dma_last():
                mk(pl.multiple_of((num_tiles - 1) * T - H, H), T + H, 0).start()

            def dma_mid():
                mk(pl.multiple_of(t * T - H, H), T + 2 * H, 0).start()

            class _Chain:
                def start(self):
                    jax.lax.cond(
                        first,
                        dma_first,
                        lambda: jax.lax.cond(last, dma_last, dma_mid),
                    )

                def wait(self):
                    # All variants signal the same semaphore; wait for
                    # the matching byte count per case.
                    jax.lax.cond(
                        first,
                        lambda: mk(0, T + H, H).wait(),
                        lambda: jax.lax.cond(
                            last,
                            lambda: mk(0, T + H, 0).wait(),
                            lambda: mk(0, T + 2 * H, 0).wait(),
                        ),
                    )

            return _Chain()

        def start_in(slot, t):
            in_dma(slot, t).start()

        def wait_in(slot, t):
            in_dma(slot, t).wait()

        def out_dma(slot, t):
            return pltpu.make_async_copy(
                ys.at[slot], o_hbm.at[pl.ds(t * T, T), :], out_sems.at[slot]
            )

        start_in(0, 0)

        def body(t, _):
            slot = jax.lax.rem(t, 2)
            nslot = jax.lax.rem(t + 1, 2)

            @pl.when(t + 1 < num_tiles)
            def _():
                start_in(nslot, t + 1)

            wait_in(slot, t)

            # Zero the halo rows at segment boundaries (no coupling
            # across segments; covers the global Dirichlet edges too).
            @pl.when(jax.lax.rem(t * T, seg) == 0)
            def _():
                xs[slot, H - 1 : H, :] = jnp.zeros((1, k), xs.dtype)

            @pl.when(jax.lax.rem(t * T + T, seg) == 0)
            def _():
                xs[slot, T + H : T + H + 1, :] = jnp.zeros((1, k), xs.dtype)

            # Make sure the previous out-DMA using this ys slot is done.
            @pl.when(t >= 2)
            def _():
                out_dma(slot, t - 2).wait()

            c = scale_smem[0]
            mid = xs[slot, H : T + H, :]
            down = xs[slot, H - 1 : T + H - 1, :]
            up = xs[slot, H + 1 : T + H + 1, :]
            ys[slot] = c * (2.0 * mid - up - down)

            out_dma(slot, t).start()
            return ()

        jax.lax.fori_loop(0, num_tiles, body, (), unroll=False)

        # Drain the last two out-DMAs.
        @pl.when(num_tiles >= 2)
        def _():
            out_dma(jax.lax.rem(num_tiles - 2, 2), num_tiles - 2).wait()

        out_dma(jax.lax.rem(num_tiles - 1, 2), num_tiles - 1).wait()

    pl.run_scoped(
        scoped,
        xs=pltpu.VMEM((2, tile + 16, k), x_hbm.dtype),
        ys=pltpu.VMEM((2, tile, k), x_hbm.dtype),
        in_sems=pltpu.SemaphoreType.DMA((2,)),
        out_sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("num_segments", "max_tile"))
def stencil_matmat_pallas(
    X: jax.Array,
    scale: jax.Array,
    *,
    num_segments: int = 1,
    max_tile: int = 2048,
) -> jax.Array:
    """Y = scale * tridiag[-1, 2, -1] X, per row segment.  f32/bf16 only."""
    n, k = X.shape
    assert n % num_segments == 0
    seg = n // num_segments
    # Cap the tile so the 4 double-buffered tiles fit comfortably in VMEM.
    vmem_tile_cap = max(8, ((4 << 20) // (k * 4)) // 8 * 8)
    tile = _pick_tile(seg, min(max_tile, vmem_tile_cap))
    kernel = functools.partial(
        _stencil_kernel, tile=tile, n=n, seg=seg
    )
    scale_arr = jnp.asarray([scale], X.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, k), X.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * (1 << 20),
        ),
    )(X, scale_arr)


def stencil_supported(X: jax.Array, num_segments: int) -> bool:
    """Static check: can the Pallas path handle this input?

    Mosaic constraint: DMA/compute slices of the VMEM scratch must be
    lane-aligned, so the block width k must be a multiple of 128 (pick
    size_sub in multiples of 128/3... practically: pad your block).
    """
    if X.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    n, k = X.shape
    if k % 128:
        return False
    if n % num_segments:
        return False
    seg = n // num_segments
    if seg < 16 or seg % 8:
        return False
    return jax.default_backend() == "tpu"
