"""Pallas TPU kernel: segmented 1-D tridiagonal stencil SpMM.

The hot operator application of the reference's flagship workloads
(`tests/test_lobpcg.c:48-62` 1-D Dirichlet Laplacian;
`tests/test_ilobpcg.c:28-52` BdG block-Laplacian A = diag(K, ..., K))
is Y = scale * (2 X - up(X) - down(X)) applied independently on
`num_segments` equal row segments.

XLA's pad/slice fusion reads X ~3x from HBM (~16% of roofline measured
on v5e).  This kernel streams X once through a standard Mosaic grid
pipeline (auto double-buffered HBM->VMEM), computing the stencil with
sublane rolls; the two rows each tile needs from its neighbours arrive
as a tiny pre-gathered [num_tiles, 2, k] side input, so no overlapping
DMA windows are needed.  Segment boundaries (where the stencil must not
couple, e.g. between the two BdG blocks) land on tile boundaries and are
handled by zeroing the gathered halo row.

Measured on v5e at [4M, k] f32 (chained-reps, best-of-3): k=256
552 GB/s and k=128 496 GB/s — identical to the previous hand-rolled
double-buffered DMA kernel — and k=64 116 GB/s where Mosaic rejects any
manual row-sliced DMA outright ("slice shape along dimension 1 must be
aligned to tiling (128)").  The k=64 rate is physically bound by the
[n, 64] HBM layout itself: TPU pads the minor dim to 128 lanes, so the
DMA strides 256-byte reads out of 512-byte rows.  Pick size_sub in
multiples of 128 — a [n, 128] block costs the same HBM and streams at
full rate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(seg_rows: int, max_tile: int = 2048, sublane: int = 8) -> int:
    """Largest divisor of the segment length <= max_tile, preferring
    multiples of the dtype's sublane tile (8 for f32, 16 for bf16)."""
    best_any, best_sub = 1, 0
    for t in range(1, min(seg_rows, max_tile) + 1):
        if seg_rows % t == 0:
            best_any = t
            if t % sublane == 0:
                best_sub = t
    return best_sub or best_any


def _stencil_kernel(scale_smem, x_ref, halo_ref, o_ref, *, T: int):
    """One [T, k] tile: stencil via sublane rolls + halo-row fixups."""
    x = x_ref[...]
    k = x.shape[1]
    up = halo_ref[0, 0, :]  # row above the tile (zero at segment edge)
    dn = halo_ref[0, 1, :]  # row below the tile (zero at segment edge)
    row = jax.lax.broadcasted_iota(jnp.int32, (T, k), 0)
    # Shifts as explicit i32 scalars: under jax_enable_x64 a Python int
    # shift is traced as i64 and Mosaic rejects the resulting
    # tpu.dynamic_rotate (observed compiling a ss-256 x64 solve).
    prev = jnp.where(
        row == 0, up[None, :], pltpu.roll(x, jnp.int32(1), axis=0)
    )
    nxt = jnp.where(
        row == T - 1, dn[None, :], pltpu.roll(x, jnp.int32(T - 1), axis=0)
    )
    c = scale_smem[0]
    o_ref[...] = c * (2.0 * x - prev - nxt)


@functools.partial(
    jax.jit,
    static_argnames=("num_segments", "max_tile", "interpret", "vma"),
)
def stencil_matmat_pallas(
    X: jax.Array,
    scale: jax.Array,
    edge_rows: jax.Array | None = None,
    *,
    num_segments: int = 1,
    max_tile: int = 2048,
    interpret: bool = False,
    vma: tuple = (),
) -> jax.Array:
    """Y = scale * tridiag[-1, 2, -1] X, per row segment.  f32/bf16.

    ``edge_rows`` ([2, k], optional) overrides the Dirichlet zeros at the
    global top/bottom of X: edge_rows[0] acts as the row above X[0] and
    edge_rows[1] as the row below X[-1].  This is the shard-local entry
    point for the SPMD halo exchange (parallel/spmd_stencil.py): the
    ppermute'd neighbour rows flow in here so the local compute runs at
    kernel rate instead of the jnp fallback's ~3x HBM traffic.  The
    caller zeroes them where a segment boundary coincides with the shard
    edge.  ``interpret`` runs the Mosaic interpreter (CPU tests).
    ``vma``: mesh axis names the output varies over — required when
    called inside a `shard_map` body with vma checking on (the shard-
    local SPMD path passes its row axis).
    """
    n, k = X.shape
    assert n % num_segments == 0
    seg = n // num_segments
    sublane = 16 if X.dtype == jnp.bfloat16 else 8
    # Cap the tile so the pipeline's double-buffered tiles fit in VMEM
    # (lanes are padded to 128 in VMEM regardless of k).
    vmem_tile_cap = max(
        sublane, ((4 << 20) // (max(k, 128) * 4)) // sublane * sublane
    )
    T = _pick_tile(seg, min(max_tile, vmem_tile_cap), sublane)
    nt = n // T

    # Tiny [nt, 2, k] side input: the one row above and below each tile,
    # zeroed where a segment boundary (or the global Dirichlet edge)
    # forbids coupling.  2*nt rows <= n/128 of extra reads.
    t = jnp.arange(nt)
    up_i = t * T - 1
    dn_i = t * T + T
    valid_up = ((t * T) % seg != 0)[:, None].astype(X.dtype)
    valid_dn = (((t + 1) * T) % seg != 0)[:, None].astype(X.dtype)
    halo = jnp.stack(
        [
            X[jnp.clip(up_i, 0, n - 1)] * valid_up,
            X[jnp.clip(dn_i, 0, n - 1)] * valid_dn,
        ],
        axis=1,
    )
    if edge_rows is not None:
        # The global top/bottom tiles are always segment boundaries in
        # the mask above (0 % seg == 0, n % seg == 0), so their halo
        # rows are zero here; replace them with the caller's rows.
        halo = halo.at[0, 0].set(edge_rows[0].astype(X.dtype))
        halo = halo.at[nt - 1, 1].set(edge_rows[1].astype(X.dtype))

    # Index maps return explicit i32 (a concrete numpy scalar — a traced
    # constant is rejected as a capture): under jax_enable_x64 a Python
    # int component is traced as i64 and Mosaic fails to legalize the
    # index function's func.return (observed compiling an x64 solve).
    import numpy as np

    z = np.int32(0)
    scale_arr = jnp.asarray([scale], X.dtype)
    return pl.pallas_call(
        functools.partial(_stencil_kernel, T=T),
        grid=(nt,),
        in_specs=[
            # Explicit index map also here: the auto-generated map for a
            # bare SMEM spec returns a 0 : i64 under x64 (transform_0 in
            # the Mosaic dump) and fails legalization the same way.
            pl.BlockSpec((1,), lambda i: (z,), memory_space=pltpu.SMEM),
            pl.BlockSpec((T, k), lambda i: (i, z)),
            pl.BlockSpec((1, 2, k), lambda i: (i, z, z)),
        ],
        out_specs=pl.BlockSpec((T, k), lambda i: (i, z)),
        out_shape=jax.ShapeDtypeStruct(
            (n, k), X.dtype, vma=frozenset(vma)
        ),
        interpret=interpret,
    )(scale_arr, X, halo)


def stencil_shape_ok(n: int, k: int, num_segments: int, dtype) -> bool:
    """Backend-independent shape gate shared by `stencil_supported` and
    the SPMD local dispatch (which also allows interpret mode on CPU)."""
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.bfloat16)):
        return False
    if k % 128:
        return False
    if n % num_segments:
        return False
    seg = n // num_segments
    sublane = 16 if jnp.dtype(dtype) == jnp.dtype(jnp.bfloat16) else 8
    return seg >= 2 * sublane and seg % sublane == 0


def stencil_supported(X: jax.Array, num_segments: int) -> bool:
    """Static check: can the Pallas path handle this input profitably?

    k % 128 == 0 only: the kernel itself handles any k >= 8 (measured
    116 GB/s at [4M, 64] vs 72 GB/s for the jnp fallback), but XLA
    stores sub-128-lane arrays compactly and inserts a 2x-padded
    layout-conversion COPY of the whole operand before any pallas call
    that consumes it — measured +1.91 GB resident and a full extra
    read/write on the dim-4M size_sub=64 solve, a net loss.  Pick
    size_sub in multiples of 128 (same HBM cost; full kernel rate).
    The segment length must be sublane-aligned; the halo side input
    costs 2/T extra reads (T = tile rows), negligible for large
    segments and still a win at the N-D stencil's short inner segments.
    """
    n, k = X.shape
    if not stencil_shape_ok(n, k, num_segments, X.dtype):
        return False
    return jax.default_backend() == "tpu"
