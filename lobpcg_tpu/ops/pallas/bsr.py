"""Pallas TPU kernels: BSR sparse matrix x dense block SpMM.

The reference funnels sparse operators through a per-column matvec
callback (`include/lobpcg/linop.h`); the TPU-native materialized-sparse
path stores the matrix in block layouts whose gathers are driven by
scalar-prefetched block-column indices (`pltpu.PrefetchScalarGridSpec`).

Two kernels:

1. `bsr_strip_matmat_pallas` (the fast path): **strip-ELL** layout.
   Block rows are grouped into 128-row strips; each strip stores the
   *union* of its block-columns once and a dense [128, Rs*bs] matrix
   chunk re-expanded against that union.  Per strip the kernel gathers
   the union's X rows into a VMEM scratch (one [bs, k] pipelined fetch
   per grid step) and issues ONE [128, Rs*bs] x [Rs*bs, k] MXU
   contraction — full 128-row systolic occupancy, contraction depth
   Rs*bs, and each shared X block row fetched once per strip instead of
   once per bs-row block row.

2. `bsr_matmat_pallas` (legacy/general): plain block-ELL, one
   [bs, bs] x [bs, k] dot per grid step.  At bs=8 this uses 8 of the
   MXU's 128 rows per issue — kept for shapes the strip converter does
   not cover, and as a reference implementation.

Padding blocks are all-zero with col index 0: they contribute nothing.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Index-map components must be concrete i32: under jax_enable_x64 a
# Python int literal in an index map is traced as i64 and Mosaic fails
# to legalize the transform function's func.return (see
# ops/pallas/stencil.py, observed compiling an x64 solve).
_Z = np.int32(0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bsr_matmat_pallas(
    block_cols: jax.Array,  # [nb, R] i32
    blocks: jax.Array,  # [nb, R, bs, bs]
    X: jax.Array,  # [n, k], n = nb * bs
    *,
    interpret: bool = False,
) -> jax.Array:
    nb, R, bs, _ = blocks.shape
    n, k = X.shape
    assert n == nb * bs

    # block_cols is flattened to 1-D: SMEM arrays are lane-padded, so a
    # [nb, R] layout would blow up R -> 128 and overflow the 1 MB SMEM.
    cols_flat = block_cols.reshape(-1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, R),
        in_specs=[
            pl.BlockSpec(
                (1, 1, bs, bs),
                lambda i, r, cols: (i, r, _Z, _Z),
            ),
            pl.BlockSpec(
                (bs, k),
                lambda i, r, cols: (cols[i * R + r], _Z),
            ),
        ],
        out_specs=pl.BlockSpec((bs, k), lambda i, r, cols: (i, _Z)),
        scratch_shapes=[pltpu.VMEM((bs, k), jnp.float32)],
    )

    def kernel(cols_ref, blocks_ref, x_ref, o_ref, acc_ref):
        r = pl.program_id(1)
        nr = pl.num_programs(1)

        @pl.when(r == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # Full-f32 MXU passes: the SpMM feeds residuals and Grams, and
        # the default bf16 passes cost ~3 digits (measured 3.6e-3 rel).
        acc_ref[:] += jnp.dot(
            blocks_ref[0, 0],
            x_ref[:],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        @pl.when(r == nr - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, k), X.dtype),
        interpret=interpret,
    )(cols_flat, blocks, X)


STRIP = 128  # MXU systolic rows; strip-ELL groups this many matrix rows


def ell_to_strip_ell(block_cols, blocks, *, strip: int = STRIP):
    """Host-side conversion: block-ELL -> strip-ELL.

    Returns (strip_cols [ns, Rs] i32, strip_vals [ns, strip, Rs*bs]) as
    numpy arrays.  Each strip groups SB = strip//bs block rows; its
    column list is the sorted union of the members' block-columns, and
    strip_vals[s][g*bs + i, u*bs + j] = A-block(row g, col strip_cols[u])
    re-expanded against the union (absent -> zero).  The trailing strip
    is zero-padded (cols 0 / zero values).

    Trade-off: union re-expansion inflates stored matrix bytes by
    ~Rs/R, but each shared X block row is gathered once per strip
    instead of once per block row, and the kernel's contraction depth
    grows from bs to Rs*bs.  For banded matrices (the LOBPCG sparse
    workload) the X-gather saving dominates at solver block widths.
    """
    import numpy as np

    cols = np.asarray(block_cols)
    vals = np.asarray(blocks)
    nb, R, bs, _ = vals.shape
    if strip % bs:
        raise ValueError(f"block size {bs} must divide strip {strip}")
    SB = strip // bs
    ns = -(-nb // SB)
    nbp = ns * SB

    # Identify real (non-padding) blocks: padding is col 0 + all-zero.
    # (A genuinely-zero stored block at col 0 is indistinguishable from
    # padding; dropping it is harmless — it contributes nothing.)
    nz = vals.reshape(nb, R, -1).any(axis=2) | (cols != 0)
    if nbp > nb:  # zero-pad the trailing partial strip
        pad = nbp - nb
        cols = np.concatenate([cols, np.zeros((pad, R), cols.dtype)])
        vals = np.concatenate(
            [vals, np.zeros((pad, R, bs, bs), vals.dtype)]
        )
        nz = np.concatenate([nz, np.zeros((pad, R), bool)])

    # Per-strip dense rank of each member's column within the sorted
    # union (vectorized: sort, mark firsts, cumsum, un-permute).
    M = SB * R
    BIGC = np.int64(1) << 40
    c = np.where(nz, cols.astype(np.int64), BIGC).reshape(ns, M)
    order = np.argsort(c, axis=1, kind="stable")
    cs = np.take_along_axis(c, order, 1)
    new = np.ones((ns, M), bool)
    new[:, 1:] = cs[:, 1:] != cs[:, :-1]
    rank_sorted = np.cumsum(new, axis=1) - 1
    rank = np.empty_like(rank_sorted)
    np.put_along_axis(rank, order, rank_sorted, 1)
    live = c != BIGC
    Rs = max(1, int((rank_sorted * live[np.arange(ns)[:, None], order]
                     ).max(initial=0)) + 1)

    s_idx, m_idx = np.nonzero(live)
    strip_cols = np.zeros((ns, Rs), np.int32)
    strip_cols[s_idx, rank[s_idx, m_idx]] = c[s_idx, m_idx]

    # Scatter-add block values: [ns, SB, bs, Rs, bs] view of
    # [ns, strip, Rs*bs].
    sv5 = np.zeros((ns, SB, bs, Rs, bs), vals.dtype)
    g_idx = m_idx // R
    r_idx = m_idx % R
    np.add.at(
        sv5,
        (s_idx[:, None, None], g_idx[:, None, None],
         np.arange(bs)[None, :, None], rank[s_idx, m_idx][:, None, None],
         np.arange(bs)[None, None, :]),
        vals.reshape(ns * SB, R, bs, bs)[s_idx * SB + g_idx, r_idx],
    )
    return strip_cols, sv5.reshape(ns, strip, Rs * bs)


@functools.partial(jax.jit, static_argnames=("bs", "interpret"))
def bsr_strip_matmat_pallas(
    strip_cols: jax.Array,  # [ns, Rs] i32
    strip_vals: jax.Array,  # [ns, strip, Rs*bs]
    X: jax.Array,  # [n, k]
    *,
    bs: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Strip-ELL SpMM: one [strip, Rs*bs] x [Rs*bs, k] MXU contraction
    per 128-row strip, X union rows gathered by scalar prefetch."""
    ns, Rs = strip_cols.shape
    strip = strip_vals.shape[1]
    n, k = X.shape
    cols_flat = strip_cols.reshape(-1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ns, Rs),
        in_specs=[
            # Whole strip chunk, constant over r: fetched once per strip.
            pl.BlockSpec(
                (1, strip, Rs * bs), lambda s, r, cols: (s, _Z, _Z)
            ),
            # One [bs, k] X block row per step, gathered by union index.
            pl.BlockSpec(
                (bs, k), lambda s, r, cols: (cols[s * Rs + r], _Z)
            ),
        ],
        out_specs=pl.BlockSpec((strip, k), lambda s, r, cols: (s, _Z)),
        scratch_shapes=[pltpu.VMEM((Rs * bs, k), jnp.float32)],
    )

    def kernel(cols_ref, vals_ref, x_ref, o_ref, xg_ref):
        r = pl.program_id(1)
        nr = pl.num_programs(1)
        off = pl.multiple_of(r * bs, bs)
        xg_ref[pl.ds(off, bs), :] = x_ref[...].astype(jnp.float32)

        @pl.when(r == nr - 1)
        def _():
            # Full-f32 MXU passes: the SpMM feeds residuals and Grams;
            # default bf16 passes cost ~3 digits (measured 3.6e-3 rel).
            o_ref[...] = jnp.dot(
                vals_ref[0],
                xg_ref[...],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ns * strip, k), X.dtype),
        interpret=interpret,
    )(cols_flat, strip_vals, X)
    return out[:n]


def bsr_strip_supported(strip_vals: jax.Array, X: jax.Array,
                        bs: int) -> bool:
    ns, strip, w = strip_vals.shape
    if X.dtype != jnp.float32 or strip_vals.dtype != jnp.float32:
        return False
    if bs % 8 or strip % bs:
        return False
    if X.shape[1] < 8:
        return False
    # VMEM: strip chunk + gather scratch + out tile, double-buffered.
    k = max(X.shape[1], 128)
    vmem = 4 * (strip * w + w * k + strip * k) * 2
    if vmem > 100 * (1 << 20):
        return False
    return jax.default_backend() == "tpu"


def ell_to_strip_window(block_cols, blocks, *, strip: int = STRIP,
                        ncols: int | None = None,
                        force_width: int | None = None):
    """Host-side conversion: block-ELL -> strip-window (banded fast path).

    ``ncols``: number of block columns the indices address (defaults to
    the row count, i.e. a square matrix).  The sharded operator passes
    the EXTENDED local frame width nb_local + 2*halo here — its local
    block matrix is rectangular (spmd_bsr.py), and window clamping must
    use the X_ext row count, not the output row count.
    ``force_width``: use this window width (in block columns) instead of
    the computed one — the sharded operator converts each shard
    separately and needs one uniform width across shards; must be >= the
    max span and should already be lane-aligned.

    Each 128-row strip stores ONE contiguous block-column window
    [lo, lo + Wb) covering every column its rows touch, and a dense
    [strip, Wb*bs] chunk re-expanded against that window.  The kernel
    then gathers the window's X rows with a single contiguous DMA and
    issues one [strip, Wb*bs] x [Wb*bs, k] MXU contraction — one grid
    step and 3 DMAs per strip, vs Rs steps and Rs gathers for strip-ELL
    (measured 8x faster at banded 1M/bs=8: grid-step and DMA-issue
    overheads dominate small-block gathers).

    Returns (lo [ns] i32, win_vals [ns, strip, Wb*bs]).  Only sensible
    for matrices whose per-strip column span is bounded (bands, RCM-
    reordered); `Wb` is the max span, and scattered matrices explode it
    — gate with `bsr_window_widths` before converting.
    """
    import numpy as np

    cols = np.asarray(block_cols)
    vals = np.asarray(blocks)
    nb, R, bs, _ = vals.shape
    if strip % bs:
        raise ValueError(f"block size {bs} must divide strip {strip}")
    SB = strip // bs
    ns = -(-nb // SB)
    nbp = ns * SB

    nz = vals.reshape(nb, R, -1).any(axis=2) | (cols != 0)
    if nbp > nb:
        pad = nbp - nb
        cols = np.concatenate([cols, np.zeros((pad, R), cols.dtype)])
        vals = np.concatenate(
            [vals, np.zeros((pad, R, bs, bs), vals.dtype)]
        )
        nz = np.concatenate([nz, np.zeros((pad, R), bool)])

    c2 = cols.astype(np.int64).reshape(ns, SB * R)
    nz2 = nz.reshape(ns, SB * R)
    cmin = np.where(nz2, c2, np.iinfo(np.int64).max).min(axis=1)
    cmax = np.where(nz2, c2, np.int64(-1)).max(axis=1)
    empty = ~nz2.any(axis=1)
    cmin[empty] = 0
    cmax[empty] = 0
    Wb = max(1, int((cmax - cmin).max()) + 1)
    # Pad the window width to a 128-lane multiple: a sub-128-multiple
    # minor dim strides partial lane tiles in both the vals stream and
    # the X gather DMA (measured: W=176 capped the kernel at ~2.4x its
    # aligned rate regardless of precision or gather).
    # lcm-based: for bs that divides 128 this is the old ceil-to-128;
    # for bs = 24/40/48 (bs % 8 == 0 but not a 128 divisor) the old
    # `ceil(Wb*bs/128)*128//bs` floor-div quietly produced a window
    # width that was NOT a 128-lane multiple, re-losing the alignment.
    nc = nb if ncols is None else ncols
    if force_width is not None:
        if force_width < Wb:
            raise ValueError(
                f"force_width {force_width} < max span {Wb}"
            )
        Wb = force_width
    else:
        step = math.lcm(bs, 128) // bs
        Wb = -(-Wb // step) * step
    Wb = min(Wb, nc)  # tiny matrices: window = whole matrix
    lo = np.clip(cmin, 0, max(0, nc - Wb)).astype(np.int32)

    win = np.zeros((ns, SB, bs, Wb, bs), vals.dtype)
    s_idx, m_idx = np.nonzero(nz2)
    g_idx = m_idx // R
    r_idx = m_idx % R
    w_idx = c2[s_idx, m_idx] - lo[s_idx]
    np.add.at(
        win,
        (s_idx[:, None, None], g_idx[:, None, None],
         np.arange(bs)[None, :, None], w_idx[:, None, None],
         np.arange(bs)[None, None, :]),
        vals.reshape(nbp, R, bs, bs)[s_idx * SB + g_idx, r_idx],
    )
    return lo, win.reshape(ns, strip, Wb * bs)


def bsr_window_widths(block_cols, blocks, *, strip: int = STRIP):
    """Max per-strip block-column span (the Wb the window format would
    pad to) — cheap windowability check before converting."""
    import numpy as np

    cols = np.asarray(block_cols)
    vals = np.asarray(blocks)
    nb, R, bs, _ = vals.shape
    SB = strip // bs
    ns = -(-nb // SB)
    nz = vals.reshape(nb, R, -1).any(axis=2) | (cols != 0)
    pad = ns * SB - nb
    if pad:
        cols = np.concatenate([cols, np.zeros((pad, R), cols.dtype)])
        nz = np.concatenate([nz, np.zeros((pad, R), bool)])
    c2 = cols.astype(np.int64).reshape(ns, SB * R)
    nz2 = nz.reshape(ns, SB * R)
    cmin = np.where(nz2, c2, np.iinfo(np.int64).max).min(axis=1)
    cmax = np.where(nz2, c2, np.int64(-1)).max(axis=1)
    ok = nz2.any(axis=1)
    spans = np.where(ok, cmax - cmin + 1, 1)
    return int(spans.max(initial=1))


@functools.partial(
    jax.jit, static_argnames=("bs", "interpret", "out_rows", "vma")
)
def bsr_window_matmat_pallas(
    lo: jax.Array,  # [ns] i32 window starts (block units)
    win_vals: jax.Array,  # [ns, strip, W] dense window chunks
    X: jax.Array,  # [n, k]
    *,
    bs: int = 8,
    interpret: bool = False,
    out_rows: int | None = None,
    vma: tuple = (),
) -> jax.Array:
    """Strip-window SpMM: per 128-row strip, one contiguous double-
    buffered DMA of the window's X rows and one MXU contraction.

    ``out_rows``: rows of the result (defaults to X's rows; the sharded
    operator passes its local row count — there X is the halo-extended
    local block and the output is shorter than the input).  ``vma``:
    mesh axes the output varies over, for calls inside `shard_map`.
    """
    ns, strip, W = win_vals.shape
    n, k = X.shape
    nr = n if out_rows is None else out_rows
    # i32 prefetch indices: under jax_enable_x64 an i64 `lo` makes the
    # DMA's memref_slice offset i64, which Mosaic rejects.
    lo = lo.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((1, strip, W), lambda s, lo: (s, _Z, _Z)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((strip, k), lambda s, lo: (s, _Z)),
        scratch_shapes=[
            pltpu.VMEM((2, W, k), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kernel(lo_ref, vals_ref, x_hbm, o_ref, xg, sems):
        s = pl.program_id(0)
        ns_ = pl.num_programs(0)

        def gather(slot, si):
            # All-i32 index arithmetic: under jax_enable_x64 any weak
            # Python-int component here becomes an i64 memref_slice
            # offset, which Mosaic rejects.
            start = pl.multiple_of(
                lo_ref[si] * np.int32(bs), bs
            )
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(start, W), pl.ds(np.int32(0), k)],
                xg.at[slot], sems.at[slot]
            )

        @pl.when(s == 0)
        def _():
            # np.int32 literals: Python-int indices into lo_ref trace
            # as i64 memref_slice offsets under jax_enable_x64.
            gather(np.int32(0), np.int32(0)).start()

        @pl.when(s + 1 < ns_)
        def _():
            gather(jax.lax.rem(s + 1, jnp.int32(2)), s + 1).start()

        gather(jax.lax.rem(s, jnp.int32(2)), s).wait()
        o_ref[...] = jnp.dot(
            vals_ref[0],
            xg[jax.lax.rem(s, jnp.int32(2))].astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (ns * strip, k), X.dtype, vma=frozenset(vma)
        ),
        interpret=interpret,
    )(lo.astype(jnp.int32), win_vals, X)
    return out[:nr]


@functools.partial(
    jax.jit, static_argnames=("bs", "hrows", "interpret", "out_rows", "vma")
)
def bsr_window_matmat_pallas_edges(
    lo: jax.Array,  # [ns] i32 window starts (block units, EXTENDED frame)
    win_vals: jax.Array,  # [ns, strip, W] dense window chunks
    X: jax.Array,  # [n_loc, k] local rows (extended rows [hrows, hrows+n_loc))
    edge_top: jax.Array,  # [hrows + W, k] = [halo_up | X[:W]]
    edge_bot: jax.Array,  # [W + hrows, k] = [X[-W:] | halo_dn]
    *,
    bs: int = 8,
    hrows: int = 0,
    interpret: bool = False,
    out_rows: int | None = None,
    vma: tuple = (),
) -> jax.Array:
    """Strip-window SpMM against a HALO-EXTENDED frame WITHOUT
    materializing the extended array (VERDICT r4 ask 5).

    The sharded operator's local SpMM previously concatenated
    [halo_up | X | halo_dn] into a fresh [n_loc + 2*hrows, k] buffer —
    a full extra read+write of X per apply that held the shard-local
    kernel at 82% of the single-chip rate (results_r4.jsonl 2s2:
    4.56e11 vs 5.57e11 nnz/s).  Here only two SMALL edge buffers are
    built ([hrows + W, k] each — W window rows + the halo band) and the
    kernel classifies each strip's gather source per window start:

        start <  hrows               -> edge_top at offset start
        start + W > hrows + n_loc    -> edge_bot at offset
                                        start - (hrows + n_loc - W)
        otherwise                    -> X at offset start - hrows

    Requires W <= n_loc (rows), which makes the three cases mutually
    exclusive; the caller falls back to the concatenated frame
    otherwise.  All three sources have identical [W, k] copy shapes, so
    one semaphore wait covers whichever DMA fired.
    """
    ns, strip, W = win_vals.shape
    n_loc, k = X.shape
    if W > n_loc:
        raise ValueError(f"edge-buffer kernel needs W ({W}) <= n_loc "
                         f"({n_loc}); use the extended-frame path")
    nr = n_loc if out_rows is None else out_rows
    lo = lo.astype(jnp.int32)
    h32 = np.int32(hrows)
    body_hi = np.int32(hrows + n_loc - W)  # last body-window start

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((1, strip, W), lambda s, lo: (s, _Z, _Z)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((strip, k), lambda s, lo: (s, _Z)),
        scratch_shapes=[
            pltpu.VMEM((2, W, k), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kernel(lo_ref, vals_ref, x_hbm, top_hbm, bot_hbm, o_ref, xg, sems):
        s = pl.program_id(0)
        ns_ = pl.num_programs(0)

        def dma(src, slot, off):
            return pltpu.make_async_copy(
                src.at[pl.ds(off, W), pl.ds(np.int32(0), k)],
                xg.at[slot], sems.at[slot]
            )

        def gather(slot, si):
            start = pl.multiple_of(lo_ref[si] * np.int32(bs), bs)
            in_top = start < h32
            in_bot = start > body_hi

            @pl.when(in_top)
            def _():
                dma(top_hbm, slot, start).start()

            @pl.when(in_bot)
            def _():
                dma(bot_hbm, slot, start - body_hi).start()

            @pl.when(jnp.logical_not(in_top | in_bot))
            def _():
                dma(x_hbm, slot, start - h32).start()

        @pl.when(s == 0)
        def _():
            gather(np.int32(0), np.int32(0))

        @pl.when(s + 1 < ns_)
        def _():
            gather(jax.lax.rem(s + 1, jnp.int32(2)), s + 1)

        # One wait regardless of which source fired: the three copies
        # share dst shape/byte count, and .wait() is a semaphore wait
        # for the descriptor's byte count.
        dma(x_hbm, jax.lax.rem(s, jnp.int32(2)), np.int32(0)).wait()
        o_ref[...] = jnp.dot(
            vals_ref[0],
            xg[jax.lax.rem(s, jnp.int32(2))].astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (ns * strip, k), X.dtype, vma=frozenset(vma)
        ),
        interpret=interpret,
    )(lo, win_vals, X, edge_top, edge_bot)
    return out[:nr]


def bsr_window_supported(win_vals: jax.Array, X: jax.Array,
                         bs: int) -> bool:
    ns, strip, W = win_vals.shape
    n, k = X.shape
    if X.dtype != jnp.float32 or win_vals.dtype != jnp.float32:
        return False
    if bs % 8 or strip % bs:
        return False
    # The window gather row-slices X: Mosaic requires the minor dim be
    # lane-aligned (see ops/pallas/stencil.py module docstring).
    if k % 128:
        return False
    # Window rows must stay in range and VMEM must hold the buffers.
    if W % bs or (W // bs) > n // bs:
        return False
    vmem = 4 * (2 * strip * W + 2 * W * k + 2 * strip * k)
    return vmem <= 12 * (1 << 20) and jax.default_backend() == "tpu"


def bsr_matmat_reference(
    block_cols: jax.Array, blocks: jax.Array, X: jax.Array
) -> jax.Array:
    """Pure-jnp ELL SpMM (any backend / dtype): gather + einsum."""
    nb, R, bs, _ = blocks.shape
    n, k = X.shape
    Xb = X.reshape(nb, bs, k)
    Xg = Xb[block_cols]  # [nb, R, bs, k]
    Y = jnp.einsum(
        "nrij,nrjk->nik", blocks, Xg,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=X.dtype,
    )
    return Y.reshape(n, k)


def bsr_supported(blocks: jax.Array, X: jax.Array) -> bool:
    nb, R, bs, _ = blocks.shape
    if X.dtype != jnp.float32 or blocks.dtype != jnp.float32:
        return False
    if bs % 8 or X.shape[1] % 128:
        return False
    return jax.default_backend() == "tpu"
