"""Pallas TPU kernel: BSR (block-ELL) sparse matrix x dense block SpMM.

The reference funnels sparse operators through a per-column matvec
callback (`include/lobpcg/linop.h`); the TPU-native materialized-sparse
path instead stores the matrix as dense (bs x bs) blocks in ELL layout —
each block row padded to a fixed `R` blocks — so the MXU sees contiguous
tiles and the gather of X block rows is driven by scalar-prefetched
block-column indices (`pltpu.PrefetchScalarGridSpec`).

Y[i*bs:(i+1)*bs] = sum_r blocks[i, r] @ X[cols[i, r]*bs : +bs]

Padding blocks are all-zero with col index 0: they contribute nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
                lambda i, r, cols: (i, r, 0, 0),
            ),
            pl.BlockSpec(
                (bs, k),
                lambda i, r, cols: (cols[i * R + r], 0),
            ),
        ],
        out_specs=pl.BlockSpec((bs, k), lambda i, r, cols: (i, 0)),
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
