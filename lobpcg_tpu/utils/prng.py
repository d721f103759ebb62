"""Explicit-key random fills.

The reference's `fill_random` draws uniform [-0.5, 0.5] with a wall-clock
`srand` (`src/residual/estimate_norm_impl.inc:19-35`) — non-reproducible
by design default.  Here every random fill takes an explicit JAX PRNG key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fill_random(key: jax.Array, shape, dtype) -> jax.Array:
    """Uniform [-0.5, 0.5]; complex dtypes get independent re/im parts."""
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.complexfloating):
        rdt = jnp.zeros((), dtype).real.dtype
        kr, ki = jax.random.split(key)
        re = jax.random.uniform(kr, shape, rdt, -0.5, 0.5)
        im = jax.random.uniform(ki, shape, rdt, -0.5, 0.5)
        return (re + 1j * im).astype(dtype)
    return jax.random.uniform(key, shape, dtype, -0.5, 0.5)
