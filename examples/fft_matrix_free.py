"""Matrix-free operators: a complex Hermitian circulant applied via FFT,
with a Fourier-space preconditioner and mixed-precision Rayleigh-Ritz.

A = F^H diag(s) F is never materialized — `CallableOperator` wraps the
jittable block function (the analog of the reference's opaque
`linop_ctx_t`, `include/lobpcg/linop.h:7-11`), and the whole solve stays
one XLA program.

Run: python examples/fft_matrix_free.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from lobpcg_tpu import CallableOperator, SolverConfig, lobpcg

n, nev = 2048, 8
dtype = jnp.complex64
s = 0.5 + jnp.arange(n, dtype=jnp.float32)  # symbol = exact spectrum


def apply_A(X, s):
    return jnp.fft.ifft(s[:, None] * jnp.fft.fft(X, axis=0), axis=0).astype(dtype)


def apply_T(X, s):  # (A + I)^-1, also circulant
    return jnp.fft.ifft(jnp.fft.fft(X, axis=0) / (s[:, None] + 1.0), axis=0).astype(dtype)


A = CallableOperator(args=(s,), fn=apply_A, n=n, _dtype=dtype)
T = CallableOperator(args=(s,), fn=apply_T, n=n, _dtype=dtype)

# complex64 storage + complex128 projected solves (rr_dtype).
cfg = SolverConfig(nev=nev, size_sub=12, tol=1e-5, max_iter=200,
                   rr_dtype="float64")
r = lobpcg(A, T=T, config=cfg, key=jax.random.PRNGKey(0))

print("eigenvalues:", np.asarray(r.eigenvalues)[:nev].round(5))
print("exact:      ", np.asarray(s)[:nev])
print("lam dtype:  ", r.eigenvalues.dtype, " (mixed precision)")
