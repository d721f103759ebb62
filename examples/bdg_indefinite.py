"""Indefinite LOBPCG (Kressner-Pandur-Shao) on a BdG-style pencil.

A = diag(K, K), B = antidiag(I, I): the pencil's spectrum is +-(k*pi)^2
and eigenpairs carry a +-1 signature.  ilobpcg returns the eigenvalues
closest to the positive spectral edge (positives ascending), with the
B-positive initialization X0 = [u; u] steering toward the + branch.

Run: python examples/bdg_indefinite.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from lobpcg_tpu import (
    BlockAntiDiagOperator,
    BlockDiagOperator,
    Laplacian1D,
    SolverConfig,
    ilobpcg,
)

m = 400  # half-dimension; the pencil is 2m x 2m
h = 1.0 / (m + 1)
K = Laplacian1D(scale=jnp.asarray(1.0 / (h * h), jnp.float64), n=m)
A = BlockDiagOperator(inner=K, copies=2)
B = BlockAntiDiagOperator(d=jnp.ones((m,), jnp.float64))

rng = np.random.RandomState(42)
u = rng.uniform(-0.5, 0.5, size=(m, 6))
X0 = jnp.asarray(np.concatenate([u, u], axis=0))

cfg = SolverConfig(nev=3, size_sub=6, tol=1e-6, max_iter=300,
                   record_history=True)
r = ilobpcg(A, X0, B, config=cfg)

print("eigenvalues:", np.asarray(r.eigenvalues))
print("analytic:   ", (np.arange(1, 4) * np.pi) ** 2)
print("signatures: ", np.asarray(r.signature))
it = int(r.iterations)
print(f"converged {int(r.converged)}/3 in {it} iterations; "
      f"residual trace of pair 0: "
      f"{np.asarray(r.history.residual_norms[:it:max(1, it // 6), 0])}")
