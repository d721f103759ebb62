"""Checkpointed long solve: run in chunks, snapshot, crash, resume.

LOBPCG warm-restarts from the X basis alone, so the checkpoint payload
is just the [n, size_sub] block (atomic npz snapshots).

Run: python examples/checkpoint_resume.py
"""

import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_enable_x64", True)  # f64 storage below

import jax.numpy as jnp
import numpy as np

from lobpcg_tpu import (
    Laplacian1D,
    SolverConfig,
    load_checkpoint,
    lobpcg,
    solve_checkpointed,
)

n = 400
h = 1.0 / (n + 1)
A = Laplacian1D(scale=jnp.asarray(1.0 / (h * h), jnp.float64), n=n)
X0 = jax.random.uniform(jax.random.PRNGKey(3), (n, 6), jnp.float64,
                        -0.5, 0.5)
path = pathlib.Path(tempfile.mkdtemp()) / "solve.npz"

# "Crash" after 2 chunks of 5 iterations.
cfg_short = SolverConfig(nev=3, size_sub=6, tol=1e-8, max_iter=10)
solve_checkpointed(lobpcg, A, X0, config=cfg_short, path=path, every=5)
print("after crash:", load_checkpoint(path)["iterations"],
      "iterations snapshotted at", path)

# A fresh process resumes from the snapshot and finishes.
cfg = SolverConfig(nev=3, size_sub=6, tol=1e-8, max_iter=2000)
r = solve_checkpointed(lobpcg, A, None, config=cfg, path=path, every=100)
print("resumed: converged", int(r.converged), "of 3 at cumulative iteration",
      int(r.iterations))
print("eigenvalues:", np.asarray(r.eigenvalues))
print("analytic:   ", (np.arange(1, 4) * np.pi) ** 2)
