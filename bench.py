"""Headline benchmark: blocked SpMM (operator application) nnz/s per chip.

BASELINE.json's headline metric is SpMM nnz/s/chip with a >=80%-of-roofline
target.  The workload is the reference's flagship operator shape: a
BdG-style block-Laplacian (A = diag(K, K), K = 1-D stencil) applied to the
search block X of a dim-4M, 160-eigenpair solve — the hot op that
dominates `lobpcg`'s inner loop (SURVEY.md §3.1 hot loops).

A 1-D stencil SpMM is HBM-bandwidth bound: per applied element we read X
once and write Y once; nnz throughput roofline is therefore
    nnz/s = nnz_per_col / (2 * n * bytes / BW).

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": "nnz/s", "vs_baseline": ...}
vs_baseline = achieved / (0.80 * roofline): >= 1.0 means the driver target
is met on this chip.
"""

from __future__ import annotations

import json
import time

import numpy as np


# v5e HBM bandwidth (bytes/s); used only to normalize vs_baseline.
HBM_BW = {
    "v5 lite": 819e9,
    "v5e": 819e9,
    "v4": 1228e9,
    "v5p": 2765e9,
    "v6": 1640e9,
    "cpu": 100e9,
}


def _device_bw() -> float:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, bw in HBM_BW.items():
        if key in kind:
            return bw
    return 819e9


def main() -> None:
    import jax
    import jax.numpy as jnp

    from lobpcg_tpu import Laplacian1D

    n = 4_000_000  # reference headline problem dimension
    k = 256  # 150+ eigenpairs, lane-aligned for the Pallas stencil
    dtype = jnp.float32
    m = n // 2
    h = 1.0 / (m + 1)
    A = Laplacian1D(scale=jnp.asarray(1.0 / (h * h), dtype), n=n, segments=2)

    X = jax.random.uniform(jax.random.PRNGKey(0), (n, k), dtype, -0.5, 0.5)

    apply_fn = jax.jit(lambda X: A.matmat(X))

    def timed_loop(reps: int) -> float:
        t0 = time.perf_counter()
        Y = X
        for _ in range(reps):
            Y = apply_fn(Y)
        # Data-dependent scalar readback: block_until_ready alone is not
        # reliable through remote-relay runtimes.
        float(jnp.sum(Y[::100_000, 0]))
        return (time.perf_counter() - t0) / reps

    timed_loop(10)  # compile + buffer-residency warm-up (first round is inflated)
    dt = timed_loop(20)

    nnz = (3 * m - 2) * 2  # tridiagonal stencil, two diagonal blocks
    nnz_per_s = nnz * k / dt

    bytes_moved = 2 * n * k * np.dtype(np.float32).itemsize
    roofline = nnz * k / (bytes_moved / _device_bw())
    target = 0.80 * roofline

    print(
        json.dumps(
            {
                "metric": "spmm_bdg_stencil_nnz_per_s_per_chip",
                "value": nnz_per_s,
                "unit": "nnz/s",
                "vs_baseline": nnz_per_s / target,
            }
        )
    )


if __name__ == "__main__":
    main()
