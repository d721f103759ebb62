"""BSR SpMM throughput benchmark: banded block-sparse operator apply.

VERDICT r1 item 3: the block-ELL Pallas kernel's throughput was an
unmeasured claim.  This benchmark builds a banded matrix (the sparse
shape LOBPCG meets in practice: stencils, overlap matrices, broadened
bands after RCM), converts it to both layouts, and reports nnz/s and
effective GB/s for:

  - strip-ELL kernel (one [128, Rs*bs] x [Rs*bs, k] MXU contraction per
    128-row strip, shared column-union gather)
  - legacy block-ELL kernel (one [bs, bs] x [bs, k] dot per block)
  - the jnp gather+einsum reference

Effective bytes per apply (the bandwidth-bound accounting): read the
stored matrix once, read each gathered X row once per strip that needs
it, write Y once.  `vs_roofline` compares against the same in-process
copy ceiling bench.py measures.

Usage: python benchmarks/bsr_spmm.py [--n 1048576] [--bs 8] [--band 24]
                                     [--k 128]
Prints one JSON line per kernel.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def banded_bsr(n: int, bs: int, band: int, seed: int = 0):
    """Banded matrix in block-ELL form, assembled directly (no dense
    intermediate): block row i couples to block cols i-w..i+w with
    w = ceil(band/bs)."""
    rng = np.random.RandomState(seed)
    nb = n // bs
    w = -(-band // bs)
    R = 2 * w + 1
    cols = np.zeros((nb, R), np.int32)
    vals = np.zeros((nb, R, bs, bs), np.float32)
    for d in range(-w, w + 1):
        r = d + w
        i = np.arange(nb)
        j = i + d
        ok = (j >= 0) & (j < nb)
        cols[ok, r] = j[ok]
        vals[ok, r] = rng.uniform(-0.5, 0.5, (int(ok.sum()), bs, bs))
    nnz = int((np.abs(vals) > 0).sum())
    return cols, vals, nnz


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_048_576)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--band", type=int, default=24)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--strip", type=int, default=128,
                    help="rows per strip for the strip formats (larger "
                         "strips amortize per-grid-step overhead)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lobpcg_tpu.ops.pallas.bsr import (
        bsr_matmat_pallas,
        bsr_matmat_reference,
        bsr_strip_matmat_pallas,
        bsr_strip_supported,
        bsr_supported,
        bsr_window_matmat_pallas,
        bsr_window_supported,
        ell_to_strip_ell,
        ell_to_strip_window,
    )

    n, bs, k = args.n, args.bs, args.k
    cols_np, vals_np, nnz = banded_bsr(n, bs, args.band)
    t0 = time.perf_counter()
    sc_np, sv_np = ell_to_strip_ell(cols_np, vals_np, strip=args.strip)
    lo_np, wv_np = ell_to_strip_window(cols_np, vals_np,
                                       strip=args.strip)
    t_convert = time.perf_counter() - t0

    cols = jnp.asarray(cols_np)
    vals = jnp.asarray(vals_np)
    sc = jnp.asarray(sc_np)
    sv = jnp.asarray(sv_np)
    lo = jnp.asarray(lo_np)
    wv = jnp.asarray(wv_np)
    X = jax.random.uniform(jax.random.PRNGKey(0), (n, k), jnp.float32,
                           -0.5, 0.5)

    ns, Rs = sc_np.shape
    W = wv_np.shape[2]
    # Bandwidth accounting: matrix bytes as stored + X gather + Y.
    bytes_strip = 4 * (sv_np.size + ns * Rs * bs * k + n * k)
    bytes_win = 4 * (wv_np.size + ns * W * k + n * k)
    bytes_ell = 4 * (vals_np.size + cols_np.size // 4
                     + vals_np.shape[0] * vals_np.shape[1] * bs * k
                     + n * k)

    # NOTE: call the (already-jitted) kernels with the matrix arrays as
    # ARGUMENTS — wrapping them in another jit via closure bakes the
    # ~GB strip_vals into the HLO as a constant, which the remote
    # compile tunnel rejects (HTTP 413).
    def timed(f, reps):
        def loop():
            t0 = time.perf_counter()
            Y = None
            for _ in range(reps):
                Y = f(X)
            float(jnp.sum(Y[:: max(1, n // 64), 0]))
            return (time.perf_counter() - t0) / reps

        f(X).block_until_ready()
        loop()
        return min(loop() for _ in range(3))

    def report(name, dt, nbytes):
        print(json.dumps({
            "metric": f"bsr_spmm_{name}",
            "value": nnz * k / dt,
            "unit": "nnz/s",
            "ms": round(dt * 1e3, 3),
            "effective_gbs": round(nbytes / dt / 1e9, 1),
            "n": n, "bs": bs, "band": args.band, "k": k,
            "nnz": nnz, "Rs": int(Rs), "strip": args.strip,
            "convert_s": round(t_convert, 2),
        }), flush=True)

    if bsr_window_supported(wv, X, bs):
        f = lambda X: bsr_window_matmat_pallas(lo, wv, X, bs=bs)
        report("strip_window", timed(f, 10), bytes_win)
    if bsr_strip_supported(sv, X, bs):
        f = lambda X: bsr_strip_matmat_pallas(sc, sv, X, bs=bs)
        report("strip_ell", timed(f, 10), bytes_strip)
    # The legacy per-block kernel keeps the [nb, R] col list flat in
    # SMEM (1 MB): it cannot run once nb*R*4 bytes exceed that — at
    # such sizes only the strip kernel applies.
    if bsr_supported(vals, X) and cols_np.size * 4 <= (1 << 20) // 2:
        try:
            f = lambda X: bsr_matmat_pallas(cols, vals, X)
            report("block_ell", timed(f, 10), bytes_ell)
        except Exception as e:  # compile limits, etc.
            print(f"# block_ell failed: {type(e).__name__}", flush=True)
    fr = jax.jit(bsr_matmat_reference)
    report("jnp_reference", timed(lambda X: fr(cols, vals, X), 4),
           bytes_ell)


if __name__ == "__main__":
    main()
