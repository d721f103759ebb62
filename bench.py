"""Headline benchmark: blocked SpMM (operator application) nnz/s per chip.

BASELINE.json's headline metric is SpMM nnz/s/chip with a >=80%-of-roofline
target.  The workload is the reference's flagship operator shape: a
BdG-style block-Laplacian (A = diag(K, K), K = 1-D stencil) applied to the
search block X of a dim-4M, 160-eigenpair solve — the hot op that
dominates `lobpcg`'s inner loop (SURVEY.md §3.1 hot loops).

A 1-D stencil SpMM is HBM-bandwidth bound: per applied element we read X
once and write Y once (the information-theoretic minimum), so
    nnz/s = nnz * k / (2 * n * k * bytes / BW).

Roofline BW is *attainable* bandwidth, measured in-process as a
same-shape double-buffered VMEM-streaming copy (the empirical-roofline
methodology: a 1:1 read/write stream cannot reach the spec-sheet read
bandwidth — on v5e the measured copy ceiling is ~65% of the 819 GB/s
sheet number).  The spec-sheet fraction is reported alongside for
transparency.

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": "nnz/s", "vs_baseline": ...,
     "copy_roofline_gbs": ..., "spec_fraction": ..., "gbs": ...}
vs_baseline = achieved / (0.80 * empirical roofline): >= 1.0 means the
SpMM kernel moves bytes at >= 80% of what a pure memcpy achieves on this
chip.
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

# Spec-sheet HBM bandwidth (bytes/s); for the spec_fraction report only.
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


def _copy_fn(n: int, k: int, tile: int = 2048):
    """Double-buffered HBM->VMEM->HBM streaming copy: the attainable
    ceiling for any kernel that reads and writes every element once."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num_tiles = n // tile

    def kernel(x_hbm, o_hbm):
        def scoped(xs, in_sems, out_sems):
            def in_dma(s, t):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(t * tile, tile), :], xs.at[s],
                    in_sems.at[s])

            def out_dma(s, t):
                return pltpu.make_async_copy(
                    xs.at[s], o_hbm.at[pl.ds(t * tile, tile), :],
                    out_sems.at[s])

            in_dma(0, 0).start()

            def body(t, _):
                s = jax.lax.rem(t, 2)
                ns = jax.lax.rem(t + 1, 2)

                @pl.when(t + 1 < num_tiles)
                def _():
                    in_dma(ns, t + 1).start()

                in_dma(s, t).wait()

                @pl.when(t >= 2)
                def _():
                    out_dma(s, t - 2).wait()

                out_dma(s, t).start()
                return ()

            jax.lax.fori_loop(0, num_tiles, body, (), unroll=False)

            @pl.when(num_tiles >= 2)
            def _():
                out_dma(jax.lax.rem(num_tiles - 2, 2), num_tiles - 2).wait()

            out_dma(jax.lax.rem(num_tiles - 1, 2), num_tiles - 1).wait()

        pl.run_scoped(
            scoped,
            xs=pltpu.VMEM((2, tile, k), np.float32),
            in_sems=pltpu.SemaphoreType.DMA((2,)),
            out_sems=pltpu.SemaphoreType.DMA((2,)),
        )

    @jax.jit
    def copy(X):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, k), X.dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * (1 << 20)),
        )(X)

    return copy


# Flagship end-to-end solve reported as a second JSON line (first in
# print order; the LAST line stays the headline SpMM metric for
# round-over-round comparability).  Measured-fastest single-chip
# configuration (results_r3.jsonl, same-session ladders): chunked
# launches + donation (r2), degree-3 Chebyshev (36 vs 77 iterations,
# 28.4 vs 44.6 s cache-less) and bf16_3x Gram contractions (-8.5%
# same-iteration wall-clock, max rel err 3.1e-6 << tol-implied bound).
FLAGSHIP_SOLVE_ARGS = [
    "--n", "4000000", "--nev", "56", "--size-sub", "64",
    "--chunk", "40", "--donate", "--reps", "2", "--check",
    "--cheb", "3", "--gram-precision", "high",
]

# Peak-HBM fallback ladder (TPU-compiled peaks, benchmarks/
# mem_analysis.py --tpu, 4M x 64 f32): --no-dual-basis 14.39 GiB ->
# + --no-b-cache 10.58 GiB -> + --no-ax-cache 8.67 GiB.  The remote
# chip's *available* HBM varies with relay state (a peak that fit in
# round 2 hit ResourceExhausted in round 3), so the solve line degrades
# through configs that are algorithmically sound for the BdG workload
# (B = antidiag(I, I) is perfectly conditioned, so the dual-basis
# branch never fires; ax-cache/b-cache off cost one extra SpMM /
# B-apply per iteration) rather than vanishing.  The JSON line records
# which knobs ran.
# Rung order follows the measured fitting boundary (results_r3.jsonl
# 2r/4r ladders, a shrunken-grant session): with b-cache ON no 4M
# configuration fit — its three carried [4M, 64] blocks cost far more
# real HBM than the CPU-backend nominal parity suggests — while
# b-cache off + dual-basis off fit WITH the ax-cache (41.6 s) and was
# faster than dropping the ax-cache too (44.6 s).
# Named rungs (VERDICT r3 ask 9: same-rung round-over-round
# comparability — the JSON line carries the rung that actually ran, and
# BASELINE.md's round table compares like with like).  Rung 0 is the
# full configuration; its TPU-measured peak is 16.31 GiB, which can
# NEVER fit the 16 GB chip (both lax.cond branches count, so the dual
# branch pins the peak even when it would not fire) — it is statically
# skipped via the measured peak model (utils/plan.py) rather than
# burning a ~3-min doomed compile, and the skip is recorded in the JSON.
# For this workload dual-basis off is algorithmically identical (B =
# antidiag(I, I) is perfectly conditioned), so the first *attempted*
# rung is dual_off: 14.39 GiB with both caches — the fastest profile.
FLAGSHIP_FALLBACKS = [
    ("full", []),
    ("dual_off", ["--no-dual-basis"]),
    ("b_cache_off", ["--no-b-cache", "--no-dual-basis"]),
    ("all_off", ["--no-b-cache", "--no-dual-basis", "--no-ax-cache"]),
    # Lane packing costs ~+2-3 blocks when it is itself the high-water
    # mark (results_r4.jsonl 5k/5l/5m): two leaner pack-off rungs
    # before giving up the full dimension.
    ("b_cache_off_nopack",
     ["--no-b-cache", "--no-dual-basis", "--no-pack"]),
    ("all_off_nopack",
     ["--no-b-cache", "--no-dual-basis", "--no-ax-cache", "--no-pack"]),
    # Last resort when the relay's grant is below every dim-4M peak:
    # report the half-dim solve rather than nothing.  The JSON line's
    # "n" field keeps the metric honest.
    ("half_dim",
     ["--half-dim", "--no-b-cache", "--no-dual-basis", "--no-ax-cache",
      "--no-pack"]),
]

# Physical chip HBM: rungs whose measured peak exceeds this can never
# run regardless of the session's grant.
CHIP_HBM_GB = 16.0


def _rung_peak_gb(name: str, n: int, size_sub: int) -> float:
    import numpy as np

    from lobpcg_tpu import SolverConfig
    from lobpcg_tpu.utils.plan import estimate_peak_gb

    knobs = {
        "full": {},
        "dual_off": {"dual_basis": False},
        "b_cache_off": {"dual_basis": False, "use_b_cache": False},
        "all_off": {"dual_basis": False, "use_b_cache": False,
                    "use_ax_cache": False},
        "b_cache_off_nopack": {"dual_basis": False, "use_b_cache": False,
                               "pack_applies": False},
        "all_off_nopack": {"dual_basis": False, "use_b_cache": False,
                           "use_ax_cache": False, "pack_applies": False},
        "half_dim": {"dual_basis": False, "use_b_cache": False,
                     "use_ax_cache": False, "pack_applies": False},
    }[name]
    cfg = SolverConfig(nev=1, size_sub=size_sub, **knobs)
    return estimate_peak_gb(n, size_sub, np.float32, cfg)


def _flagship_solve_line() -> str | None:
    """Run the flagship solve benchmark in a subprocess; return its JSON
    line, or None on any failure (the SpMM headline must survive a solve
    OOM / relay kill).  Retries down FLAGSHIP_FALLBACKS on OOM."""
    import pathlib
    import subprocess
    import sys

    script = pathlib.Path(__file__).resolve().parent / "benchmarks" / \
        "solve_bdg.py"
    base = list(FLAGSHIP_SOLVE_ARGS)
    dim = int(base[base.index("--n") + 1])
    ss = int(base[base.index("--size-sub") + 1])
    skipped = []
    for rung_idx, (rung_id, extra) in enumerate(FLAGSHIP_FALLBACKS):
        # Static skip via the measured peak model: a rung whose
        # TPU-compiled peak exceeds the physical chip can never run.
        rung_dim = dim // 2 if rung_id == "half_dim" else dim
        if _rung_peak_gb(rung_id, rung_dim, ss) > CHIP_HBM_GB:
            skipped.append(rung_id)
            continue
        args = list(base)
        if "--half-dim" in extra:
            extra = [e for e in extra if e != "--half-dim"]
            args[args.index("--n") + 1] = str(dim // 2)
        try:
            p = subprocess.run(
                [sys.executable, str(script)] + args + extra,
                capture_output=True, text=True, timeout=2400,
                cwd=str(script.parents[1]),
            )
        except (subprocess.TimeoutExpired, OSError):
            return None
        if p.returncode != 0:
            # Runtime OOM says RESOURCE_EXHAUSTED; an unallocatable
            # program prints an XLA allocation dump instead.
            if any(s in (p.stderr or "") for s in
                   ("RESOURCE_EXHAUSTED", "Largest program allocations",
                    "exceeds the limit in memory space")):
                skipped.append(rung_id)
                continue  # try the next-lower-memory configuration
            return None
        for line in reversed(p.stdout.strip().splitlines()):
            if line.startswith("{"):
                rec = json.loads(line)
                rec["rung"] = rung_idx
                rec["rung_id"] = rung_id
                rec["rungs_skipped"] = skipped
                return json.dumps(rec)
        return None
    return None


def main() -> None:
    import jax
    import jax.numpy as jnp

    from lobpcg_tpu import Laplacian1D

    # Flagship solve FIRST, in a subprocess, while this process holds no
    # HBM buffers — the chip is single and the solve needs ~14 GB.  Its
    # JSON line prints before the SpMM line so the LAST line remains the
    # round-over-round headline metric.
    if jax.default_backend() == "tpu":
        solve_line = _flagship_solve_line()
        if solve_line is not None:
            print(solve_line, flush=True)

    n = 4_000_000  # reference headline problem dimension
    k = 256  # 150+ eigenpairs, lane-aligned for the Pallas stencil
    dtype = jnp.float32
    m = n // 2
    h = 1.0 / (m + 1)
    A = Laplacian1D(scale=jnp.asarray(1.0 / (h * h), dtype), n=n, segments=2)
    X = jax.random.uniform(jax.random.PRNGKey(0), (n, k), dtype, -0.5, 0.5)

    apply_fn = jax.jit(lambda X: A.matmat(X))
    on_tpu = jax.default_backend() == "tpu"
    copy_fn = _copy_fn(n, k) if on_tpu else apply_fn

    def timed_loop(fn, reps: int) -> float:
        t0 = time.perf_counter()
        Y = X
        for _ in range(reps):
            Y = fn(Y)
        # Data-dependent scalar readback: block_until_ready alone is not
        # reliable through remote-relay runtimes.
        float(jnp.sum(Y[::100_000, 0]))
        return (time.perf_counter() - t0) / reps

    # Compile + buffer-residency warm-up (first rounds are inflated),
    # then best-of-3 timing windows to cut remote-relay jitter.
    timed_loop(apply_fn, 8)
    dt = min(timed_loop(apply_fn, 15) for _ in range(3))

    bytes_moved = 2 * n * k * np.dtype(np.float32).itemsize
    if on_tpu:
        timed_loop(copy_fn, 8)
        dt_copy = min(timed_loop(copy_fn, 15) for _ in range(3))
        copy_bw = bytes_moved / dt_copy
    else:
        copy_bw = bytes_moved / dt  # CPU: self-normalize

    nnz = (3 * m - 2) * 2  # tridiagonal stencil, two diagonal blocks
    nnz_per_s = nnz * k / dt
    achieved_bw = bytes_moved / dt

    roofline_nnz = nnz * k / (bytes_moved / copy_bw)
    target = 0.80 * roofline_nnz

    print(
        json.dumps(
            {
                "metric": "spmm_bdg_stencil_nnz_per_s_per_chip",
                "value": nnz_per_s,
                "unit": "nnz/s",
                "vs_baseline": nnz_per_s / target,
                "gbs": achieved_bw / 1e9,
                "copy_roofline_gbs": copy_bw / 1e9,
                "spec_fraction": achieved_bw / _device_bw(),
            }
        )
    )


if __name__ == "__main__":
    main()
