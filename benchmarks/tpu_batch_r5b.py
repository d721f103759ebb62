"""Round-5 TPU batch B — diagnose the ss=256 convergence failure.

Every full solve that ever converged used the jnp stencil fallback
(ss 64/164) or the packed k=128 kernel; the only ss=256 solves on record
(r4 6b3 f32 control, r5 esc f64-RR) both finished 300+ iterations with
converged=0.  Three confounded variables: the Pallas full-width stencil
path (k % 128 == 0), the projected-pencil width 768, and the lean flags
(--no-b-cache --no-dual-basis).  This batch separates them:

  d0/d0x  direct kernel-vs-fallback numerics at the exact apply shapes
          (k 128/256/512/768, segments=2, n=200k), f32 and under x64
  d1      20k x 150 ss=256 f32, DEFAULT flags (dual on, b-cache on)
  d2      20k x 150 ss=256 f32, lean flags (the esc configuration)
  d6      20k x 150 ss=256 x64 auto-escalated RR (small-n esc repro)
  d3      20k x 150 ss=164 f32 control (the shape class that converges)
  d4      200k x 150 ss=250 f32 lean — jnp path at width 750: kernel
          vs width discriminator at the failing scale
  d5      200k x 150 ss=256 f32 DEFAULT flags — flag discriminator
  d7      200k x 150 ss=256 x64 escalated with DEFAULT flags — the
          ask-2 positive candidate if the lean flags were the cause

Usage: python benchmarks/tpu_batch_r5b.py [--only d1,d2] [--skip d7]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from tpu_batch_r5a import SOLVE, record, run_experiments, wait_for_backend

REPO = pathlib.Path(__file__).resolve().parents[1]
CHECKER = [sys.executable, str(REPO / "benchmarks" / "stencil_check.py")]

# --chunk 20: the relay kills single device launches running longer
# than ~1 min (d1's unchunked 300-iteration launch died with "TPU
# worker process crashed"); warm-restarted 20-iteration launches share
# one compile.
COMMON = ["--nev", "150", "--tol", "1e-5", "--max-iter", "300",
          "--reps", "1", "--no-warmup", "--check", "--donate",
          "--chunk", "20"]
LEAN = ["--no-b-cache", "--no-dual-basis"]


def solve(n, ss, *extra):
    return SOLVE + ["--n", str(n), "--size-sub", str(ss)] + COMMON + list(extra)


LINALG = [sys.executable, str(REPO / "benchmarks" / "linalg_check.py")]

EXPERIMENTS = [
    # d0/d0x (k 128/256 exact; k=512 crashed the worker with a Mosaic
    # kernel fault) ran in the first launch of this batch; the crashing
    # widths are probed LAST (dX) so a sick worker cannot poison the
    # solve experiments.
    ("d0", "stencil_pallas_vs_jnp_200k",
     CHECKER + ["--n", "200000", "--widths", "128,256"], 2400),
    ("d0x", "stencil_pallas_vs_jnp_200k_x64",
     CHECKER + ["--n", "200000", "--widths", "128,256", "--x64"], 2400),
    # k x k linalg accuracy at the pencil widths (cholesky/trsm default-
    # precision-dot hypothesis; cheap and maximally discriminating).
    ("d8", "kxk_linalg_f32_accuracy", LINALG, 2400),
    ("d1", "20k150_ss256_f32_default_flags", solve(20000, 256), 2400),
    ("d2", "20k150_ss256_f32_lean_flags", solve(20000, 256, *LEAN), 2400),
    ("d6", "20k150_ss256_x64_escalated_default",
     solve(20000, 256, "--x64"), 3600),
    ("d3", "20k150_ss164_f32_control", solve(20000, 164), 2400),
    ("d4", "200k150_ss250_f32_lean_jnp_path", solve(200000, 250, *LEAN), 2400),
    ("d5", "200k150_ss256_f32_default_flags", solve(200000, 256), 2400),
    ("dX", "stencil_pallas_512_768_probe",
     CHECKER + ["--n", "200000", "--widths", "512,768"], 2400),
    ("d7", "200k150_ss256_x64_escalated_default",
     solve(200000, 256, "--x64", "--rr-chunk", "32768", "--chunk", "5"),
     9000),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    only = [s for s in args.only.split(",") if s]
    skip = [s for s in args.skip.split(",") if s]

    if not wait_for_backend():
        record({"experiment": "batch_r5b", "error": "backend never came up"})
        return
    run_experiments(EXPERIMENTS, only, skip)
    print("batch r5b done", flush=True)


if __name__ == "__main__":
    main()
