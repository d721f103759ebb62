"""Round-5 TPU batch D — validate the spectral-whitening RR fix on chip.

The d-series (results_r5.jsonl, pre-fix code) established: the identical
20k x 150 ss=256 f32 solve converges in 10 iterations on CPU but ran
300 iterations with 299 rr_fails on TPU — root-caused to XLA's
cholesky/triangular-solve expanders emitting DEFAULT-precision (bf16)
dots, capping the factorable condition number near 1/eps_bf16.  The fix
replaces every chol/trsm whitening with eigh-based spectral whitening
(ops/pencil.py, ops/rayleigh.py).  This batch is the on-chip after:

  f8    k x k linalg accuracy at cond 1e2/1e4/1e6 (mechanism proof:
        TPU cholesky should fail/degrade where CPU and TPU-eigh do not)
  f2    20k x 150 ss=256 f32 lean — the d2 A/B (before: conv 0/150)
  f3    20k x 150 ss=164 f32 — regression control (was healthy-ish)
  f5    200k x 150 ss=256 f32 lean — VERDICT ask 2's workload in PURE
        f32: if this converges, the f64 escalation (and its 57 GiB
        emulation hazard) is unnecessary at this scale
  f6    200k x 150 ss=256 f32 default flags (dual on, b-cache on)
  ffl   flagship 4M x 56 lean cheb-3 — does the fix cut the iteration
        count (r4: 31-43 its; CPU-physics equivalent: ~10)?
  f1M   1M x 150 ss=164 dual_off — second headline shape
  fqa-d 2M x 56 chaos quartet (pack x pad, no stall_reset): pre-fix
        spread was 34-192 iterations with up to 8 rr_fails — if the
        rr_fails were bf16-chol artifacts, the chaos should collapse

Usage: python benchmarks/tpu_batch_r5d.py [--only f2] [--skip fq]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from tpu_batch_r5a import SOLVE, record, run_experiments, wait_for_backend

REPO = pathlib.Path(__file__).resolve().parents[1]
LINALG = [sys.executable, str(REPO / "benchmarks" / "linalg_check.py")]

LEAN = ["--no-b-cache", "--no-dual-basis"]
COMMON = ["--nev", "150", "--tol", "1e-5", "--max-iter", "300",
          "--reps", "1", "--no-warmup", "--check", "--donate",
          "--chunk", "20"]
FLAG_2M64 = ["--n", "2000000", "--nev", "56", "--size-sub", "64",
             "--chunk", "40", "--donate", "--reps", "2", "--check",
             "--cheb", "3", "--gram-precision", "high"]
FLAG_4M56 = ["--n", "4000000", "--nev", "56", "--size-sub", "64",
             "--chunk", "40", "--donate", "--reps", "2", "--check",
             "--cheb", "3", "--gram-precision", "high"]
FLAG_1M150 = ["--n", "1000000", "--nev", "150", "--size-sub", "164",
              "--chunk", "40", "--donate", "--reps", "2", "--check",
              "--cheb", "3", "--gram-precision", "high",
              "--no-dual-basis"]


def solve(n, ss, *extra):
    return SOLVE + ["--n", str(n), "--size-sub", str(ss)] + COMMON + list(extra)


EXPERIMENTS = [
    ("f8", "kxk_linalg_f32_accuracy_conds", LINALG, 2400),
    ("f2", "20k150_ss256_f32_lean_POSTFIX", solve(20000, 256, *LEAN), 2400),
    ("f3", "20k150_ss164_f32_POSTFIX", solve(20000, 164), 2400),
    ("f5", "200k150_ss256_f32_lean_POSTFIX", solve(200000, 256, *LEAN), 2400),
    ("f6", "200k150_ss256_f32_default_POSTFIX", solve(200000, 256), 2400),
    ("ffl", "4M56_lean_cheb3_POSTFIX", SOLVE + FLAG_4M56 + LEAN, 2400),
    ("f1M", "1M150_ss164_dualoff_cheb3_POSTFIX", SOLVE + FLAG_1M150, 2400),
    ("fqa", "2M56_pack_on_pad_off_POSTFIX", SOLVE + FLAG_2M64 + LEAN, 2400),
    ("fqb", "2M56_pack_off_pad_off_POSTFIX",
     SOLVE + FLAG_2M64 + LEAN + ["--no-pack"], 2400),
    ("fqc", "2M56_pack_on_pad_on_POSTFIX",
     SOLVE + FLAG_2M64 + LEAN + ["--pad"], 2400),
    ("fqd", "2M56_pack_off_pad_on_POSTFIX",
     SOLVE + FLAG_2M64 + LEAN + ["--no-pack", "--pad"], 2400),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    only = [s for s in args.only.split(",") if s]
    skip = [s for s in args.skip.split(",") if s]

    if not wait_for_backend():
        record({"experiment": "batch_r5d", "error": "backend never came up"})
        return
    run_experiments(EXPERIMENTS, only, skip)
    print("batch r5d done", flush=True)


if __name__ == "__main__":
    main()
