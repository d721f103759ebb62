"""Round-5 TPU batch C — stabilizer proof, BSR edge-buffer rate, bench drill.

  s8a-s8d  the r4 iteration-chaos quartet (2M x 56 ss=64 cheb-3 lean,
           pack x pad) re-run with --stall-reset 4 (VERDICT r4 ask 4:
           worst-case iterations across the quartet within ~2x the best,
           vs 5.6x measured without the stabilizer, results_r4 8a-8d)
  sfl      flagship 4M x 56 lean cheb-3 with --stall-reset 4 (no
           regression gate for the stabilizer on the headline rung)
  bsr      sharded-BSR local rate with the edge-buffer window kernel
           (VERDICT r4 ask 5: >= 90% of single-chip, was 82% against
           the halo-extended frame) — benchmarks/lane_spmd.py --sections bsr
  bench    the full bench.py under an OUTER timeout 1500 (VERDICT r4
           ask 1 done-check: the artifact's last line must parse even
           under a driver-style timeout)

Usage: python benchmarks/tpu_batch_r5c.py [--only s8] [--skip bench]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from tpu_batch_r5a import SOLVE, record, run_experiments, wait_for_backend

REPO = pathlib.Path(__file__).resolve().parents[1]

LEAN = ["--no-b-cache", "--no-dual-basis"]
STALL = ["--stall-reset", "4"]
FLAG_2M64 = ["--n", "2000000", "--nev", "56", "--size-sub", "64",
             "--chunk", "40", "--donate", "--reps", "2", "--check",
             "--cheb", "3", "--gram-precision", "high"]
FLAG_4M56 = ["--n", "4000000", "--nev", "56", "--size-sub", "64",
             "--chunk", "40", "--donate", "--reps", "2", "--check",
             "--cheb", "3", "--gram-precision", "high"]

EXPERIMENTS = [
    ("s8a", "2M56_stall4_pack_on_pad_off",
     SOLVE + FLAG_2M64 + LEAN + STALL, 2400),
    ("s8b", "2M56_stall4_pack_off_pad_off",
     SOLVE + FLAG_2M64 + LEAN + STALL + ["--no-pack"], 2400),
    ("s8c", "2M56_stall4_pack_on_pad_on",
     SOLVE + FLAG_2M64 + LEAN + STALL + ["--pad"], 2400),
    ("s8d", "2M56_stall4_pack_off_pad_on",
     SOLVE + FLAG_2M64 + LEAN + STALL + ["--no-pack", "--pad"], 2400),
    ("sfl", "4M56_stall4_lean_cheb3",
     SOLVE + FLAG_4M56 + LEAN + STALL, 2400),
    ("bsr", "bsr_edge_buffer_local_rate",
     [sys.executable, str(REPO / "benchmarks" / "lane_spmd.py"),
      "--sections", "bsr"], 3000),
    ("bench", "bench_under_driver_timeout",
     ["timeout", "1500", sys.executable, str(REPO / "bench.py")], 1600),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    only = [s for s in args.only.split(",") if s]
    skip = [s for s in args.skip.split(",") if s]

    if not wait_for_backend():
        record({"experiment": "batch_r5c", "error": "backend never came up"})
        return
    run_experiments(EXPERIMENTS, only, skip)
    print("batch r5c done", flush=True)


if __name__ == "__main__":
    main()
