"""Round-3 follow-up TPU batch: the 4M experiments, OOM-aware.

The main r3 batch's 4M runs hit ResourceExhausted: the chip's
*available* HBM had shrunk below the (unchanged since round 2, verified
by compile-time analysis) 14.34 GB program peak.  This batch retries
them with a peak-HBM fallback ladder — default, then --no-dual-basis
(-2.9 GB), then + --no-ax-cache (-0.95 GB more) — recording which
configuration ran, plus higher-rep 1M reruns to discriminate
gram_precision high vs highest under relay wall-clock variance.

Appends to benchmarks/results_r3.jsonl.  Usage: same as tpu_batch_r3.py.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
OUT = REPO / "benchmarks" / "results_r3.jsonl"

SOLVE = [sys.executable, str(REPO / "benchmarks" / "solve_bdg.py")]

FLAG_4M = ["--n", "4000000", "--nev", "56", "--size-sub", "64",
           "--chunk", "40", "--donate", "--reps", "2", "--check"]
FLAG_1M = ["--n", "1000000", "--nev", "150", "--size-sub", "164",
           "--chunk", "40", "--donate", "--reps", "4", "--check"]

# The final rung drops the b-cache too: its three carried [4M, 64]
# blocks are lane-padded to 128 on the TPU (CLAUDE.md), so its REAL
# peak cost at ss=64 is ~2x the CPU-backend nominal delta — and it is
# the one r3 default the round-2 33.3 s run did not carry.
LADDER = [[], ["--no-dual-basis"], ["--no-dual-basis", "--no-ax-cache"],
          ["--no-dual-basis", "--no-ax-cache", "--no-b-cache"]]

# Ordered most-valuable-first: the relay's grant comes and goes (a
# 20 GiB probe can precede an OOM an hour later), so the flagship
# comparisons run while the window is open.
EXPERIMENTS = [
    ("2r", "flagship_4M56_default", SOLVE + FLAG_4M, 2400, True),
    # Early: if default OOMs but this fits, the b-cache's lane-padded
    # TPU cost is the regression (it is the one new-in-r3 default).
    ("4r", "flagship_4M56_no_b_cache",
     SOLVE + FLAG_4M + ["--no-b-cache"], 2400, True),
    ("5r", "flagship_4M56_ss128",
     SOLVE + ["--n", "4000000", "--nev", "56", "--size-sub", "128",
              "--chunk", "40", "--donate", "--reps", "2", "--check"],
     2400, True),
    ("3ar", "flagship_4M56_gram_high",
     SOLVE + FLAG_4M + ["--gram-precision", "high"], 2400, True),
    ("6ar", "cheb3_4M56", SOLVE + FLAG_4M + ["--cheb", "3"], 2400, True),
    # Same-day plain-solve counterpart to the main batch's cheb3_2M120
    # (relay wall-clock is only comparable within a session).
    ("6bp", "plain_2M120",
     SOLVE + ["--n", "2000000", "--nev", "120", "--size-sub", "128",
              "--chunk", "40", "--donate", "--reps", "2", "--check"],
     2400, False),
    # Rerun of the main batch's experiment 7 after the stencil kernel's
    # i32 roll-shift fix (x64 solves lowered an i64 dynamic_rotate that
    # Mosaic rejected).
    ("7r", "1M150_ss256_x64_escalated",
     SOLVE + ["--n", "1000000", "--nev", "150", "--size-sub", "256",
              "--chunk", "10", "--donate", "--reps", "1", "--check",
              "--x64"], 3600, False),
    ("3br", "flagship_1M150_gram_high_r4",
     SOLVE + FLAG_1M + ["--gram-precision", "high"], 3000, False),
    ("3cr", "flagship_1M150_highest_r4", SOLVE + FLAG_1M, 3000, False),
]


def wait_for_backend(max_wait_s: float = 7200) -> bool:
    probe = "import jax; print(jax.devices()[0].device_kind)"
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        p = subprocess.run([sys.executable, "-c", probe], cwd=str(REPO),
                           capture_output=True, text=True, timeout=1800)
        if p.returncode == 0 and p.stdout.strip():
            print(f"backend up: {p.stdout.strip()}", flush=True)
            return True
        print(f"backend down ({time.time() - t0:.0f}s)", flush=True)
        time.sleep(300)
    return False


def record(obj) -> None:
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")


def run_one(eid, label, argv, tmo, use_ladder) -> None:
    ladders = LADDER if use_ladder else [[]]
    for extra in ladders:
        print(f"=== [{eid}] {label} {' '.join(extra) or '(default)'}",
              flush=True)
        t0 = time.time()
        try:
            p = subprocess.run(argv + extra, cwd=str(REPO),
                               capture_output=True, text=True, timeout=tmo)
        except subprocess.TimeoutExpired:
            record({"experiment": eid, "label": label, "error": "timeout",
                    "timeout_s": tmo, "extra": extra})
            return
        elapsed = round(time.time() - t0, 1)
        lines = [ln for ln in p.stdout.strip().splitlines()
                 if ln.startswith("{")]
        if p.returncode == 0 and lines:
            for ln in lines:
                obj = json.loads(ln)
                obj.update({"experiment": eid, "label": label,
                            "elapsed_s": elapsed, "extra": extra})
                record(obj)
                print(f"    {ln[:160]}", flush=True)
            return
        # Runtime OOM says RESOURCE_EXHAUSTED; a program too big to even
        # allocate reports an XLA allocation dump instead (observed for
        # 4M x 128: "Largest program allocations" + HLO temp table).
        oom = any(s in (p.stderr or "") for s in
                  ("RESOURCE_EXHAUSTED", "Largest program allocations",
                   "exceeds the limit in memory space"))
        tail = [ln for ln in (p.stderr or p.stdout).strip().splitlines()
                if ln.strip()][-8:]
        record({"experiment": eid, "label": label,
                "error": f"rc={p.returncode}" + (" OOM" if oom else ""),
                "tail": tail, "elapsed_s": elapsed, "extra": extra})
        print(f"    FAILED rc={p.returncode} oom={oom}", flush=True)
        if not oom:
            return  # non-OOM failure: the ladder will not help
    # ladder exhausted


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    only = [s for s in args.only.split(",") if s]
    skip = [s for s in args.skip.split(",") if s]

    if not wait_for_backend():
        record({"experiment": "batch_r3b", "error": "backend never came up"})
        return

    for eid, label, argv, tmo, ladder in EXPERIMENTS:
        if only and not any(eid.startswith(o) for o in only):
            continue
        if skip and any(eid.startswith(o) for o in skip):
            continue
        run_one(eid, label, argv, tmo, ladder)


if __name__ == "__main__":
    main()
