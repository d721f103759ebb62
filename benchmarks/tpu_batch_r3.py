"""Round-3 TPU measurement batch — serialized, one long process.

Runs the VERDICT r2 measurement list on the real chip, in value order,
appending one JSON line per experiment to benchmarks/results_r3.jsonl:

  1. verify: small f32 solve through the public API (the /verify TPU leg)
  2. flagship sanity: 4M x 56 chunked+donated (round-2 configuration)
  3. gram_precision='high' vs 'highest' end-to-end (4M x 56, 1M x 150)
  4. use_b_cache on vs off (4M x 56) — the new B-application reuse
  5. size_sub 128 vs 64 at 4M x 56 (lane-padding question)
  6. Chebyshev --cheb 3 with --chunk/--donate (4M x 56, 2M x 120)
  7. 1M x 150 at size_sub 256 with --x64 (auto-escalated f64 RR math)
  8. BSR strip-window at strip 128/256/512 (per-grid-step overhead test)

Each experiment is a subprocess with its own timeout; a failure (relay
kill, OOM) records an "error" line and the batch continues.  The batch
probes the axon backend first and waits for it to come back if the
relay is down (transient UNAVAILABLE phases are routine).

Usage: python benchmarks/tpu_batch_r3.py [--only 3,4] [--skip 8]
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
BSR = [sys.executable, str(REPO / "benchmarks" / "bsr_spmm.py")]

FLAG_4M = ["--n", "4000000", "--nev", "56", "--size-sub", "64",
           "--chunk", "40", "--donate", "--reps", "2", "--check"]
FLAG_1M = ["--n", "1000000", "--nev", "150", "--size-sub", "164",
           "--chunk", "40", "--donate", "--reps", "2", "--check"]

EXPERIMENTS = [
    # (id, label, argv, timeout_s)
    ("1", "verify_tpu_small",
     SOLVE + ["--n", "100000", "--nev", "8", "--size-sub", "16",
              "--reps", "1", "--check"], 2400),
    ("2", "flagship_4M56_r2config", SOLVE + FLAG_4M, 2400),
    ("3a", "flagship_4M56_gram_high",
     SOLVE + FLAG_4M + ["--gram-precision", "high"], 2400),
    ("3b", "flagship_1M150_gram_high",
     SOLVE + FLAG_1M + ["--gram-precision", "high"], 2400),
    ("3c", "flagship_1M150_r2config", SOLVE + FLAG_1M, 2400),
    ("4", "flagship_4M56_no_b_cache",
     SOLVE + FLAG_4M + ["--no-b-cache"], 2400),
    ("5", "flagship_4M56_ss128",
     SOLVE + ["--n", "4000000", "--nev", "56", "--size-sub", "128",
              "--chunk", "40", "--donate", "--reps", "2", "--check"],
     2400),
    ("6a", "cheb3_4M56",
     SOLVE + FLAG_4M + ["--cheb", "3"], 2400),
    ("6b", "cheb3_2M120",
     SOLVE + ["--n", "2000000", "--nev", "120", "--size-sub", "128",
              "--chunk", "40", "--donate", "--reps", "2", "--check",
              "--cheb", "3"], 2400),
    # f64-emulated k=768 eigensolves make iterations slow: small chunks
    # keep each device launch under the relay's ~1 min kill threshold.
    ("7", "1M150_ss256_x64_escalated",
     SOLVE + ["--n", "1000000", "--nev", "150", "--size-sub", "256",
              "--chunk", "10", "--donate", "--reps", "1", "--check",
              "--x64"], 3600),
    ("8a", "bsr_strip128", BSR + ["--strip", "128"], 2400),
    ("8b", "bsr_strip256", BSR + ["--strip", "256"], 2400),
    ("8c", "bsr_strip512", BSR + ["--strip", "512"], 2400),
    # VERDICT r2 item 1c: re-measure the phase profile after the B-reuse
    # and upper-triangle Gram changes (r2 table: ortho 35% + A-Gram 23%
    # + B-Gram 18% at 2M x 128).
    ("9", "phase_profile_2M128",
     [sys.executable, str(REPO / "benchmarks" / "profile_solve.py"),
      "--n", "2000000", "--ss", "128", "--reps", "6"], 2400),
]


def wait_for_backend(max_wait_s: float = 7200) -> bool:
    """Probe the axon backend in a subprocess until it initializes."""
    probe = ("import jax; print(jax.devices()[0].device_kind)")
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        p = subprocess.run([sys.executable, "-c", probe], cwd=str(REPO),
                           capture_output=True, text=True, timeout=1800)
        if p.returncode == 0 and p.stdout.strip():
            print(f"backend up: {p.stdout.strip()}", flush=True)
            return True
        print(f"backend down ({time.time() - t0:.0f}s): "
              f"{p.stderr.strip().splitlines()[-1][:120] if p.stderr else '?'}",
              flush=True)
        time.sleep(300)
    return False


def record(obj) -> None:
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="",
                    help="comma-separated experiment id prefixes to run")
    ap.add_argument("--skip", default="",
                    help="comma-separated experiment id prefixes to skip")
    args = ap.parse_args()
    only = [s for s in args.only.split(",") if s]
    skip = [s for s in args.skip.split(",") if s]

    if not wait_for_backend():
        record({"experiment": "batch", "error": "backend never came up"})
        return

    for eid, label, argv, tmo in EXPERIMENTS:
        if only and not any(eid.startswith(o) for o in only):
            continue
        if skip and any(eid.startswith(o) for o in skip):
            continue
        print(f"=== [{eid}] {label}", flush=True)
        t0 = time.time()
        try:
            p = subprocess.run(argv, cwd=str(REPO), capture_output=True,
                               text=True, timeout=tmo)
        except subprocess.TimeoutExpired:
            record({"experiment": eid, "label": label, "error": "timeout",
                    "timeout_s": tmo})
            continue
        elapsed = round(time.time() - t0, 1)
        lines = [ln for ln in p.stdout.strip().splitlines()
                 if ln.startswith("{")]
        if p.returncode != 0 or not lines:
            tail = (p.stderr or p.stdout).strip().splitlines()[-3:]
            record({"experiment": eid, "label": label,
                    "error": f"rc={p.returncode}", "tail": tail,
                    "elapsed_s": elapsed})
            print(f"    FAILED rc={p.returncode}: {tail}", flush=True)
            continue
        for ln in lines:
            obj = json.loads(ln)
            obj.update({"experiment": eid, "label": label,
                        "elapsed_s": elapsed})
            record(obj)
            print(f"    {ln[:160]}", flush=True)


if __name__ == "__main__":
    main()
