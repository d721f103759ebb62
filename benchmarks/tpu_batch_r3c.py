"""Round-3 third TPU batch: x64 wide-pencil solve (post Mosaic-i64
fixes), the ss-128 flagship retry, and authoritative TPU-compiled peak
memory for the flagship config ladder (the planner's calibration data —
CPU-backend nominals mispredict the fit boundary: results_r3.jsonl
2r/4r show b_cache, nominal-parity on CPU, is what blows the budget on
the chip).

Appends to benchmarks/results_r3.jsonl.
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
OUT = REPO / "benchmarks" / "results_r3.jsonl"

SOLVE = [sys.executable, str(REPO / "benchmarks" / "solve_bdg.py")]
MEM = [sys.executable, str(REPO / "benchmarks" / "mem_analysis.py"),
       "--tpu", "--n", "4000000", "--size-sub", "64", "--nev", "56"]

FLAG_4M_128 = ["--n", "4000000", "--nev", "56", "--size-sub", "128",
               "--chunk", "40", "--donate", "--reps", "2", "--check"]

LADDER = [[], ["--no-b-cache", "--no-dual-basis"],
          ["--no-b-cache", "--no-dual-basis", "--no-ax-cache"]]

MEM_CONFIGS = [
    ("mem_default", "{}"),
    ("mem_no_b", '{"use_b_cache": false}'),
    ("mem_no_dual", '{"dual_basis": false}'),
    ("mem_no_b_no_dual", '{"use_b_cache": false, "dual_basis": false}'),
    ("mem_min",
     '{"use_b_cache": false, "dual_basis": false, "use_ax_cache": false}'),
]

EXPERIMENTS = [
    # x64-escalated wide pencil, post Mosaic-i64 kernel fixes.
    ("7r2", "1M150_ss256_x64_escalated",
     SOLVE + ["--n", "1000000", "--nev", "150", "--size-sub", "256",
              "--chunk", "10", "--donate", "--reps", "1", "--check",
              "--x64"], 3600, False),
    ("5r2", "flagship_4M56_ss128", SOLVE + FLAG_4M_128, 2400, True),
] + [
    (eid, eid, MEM + ["--config-json", cfg], 2400, False)
    for eid, cfg in MEM_CONFIGS
]


def record(obj) -> None:
    with open(OUT, "a") as f:
        f.write(json.dumps(obj) + "\n")


def run_one(eid, label, argv, tmo, use_ladder) -> None:
    for extra in (LADDER if use_ladder else [[]]):
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
            return


def main() -> None:
    for eid, label, argv, tmo, ladder in EXPERIMENTS:
        run_one(eid, label, argv, tmo, ladder)


if __name__ == "__main__":
    main()
