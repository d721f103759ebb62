"""Round-4 TPU measurement batch — serialized, one long process.

Runs the VERDICT r3 measurement list on the real chip, in value order,
appending one JSON line per experiment to benchmarks/results_r4.jsonl:

  1.  verify: small f32 solve through the public API
  2.  lane_spmd microbench: SPMD-local kernel rate (ask 1), pad-to-128
      single apply and packed-pair apply at [4M, 64] (ask 2)
  3.  flagship A/B at 4M x 56: r4 defaults (pack+pad) vs r3 behavior
      (--no-pack --no-pad) vs --ortho-skip, at the dual_off and
      b_cache_off rungs (ask 2/3 adoption calls + ask 9 rung anchors)
  4.  phase profile 2M x 128 incl. the ortho_entry_skip phase (ask 3)
  5.  TPU peak-memory anchors: the interpolated/assumed PEAK_BLOCKS_TPU
      entries + the pack_applies deltas (ask 6)
  6.  wide-pencil escalation proof: 1M x 150 at size_sub 256 with
      auto-escalated f64 RR under x64 (ask 5)
  7.  1M x 150 regression point (same-rung comparability)

Each experiment is a subprocess with its own timeout; failures record an
"error" line and the batch continues.  Probes the axon backend first and
waits if the relay is down.

Usage: python benchmarks/tpu_batch_r4.py [--only 3] [--skip 6]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
OUT = REPO / "benchmarks" / "results_r4.jsonl"

SOLVE = [sys.executable, str(REPO / "benchmarks" / "solve_bdg.py")]
PROF = [sys.executable, str(REPO / "benchmarks" / "profile_solve.py")]
MEM = [sys.executable, str(REPO / "benchmarks" / "mem_analysis.py")]
LANE = [sys.executable, str(REPO / "benchmarks" / "lane_spmd.py")]

FLAG = ["--n", "4000000", "--nev", "56", "--size-sub", "64",
        "--chunk", "40", "--donate", "--reps", "2", "--check",
        "--cheb", "3", "--gram-precision", "high"]
DUAL_OFF = ["--no-dual-basis"]
LEAN = ["--no-b-cache", "--no-dual-basis"]
FLAG_1M = ["--n", "1000000", "--nev", "150", "--size-sub", "164",
           "--chunk", "40", "--donate", "--reps", "2", "--check",
           "--cheb", "3", "--gram-precision", "high"]


def mem(cfg: dict) -> list[str]:
    return MEM + ["--tpu", "--config-json", json.dumps(cfg)]


EXPERIMENTS = [
    ("1", "verify_tpu_small",
     SOLVE + ["--n", "100000", "--nev", "8", "--size-sub", "16",
              "--reps", "1", "--check"], 2400),
    ("2", "lane_spmd_micro", LANE, 3000),
    # Flagship A/B.  dual_off is the top attemptable rung (full config's
    # 16.31 GiB can never fit); lean fits shrunken grants, giving a
    # same-session A/B even when dual_off OOMs.
    ("3a", "flagship_dual_off_r4_defaults", SOLVE + FLAG + DUAL_OFF, 2400),
    ("3b", "flagship_lean_r4_defaults", SOLVE + FLAG + LEAN, 2400),
    ("3c", "flagship_lean_r3_equiv",
     SOLVE + FLAG + LEAN + ["--no-pack", "--no-pad"], 2400),
    ("3d", "flagship_lean_ortho_skip",
     SOLVE + FLAG + LEAN + ["--ortho-skip"], 2400),
    ("3e", "flagship_dual_off_ortho_skip",
     SOLVE + FLAG + DUAL_OFF + ["--ortho-skip"], 2400),
    ("4", "phase_profile_2M128",
     PROF + ["--n", "2000000", "--ss", "128", "--reps", "6"], 2400),
    # Peak anchors (ask 6): the interpolated (dual off, b on, ax off)
    # rung, the three assumed dual-on combos, and the pack_applies
    # deltas at the measured corners.
    ("5a", "mem_dualoff_b_on_ax_off",
     mem({"dual_basis": False, "use_ax_cache": False}), 2400),
    ("5b", "mem_dual_on_b_off_ax_on", mem({"use_b_cache": False}), 2400),
    ("5c", "mem_dual_on_b_on_ax_off", mem({"use_ax_cache": False}), 2400),
    ("5d", "mem_dual_on_all_off",
     mem({"use_b_cache": False, "use_ax_cache": False}), 2400),
    ("5e", "mem_dual_off_pack_off",
     mem({"dual_basis": False, "pack_applies": False}), 2400),
    ("5f", "mem_dual_off_pack_on", mem({"dual_basis": False}), 2400),
    ("5g", "mem_lean_pack_on",
     mem({"dual_basis": False, "use_b_cache": False}), 2400),
    ("5h", "mem_lean_pack_off",
     mem({"dual_basis": False, "use_b_cache": False,
          "pack_applies": False}), 2400),
    # Wide-pencil escalation proof (ask 5): f64-emulated width-768
    # eigensolves are slow — tiny chunks keep device launches under the
    # relay's ~1 min kill threshold.
    ("6", "1M150_ss256_x64_escalated",
     SOLVE + ["--n", "1000000", "--nev", "150", "--size-sub", "256",
              "--chunk", "10", "--donate", "--reps", "1", "--check",
              "--x64", "--no-b-cache", "--no-dual-basis"], 3600),
    ("7", "flagship_1M150_r4_defaults", SOLVE + FLAG_1M, 2400),
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
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
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
        for ln in lines:
            obj = json.loads(ln)
            obj.update({"experiment": eid, "label": label,
                        "elapsed_s": elapsed})
            record(obj)
            print(f"    {ln[:160]}", flush=True)
        if p.returncode != 0 or not lines:
            tail = (p.stderr or p.stdout).strip().splitlines()[-3:]
            record({"experiment": eid, "label": label,
                    "error": f"rc={p.returncode}", "tail": tail,
                    "elapsed_s": elapsed})
            print(f"    FAILED rc={p.returncode}: {tail}", flush=True)


if __name__ == "__main__":
    main()
