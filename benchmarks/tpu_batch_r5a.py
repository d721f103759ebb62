"""Round-5 TPU measurement batch A — serialized, one long process.

VERDICT r4 asks, in value order (cheap anchors first so a sick relay
cannot starve them behind a long solve):

  m1-m5  the four ASSUMED PEAK_BLOCKS_TPU dual-on pack-off anchors plus
         the (dual off, b on, ax off, pack off) row ADVICE.md flagged as
         also-unmeasured (ask 7) — one AOT memory analysis each
  m6-m7  pad-on vs pad-off peaks at the 1M x 164 shape (ask 8: gate the
         bench's pad rung on a MEASURED peak at the shape it runs)
  esc    the wide-pencil escalated-RR positive (ask 2, third round):
         200k x 150 at size_sub 256, x64 + auto-f64 RR + rr_chunk_rows
         (the r4 6a3 retry ran WITHOUT --rr-chunk and with a redundant
         warm-up solve — both fixed here), vs the recorded diverging
         f32 control 6b3 (320 its, converged 0, rel err 106)

Each experiment is a subprocess with its own timeout; failures record an
"error" line and the batch continues.

Usage: python benchmarks/tpu_batch_r5a.py [--only m] [--skip esc]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
OUT = REPO / "benchmarks" / "results_r5.jsonl"

SOLVE = [sys.executable, str(REPO / "benchmarks" / "solve_bdg.py")]
MEM = [sys.executable, str(REPO / "benchmarks" / "mem_analysis.py")]


def mem(cfg: dict, extra=()) -> list[str]:
    return MEM + ["--tpu", "--config-json", json.dumps(cfg)] + list(extra)


MEM_1M = ["--n", "1000000", "--size-sub", "164", "--nev", "150"]

# 200k x 150 ss=256 trips the width-768 auto-escalation; rr_chunk_rows
# bounds the TPU f64-emulation operand splits (results_r4 6p1M: 57 GiB
# compile peak without it).  --no-warmup: one timed rep including
# compile — this is a convergence proof, not a wall-clock comparison.
ESC_200K = ["--n", "200000", "--nev", "150", "--size-sub", "256",
            "--donate", "--reps", "1", "--check", "--no-warmup",
            "--no-b-cache", "--no-dual-basis",
            "--x64", "--rr-chunk", "32768", "--chunk", "5"]

EXPERIMENTS = [
    ("m1", "mem_dual_on_pack_off", mem({"pack_applies": False}), 2400),
    ("m2", "mem_dual_on_b_off_pack_off",
     mem({"use_b_cache": False, "pack_applies": False}), 2400),
    ("m3", "mem_dual_on_ax_off_pack_off",
     mem({"use_ax_cache": False, "pack_applies": False}), 2400),
    ("m4", "mem_dual_on_all_off_pack_off",
     mem({"use_b_cache": False, "use_ax_cache": False,
          "pack_applies": False}), 2400),
    ("m5", "mem_dualoff_b_on_ax_off_pack_off",
     mem({"dual_basis": False, "use_ax_cache": False,
          "pack_applies": False}), 2400),
    ("m6", "mem_1M164_dual_off_pad",
     mem({"dual_basis": False}, MEM_1M + ["--pad"]), 2400),
    ("m7", "mem_1M164_dual_off_nopad",
     mem({"dual_basis": False}, MEM_1M), 2400),
    ("esc", "200k150_ss256_x64_escalated_chunked",
     SOLVE + ESC_200K, 9000),
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


def run_experiments(experiments, only=(), skip=()) -> None:
    for eid, label, argv, tmo in experiments:
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
            print(f"    TIMEOUT after {tmo}s", flush=True)
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    only = [s for s in args.only.split(",") if s]
    skip = [s for s in args.skip.split(",") if s]

    if not wait_for_backend():
        record({"experiment": "batch_r5a", "error": "backend never came up"})
        return
    run_experiments(EXPERIMENTS, only, skip)
    print("batch r5a done", flush=True)


if __name__ == "__main__":
    main()
