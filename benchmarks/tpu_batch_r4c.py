"""Round-4 TPU batch 3: microbench retry + iteration-noise study + final
peak anchors.

Batch-2 findings this batch follows up (results_r4.jsonl):
- pack is PEAK-FREE (5i/5j: 14.394 vs 14.393 GiB at dual_off) and cuts
  per-iteration time 22% at 4M x 56 (3b2 0.676 vs 3c 0.871 s/it), but
  the f32 solve trajectory shifted (31 -> 43 iterations) — a second
  shape decides whether that is noise or systematic.
- pad wins where it fits (1M x 150: 16.82 s pad-on vs 19.31 pad-off).
- ortho_skip adds ~0.12 s/it at the flagship without skipping
  (3d2 0.794 vs 3b2 0.676 s/it) — confirming the phase-profile read.

Experiments:
  8a-8d  2M x 56 ss=64: pack on/off x pad on/off (iteration noise + the
      pad fit at mid-scale; decides the pack_applies default)
  6a3/6b3  wide-pencil escalation proof at 200k x 150 ss=256: the 1M
      attempt's compile wanted 56.5 G HBM (mixed f32->f64 Gram converts
      materialize tall f64 operands); 200k scales that to ~11.3 G.
      6b3 is the f32 control (rr_dtype pinned to float32) — the proof
      needs BOTH: f32 misconverges at width 768, escalated f64 RR
      converges.
  2s  lane_spmd retry (now survives relay compile flakes per-section)
  5a2 (dual off, b on, ax off) anchor, pad off (batch-1 5a was padded)
  5k  lean pack-on pad-off anchor (batch-1 5g was padded)
  9   flagship lean with pack + --pad (does the 4M pad peak fit the
      current grant at the LEAN rung? lean 10.58 + pad ~ 15.3 per 5g)

Appends to benchmarks/results_r4.jsonl.
"""

from __future__ import annotations

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "benchmarks"))

from tpu_batch_r4 import (  # noqa: E402
    FLAG,
    LANE,
    LEAN,
    MEM,
    SOLVE,
    record,
    wait_for_backend,
)

FLAG_2M = ["--n", "2000000", "--nev", "120", "--size-sub", "128",
           "--chunk", "40", "--donate", "--reps", "2", "--check",
           "--cheb", "3", "--gram-precision", "high"]
# At size_sub 128 neither pack nor pad fires (width already lane-ok);
# use size_sub 64 at 2M so the sub-128 machinery engages.
FLAG_2M64 = ["--n", "2000000", "--nev", "56", "--size-sub", "64",
             "--chunk", "40", "--donate", "--reps", "2", "--check",
             "--cheb", "3", "--gram-precision", "high"]


def mem(cfg: dict, extra=()) -> list[str]:
    return MEM + ["--tpu", "--config-json", json.dumps(cfg)] + list(extra)


ESC_200K = ["--n", "200000", "--nev", "150", "--size-sub", "256",
            "--donate", "--reps", "1", "--check",
            "--no-b-cache", "--no-dual-basis"]

EXPERIMENTS = [
    ("8a", "2M56_pack_on_pad_off", SOLVE + FLAG_2M64 + LEAN, 2400),
    ("8b", "2M56_pack_off_pad_off",
     SOLVE + FLAG_2M64 + LEAN + ["--no-pack"], 2400),
    ("8c", "2M56_pack_on_pad_on",
     SOLVE + FLAG_2M64 + LEAN + ["--pad"], 2400),
    ("8d", "2M56_pack_off_pad_on",
     SOLVE + FLAG_2M64 + LEAN + ["--no-pack", "--pad"], 2400),
    ("6a3", "200k150_ss256_x64_escalated",
     SOLVE + ESC_200K + ["--x64", "--chunk", "10"], 3600),
    ("6b3", "200k150_ss256_f32_control",
     SOLVE + ESC_200K + ["--rr-dtype", "float32", "--chunk", "40"], 2400),
    ("2s", "lane_spmd_micro_retry2", LANE, 3000),
    ("5a2", "mem_dualoff_b_on_ax_off_nopad",
     mem({"dual_basis": False, "use_ax_cache": False}), 2400),
    ("5k", "mem_lean_pack_on_nopad",
     mem({"dual_basis": False, "use_b_cache": False}), 2400),
    ("9", "flagship_lean_pack_pad",
     SOLVE + FLAG + LEAN + ["--pad"], 2400),
]


def main() -> None:
    import argparse
    import subprocess
    import time

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    only = [s for s in args.only.split(",") if s]
    skip = [s for s in args.skip.split(",") if s]

    if not wait_for_backend():
        record({"experiment": "batch3", "error": "backend never came up"})
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
            tail = (p.stderr or p.stdout).strip().splitlines()[-6:]
            record({"experiment": eid, "label": label,
                    "error": f"rc={p.returncode}", "tail": tail,
                    "elapsed_s": elapsed})
            print(f"    FAILED rc={p.returncode}: {tail}", flush=True)


if __name__ == "__main__":
    main()
