"""Round-4 TPU batch 2: retries + pad-off reruns.

Batch 1 (results_r4.jsonl, experiments 1-7) found the pad-to-128 path
raises flagship peaks by 3-4.8 GiB (XLA memory analysis 5e-5h) and every
padded 4M solve ResourceExhausted'd; pad_lanes now defaults OFF.  This
batch reruns everything that failed or was confounded by padding:

  2   lane_spmd microbench (batch-1 run died to a relay broken pipe)
  3a2 flagship dual_off, pack on / pad off
  3b2 flagship lean, pack on / pad off  (vs batch-1 3c pack-off 26.99 s)
  3d2 flagship lean + ortho_skip
  3e2 flagship dual_off + ortho_skip
  5b2-5d2 dual-on peak anchors (compile failed in batch 1 with padding)
  5i/5j   dual_off pack-on/off anchors without padding
  6r  wide-pencil 1M x 150 ss 256 x64 escalation retry
  7b  1M x 150 ss 164 with pad off (batch-1 7 ran pad-on: 16.82 s)

Appends to benchmarks/results_r4.jsonl.
"""

from __future__ import annotations

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "benchmarks"))

from tpu_batch_r4 import (  # noqa: E402
    DUAL_OFF,
    FLAG,
    FLAG_1M,
    LANE,
    LEAN,
    MEM,
    SOLVE,
    record,
    wait_for_backend,
)


def mem(cfg: dict) -> list[str]:
    return MEM + ["--tpu", "--config-json", json.dumps(cfg)]


EXPERIMENTS = [
    ("2r", "lane_spmd_micro_retry", LANE, 3000),
    ("3a2", "flagship_dual_off_pack", SOLVE + FLAG + DUAL_OFF, 2400),
    ("3b2", "flagship_lean_pack", SOLVE + FLAG + LEAN, 2400),
    ("3d2", "flagship_lean_ortho_skip",
     SOLVE + FLAG + LEAN + ["--ortho-skip"], 2400),
    ("3e2", "flagship_dual_off_ortho_skip",
     SOLVE + FLAG + DUAL_OFF + ["--ortho-skip"], 2400),
    ("5b2", "mem_dual_on_b_off_ax_on", mem({"use_b_cache": False}), 2400),
    ("5c2", "mem_dual_on_b_on_ax_off", mem({"use_ax_cache": False}), 2400),
    ("5d2", "mem_dual_on_all_off",
     mem({"use_b_cache": False, "use_ax_cache": False}), 2400),
    ("5i", "mem_dual_off_pack_on_nopad", mem({"dual_basis": False}), 2400),
    ("5j", "mem_dual_off_pack_off_nopad",
     mem({"dual_basis": False, "pack_applies": False}), 2400),
    ("6r", "1M150_ss256_x64_escalated_retry",
     SOLVE + ["--n", "1000000", "--nev", "150", "--size-sub", "256",
              "--chunk", "10", "--donate", "--reps", "1", "--check",
              "--x64", "--no-b-cache", "--no-dual-basis"], 3600),
    ("7b", "flagship_1M150_nopad", SOLVE + FLAG_1M, 2400),
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
        record({"experiment": "batch2", "error": "backend never came up"})
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
