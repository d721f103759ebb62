"""Round-4 TPU batch 4: final peak anchors + escalated-RR compile probe.

Completes the PEAK_BLOCKS_TPU measurement set (VERDICT r3 ask 6) with
the combinations still unmeasured on the r4 code at pad-off, separates
the pack_applies delta at the lean rung (5k measured 13.438 GiB pack-on
vs the r3 code's 10.58 — is that pack or other r4 changes?), and
compile-probes the 1M x 256 escalated solve with the serialized-Gram
dot-merger fix (ops/gram.chain_dep) — the unfixed compile wanted
56.5 GiB (results_r4.jsonl exp 6/6r).

Appends to benchmarks/results_r4.jsonl.
"""

from __future__ import annotations

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "benchmarks"))

from tpu_batch_r4 import MEM, record, wait_for_backend  # noqa: E402


def mem(cfg: dict, extra=()) -> list[str]:
    return MEM + ["--tpu", "--config-json", json.dumps(cfg)] + list(extra)


EXPERIMENTS = [
    ("5l", "mem_lean_pack_off_nopad",
     mem({"dual_basis": False, "use_b_cache": False,
          "pack_applies": False}), 2400),
    ("5m", "mem_all_off_nopad",
     mem({"dual_basis": False, "use_b_cache": False,
          "use_ax_cache": False}), 2400),
    ("5n", "mem_full_nopad", mem({}), 2400),
    ("6p1M", "mem_1M256_escalated_chained",
     mem({"dual_basis": False, "use_b_cache": False},
         ["--x64", "--n", "1000000", "--size-sub", "256",
          "--nev", "150"]), 3600),
]


def main() -> None:
    import argparse
    import subprocess
    import time

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    only = [s for s in args.only.split(",") if s]

    if not wait_for_backend():
        record({"experiment": "batch4", "error": "backend never came up"})
        return

    for eid, label, argv, tmo in EXPERIMENTS:
        if only and not any(eid.startswith(o) for o in only):
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
            print(f"    {ln[:200]}", flush=True)
        if p.returncode != 0 or not lines:
            tail = (p.stderr or p.stdout).strip().splitlines()[-6:]
            record({"experiment": eid, "label": label,
                    "error": f"rc={p.returncode}", "tail": tail,
                    "elapsed_s": elapsed})
            print(f"    FAILED rc={p.returncode}: {tail}", flush=True)


if __name__ == "__main__":
    main()
