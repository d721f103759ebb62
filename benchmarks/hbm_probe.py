"""Probe how much HBM the remote chip will actually grant right now.

The relay-attached chip's *available* HBM varies with backend state: a
solve whose compiled peak fit in one session can ResourceExhausted in
another with identical code (observed round 3; compile-time peaks
verified unchanged).  This probe allocates 1 GiB device buffers until
allocation fails and reports the granted total, giving the session's
real capacity so benchmark configurations can be sized to fit.

Usage: python benchmarks/hbm_probe.py [--step-gb 1]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--step-gb", type=float, default=1.0)
    ap.add_argument("--max-gb", type=float, default=20.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    step = int(args.step_gb * (1 << 28))  # f32 elements per step
    bufs = []
    granted = 0.0
    err = None
    while granted < args.max_gb:
        try:
            b = jax.device_put(jnp.zeros((step,), jnp.float32), dev)
            b.block_until_ready()
            bufs.append(b)
            granted += args.step_gb
        except Exception as e:  # noqa: BLE001 - any backend error ends probe
            err = str(e).splitlines()[0][:160]
            break
    print(json.dumps({
        "metric": "hbm_granted_gb",
        "value": round(granted, 2),
        "unit": "GiB",
        "device": str(dev.device_kind),
        "stopped_by": err,
    }))


if __name__ == "__main__":
    main()
