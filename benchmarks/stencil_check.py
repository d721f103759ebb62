"""On-chip numeric check: Pallas stencil vs the jnp fallback formulation.

The r4/r5 escalated-RR failures (results_r5.jsonl exp esc: 200k x 150 at
size_sub 256, converged 0) are the ONLY full solves whose width puts the
operator apply on the Pallas stencil path (k % 128 == 0 at k >= 256);
every converging solve used the jnp fallback (ss 64/164) or the packed
k=128 kernel.  This script compares the kernel against the fallback at
the exact shapes that solve exercises, on the real chip (the CPU suite
only runs the Mosaic interpreter).

Usage: python benchmarks/stencil_check.py [--n 200000] [--segments 2]
Prints one JSON line per width.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--segments", type=int, default=2)
    ap.add_argument("--widths", default="128,256,512,768")
    ap.add_argument("--x64", action="store_true")
    args = ap.parse_args()

    import jax

    if args.x64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from lobpcg_tpu.ops.pallas.stencil import stencil_matmat_pallas

    n, seg = args.n, args.segments
    for k in (int(w) for w in args.widths.split(",")):
        X = jax.random.uniform(
            jax.random.PRNGKey(k), (n, k), jnp.float32, -1, 1
        )
        try:
            Y = np.asarray(
                stencil_matmat_pallas(X, jnp.float32(1.7), num_segments=seg)
            )
        except Exception as e:  # noqa: BLE001 - record and continue
            print(json.dumps({
                "metric": "stencil_pallas_vs_jnp_max_abs_err",
                "n": n, "segments": seg, "k": k, "x64": args.x64,
                "error": f"{type(e).__name__}: {str(e)[:300]}",
            }), flush=True)
            continue
        Xs = np.asarray(X).reshape(seg, n // seg, k)
        Xp = np.pad(Xs, ((0, 0), (1, 1), (0, 0)))
        ref = (1.7 * (2 * Xs - Xp[:, 2:] - Xp[:, :-2])).reshape(n, k)
        err = float(np.max(np.abs(Y - ref)))
        print(json.dumps({
            "metric": "stencil_pallas_vs_jnp_max_abs_err",
            "n": n, "segments": seg, "k": k, "x64": args.x64,
            "value": err, "unit": "abs",
            "device": str(jax.devices()[0].device_kind),
        }), flush=True)


if __name__ == "__main__":
    main()
