"""Step the REAL ilobpcg driver program one iteration at a time (traced
it_cap => one compile for all caps) and dump lam/res heads per cap —
locates where the compiled while_loop program's state first diverges
from the healthy out-of-loop replica (benchmarks/rr_bisect.py showed
every iteration-0 component is accurate on TPU in isolation, yet the
driver's it0 history records garbage lam with a quality-5 flag).

Usage: python benchmarks/driver_probe.py [--cpu] [--caps 0,1,2,3]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from solve_bdg import BARRIER, SHIFT, WELL, well_eigs_oracle  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--nev", type=int, default=150)
    ap.add_argument("--size-sub", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--caps", default="0,1,2,3")
    ap.add_argument("--max-iter", type=int, default=12)
    ap.add_argument("--save-state", default="", metavar="NPZ",
                    help="save basis/momentum/lam/sig after the LAST cap")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from lobpcg_tpu import (
        BlockAntiDiagOperator,
        DiagonalOperator,
        JacobiPreconditioner,
        Laplacian1D,
        SolverConfig,
        ilobpcg,
    )

    dtype = jnp.float32
    n, nev, ss = args.n, args.nev, args.size_sub
    m2 = n // 2
    lo = (m2 - WELL) // 2
    V0 = np.full(m2, BARRIER + SHIFT, np.float64)
    V0[lo : lo + WELL] = SHIFT
    Vd = jnp.asarray(V0, dtype)
    A = Laplacian1D(scale=jnp.asarray(1.0, dtype), n=n, segments=2) \
        + DiagonalOperator(jnp.concatenate([Vd, Vd]))
    B = BlockAntiDiagOperator(d=jnp.ones((m2,), dtype))
    T = JacobiPreconditioner(jnp.concatenate([2.0 + Vd, 2.0 + Vd]))

    rng = np.random.RandomState(42)
    u = np.zeros((m2, ss), np.float32)
    u[lo : lo + WELL] = rng.uniform(-0.5, 0.5, size=(WELL, ss))
    X0 = jnp.asarray(np.concatenate([u, u], axis=0), dtype)

    cfg = SolverConfig(
        nev=nev, size_sub=ss, tol=1e-5, max_iter=args.max_iter,
        use_b_cache=False, dual_basis=False,
    )
    exact = well_eigs_oracle(WELL, nev, BARRIER)
    for cap in [int(c) for c in args.caps.split(",")]:
        r = ilobpcg(A, X0, B, T, config=cfg, key=jax.random.PRNGKey(0),
                    it_cap=cap)
        lam = np.asarray(r.eigenvalues)
        res = np.asarray(r.residual_norms)
        rel = np.abs(lam - exact) / np.abs(exact)
        print(json.dumps({
            "cap": cap, "backend": jax.default_backend(),
            "iterations": int(r.iterations), "converged": int(r.converged),
            "quality5": int(r.quality5_count),
            "rr_failed": int(r.rr_fail_count),
            "lam_head": lam[:5].tolist(),
            "res_head": res[:3].tolist(),
            "res_max": float(res.max()),
            "lam_rel_err_max": float(rel.max()),
        }), flush=True)
    if args.save_state:
        np.savez(
            args.save_state,
            X=np.asarray(r.basis), P=np.asarray(r.momentum),
            lam=np.asarray(r.eigenvalues),
            lam_full=np.asarray(r.eigenvalues),
            sig=np.asarray(r.signature),
            converged=int(r.converged),
        )


if __name__ == "__main__":
    main()
