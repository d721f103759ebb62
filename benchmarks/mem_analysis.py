"""Compile-time peak-memory analysis of the flagship solve.

Lowers and compiles the jitted ilobpcg solve for a given shape WITHOUT
executing it, and prints XLA's memory analysis (argument / output /
temp / total bytes).  Used to attribute HBM regressions to specific
config knobs (e.g. use_b_cache holding pre-applied B blocks across the
iteration body) before burning chip time.

By default compiles on the CPU backend — buffer liveness of the [n, m]
blocks is scheduling-dependent but backend-comparable, so *deltas*
between configs are meaningful anywhere; pass --tpu to compile (not run)
on the real chip for the authoritative numbers.

Usage:
  python benchmarks/mem_analysis.py --n 4000000 --size-sub 64 \
      [--compare b_cache] [--tpu]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def build(n, ss, nev, cfg_kwargs, pad=False):
    import jax
    import jax.numpy as jnp

    from lobpcg_tpu import (
        BlockAntiDiagOperator,
        DiagonalOperator,
        JacobiPreconditioner,
        Laplacian1D,
        SolverConfig,
    )
    from lobpcg_tpu.solvers.ilobpcg import _ilobpcg_impl

    dtype = jnp.float32
    m = n // 2
    V = np.full(m, 2.0, np.float64)
    Vd2 = jnp.asarray(np.concatenate([V, V]), dtype)
    A = Laplacian1D(scale=jnp.asarray(1.0, dtype), n=n, segments=2,
                    pad_lanes=pad) + DiagonalOperator(Vd2)
    B = BlockAntiDiagOperator(d=jnp.ones((m,), dtype))
    T = JacobiPreconditioner(2.0 + Vd2)
    cfg = SolverConfig(nev=nev, size_sub=ss, tol=1e-5, max_iter=40,
                       **cfg_kwargs)
    X0 = jax.ShapeDtypeStruct((n, ss), dtype)
    P0 = jax.ShapeDtypeStruct((n, ss), dtype)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    fn = jax.jit(_ilobpcg_impl, static_argnums=(5,),
                 donate_argnums=(3, 6))
    return fn, (A, B, T, X0, key, cfg, P0, 0, 40)


def analyze(n, ss, nev, cfg_kwargs, pad=False):
    fn, args = build(n, ss, nev, cfg_kwargs, pad)
    try:
        compiled = fn.lower(*args).compile()
    except Exception as e:  # noqa: BLE001 - OOM compiles carry the dump
        # TPU AOT compile OOM: surface the largest allocations so the
        # blow-up is attributable (e.g. dot-merger stacked copies).
        msg = str(e)
        tops = []
        for ln in msg.splitlines():
            ln = ln.strip()
            if ln.startswith(("Size:", "Shape:", "XLA label:")):
                tops.append(ln)
            if len(tops) >= 18:
                break
        used = next((ln.strip() for ln in msg.splitlines()
                     if "Used" in ln and "hbm" in ln), msg[:160])
        return {"config": cfg_kwargs, "compile_oom": used, "top": tops}
    ma = compiled.memory_analysis()
    gb = 1 / (1 << 30)
    out = {
        "config": cfg_kwargs,
        "arg_gb": round(ma.argument_size_in_bytes * gb, 3),
        "out_gb": round(ma.output_size_in_bytes * gb, 3),
        "temp_gb": round(ma.temp_size_in_bytes * gb, 3),
        "alias_gb": round(ma.alias_size_in_bytes * gb, 3),
    }
    out["peak_gb"] = round(
        (ma.argument_size_in_bytes + ma.output_size_in_bytes
         + ma.temp_size_in_bytes - ma.alias_size_in_bytes) * gb, 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4_000_000)
    ap.add_argument("--size-sub", type=int, default=64)
    ap.add_argument("--nev", type=int, default=56)
    ap.add_argument("--tpu", action="store_true",
                    help="compile on the real chip (authoritative; "
                         "costs one relay compile per config)")
    ap.add_argument("--compare", default="b_cache",
                    choices=("b_cache", "ax_cache", "dual_basis", "none"),
                    help="knob to toggle; 'none' analyzes defaults only")
    ap.add_argument("--pad", action="store_true",
                    help="enable the stencil pad-to-128 path (peak study)")
    ap.add_argument("--x64", action="store_true",
                    help="enable jax_enable_x64 (the escalated-RR peak "
                         "study: width > 512 auto-escalates rr_dtype)")
    ap.add_argument("--config-json", default=None,
                    help="JSON dict of SolverConfig kwargs to analyze "
                         "(overrides --compare), e.g. "
                         '\'{"use_b_cache": false, "dual_basis": false}\'')
    args = ap.parse_args()

    import jax

    if args.x64:
        jax.config.update("jax_enable_x64", True)
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    configs = [{}]
    if args.config_json is not None:
        configs = [json.loads(args.config_json)]
    elif args.compare != "none":
        key = {"b_cache": "use_b_cache", "ax_cache": "use_ax_cache",
               "dual_basis": "dual_basis"}[args.compare]
        configs = [{key: True}, {key: False}]

    for kw in configs:
        r = analyze(args.n, args.size_sub, args.nev, kw, args.pad)
        r.update({"n": args.n, "size_sub": args.size_sub,
                  "backend": jax.default_backend()})
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
