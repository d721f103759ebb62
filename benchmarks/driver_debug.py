"""Instrumented replica of the ilobpcg while_loop body that CARRIES the
k x k RR inputs/outputs out of the loop — the only way to see what the
in-loop compiled program computes on a host-callback-less TPU runtime.

Context (benchmarks/rr_bisect.py + driver_probe.py): the driver's
preamble is bit-identical to the straight-line replica (cap-0 lam heads
match exactly), every it0 component replayed straight-line on TPU is
healthy, yet the real driver's it0 records quality=5 with lam 1.43 vs
the replica's healthy 1.1068 from the same state.  The divergence is
therefore INSIDE the while_loop compilation.  This script reruns the
same body inside a lax.while_loop, returning GA/GB/lam/quality scalars
in the carry so the diverging stage can be identified by direct
comparison against the straight-line values.

Usage: python benchmarks/driver_debug.py [--cpu] [--cap 1]
       [--save /tmp/loop_state.npz]
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
    ap.add_argument("--cap", type=int, default=1)
    ap.add_argument("--save", default="")
    ap.add_argument("--no-loop", action="store_true",
                    help="run the body as straight-line code instead")
    ap.add_argument("--no-pack", action="store_true")
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
    )
    from lobpcg_tpu.config import quality_tol, tiny
    from lobpcg_tpu.ops import masking
    from lobpcg_tpu.ops.gram import b_mm, gram_blocks, mm, precision_ctx
    from lobpcg_tpu.ops.indefinite import indefinite_rayleigh_ritz_modified
    from lobpcg_tpu.ops.indefinite import indefinite_rayleigh_ritz
    from lobpcg_tpu.ops.ortho import ortho_indefinite
    from lobpcg_tpu.ops.rayleigh import _a_gram
    from lobpcg_tpu.ops.residual import (
        estimate_norm,
        get_residual,
        get_residual_norm,
    )
    from lobpcg_tpu.ops.svqb import robust_basis_init

    dtype = jnp.float32
    n, nev, ss = args.n, args.nev, args.size_sub
    m2 = n // 2
    cfg = SolverConfig(nev=nev, size_sub=ss, use_b_cache=False,
                       dual_basis=False, max_iter=40)
    eps_ortho, eps_drop = cfg.resolved_eps(dtype)
    tn = tiny(dtype)
    qt = quality_tol(dtype)
    m = ss
    pack = not args.no_pack

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
    X0j = jnp.asarray(np.concatenate([u, u], axis=0), dtype)
    key = jax.random.PRNGKey(0)

    def impl(A, B, T, X0, key, it_cap):
        k_a, k_b, k_x, k_r, k_stall = jax.random.split(key, 5)
        a_norm = estimate_norm(A, k_a, cfg.norm_iters, cfg.norm_block)
        b_norm = estimate_norm(B, k_b, cfg.norm_iters, cfg.norm_block)

        def res_norm(W, lam):
            return get_residual_norm(W, lam, a_norm, b_norm, nev, None)

        X = robust_basis_init(X0, B, k_r, tau=eps_drop)
        Cx0, lam0, sig0, rr_ok0 = indefinite_rayleigh_ritz(
            X, A, B, method="cholesky", tiny=tn
        )
        X = mm(X, Cx0)
        AX = A.matmat(X)
        W = get_residual(X, AX, lam0, A, B)
        res = res_norm(W, lam0)
        P0 = jnp.zeros((n, m), dtype)

        kk = 3 * m
        diag0 = dict(
            GA=jnp.zeros((kk, kk), dtype), GB=jnp.zeros((kk, kk), dtype),
            rr_lam=jnp.zeros((kk,), jnp.float32),
            rr_quality=jnp.int32(0), rr_ok=jnp.bool_(True),
            nw_post=jnp.int32(0),
        )
        carry0 = (X, P0, W, AX, lam0, sig0, res, jnp.int32(0),
                  jnp.int32(0), jnp.int32(0), diag0)

        def cond(c):
            return (c[8] < it_cap) & (c[7] < nev)

        def body(c):
            X, P, W, AX, lam, sig, res, conv, it, p_cnt, _diag = c
            it0 = it == 0
            np_act = jnp.minimum(p_cnt, m - conv)
            nw = jnp.where(it0, jnp.int32(m), m - conv)
            W = masking.mask_cols(T.matmat(W), nw)
            W, nw = ortho_indefinite(
                W, nw, (X, P), m + np_act, B,
                eps_ortho=eps_ortho, eps_drop=eps_drop,
                max_outer=cfg.max_outer, max_inner=cfg.max_inner,
            )
            blocks = (X, P, W)
            rr = indefinite_rayleigh_ritz_modified(
                blocks, AX, np_act, nw, A, B,
                nx=m, method="cholesky", tiny=tn, quality_tol=qt,
                eps_ortho=eps_ortho, eps_drop=eps_drop,
                max_outer=cfg.max_outer, max_inner=cfg.max_inner,
                pack=pack,
            )
            # Re-derive the RR's own Gram inputs for the diagnostics
            # carry (same calls, same HLO context as inside the RR).
            live = masking.blocks_mask((m, m, m), (m, np_act, nw))
            GA_d = masking.inject_diag(
                _a_gram(blocks, AX, A, pack=pack), live, 1.0
            )
            GB_d = masking.inject_diag(gram_blocks(blocks, B), live, 1.0)

            def do_update(_):
                Xn = b_mm(blocks, rr.Cx)
                Pn = b_mm(blocks, rr.Cp)
                AXn = A.matmat(Xn)
                Wres = get_residual(Xn, AXn, rr.lam, A, B)
                return Xn, Pn, AXn, Wres, rr.lam, rr.sig[:m]

            def do_recover(_):
                Wres = get_residual(X, AX, lam, A, B)
                return (X, jnp.zeros_like(P), AX, Wres, lam, sig)

            Xn, Pn, AXn, Wres, lam_n, sig_n = jax.lax.cond(
                rr.rr_ok, do_update, do_recover, None
            )
            res_n = res_norm(Wres, lam_n)
            convn = masking.prefix_count(res_n <= cfg.tol)
            act = m - convn
            p_next = jnp.where(rr.rr_ok, act, 0)
            Pc = masking.shift_cols(Pn, convn, p_next)
            Wc = masking.shift_cols(Wres, convn, act)
            diag = dict(
                GA=GA_d, GB=GB_d,
                rr_lam=rr.lam if rr.lam.shape[0] == kk
                else jnp.pad(rr.lam, (0, kk - rr.lam.shape[0])),
                rr_quality=rr.quality, rr_ok=rr.rr_ok,
                nw_post=nw,
            )
            return (Xn, Pc, Wc, AXn, lam_n, sig_n, res_n, convn,
                    it + 1, p_next, diag)

        if args.no_loop:
            cf = body(carry0)
        else:
            cf = jax.lax.while_loop(cond, body, carry0)
        return cf

    with precision_ctx("highest"):
        fn = jax.jit(impl, static_argnums=())
        cf = fn(A, B, T, X0j, key, jnp.int32(args.cap))
    X, P, W, AX, lam, sig, res, conv, it, p_cnt, diag = cf
    lam = np.asarray(lam)
    exact = well_eigs_oracle(WELL, nev, BARRIER)
    rel = np.abs(lam[:nev] - exact) / np.abs(exact)
    out = {
        "backend": jax.default_backend(), "cap": args.cap,
        "loop": not args.no_loop, "pack": pack,
        "it": int(it), "conv": int(conv),
        "rr_quality": int(diag["rr_quality"]),
        "rr_ok": bool(diag["rr_ok"]), "nw_post": int(diag["nw_post"]),
        "lam_head": lam[:5].tolist(),
        "lam_rel_err_max": float(rel.max()),
        "res_max": float(np.asarray(res).max()),
    }
    print(json.dumps(out), flush=True)
    if args.save:
        np.savez(args.save, GA=np.asarray(diag["GA"]),
                 GB=np.asarray(diag["GB"]),
                 rr_lam=np.asarray(diag["rr_lam"]),
                 X=np.asarray(X), lam=lam)


if __name__ == "__main__":
    main()
