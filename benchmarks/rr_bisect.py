"""Iteration-0 RR bisect probe for the width-768 TPU convergence failure.

The post-whitening trajectory (benchmarks/trace_tpu_postfix.log) shows
the TPU solve is dead AT iteration 0: the first modified indefinite RR
returns quality=5 with garbage eigenvalues (lam_last 3.96 vs CPU 1.72),
and every later iteration rr-fails (flag 13) without the state changing.
The CPU control of the identical code converges 150/150 in 10 its — so
the failure is TPU-backend-specific and fully contained in iteration 0.

This probe splits it0 into its two halves and tests each per backend:

  stage 1 (tall path): replicate the driver preamble exactly — robust
    basis init, initial indefinite RR, residual, precondition, indefinite
    ortho — and report the STRUCTURAL quality of the resulting k x k
    Grams (after signature-ortho, GB should be near diag(+-1)).
  stage 2 (k x k path): run the projected pencil solve + double
    B-normalization + quality check from a GIVEN (GA, GB, live) triple,
    reporting every intermediate: whitening score / live whiten error,
    eigh residual + Q orthogonality, pencil ok, quality eerr/cerr/bcerr,
    sentinel count, and eigenvalue error vs an f64 scipy ground truth
    computed host-side FROM THE SAME f32 Grams.

Cross-backend replay isolates the k x k path: --save the TPU-built Grams,
--load them on CPU (and vice versa).  Same input + different verdict
=> the bug is inside the k x k solve on that backend.

Usage:
  python benchmarks/rr_bisect.py --cpu --save /tmp/cpu_state.npz
  python benchmarks/rr_bisect.py --save /tmp/tpu_state.npz
  python benchmarks/rr_bisect.py --load /tmp/tpu_state.npz --cpu
  python benchmarks/rr_bisect.py --load /tmp/cpu_state.npz
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
    ap.add_argument("--save", default="")
    ap.add_argument("--load", default="")
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
    from lobpcg_tpu.ops.gram import frob_norm, gram_blocks, mm, precision_ctx
    from lobpcg_tpu.ops.indefinite import (
        _b_normalize,
        indefinite_rayleigh_ritz,
        signature_sort,
    )
    from lobpcg_tpu.ops.ortho import ortho_indefinite
    from lobpcg_tpu.ops.pencil import _whiten_scored, pencil_eig_cholesky
    from lobpcg_tpu.ops.rayleigh import _a_gram
    from lobpcg_tpu.ops.residual import get_residual
    from lobpcg_tpu.ops.svqb import robust_basis_init

    dtype = jnp.float32
    n, nev, ss = args.n, args.nev, args.size_sub
    m2 = n // 2
    cfg = SolverConfig(nev=nev, size_sub=ss, use_b_cache=False,
                       dual_basis=False)
    eps_ortho, eps_drop = cfg.resolved_eps(dtype)
    tn = tiny(dtype)
    qt = quality_tol(dtype)
    mm_ = mm  # HIGHEST inside precision_ctx below

    def emit(tag, obj):
        obj["tag"] = tag
        obj["backend"] = jax.default_backend()
        print(json.dumps(obj), flush=True)

    # ---------------- stage 2: k x k replay ----------------
    def kxk_replay(GA, GB, live):
        GAh = 0.5 * (GA + GA.conj().T)
        GBh = 0.5 * (GB + GB.conj().T)
        k = GA.shape[0]
        F, ok0, sc0 = _whiten_scored(GAh, live)
        lo = live.astype(GA.dtype)
        live_outer = lo[:, None] * lo[None, :]
        Mw = mm_(F.conj().T, mm_(GAh, F))
        whiten_err = frob_norm((Mw - jnp.eye(k, dtype=GA.dtype)) * live_outer)
        M = mm_(F.conj().T, mm_(GBh, F))
        M = 0.5 * (M + M.conj().T)
        mu, Q = jnp.linalg.eigh(M)
        eigh_resid = frob_norm(mm_(M, Q) - Q * mu[None, :]) / frob_norm(M)
        q_orth = frob_norm(
            mm_(Q.conj().T, Q) - jnp.eye(k, dtype=Q.dtype)
        )
        lam_all, V, rr_ok = pencil_eig_cholesky(GA, GB, tn, live)
        V1, _ = _b_normalize(V, GB, tn)
        V2, d2 = _b_normalize(V1, GB, tn)
        sig = jnp.where(d2.real >= 0, 1, -1).astype(jnp.int32)
        sent = masking.dead_mass(V2, live) > 0.5
        sig = jnp.where(sent, 0, sig)
        live_cols = (~sent)[None, :].astype(V2.dtype)
        Vl = V2 * live_cols
        GBVl = mm_(GB, Vl)
        G2 = mm_(Vl.conj().T, GBVl)
        dd = jnp.abs(jnp.diagonal(G2)) - jnp.where(sent, 0.0, 1.0)
        E = G2 - jnp.diag(jnp.diagonal(G2)) + jnp.diag(dd.astype(G2.dtype))
        eerr = frob_norm(E)
        cerr = frob_norm(Vl)
        bcerr = frob_norm(GBVl)
        quality_ok = (bcerr < tn) | (eerr <= qt * cerr * bcerr)
        perm = signature_sort(lam_all, sig)
        lam_s = lam_all[perm]
        sig_s = sig[perm]
        return dict(
            ok0=ok0, sc0=sc0, whiten_err=whiten_err,
            eigh_resid=eigh_resid, q_orth=q_orth, rr_ok=rr_ok,
            eerr=eerr, cerr=cerr, bcerr=bcerr, quality_ok=quality_ok,
            n_sent=jnp.sum(sent), lam_sorted=lam_s, sig_sorted=sig_s,
        )

    kxk_jit = jax.jit(kxk_replay)

    def run_kxk(GA, GB, live, label):
        out = {k: np.asarray(v) for k, v in
               kxk_jit(GA, GB, live).items()}
        lam_s = out.pop("lam_sorted")
        sig_s = out.pop("sig_sorted")
        # f64 host truth from the SAME f32 Grams (live block only).
        GA64 = np.asarray(GA, np.float64)
        GB64 = np.asarray(GB, np.float64)
        lv = np.asarray(live)
        import scipy.linalg as sla

        mu_t, _ = sla.eigh(GB64[np.ix_(lv, lv)], GA64[np.ix_(lv, lv)])
        pos = mu_t[mu_t > 1e-12]
        lam_t_pos = np.sort(1.0 / pos)  # positives ascending
        lam_probe_pos = lam_s[sig_s > 0][: len(lam_t_pos)]
        ncmp = min(nev, len(lam_t_pos), len(lam_probe_pos))
        rel = np.abs(lam_probe_pos[:ncmp] - lam_t_pos[:ncmp]) / np.abs(
            lam_t_pos[:ncmp]
        )
        emit(label, {
            **{k: (float(v) if v.ndim == 0 else v.tolist())
               for k, v in out.items()},
            "lam_probe_head": lam_probe_pos[:5].tolist(),
            "lam_truth_head": lam_t_pos[:5].tolist(),
            "lam_rel_err_max": float(rel.max()),
            "lam_rel_err_med": float(np.median(rel)),
            "n_cmp": int(ncmp),
        })

    if args.load:
        z = np.load(args.load)
        GA = jnp.asarray(z["GA"])
        GB = jnp.asarray(z["GB"])
        live = jnp.asarray(z["live"])
        with precision_ctx("highest"):
            run_kxk(GA, GB, live, "kxk_replay_loaded")
        return

    # ---------------- stage 1: build it0 state ----------------
    lo_w = (m2 - WELL) // 2
    V0 = np.full(m2, BARRIER + SHIFT, np.float64)
    V0[lo_w : lo_w + WELL] = SHIFT
    Vd = jnp.asarray(V0, dtype)
    A = Laplacian1D(scale=jnp.asarray(1.0, dtype), n=n, segments=2) \
        + DiagonalOperator(jnp.concatenate([Vd, Vd]))
    B = BlockAntiDiagOperator(d=jnp.ones((m2,), dtype))
    T = JacobiPreconditioner(jnp.concatenate([2.0 + Vd, 2.0 + Vd]))

    rng = np.random.RandomState(42)
    u = np.zeros((m2, ss), np.float32)
    u[lo_w : lo_w + WELL] = rng.uniform(-0.5, 0.5, size=(WELL, ss))
    X0 = jnp.asarray(np.concatenate([u, u], axis=0), dtype)
    key = jax.random.PRNGKey(0)
    _, _, _, k_r, _ = jax.random.split(key, 5)

    def build(A, B, T, X0, k_r):
        X = robust_basis_init(X0, B, k_r, tau=eps_drop)
        Cx0, lam0, sig0, rr_ok0 = indefinite_rayleigh_ritz(
            X, A, B, method="cholesky", tiny=tn
        )
        X = mm_(X, Cx0)
        AX = A.matmat(X)
        W = get_residual(X, AX, lam0, A, B)
        nw = jnp.int32(ss)
        W = masking.mask_cols(T.matmat(W), nw)
        P = jnp.zeros_like(X)
        W, nw = ortho_indefinite(
            W, nw, (X, P), ss, B,
            eps_ortho=eps_ortho, eps_drop=eps_drop,
            max_outer=3, max_inner=3,
        )
        blocks = (X, P, W)
        GA = _a_gram(blocks, AX, A)
        GB = gram_blocks(blocks, B)
        live = masking.blocks_mask((ss, ss, ss), (ss, 0, nw))
        GA = masking.inject_diag(GA, live, 1.0)
        GB = masking.inject_diag(GB, live, 1.0)
        # Structural quality of the Grams the RR will see.
        k = GA.shape[0]
        gb_off = frob_norm(GB - jnp.diag(jnp.diagonal(GB)))
        gb_diag_err = jnp.max(
            jnp.abs(jnp.abs(jnp.diagonal(GB)) - 1.0)
            * live.astype(GB.dtype).real
        )
        ga_herm = frob_norm(GA - GA.conj().T) / frob_norm(GA)
        return dict(GA=GA, GB=GB, live=live, nw=nw, lam0=lam0,
                    rr_ok0=rr_ok0, gb_off=gb_off,
                    gb_diag_err=gb_diag_err, ga_herm=ga_herm)

    with precision_ctx("highest"):
        st = jax.jit(build)(A, B, T, X0, k_r)
        GA, GB, live = st["GA"], st["GB"], st["live"]
        lam0 = np.asarray(st["lam0"])
        exact = well_eigs_oracle(WELL, nev, BARRIER)
        nl0 = min(nev, (np.asarray(lam0) > 0).sum())
        lam0_pos = np.sort(lam0[lam0 > 0])[:nl0]
        emit("state_build", {
            "nw": int(st["nw"]), "rr_ok0": bool(st["rr_ok0"]),
            "gb_off": float(st["gb_off"]),
            "gb_diag_err": float(st["gb_diag_err"]),
            "ga_herm": float(st["ga_herm"]),
            "lam0_head": lam0_pos[:5].tolist(),
            "lam0_rel_err_max": float(np.max(
                np.abs(lam0_pos[:nl0] - exact[:nl0]) / np.abs(exact[:nl0])
            )),
        })
        if args.save:
            np.savez(args.save, GA=np.asarray(GA), GB=np.asarray(GB),
                     live=np.asarray(live))
        run_kxk(GA, GB, live, "kxk_native")


if __name__ == "__main__":
    main()
