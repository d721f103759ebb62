"""On-chip accuracy of the k x k linalg the RR path leans on.

Hypothesis (ss=256 convergence failure): `jnp.linalg.cholesky` and
`jax.scipy.linalg.solve_triangular` lower to XLA expanders whose
internal dots run at DEFAULT precision — bf16 passes on TPU for f32
operands (the same hazard ops/gram guards the solver's own contractions
against with Precision.HIGHEST).  The KPS reduction chol(GA) -> two
trsm -> eigh therefore degrades with pencil width; the TPU QDWH eigh
itself pins 'float32' matmul precision internally and should be fine.

For widths matching the solve ladder (192 / 492 / 768) this measures,
in f32 against an f64 host oracle:
  - ||L L^H - G||_F / ||G||_F for cholesky
  - ||L y - b|| / ||b|| for solve_triangular
  - max |mu - mu_exact| / |mu| and the Frobenius eigen-residual for eigh
each with the default matmul precision and inside
jax.default_matmul_precision('float32').

Usage: python benchmarks/linalg_check.py [--widths 192,492,768]
Prints one JSON line per (width, op, precision_mode).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def spd_with_clustered_spectrum(k: int, rng, cond: float) -> np.ndarray:
    """SPD f64 matrix shaped like a Jacobi-scaled projected Gram:
    eigenvalues logspaced in [1/cond, 1] with ~1e-5-relative
    near-degenerate pairs (the well's low modes).  `cond` matters: the
    bf16-internal-dot hypothesis predicts failure only beyond a
    condition ceiling near 1/eps_bf16 ~ 1e2-1e3 (a cond-1.8 matrix
    factors fine in any precision — the first version of this probe
    measured exactly that and discriminated nothing)."""
    mu = np.logspace(-np.log10(cond), 0.0, k)
    mu[1::2] = mu[0::2][: mu[1::2].size] * (1 + 2.8e-5)  # clustered pairs
    Q, _ = np.linalg.qr(rng.randn(k, k))
    return (Q * mu) @ Q.T, np.sort(mu), Q


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="192,492,768")
    ap.add_argument("--conds", default="1e2,1e4,1e6")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.scipy.linalg import solve_triangular

    rng = np.random.RandomState(0)
    cases = [
        (k, c)
        for k in (int(w) for w in args.widths.split(","))
        for c in (float(c) for c in args.conds.split(","))
    ]
    for k, cond in cases:
        G64, mu, Q = spd_with_clustered_spectrum(k, rng, cond)
        G = jnp.asarray(G64, jnp.float32)
        b64 = rng.randn(k, 8)
        b = jnp.asarray(b64, jnp.float32)
        L64 = np.linalg.cholesky(G64)

        for mode in ("default", "float32"):
            ctx = (
                jax.default_matmul_precision("float32")
                if mode == "float32" else _null()
            )
            with ctx:
                chol = jax.jit(jnp.linalg.cholesky)
                trsm = jax.jit(
                    lambda Lm, bm: solve_triangular(Lm, bm, lower=True)
                )
                eigh = jax.jit(jnp.linalg.eigh)
                L = np.asarray(chol(G))
                y = np.asarray(trsm(jnp.asarray(L64, jnp.float32), b))
                w, V = eigh(G)
                w, V = np.asarray(w), np.asarray(V)

            chol_err = (
                np.linalg.norm(L @ L.T - G64) / np.linalg.norm(G64)
            )
            trsm_err = (
                np.linalg.norm(L64 @ y.astype(np.float64) - b64)
                / np.linalg.norm(b64)
            )
            eig_val_err = float(np.max(np.abs(w - mu) / np.abs(mu)))
            eig_res = (
                np.linalg.norm(G64 @ V - V * w) / np.linalg.norm(G64)
            )
            def fin(x):  # NaN (failed potrf) -> None, JSON-safe
                x = float(x)
                return x if np.isfinite(x) else None

            print(json.dumps({
                "metric": "kxk_linalg_f32_accuracy",
                "k": k, "cond": cond, "precision_mode": mode,
                "chol_rel_err": fin(chol_err),
                "trsm_rel_err": fin(trsm_err),
                "eigh_val_rel_err": fin(eig_val_err),
                "eigh_residual": fin(eig_res),
                "backend": jax.default_backend(),
                "device": str(jax.devices()[0].device_kind),
            }), flush=True)


class _null:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
