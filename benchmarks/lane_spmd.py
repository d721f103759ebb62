"""Round-4 microbenchmarks: SPMD-local kernel rate + lane packing.

Measures, on the real chip (VERDICT r3 asks 1 and 2):

  spmd_stencil   SpmdLaplacian1D over a 1-device mesh (shard_map with
                 ppermute degenerating to self) vs the unsharded
                 Laplacian1D Pallas kernel at [4M, 256] f32 — "local
                 apply at kernel rate, ±10% of the unsharded 552 GB/s".
                 The jnp-local variant (pallas='off') is the contrast.
  spmd_bsr       ShardedBSROperator window kernel over a 1-device mesh
                 vs the single-chip BSROperator window kernel (banded
                 1M, bs 8, k 128).
  lane_pad       [4M, 64] f32 stencil apply: jnp fallback
                 (pad_lanes=False) vs pad-to-128 + kernel + slice.
  lane_pack      A@P + A@W at [4M, 64]: two separate applies vs one
                 packed [4M, 128] call (concat + kernel + slices feeding
                 two Gram dots, the _a_gram consumption pattern).

Timing: chained reps (Z = f(Z)) with one readback, best-of-3 — the
remote relay makes single-shot block_until_ready unreliable (CLAUDE.md).
Prints one JSON line per experiment.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def chained(fn, X, reps=15, warm=6):
    import jax.numpy as jnp

    def loop(r):
        t0 = time.perf_counter()
        Z = X
        for _ in range(r):
            Z = fn(Z)
        float(jnp.sum(Z[::100_000, 0]))
        return (time.perf_counter() - t0) / r

    loop(warm)
    return min(loop(reps) for _ in range(3))


def main() -> None:
    import argparse

    import jax
    import jax.numpy as jnp

    from lobpcg_tpu import Laplacian1D
    from lobpcg_tpu.parallel import row_mesh
    from lobpcg_tpu.parallel.spmd_stencil import SpmdLaplacian1D

    ap = argparse.ArgumentParser()
    ap.add_argument("--sections", default="stencil,pad,pack,bsr",
                    help="comma list of sections to run")
    args = ap.parse_args()
    sections = set(args.sections.split(","))

    n = 4_000_000
    sc = jnp.float32(1.7)
    out = []

    # --- spmd_stencil: 1-device mesh, kernel local vs jnp local -------
    mesh = row_mesh(1)
    k = 256
    X = jax.random.uniform(jax.random.PRNGKey(0), (n, k), jnp.float32,
                           -0.5, 0.5)
    base = Laplacian1D(scale=sc, n=n, segments=2)
    s_auto = SpmdLaplacian1D(scale=sc, n=n, segments=2, mesh=mesh)
    s_jnp = SpmdLaplacian1D(scale=sc, n=n, segments=2, mesh=mesh,
                            pallas="off")
    gb = 2 * n * k * 4 / 1e9
    stencil_ops = (("unsharded_kernel", base),
                   ("spmd_local_kernel", s_auto),
                   ("spmd_local_jnp", s_jnp)) if "stencil" in sections \
        else ()
    with mesh:
        for name, op in stencil_ops:
            try:
                dt = chained(jax.jit(op.matmat), X)
            except Exception as e:  # noqa: BLE001 - relay compile flake
                print(json.dumps({"metric": f"stencil_{name}_4Mx{k}",
                                  "error": str(e)[:160]}), flush=True)
                continue
            out.append({
                "metric": f"stencil_{name}_4Mx{k}", "value": gb / dt,
                "unit": "GB/s", "ms": round(dt * 1e3, 2),
            })
            print(json.dumps(out[-1]), flush=True)
    del X

    # --- lane_pad: [4M, 64] apply, jnp vs pad-to-128 ------------------
    k = 64
    X = jax.random.uniform(jax.random.PRNGKey(1), (n, k), jnp.float32,
                           -0.5, 0.5)
    gb = 2 * n * k * 4 / 1e9
    pad_ops = (
        ("jnp_fallback", Laplacian1D(scale=sc, n=n, segments=2,
                                     pad_lanes=False)),
        ("pad128_kernel", Laplacian1D(scale=sc, n=n, segments=2,
                                      pad_lanes=True)),
    ) if "pad" in sections else ()
    for name, op in pad_ops:
        try:
            dt = chained(jax.jit(op.matmat), X)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"metric": f"stencil_apply64_{name}",
                              "error": str(e)[:160]}), flush=True)
            continue
        out.append({
            "metric": f"stencil_apply64_{name}", "value": dt * 1e3,
            "unit": "ms/apply", "gbs_effective": round(gb / dt, 1),
        })
        print(json.dumps(out[-1]), flush=True)

    # --- lane_pack: two [4M, 64] applies vs one packed [4M, 128] ------
    # Consumption mimics _a_gram: each applied block feeds one [64, n] x
    # [n, 64] Gram dot, so slice-fusion into the dots is part of what is
    # measured.  Chained via the Gram outputs' sum into a scalar carried
    # bias (keeps the rep chain data-dependent without growing state).
    P = jax.random.uniform(jax.random.PRNGKey(2), (n, k), jnp.float32,
                           -0.5, 0.5)
    W = jax.random.uniform(jax.random.PRNGKey(3), (n, k), jnp.float32,
                           -0.5, 0.5)
    lap_nopad = Laplacian1D(scale=sc, n=n, segments=2, pad_lanes=False)
    lap_pad = Laplacian1D(scale=sc, n=n, segments=2, pad_lanes=True)

    # P and W are ARGUMENTS, not closures: closure arrays are baked into
    # the HLO as constants and the remote compile tunnel rejects bodies
    # this large (2.05 GB captured -> broken pipe; CLAUDE.md gotcha).
    def two_applies(op):
        def f(bias, P, W):
            AP = op.matmat(P + bias)
            AW = op.matmat(W + bias)
            g1 = jnp.matmul(P.T, AP, precision=jax.lax.Precision.HIGH)
            g2 = jnp.matmul(W.T, AW, precision=jax.lax.Precision.HIGH)
            return (jnp.sum(g1) + jnp.sum(g2)) * 1e-30

        return f

    def packed(op):
        def f(bias, P, W):
            Y = op.matmat(jnp.concatenate([P + bias, W + bias], axis=1))
            g1 = jnp.matmul(P.T, Y[:, :k], precision=jax.lax.Precision.HIGH)
            g2 = jnp.matmul(W.T, Y[:, k:], precision=jax.lax.Precision.HIGH)
            return (jnp.sum(g1) + jnp.sum(g2)) * 1e-30

        return f

    def chained_scalar(fn, reps=12, warm=5):
        def loop(r):
            t0 = time.perf_counter()
            z = jnp.float32(0.0)
            for _ in range(r):
                z = fn(z, P, W)
            float(z)
            return (time.perf_counter() - t0) / r

        loop(warm)
        return min(loop(reps) for _ in range(3))

    pack_fns = (
        ("two_jnp", two_applies(lap_nopad)),
        ("two_pad128", two_applies(lap_pad)),
        ("packed128", packed(lap_nopad)),
    ) if "pack" in sections else ()
    for name, f in pack_fns:
        try:
            dt = chained_scalar(jax.jit(f))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"metric": f"pair_apply64_{name}",
                              "error": str(e)[:160]}), flush=True)
            continue
        out.append({
            "metric": f"pair_apply64_{name}", "value": dt * 1e3,
            "unit": "ms/pair+grams",
        })
        print(json.dumps(out[-1]), flush=True)
    del P, W, X

    # --- spmd_bsr: 1-device mesh window kernel vs single-chip ---------
    if "bsr" not in sections:
        return
    import scipy.sparse as sp

    from lobpcg_tpu.operators.sparse import BSROperator
    from lobpcg_tpu.parallel.spmd_bsr import ShardedBSROperator

    nb_n, bw, k = 1_000_000, 17, 128
    diags = [np.full(nb_n - abs(d), 0.3 ** abs(d)) for d in
             range(-bw, bw + 1)]
    M = sp.diags(diags, list(range(-bw, bw + 1)), format="csr")
    op = BSROperator.from_csr(M.indptr, M.indices, M.data, block_size=8)
    nnz = M.nnz
    X = jax.random.uniform(jax.random.PRNGKey(4), (nb_n, k), jnp.float32,
                           -0.5, 0.5)
    sop = ShardedBSROperator.shard(op, mesh)
    # Operators are pytrees: pass them as jit ARGUMENTS — closing over
    # the ~1 GB window-value arrays bakes them into the HLO and the
    # remote compile tunnel rejects the body (HTTP 413).
    apply = jax.jit(lambda o, Z: o.matmat(Z))
    with mesh:
        for name, o in (("single_chip", op), ("spmd_local", sop)):
            try:
                dt = chained(lambda Z, _o=o: apply(_o, Z), X)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({
                    "metric": f"bsr_window_{name}_1M_bw17",
                    "error": str(e)[:160]}), flush=True)
                continue
            out.append({
                "metric": f"bsr_window_{name}_1M_bw17",
                "value": nnz * k / dt, "unit": "nnz/s",
                "ms": round(dt * 1e3, 2),
                "windowed": (o.win_vals is not None),
            })
            print(json.dumps(out[-1]), flush=True)


if __name__ == "__main__":
    main()
