"""HBM-aware solve planning: estimate a solve's device peak memory and
fit the fastest SolverConfig inside a budget.

Why this exists: the solver's three memory/speed knobs (`dual_basis`,
`use_b_cache`, `use_ax_cache`) interact with XLA buffer liveness in ways
a CPU-backend estimate mispredicts — measured on the chip, the b-cache
is nominal-free on CPU yet co-determines the TPU peak — and the
remote-relay chip's *available* HBM varies session to session (a probe
granting 20 GiB was followed minutes later by a 14.4 GB program
ResourceExhausted; twenty separate 1 GiB buffers are not one program's
temp arena).  So planning uses TPU-compiled peaks, measured via
``benchmarks/mem_analysis.py --tpu`` (XLA memory analysis of the real
compiled ilobpcg program), and a conservative default budget.

Measured anchors (v5e, dim 4M x size_sub 64 f32, chunked + donated
ilobpcg, stencil pad_lanes OFF — benchmarks/results_r4.jsonl 5* plus
the round-5 m1-m5 completions; every row below is measured, none
interpolated or assumed):

    dual  b_cache  ax_cache  pack   peak (GiB)  blocks   exp
    on    on       on        on     16.31       17.10    5n / r3
    on    on       on        off    16.31       17.10    m1
    on    off      on        on     16.31       17.10    5b2
    on    off      on        off    16.31       17.10    m2
    on    on       off       on     15.40       16.15    5c2
    on    on       off       off    15.39       16.13    m3
    on    off      off       on     15.39       16.13    5d2
    on    off      off       off    15.39       16.13    m4
    off   on       on        on     14.39       15.09    5i
    off   on       on        off    14.39       15.09    5j
    off   on       off       on     12.49       13.09    5a2
    off   on       off       off    12.49       13.09    m5
    off   off      on        on     13.44       14.09    5k
    off   off      on        off    10.58       11.09    5l / r3
    off   off      off       on     10.63       11.15    5m
    off   off      off       off     8.67        9.09    r3

pack_applies is peak-FREE when a larger liveness set pins the peak
(the dual branch or the b-cache's carried BX/BP/BW) and costs ~+2-3
blocks when it is itself the high-water mark (lean/all-off rungs: the
packed [n, 2m] pair transients).  The fit ladder mirrors the measured
speed order at the 4M flagship: pack-on rungs first (0.676 vs 0.871
s/it, results_r4 3b2/3c), then pack-off leaner rungs.

Reference context: the reference sizes its workspace exactly and
mallocs once (`/root/reference/lobpcg.h:586-686`); on TPU the analog is
choosing compile-time knobs so XLA's arena fits the grant.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

# Peak in units of one [n, size_sub] operator-dtype block, keyed by
# (dual_basis, use_b_cache, use_ax_cache, pack_applies).  All sixteen
# entries measured (table above; the r4-assumed dual-on pack-off rows
# were measured in round 5, exps m1-m5, and confirmed the dual branch
# pins the peak — pack is invisible under dual-on to within 0.02 GiB).
PEAK_BLOCKS_TPU = {
    (True, True, True, True): 17.10,
    (True, True, True, False): 17.10,
    (True, False, True, True): 17.10,
    (True, False, True, False): 17.10,
    (True, True, False, True): 16.15,
    (True, True, False, False): 16.13,
    (True, False, False, True): 16.13,
    (True, False, False, False): 16.13,
    (False, True, True, True): 15.09,
    (False, True, True, False): 15.09,
    (False, True, False, True): 13.09,
    (False, True, False, False): 13.09,
    (False, False, True, True): 14.09,
    (False, False, True, False): 11.09,
    (False, False, False, True): 11.15,
    (False, False, False, False): 9.09,
}

# Stencil pad-to-128-lanes (Laplacian1D.pad_lanes) peak surcharge, in
# units of one [n, extra_width] operator-dtype block where extra_width =
# pad_target - size_sub.  Measured at 4M x 64 f32 (extra width 64,
# results_r4.jsonl 5e-5h vs the nopad 5i-5l rows), keyed like
# PEAK_BLOCKS_TPU on (dual_basis, use_b_cache, use_ax_cache,
# pack_applies); unmeasured keys assume the worst measured surcharge
# (5.0 — lean pack-off, where the padded apply transients ARE the
# high-water mark).
PAD_EXTRA_BLOCKS_TPU = {
    (False, True, True, False): 3.0,
    (False, True, True, True): 4.07,
    (False, False, True, True): 2.0,
    (False, False, True, False): 5.0,
}
_PAD_EXTRA_DEFAULT = 5.0


def _pad_target(size_sub: int) -> int:
    """Lane width the stencil pad path pads a sub-multiple block to."""
    return -(-size_sub // 128) * 128


# The grant to assume when none is given: v5e chips have 16 GB, but the
# observed per-program usable ceiling on the shared relay sits lower
# (a 14.39 GB program OOM'd; a 10.58 GB one ran — results_r3.jsonl).
DEFAULT_BUDGET_GB = 12.0

# Knob combinations in measured wall-clock order (fastest first) at the
# 4M x 56 flagship; each entry overrides SolverConfig fields.  The
# dual-off-only rung keeps both caches (the r3 phase profile's fastest
# Gram path) at 15.09 blocks; pack-on rungs precede pack-off ones
# (0.676 vs 0.871 s/it, results_r4.jsonl 3b2/3c); dual_basis only
# matters for ill-conditioned B, where the caller should pass it
# explicitly and accept the sharded path if the full config does not
# fit.  Ladder: full -> dual off -> lean (b-cache+dual off) -> all
# caches off -> lean pack off -> all off pack off.
_LADDER = (
    {},
    {"dual_basis": False},
    {"use_b_cache": False, "dual_basis": False},
    {"use_b_cache": False, "dual_basis": False, "use_ax_cache": False},
    {"use_b_cache": False, "dual_basis": False, "pack_applies": False},
    {"use_b_cache": False, "dual_basis": False, "use_ax_cache": False,
     "pack_applies": False},
)


def estimate_peak_gb(n: int, size_sub: int, dtype, config,
                     pad_lanes: bool = False) -> float:
    """TPU-compiled peak estimate for an ilobpcg/lobpcg solve.

    Scales the measured 4M x 64 f32 anchors by the block size
    n * size_sub * itemsize.  k x k Gram/RR scratch is negligible
    (< 20 MB at size_sub 256) and not modeled; rr_dtype='float64' with
    rr_chunk_rows set adds only chunk-scale buffers (WITHOUT
    rr_chunk_rows the TPU f64-emulation splits tall operands ~8x —
    see SolverConfig.rr_chunk_rows — which this model does NOT cover).
    ``pad_lanes``: include the stencil pad-to-128 surcharge (measured
    deltas, PAD_EXTRA_BLOCKS_TPU).  Accuracy is what the anchors give:
    exact at the measured corner, proportional elsewhere — use a
    margin, don't run at 99% of a grant.
    """
    key = (bool(config.dual_basis), bool(config.use_b_cache),
           bool(config.use_ax_cache), bool(config.pack_applies))
    itemsize = np.dtype(dtype).itemsize
    block_gb = n * size_sub * itemsize / (1 << 30)
    peak = PEAK_BLOCKS_TPU[key] * block_gb
    if pad_lanes and size_sub % 128:
        extra_w = _pad_target(size_sub) - size_sub
        extra_block_gb = n * extra_w * itemsize / (1 << 30)
        peak += PAD_EXTRA_BLOCKS_TPU.get(
            key, _PAD_EXTRA_DEFAULT) * extra_block_gb
    return peak


def plan_config(
    config,
    n: int,
    dtype=np.float32,
    *,
    hbm_gb: Optional[float] = None,
    margin: float = 0.95,
):
    """Return the fastest-known variant of `config` whose estimated
    peak fits ``margin * hbm_gb``, walking the measured speed ladder
    (full -> dual off -> b-cache+dual off -> + ax-cache off -> lean
    pack off -> all off pack off, matching _LADDER).

    Knobs the caller already disabled stay disabled.  Raises
    ``ValueError`` if even the leanest configuration does not fit —
    the problem needs a sharded multi-chip mesh (``lobpcg_tpu.parallel``)
    or a smaller subspace, not a doomed launch.
    """
    budget = margin * (DEFAULT_BUDGET_GB if hbm_gb is None else hbm_gb)
    for rung in _LADDER:
        # Never re-enable a knob the caller turned off.
        kw = dict(rung)
        for field in ("use_b_cache", "dual_basis", "use_ax_cache",
                      "pack_applies"):
            if not getattr(config, field):
                kw[field] = False
        cand = dataclasses.replace(config, **kw)
        if estimate_peak_gb(n, config.size_sub, dtype, cand) <= budget:
            return cand
    raise ValueError(
        f"no single-chip configuration fits: dim {n} x size_sub "
        f"{config.size_sub} needs >= "
        f"{estimate_peak_gb(n, config.size_sub, dtype, cand):.2f} GB "
        f"(budget {budget:.2f} GB). Shard the problem over a mesh "
        f"(lobpcg_tpu.parallel.shard_problem) or shrink size_sub."
    )


def probe_hbm_gb(step_gb: float = 1.0, max_gb: float = 31.0) -> float:
    """Allocate device buffers until failure and return the granted
    total (buffers are freed before returning).

    CAUTION: this measures allocatable *fragments*, not one program's
    contiguous arena — on the shared relay a 20 GiB probe preceded a
    14.4 GB program OOM by minutes.  Treat the result as an upper
    bound; plan against DEFAULT_BUDGET_GB unless the chip is dedicated.
    """
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    step = int(step_gb * (1 << 28))  # f32 elements per step
    bufs, granted = [], 0.0
    try:
        while granted < max_gb:
            b = jax.device_put(jnp.zeros((step,), jnp.float32), dev)
            b.block_until_ready()
            bufs.append(b)
            granted += step_gb
    except Exception:  # noqa: BLE001 - any backend error ends the probe
        pass
    finally:
        del bufs
    return granted
