"""HBM-aware planning (utils/plan.py): peak estimates and knob fitting.

Anchors are TPU-measured (benchmarks/results_r3.jsonl mem_*); these
tests pin the model to them and check the fit ladder's semantics.
"""

import jax.numpy as jnp
import pytest

from lobpcg_tpu import SolverConfig, estimate_peak_gb, plan_config


def _cfg(**kw):
    return SolverConfig(nev=56, size_sub=64, **kw)


def test_peak_matches_measured_anchors():
    # v5e-measured peaks at dim 4M x 64 f32 (results_r3.jsonl mem_*).
    for kw, gb in [
        (dict(), 16.31),
        (dict(use_b_cache=False), 16.31),
        (dict(dual_basis=False), 14.39),
        (dict(use_b_cache=False, dual_basis=False), 10.58),
        (dict(use_b_cache=False, dual_basis=False, use_ax_cache=False),
         8.67),
    ]:
        est = estimate_peak_gb(4_000_000, 64, jnp.float32, _cfg(**kw))
        assert est == pytest.approx(gb, rel=0.01), (kw, est)


def test_peak_scales_with_shape_and_dtype():
    c = _cfg()
    base = estimate_peak_gb(4_000_000, 64, jnp.float32, c)
    assert estimate_peak_gb(2_000_000, 64, jnp.float32, c) == \
        pytest.approx(base / 2)
    assert estimate_peak_gb(4_000_000, 128, jnp.float32, c) == \
        pytest.approx(2 * base)
    assert estimate_peak_gb(4_000_000, 64, jnp.float64, c) == \
        pytest.approx(2 * base)


def test_plan_keeps_full_config_when_it_fits():
    planned = plan_config(_cfg(), 1_000_000, jnp.float32, hbm_gb=16.0)
    assert planned.use_b_cache and planned.dual_basis
    assert planned.use_ax_cache


def test_plan_dual_off_rung_keeps_both_caches():
    # 4M x 64 at a full 16 GB chip: the full config (16.31 GiB) cannot
    # fit, but the dual-off rung (14.39 GiB) does — and it must keep
    # the b/ax caches (the fastest measured Gram path).
    planned = plan_config(_cfg(), 4_000_000, jnp.float32, hbm_gb=16.0)
    assert not planned.dual_basis
    assert planned.use_b_cache and planned.use_ax_cache


def test_plan_drops_knobs_in_measured_speed_order():
    # 4M x 64 at a 12 GB budget: only the b+dual-off rungs fit; the
    # ax-cache must survive (it was measured faster, 41.6 vs 44.6 s).
    planned = plan_config(_cfg(), 4_000_000, jnp.float32, hbm_gb=12.0)
    assert not planned.use_b_cache and not planned.dual_basis
    assert planned.use_ax_cache
    # Tighter budget: the leanest rung.
    lean = plan_config(_cfg(), 4_000_000, jnp.float32, hbm_gb=9.2)
    assert not lean.use_ax_cache


def test_plan_respects_caller_disabled_knobs():
    c = _cfg(use_ax_cache=False)
    planned = plan_config(c, 1_000_000, jnp.float32, hbm_gb=16.0)
    assert not planned.use_ax_cache  # never re-enabled


def test_plan_raises_when_nothing_fits():
    with pytest.raises(ValueError, match="Shard the problem"):
        plan_config(_cfg(), 16_000_000, jnp.float32, hbm_gb=16.0)


def test_default_budget_is_conservative():
    # No hbm_gb: defaults to the observed usable relay grant (12 GB),
    # so the 4M flagship plans to the b+dual-off rung out of the box.
    planned = plan_config(_cfg(), 4_000_000, jnp.float32)
    assert not planned.use_b_cache and not planned.dual_basis
