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
    # v5e-measured peaks at dim 4M x 64 f32, pad off
    # (results_r4.jsonl 5* — the pack_applies-aware r4 set).
    for kw, gb in [
        (dict(), 16.31),
        (dict(use_b_cache=False), 16.31),
        (dict(dual_basis=False), 14.39),
        (dict(dual_basis=False, use_ax_cache=False), 12.49),
        (dict(use_b_cache=False, dual_basis=False), 13.44),
        (dict(use_b_cache=False, dual_basis=False, pack_applies=False),
         10.58),
        (dict(use_b_cache=False, dual_basis=False, use_ax_cache=False),
         10.63),
        (dict(use_b_cache=False, dual_basis=False, use_ax_cache=False,
              pack_applies=False), 8.67),
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
    # 4M x 64 at a 12 GB budget: the lean pack-on rung (13.44 GiB) no
    # longer fits; the next-fastest fitting rung is all-caches-off with
    # packing KEPT (10.63 GiB — kernel-rate applies beat the jnp
    # fallback, results_r4 3b2/3c).
    planned = plan_config(_cfg(), 4_000_000, jnp.float32, hbm_gb=12.0)
    assert not planned.use_b_cache and not planned.dual_basis
    assert not planned.use_ax_cache
    assert planned.pack_applies
    # Tighter budget: the leanest rung drops packing too (8.67 GiB).
    lean = plan_config(_cfg(), 4_000_000, jnp.float32, hbm_gb=9.2)
    assert not lean.use_ax_cache and not lean.pack_applies


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
