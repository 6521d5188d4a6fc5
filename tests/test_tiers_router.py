"""tier_over_time: range windows answered from the coarsest dividing
tier, pinned exactly equal to the fine-tier evaluation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.tiers import (
    reaggregate,
    rollup_tier1,
    tier_over_time,
)


@pytest.fixture(scope="module")
def tiers(spark, events):
    t1 = rollup_tier1(events).localCheckpoint(eager=True)
    t2 = reaggregate(t1, "1h").localCheckpoint(eager=True)
    t3 = reaggregate(t2, "1d").localCheckpoint(eager=True)
    return {60: t1, 3600: t2, 86400: t3}


def _vals(df):
    return {
        (r["source"], r["bucket_ts"]): r["value"] for r in df.collect()
    }


@pytest.mark.parametrize("func", ["sum", "count", "min", "max", "avg"])
def test_router_picks_coarse_and_matches_fine(tiers, func):
    """A 6h window: the router answers from tier-1h; the value at coarse
    bucket T must equal the tier-1m evaluation at the last minute bucket
    inside T (identical covered interval)."""
    coarse = tier_over_time(tiers, func, 6 * 3600)
    assert coarse.select("tier_step_s").first()[0] == 3600
    fine = tier_over_time({60: tiers[60]}, func, 6 * 3600)
    cv, fv = _vals(coarse), _vals(fine)
    # align: coarse bucket start T <-> last fine bucket start inside T
    fine_by_src = {}
    for (s, ts), v in fv.items():
        fine_by_src.setdefault(s, {})[ts] = v
    from datetime import timedelta

    checked = 0
    for (s, T), v in cv.items():
        last_fine = max(t for t in fine_by_src[s] if T <= t < T + timedelta(seconds=3600))
        assert fv[(s, last_fine)] == pytest.approx(v, rel=1e-12), (func, s, T)
        checked += 1
    assert checked > 50


def test_router_tier_choice_and_errors(tiers):
    assert tier_over_time(tiers, "sum", 86400 * 2).select("tier_step_s").first()[0] == 86400
    assert tier_over_time(tiers, "sum", 90 * 60).select("tier_step_s").first()[0] == 60
    with pytest.raises(ValueError, match="divides"):
        tier_over_time({3600: tiers[3600]}, "sum", 90 * 60)
    with pytest.raises(ValueError, match="non-decomposable"):
        tier_over_time(tiers, "rate", 3600)


def test_router_window_content(tiers):
    """sum over 2h from tier-1h == lag-window sum of two hourly buckets
    (sparse-safe RANGE frame, not ROWS)."""
    got = _vals(tier_over_time({3600: tiers[3600]}, "sum", 2 * 3600))
    rows = {
        (r["source"], r["bucket_ts"]): r["sum_v"]
        for r in tiers[3600].collect()
    }
    from datetime import timedelta

    for (s, T), v in got.items():
        prev = rows.get((s, T - timedelta(hours=1)), 0.0)
        assert v == pytest.approx(rows[(s, T)] + prev, rel=1e-12), (s, T)
