"""Counter rate/increase, sliding rollups, rolling z-score, EWMA.

Exact oracles: DuckDB window SQL for the counter family and the sliding
rollup (same relation, independent formulation), numpy/pure-python
recurrences for EWMA, and an in-Spark equivalence check pinning
`sliding_rollup_from_tier1` to the native `F.window(slide)` fan-out over
raw events (the formulation it replaces at scale).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.rates import (
    anomaly_zscore,
    counter_deltas,
    ewma,
    ewma_expr,
    increase_tier1,
    rate,
    rolling_stats,
    sliding_rollup_from_tier1,
)
from workbook_exporter_fe_spark.operators.tiers import rollup_tier1


def _counter_values(s: str) -> list[float]:
    """Deterministic cumulative counter with a reset every 37th sample on s1."""
    out = []
    acc = 0.0
    for i in range(400):
        step = ((i * 2654435761 + ord(s[1]) * 40503) % 97) / 7.0
        if s == "s1" and i % 37 == 0 and i > 0:
            acc = step  # counter reset
        else:
            acc += step
        out.append(round(acc, 3))
    return out


@pytest.fixture(scope="module")
def counter_series(spark):
    rows = [
        (s, i, v)
        for s in ("s0", "s1", "s2")
        for i, v in enumerate(_counter_values(s))
    ]
    return spark.createDataFrame(rows, "source string, idx int, v double").select(
        "source",
        F.timestamp_seconds(F.lit(1700000000) + F.col("idx") * 15).alias("event_ts"),
        "v",
    )


def _duck_con(pdf):
    con = duckdb.connect()
    con.register("series", pdf)
    return con


def test_counter_deltas_vs_duckdb(spark, counter_series):
    got = counter_deltas(counter_series).orderBy("source", "event_ts").collect()
    con = _duck_con(counter_series.toPandas())
    want = con.execute(
        """
        SELECT source, event_ts, v,
               CASE WHEN lag(v) OVER w IS NULL THEN NULL
                    WHEN v >= lag(v) OVER w THEN v - lag(v) OVER w
                    ELSE v END AS delta
        FROM series
        WINDOW w AS (PARTITION BY source ORDER BY event_ts)
        ORDER BY source, event_ts
        """
    ).fetchall()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["source"] == w[0]
        assert (g["delta"] is None) == (w[3] is None)
        if g["delta"] is not None:
            assert math.isclose(g["delta"], w[3], rel_tol=1e-12)


def test_rate_and_increase_vs_duckdb(spark, counter_series):
    r = rate(counter_series).filter(F.col("rate_ps").isNotNull())
    # 15s cadence: rate == delta / 15 everywhere
    bad = r.filter(F.abs(F.col("rate_ps") - F.col("delta") / 15.0) > 1e-12).count()
    assert bad == 0

    inc = increase_tier1(counter_series).orderBy("source", "bucket_ts").collect()
    con = _duck_con(counter_series.toPandas())
    want = con.execute(
        """
        WITH d AS (
          SELECT source, event_ts,
                 CASE WHEN lag(v) OVER w IS NULL THEN NULL
                      WHEN v >= lag(v) OVER w THEN v - lag(v) OVER w
                      ELSE v END AS delta
          FROM series
          WINDOW w AS (PARTITION BY source ORDER BY event_ts)
        )
        SELECT source, date_trunc('minute', event_ts) AS bucket_ts,
               SUM(delta) AS increase, COUNT(*) AS n_samples
        FROM d WHERE delta IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    assert len(inc) == len(want)
    for g, w in zip(inc, want):
        assert (g["source"], g["bucket_ts"]) == (w[0], w[1])
        assert math.isclose(g["increase"], w[2], rel_tol=1e-9)
        assert g["n_samples"] == w[3]


def test_increase_survives_resets_exactly(spark, counter_series):
    """Total increase per source == sum of all per-sample steps (the ground
    truth the cumulative counter was built from), reset-adjusted."""
    total = (
        counter_deltas(counter_series)
        .groupBy("source")
        .agg(F.sum("delta").alias("inc"))
        .collect()
    )
    truth = {}
    for s in ("s0", "s1", "s2"):
        vals = _counter_values(s)
        truth[s] = sum(
            v - p if v >= p else v for p, v in zip(vals, vals[1:])
        )
    for row in total:
        assert math.isclose(row["inc"], truth[row["source"]], rel_tol=1e-9)


def test_sliding_rollup_equals_native_window(spark, events):
    """Tier-1-derived hopping windows == native F.window(5m slide 1m) over
    raw events — same aggregates, k× less shuffle fan-out at tier-0."""
    ev = events.select("source", "event_ts", F.col("v").cast("double").alias("v"))
    t1 = rollup_tier1(ev)
    got = sliding_rollup_from_tier1(t1, 5, 1).select(
        "source", "win_start", "sum_v", "min_v", "max_v", "cnt"
    )
    native = (
        ev.groupBy("source", F.window("event_ts", "5 minutes", "1 minute").alias("w"))
        .agg(
            F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.count("*").alias("cnt"),
        )
        .select(
            "source", F.col("w.start").alias("win_start"),
            "sum_v", "min_v", "max_v", "cnt",
        )
    )
    j = got.alias("g").join(native.alias("n"), ["source", "win_start"], "full")
    assert j.filter(F.col("g.cnt").isNull() | F.col("n.cnt").isNull()).count() == 0
    bad = j.filter(
        (F.col("g.cnt") != F.col("n.cnt"))
        | (F.abs(F.col("g.sum_v") - F.col("n.sum_v")) > 1e-6)
        | (F.col("g.min_v") != F.col("n.min_v"))
        | (F.col("g.max_v") != F.col("n.max_v"))
    ).count()
    assert bad == 0


def test_rolling_zscore_flags_planted_spike(spark):
    rows = [("a", i, 10.0 + (i % 3) * 0.1) for i in range(120)]
    rows[80] = ("a", 80, 300.0)  # planted spike
    df = spark.createDataFrame(rows, "source string, idx int, avg_v double").select(
        "source",
        F.timestamp_seconds(F.lit(1700000000) + F.col("idx") * 60).alias("bucket_ts"),
        "avg_v",
    )
    out = anomaly_zscore(df, n=30, threshold=4.0).filter("is_anomaly").collect()
    assert len(out) == 1 and out[0]["avg_v"] == 300.0
    # cold start: first min_points rows never flag even if std is tiny
    s = rolling_stats(df, n=30).orderBy("bucket_ts").limit(3).collect()
    assert s[0]["roll_n"] == 0


def test_rolling_stats_vs_duckdb(spark, counter_series):
    got = (
        rolling_stats(counter_series, value_col="v", ts_col="event_ts", n=20)
        .orderBy("source", "event_ts")
        .collect()
    )
    con = _duck_con(counter_series.toPandas())
    want = con.execute(
        """
        SELECT source, event_ts,
               avg(v) OVER w AS m, stddev_samp(v) OVER w AS sd, count(v) OVER w AS n
        FROM series
        WINDOW w AS (PARTITION BY source ORDER BY event_ts
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
        ORDER BY source, event_ts
        """
    ).fetchall()
    for g, w in zip(got, want):
        assert g["roll_n"] == w[4]
        if w[2] is not None:
            assert math.isclose(g["roll_mean"], w[2], rel_tol=1e-9)
        if w[3] is not None:
            assert math.isclose(g["roll_std"], w[3], rel_tol=1e-6, abs_tol=1e-9)


def test_ewma_matches_recurrence_and_expr(spark):
    alpha = 0.3
    vals = [((i * 37) % 11) / 3.0 for i in range(200)]
    rows = [("a", i, v) for i, v in enumerate(vals)] + [
        ("b", i, v * 2) for i, v in enumerate(vals[:50])
    ]
    df = spark.createDataFrame(rows, "source string, idx int, avg_v double").select(
        "source",
        "idx",
        F.timestamp_seconds(F.lit(1700000000) + F.col("idx") * 60).alias("bucket_ts"),
        "avg_v",
    )

    def ref(seq, a):
        out = []
        s = None
        for v in seq:
            s = v if s is None else a * v + (1 - a) * s
            out.append(s)
        return out

    for op in (ewma, ewma_expr):
        got = {
            (r["source"], r["idx"]): r["ewma"] for r in op(df, alpha).collect()
        }
        for src, seq in (("a", vals), ("b", [v * 2 for v in vals[:50]])):
            for i, e in enumerate(ref(seq, alpha)):
                assert math.isclose(
                    got[(src, i)], e, rel_tol=1e-9, abs_tol=1e-12
                ), (op.__name__, src, i)


def test_ewma_expr_guards_depth_overflow(spark):
    # (1-a)^-t leaves double range on deep series; the closed form must
    # FAIL LOUDLY instead of silently emitting inf/NaN (ADVICE r2)
    import pytest

    alpha = 0.3
    n = 3000  # past the alpha=0.3 safe depth (~1822)
    rows = [("a", i, float((i * 37) % 11)) for i in range(n)]
    df = spark.createDataFrame(rows, "source string, idx int, avg_v double").select(
        "source",
        F.timestamp_seconds(F.lit(1700000000) + F.col("idx") * 60).alias("bucket_ts"),
        "avg_v",
    )
    with pytest.raises(Exception, match="ewma_expr"):
        ewma_expr(df, alpha).collect()
    # the exact recurrence handles the same depth fine
    deep = ewma(df, alpha).orderBy("bucket_ts").collect()
    assert len(deep) == n and all(math.isfinite(r["ewma"]) for r in deep)
    # alpha=1 short-circuits (s_t = v_t), no guard needed
    ident = ewma_expr(df, 1.0).orderBy("bucket_ts").collect()
    assert all(r["ewma"] == r["avg_v"] for r in ident)


def test_linear_fit_and_predict_vs_duckdb(spark, counter_series):
    from workbook_exporter_fe_spark.operators.rates import predict_linear

    got = (
        predict_linear(
            counter_series, 3600.0, value_col="v", ts_col="event_ts", n=20
        )
        .orderBy("source", "event_ts")
        .collect()
    )
    con = _duck_con(counter_series.toPandas())
    want = con.execute(
        """
        SELECT source, event_ts,
               CASE WHEN k >= 2 AND (k*stt - st*st) > 0
                    THEN (k*sty - st*sy) / (k*stt - st*st) END AS slope
        FROM (
          SELECT source, event_ts,
                 CAST(count(v) OVER w AS DOUBLE) AS k,
                 sum(tc) OVER w AS st,
                 sum(v) OVER w AS sy,
                 sum(tc * v) OVER w AS sty,
                 sum(tc * tc) OVER w AS stt
          FROM (
            SELECT *, epoch(event_ts)
                      - min(epoch(event_ts)) OVER (PARTITION BY source) AS tc
            FROM series
          )
          WINDOW w AS (PARTITION BY source ORDER BY event_ts
                       ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        )
        ORDER BY source, event_ts
        """
    ).fetchall()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        if w[2] is None:
            assert g["slope_per_sec"] is None
        else:
            assert math.isclose(g["slope_per_sec"], w[2], rel_tol=1e-6, abs_tol=1e-9)
        if g["slope_per_sec"] is not None:
            # horizon extrapolation is fit_at_now + slope*h exactly
            assert math.isclose(
                g["predicted"],
                g["fit_at_now"] + g["slope_per_sec"] * 3600.0,
                rel_tol=1e-12,
            )


def test_predict_linear_exact_on_linear_series(spark):
    """On an exactly-linear series the fit reproduces the line and the
    prediction is exact."""
    from workbook_exporter_fe_spark.operators.rates import predict_linear

    rows = [("a", i, 5.0 + 2.0 * i) for i in range(50)]  # y = 5 + 2*idx
    df = spark.createDataFrame(rows, "source string, idx int, avg_v double").select(
        "source",
        F.timestamp_seconds(F.lit(1700000000) + F.col("idx") * 60).alias("bucket_ts"),
        "avg_v",
    )
    out = predict_linear(df, horizon_seconds=600.0, n=10).orderBy("bucket_ts").collect()
    last = out[-1]
    # slope = 2 per idx = 2/60 per second; +600s -> +20
    assert math.isclose(last["slope_per_sec"], 2.0 / 60.0, rel_tol=1e-9)
    assert math.isclose(last["predicted"], last["avg_v"] + 20.0, rel_tol=1e-9)


def test_holt_winters_matches_recurrence(spark):
    from workbook_exporter_fe_spark.operators.rates import holt_winters

    a, b = 0.4, 0.2
    vals = [10.0 + 0.5 * i + ((i * 13) % 7) / 5.0 for i in range(120)]  # trend+noise
    rows = [("a", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "source string, idx int, avg_v double").select(
        "source", "idx",
        F.timestamp_seconds(F.lit(1700000000) + F.col("idx") * 60).alias("bucket_ts"),
        "avg_v",
    )
    got = {
        r["idx"]: (r["hw_level"], r["hw_trend"])
        for r in holt_winters(df, a, b).collect()
    }
    # pure-python recurrence
    lvl, tr = [vals[0]], [0.0]
    tr.append(vals[1] - vals[0])
    lvl.append(a * vals[1] + (1 - a) * (lvl[0] + tr[1]))
    for i in range(2, len(vals)):
        lvl.append(a * vals[i] + (1 - a) * (lvl[i - 1] + tr[i - 1]))
        tr.append(b * (lvl[i] - lvl[i - 1]) + (1 - b) * tr[i - 1])
    for i in range(len(vals)):
        assert math.isclose(got[i][0], lvl[i], rel_tol=1e-12), i
        assert math.isclose(got[i][1], tr[i], rel_tol=1e-12), i
    # smoothing tracks the underlying trend: late-trend estimate near 0.5/step
    assert abs(got[119][1] - 0.5) < 0.2


def test_mean_shift_changepoints_vs_reference(spark):
    """Planted level shift is flagged at the shift boundary and nowhere
    else; shift magnitudes match a pure-python two-window scan."""
    from workbook_exporter_fe_spark.operators.rates import (
        mean_shift_changepoints,
    )

    n = 10
    vals = [10.0 + ((i * 7) % 5) / 10.0 for i in range(60)]
    vals += [30.0 + ((i * 7) % 5) / 10.0 for i in range(60)]
    rows = [("s", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "source string, idx int, v double").select(
        "source",
        F.timestamp_seconds(F.lit(1700000000) + F.col("idx") * 15).alias(
            "event_ts"
        ),
        "idx",
        "v",
    )
    got = {
        r["idx"]: (r["shift"], r["is_shift"])
        for r in mean_shift_changepoints(
            df, value_col="v", key="source", order_cols=("event_ts",),
            n=n, threshold=5.0, scale=100,
        ).collect()
    }
    x = [round(v * 100) for v in vals]
    for i in range(len(vals)):
        left = x[max(0, i - n) : i]
        right = x[i : i + n]
        if len(left) == n and len(right) == n:
            diff = sum(right) - sum(left)
            want_shift = round(diff / (n * 100), 6)
            want_flag = abs(diff) > n * 5.0 * 100
        else:
            want_shift, want_flag = None, False
        assert got[i] == (want_shift, want_flag), i
    # the planted +20 step is detected in the boundary window only
    flagged = [i for i, (_, f) in got.items() if f]
    assert flagged and all(60 - n < i <= 60 + n for i in flagged)
    assert 60 in flagged


def test_rolling_corr_vs_reference(spark):
    """Rolling Pearson over scaled ints equals the closed-form reference;
    constant windows yield NULL."""
    from workbook_exporter_fe_spark.operators.rates import rolling_corr

    n = 12
    vals = [((i * 31) % 17) / 4.0 + (0.5 * i if i < 50 else -0.25 * i)
            for i in range(100)]
    ys = [float(i % 23) for i in range(100)]
    rows = [("s", i, v, y) for i, (v, y) in enumerate(zip(vals, ys))]
    df = spark.createDataFrame(
        rows, "source string, idx int, v double, y double"
    ).select(
        "source",
        F.timestamp_seconds(F.lit(1700000000) + F.col("idx") * 15).alias(
            "event_ts"
        ),
        "idx", "v", "y",
    )
    got = {
        r["idx"]: (r["corr_n"], r["corr_xy"])
        for r in rolling_corr(
            df, "v", "y", key="source", order_cols=("event_ts",),
            n=n, x_scale=100, y_scale=1,
        ).collect()
    }
    xs = [round(v * 100) for v in vals]
    for i in range(100):
        w = list(range(max(0, i - n + 1), i + 1))
        k = len(w)
        sx = sum(xs[j] for j in w); sy = sum(int(ys[j]) for j in w)
        sxx = sum(xs[j] ** 2 for j in w); syy = sum(int(ys[j]) ** 2 for j in w)
        sxy = sum(xs[j] * int(ys[j]) for j in w)
        num = k * sxy - sx * sy
        vx = k * sxx - sx * sx
        vy = k * syy - sy * sy
        if k >= 2 and vx > 0 and vy > 0:
            want = round(num / math.sqrt(float(vx) * float(vy)), 6)
        else:
            want = None
        assert got[i][0] == k and (
            got[i][1] == pytest.approx(want) if want is not None
            else got[i][1] is None
        ), i


def test_series_analytics_fused_equals_composed_chain(spark, counter_series):
    """The fused single-window-pass operator is bit-identical to the
    composed rate → predict_linear → rolling z-score → mean-shift →
    rolling-corr chain, and its physical plan has exactly one Exchange,
    one Sort, and ≤2 Window operators (the chain builds ~15)."""
    import re

    from pyspark.sql import Window

    from workbook_exporter_fe_spark.operators.rates import (
        mean_shift_changepoints,
        predict_linear,
        rolling_corr,
        series_analytics,
    )

    ev = counter_series.withColumn(
        "event_id", F.monotonically_increasing_id()
    )
    ev = spark.createDataFrame(ev.collect(), ev.schema)  # pin ids

    fused = series_analytics(
        ev, value_col="v", key="source", ts_col="event_ts",
        tiebreak=("event_id",), scale=100, anomaly_n=30,
        anomaly_threshold=3.0, anomaly_min_points=5, fit_n=20,
        horizon_seconds=3600.0, shift_n=10, shift_threshold=5.0,
    )

    # the pre-fusion composed chain, verbatim from the old q71 body
    r = rate(ev, tiebreak=["event_id"])
    fit = predict_linear(
        r, 3600.0, value_col="v", ts_col="event_ts", n=20, scale=100,
        tiebreak=("event_id",),
    )
    x = F.round(F.col("v") * 100).cast("long")
    wf = (
        Window.partitionBy("source")
        .orderBy("event_ts", "event_id")
        .rowsBetween(-30, -1)
    )
    d = (
        fit.withColumn("_x", x)
        .withColumn("_s1", F.sum("_x").over(wf))
        .withColumn("_s2", F.sum(F.col("_x") * F.col("_x")).over(wf))
        .withColumn("roll_n", F.count("_x").over(wf))
    )
    tsec = F.col("event_ts").cast("timestamp").cast("long")
    d = d.withColumn(
        "_trel", tsec - F.min(tsec).over(Window.partitionBy("source"))
    )
    d = mean_shift_changepoints(
        d, value_col="v", key="source", order_cols=("event_ts", "event_id"),
        n=10, threshold=5.0, scale=100,
    )
    d = rolling_corr(
        d, "v", "_trel", key="source", order_cols=("event_ts", "event_id"),
        n=20, x_scale=100, y_scale=1,
    )
    n_, s1, s2 = F.col("roll_n"), F.col("_s1"), F.col("_s2")
    dev = n_ * F.col("_x") - s1
    var_num = n_ * s2 - s1 * s1
    flag = (n_ >= 5) & (var_num > 0) & (dev * dev * (n_ - 1) > 9 * n_ * var_num)
    out_cols = [
        "source", "event_id", "delta", "rate_ps", "roll_n", "is_anomaly",
        "slope_per_sec", "predicted", "shift", "is_shift", "corr_n",
        "corr_xy",
    ]
    composed = d.withColumn(
        "is_anomaly", F.coalesce(flag, F.lit(False))
    ).select(*out_cols)

    got = sorted(fused.select(*out_cols).collect())
    want = sorted(composed.collect())
    assert got == want  # bit-exact, including NULL placement

    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"\bWindow\b", plan)) <= 2, plan
    assert len(re.findall(r"\bExchange\b", plan)) == 1, plan
    assert len(re.findall(r"\bSort\b", plan)) == 1, plan
