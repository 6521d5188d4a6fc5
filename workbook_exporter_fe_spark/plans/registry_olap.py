"""OLAP surface beyond the reference (SURVEY §2 'does NOT implement' list).

Multi-dim aggregation (cube/rollup/grouping sets), set ops, pivot/unpivot,
sessionization, as-of join, percentiles, date/time and math expression
coverage — each as a (PySpark, DuckDB) pair under the same determinism
discipline.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import _dsum, _isum, _t, query


# Multi-dimensional aggregation family — CUBE (DataFrame .cube), ROLLUP
# (.rollup), GROUPING SETS (SQL surface) — union-tagged by `mode` over one
# shared base relation, which also pins three-valued null semantics: the
# `et` dimension routes through nullif/coalesce and the two nonnull
# measures count through nullif(user_id, 7) (SQL NULL-skipping COUNT).
@query(
    "q40_cube_rollup_gsets",
    """
    WITH base AS (
      SELECT coalesce(nullif(event_type, 'view'), 'other') AS et,
             user_id % 10 AS cohort,
             nullif(user_id, 7) AS uid_nn
      FROM events
    )
    SELECT 'cube' AS mode, et, cohort, COUNT(*) AS cnt,
           COUNT(uid_nn) AS cnt_nonnull,
           CAST(COUNT(DISTINCT uid_nn) AS BIGINT) AS distinct_nonnull
    FROM base GROUP BY CUBE (et, cohort)
    UNION ALL
    SELECT 'rollup', et, cohort, COUNT(*), COUNT(uid_nn),
           CAST(COUNT(DISTINCT uid_nn) AS BIGINT)
    FROM base GROUP BY ROLLUP (et, cohort)
    UNION ALL
    SELECT 'gsets', et, cohort, COUNT(*), COUNT(uid_nn),
           CAST(COUNT(DISTINCT uid_nn) AS BIGINT)
    FROM base GROUP BY GROUPING SETS ((et), (cohort), ())
    """,
)
def q40_cube_rollup_gsets(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.coalesce(F.nullif(F.col("event_type"), F.lit("view")), F.lit("other")).alias("et"),
        (F.col("user_id") % 10).alias("cohort"),
        F.nullif(F.col("user_id"), F.lit(7)).alias("uid_nn"),
    )
    aggs = [
        F.count("*").alias("cnt"),
        F.count("uid_nn").alias("cnt_nonnull"),
        F.countDistinct("uid_nn").alias("distinct_nonnull"),
    ]
    cols = ["et", "cohort", "cnt", "cnt_nonnull", "distinct_nonnull"]
    cube = base.cube("et", "cohort").agg(*aggs).select(F.lit("cube").alias("mode"), *cols)
    roll = base.rollup("et", "cohort").agg(*aggs).select(F.lit("rollup").alias("mode"), *cols)
    base.createOrReplaceTempView("events_gs_base")
    gs = spark.sql(
        """
        SELECT 'gsets' AS mode, et, cohort, COUNT(*) AS cnt,
               COUNT(uid_nn) AS cnt_nonnull,
               COUNT(DISTINCT uid_nn) AS distinct_nonnull
        FROM events_gs_base GROUP BY GROUPING SETS ((et), (cohort), ())
        """
    )
    return cube.unionByName(roll).unionByName(gs)


@query(
    "q43_set_ops",
    """
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 400000
    """,
)
def q43_set_ops(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    big_f = o.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 400000)
    ).select("o_custkey")
    return urgent.intersect(low).exceptAll(big_f).distinct()


# Pivot → unpivot round-trip: long events pivot to a wide per-cohort count
# matrix (DataFrame .pivot), which then unpivots back to long (stack) —
# both reshape operators in one gate query, scalar columns throughout.
@query(
    "q44_pivot_unpivot",
    """
    WITH wide AS (
      SELECT user_id % 5 AS cohort,
             COUNT(*) FILTER (WHERE event_type = 'click') AS click,
             COUNT(*) FILTER (WHERE event_type = 'view') AS vw,
             COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             COUNT(*) FILTER (WHERE event_type = 'error') AS error
      FROM events GROUP BY 1
    )
    SELECT cohort, f.metric, f.val
    FROM wide, LATERAL (VALUES
      ('click', click), ('view', vw),
      ('purchase', purchase), ('error', error)) AS f(metric, val)
    """,
)
def q44_pivot_unpivot(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    wide = (
        ev.withColumn("cohort", F.col("user_id") % 5)
        .groupBy("cohort")
        .pivot("event_type", ["click", "view", "purchase", "error"])
        .count()
    )
    # pivot yields nulls for empty cells; oracle's FILTER yields 0
    filled = wide.select(
        "cohort",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ["click", "view", "purchase", "error"]],
    )
    return filled.selectExpr(
        "cohort",
        "stack(4, 'click', click, 'view', `view`, 'purchase', purchase,"
        " 'error', error) AS (metric, val)",
    )


@query(
    "q46_sessionize",
    """
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           date_diff('second', MIN(ts), MAX(ts)) AS span_sec
    FROM sess GROUP BY 1, 2
    """,
)
def q46_sessionize(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    # TIMESTAMP_NTZ has no direct long cast: go via TIMESTAMP (UTC session)
    epoch = F.col("ts").cast("timestamp").cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    gap = epoch - F.lag(epoch).over(w)
    new_s = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = ev.withColumn("_epoch", epoch).withColumn("new_session", new_s).withColumn(
        "session_id", F.sum("new_session").over(wrun)
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max("_epoch") - F.min("_epoch")).alias("span_sec"),
    )


# As-of join (Spark lacks a native one): latest 'purchase' value per user
# at or before each 'error' event — composed as a union of tagged streams +
# running last(ignorenulls) window, the shuffle-free as-of pattern.
@query(
    "q47_asof_join",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN event_type = 'purchase' THEN value END AS purchase_v,
             event_type
      FROM events WHERE event_type IN ('purchase', 'error')
    ),
    filled AS (
      SELECT *, last_value(purchase_v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_v
      FROM tagged
    )
    SELECT user_id, event_id, value AS error_v, last_purchase_v
    FROM filled WHERE event_type = 'error'
    """,
)
def q47_asof_join(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "error")
    )
    tagged = ev.withColumn(
        "purchase_v", F.when(F.col("event_type") == "purchase", F.col("value"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = tagged.withColumn(
        "last_purchase_v", F.last("purchase_v", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", F.col("value").alias("error_v"), "last_purchase_v"
    )


# Exact percentiles UNION-TAGGED with the Prometheus-histogram tier family
# (operators/histogram.py): 1h bin tier → re-summed 1d tier (kind='bin':
# integer counts, trivially oracle-exact) and histogram_quantile over the
# 1d tier (kind='hq': the PromQL cumulative-bin interpolation — every
# float op is a fixed IEEE chain over exact integer bin counts, mirrored
# verbatim in the SQL, so the estimate itself value-hashes).
@query(
    "q48_percentiles",
    """
    WITH pct AS (
      SELECT event_type,
             ROUND(quantile_cont(value, 0.5), 6) AS p50,
             ROUND(quantile_cont(value, 0.95), 6) AS p95,
             MIN(value) AS lo, MAX(value) AS hi
      FROM events GROUP BY event_type
    ), h1 AS (
      SELECT event_type AS source,
             date_trunc('hour', ts) AS bucket_ts,
             CASE WHEN value < 0.0 THEN -1
                  WHEN value >= 500.0 THEN 20
                  ELSE CAST(FLOOR((value - 0.0) / 25.0) AS INTEGER) END AS bin,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2, 3
    ), hd AS (
      SELECT source, CAST(date_trunc('day', bucket_ts) AS TIMESTAMP) AS bucket_ts,
             bin, CAST(SUM(n) AS BIGINT) AS n
      FROM h1 GROUP BY 1, 2, 3
    ), cum AS (
      SELECT source, bucket_ts, bin, n,
             SUM(n) OVER (PARTITION BY source, bucket_ts ORDER BY bin
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(n) OVER (PARTITION BY source, bucket_ts) AS total
      FROM hd
    ), hit AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY source, bucket_ts ORDER BY bin) AS rn
      FROM cum WHERE cum >= total * 0.5
    ), hq AS (
      SELECT source, bucket_ts,
             ROUND(CASE WHEN bin < 0 THEN 0.0
                        WHEN bin >= 20 THEN 500.0
                        ELSE 0.0 + (bin + (total * 0.5 - (cum - n)) / n) * 25.0
                   END, 6) AS hq50,
             CAST(total AS BIGINT) AS total
      FROM hit WHERE rn = 1
    )
    SELECT 'pct' AS kind, event_type AS source, CAST(NULL AS TIMESTAMP) AS bucket_ts,
           CAST(NULL AS INTEGER) AS bin, CAST(NULL AS BIGINT) AS n,
           p50, p95, lo, hi, CAST(NULL AS DOUBLE) AS hq50, CAST(NULL AS BIGINT) AS total
    FROM pct
    UNION ALL
    SELECT 'bin' AS kind, source, bucket_ts, CAST(bin AS INTEGER) AS bin, n,
           CAST(NULL AS DOUBLE) AS p50, CAST(NULL AS DOUBLE) AS p95,
           CAST(NULL AS DOUBLE) AS lo, CAST(NULL AS DOUBLE) AS hi,
           CAST(NULL AS DOUBLE) AS hq50, CAST(NULL AS BIGINT) AS total
    FROM hd
    UNION ALL
    SELECT 'hq' AS kind, source, bucket_ts,
           CAST(NULL AS INTEGER) AS bin, CAST(NULL AS BIGINT) AS n,
           CAST(NULL AS DOUBLE) AS p50, CAST(NULL AS DOUBLE) AS p95,
           CAST(NULL AS DOUBLE) AS lo, CAST(NULL AS DOUBLE) AS hi,
           hq50, total
    FROM hq
    """,
)
def q48_percentiles(spark, sf_dir):
    from workbook_exporter_fe_spark.operators.histogram import (
        histogram_quantile,
        histogram_reaggregate,
        histogram_tier1,
    )

    ev = _t(spark, sf_dir, "events")
    pct = ev.groupBy(F.col("event_type").alias("source")).agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    evh = ev.select(
        F.col("event_type").alias("source"),
        F.col("ts").alias("event_ts"),
        F.col("value").alias("v"),
    )
    h1 = histogram_tier1(evh, lo=0.0, hi=500.0, n_bins=20, tier="1h")
    hd = histogram_reaggregate(h1, "1d")
    hq = histogram_quantile(hd, 0.5, lo=0.0, hi=500.0, n_bins=20)

    def _pad(df, have):
        cols = {
            "bucket_ts": "timestamp", "bin": "int", "n": "bigint",
            "p50": "double", "p95": "double", "lo": "double", "hi": "double",
            "hq50": "double", "total": "bigint",
        }
        out = []
        for c, typ in cols.items():
            out.append(
                F.col(c).cast(typ).alias(c) if c in have
                else F.lit(None).cast(typ).alias(c)
            )
        return df.select("kind", "source", *out)

    return (
        _pad(pct.withColumn("kind", F.lit("pct")), {"p50", "p95", "lo", "hi"})
        .unionByName(
            _pad(hd.withColumn("kind", F.lit("bin")), {"bucket_ts", "bin", "n"})
        )
        .unionByName(
            _pad(
                hq.withColumnRenamed("q50", "hq50").withColumn(
                    "kind", F.lit("hq")
                ),
                {"bucket_ts", "hq50", "total"},
            )
        )
    )


# Approximate sketches through a FULL oracle via the error-envelope trick:
# sketch estimates are engine-specific bytes (HLL/GK vs DuckDB's
# implementations) and can never hash-match — but "the estimate lands
# inside its published error envelope of the EXACT answer" is a boolean
# computable Spark-side and trivially TRUE oracle-side. The exact
# companions (n_users, p50) hash-check the aggregation arithmetic; the
# booleans check the estimators.
@query(
    "q49_approx_sketches",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           TRUE AS users_ok,
           TRUE AS p50_ok
    FROM events GROUP BY event_type
    """,
)
def q49_approx_sketches(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.approx_count_distinct("user_id").alias("_approx_users"),
        F.percentile_approx("value", 0.5).alias("_approx_p50"),
        F.expr("percentile(value, 0.4)").alias("_p40"),
        F.expr("percentile(value, 0.6)").alias("_p60"),
    )
    users_ok = (
        F.abs(F.col("_approx_users") - F.col("n_users"))
        <= F.greatest(F.col("n_users") * 0.05, F.lit(5.0))
    )
    p50_ok = (F.col("_approx_p50") >= F.col("_p40")) & (
        F.col("_approx_p50") <= F.col("_p60")
    )
    return agg.select(
        "event_type",
        "n_users",
        "p50",
        users_ok.alias("users_ok"),
        p50_ok.alias("p50_ok"),
    )


# Datetime/math family UNION-TAGGED with classical seasonal decomposition
# (operators/seasonal.py) of the hourly event-count series per event_type:
# period-24 centered-MA trend (width 25), per-phase seasonal means of the
# detrended series, residual — numerators exact int64 (counts, so scale=1),
# every float a fixed correctly-rounded IEEE chain mirrored verbatim below.
@query(
    "q50_datetime_math",
    """
    WITH hb AS (
      SELECT event_type AS src, date_trunc('hour', ts) AS b, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT src, b, cnt,
             (row_number() OVER ws - 1) % 24 AS phase,
             CAST(SUM(cnt) OVER wc AS BIGINT) AS s,
             COUNT(cnt) OVER wc AS n
      FROM hb
      WINDOW ws AS (PARTITION BY src ORDER BY b),
             wc AS (PARTITION BY src ORDER BY b
                    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ),
    det AS (
      SELECT *, CASE WHEN n = 25 THEN 25 * cnt - s END AS dnum FROM r
    ),
    ph AS (
      SELECT src, phase, CAST(SUM(dnum) AS BIGINT) AS pnum, COUNT(*) AS pn
      FROM det WHERE dnum IS NOT NULL GROUP BY 1, 2
    ),
    dec AS (
      SELECT det.src, det.phase, det.cnt, epoch(det.b) AS t_epoch,
             CASE WHEN det.n = 25
                  THEN ROUND(CAST(det.s AS DOUBLE) / 25.0, 6) END AS trend,
             ROUND(CAST(ph.pnum AS DOUBLE) / 25.0 / CAST(ph.pn AS DOUBLE), 6) AS seasonal
      FROM det LEFT JOIN ph ON det.src = ph.src AND det.phase = ph.phase
    )
    SELECT 'dh' AS kind, extract(isodow FROM ts) AS dow, extract(hour FROM ts) AS hour,
           COUNT(*) AS cnt,
           ROUND(CAST(SUM(CAST(sqrt(abs(value)) + ln(1 + abs(value)) AS DECIMAL(28,6))) AS DOUBLE), 6) AS math_sum,
           CAST(NULL AS VARCHAR) AS src, CAST(NULL AS BIGINT) AS t_epoch,
           CAST(NULL AS DOUBLE) AS trend, CAST(NULL AS DOUBLE) AS seasonal,
           CAST(NULL AS DOUBLE) AS resid
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'dec', CAST(NULL AS BIGINT), CAST(phase AS BIGINT), cnt,
           CAST(NULL AS DOUBLE), src, CAST(t_epoch AS BIGINT), trend, seasonal,
           ROUND(CAST(cnt AS DOUBLE) - trend - seasonal, 6) + 0.0 AS resid
    FROM dec
    """,
)
def q50_datetime_math(spark, sf_dir):
    from workbook_exporter_fe_spark.operators.seasonal import seasonal_decompose

    ev = _t(spark, sf_dir, "events")
    expr = (F.sqrt(F.abs("value")) + F.log(F.lit(1) + F.abs("value"))).cast(
        "decimal(28,6)"
    )
    dh = ev.groupBy(
        (F.weekday("ts") + 1).cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hour"),
    ).agg(
        F.count("*").alias("cnt"),
        F.round(F.sum(expr), 6).cast("double").alias("math_sum"),
    ).select(
        F.lit("dh").alias("kind"),
        "dow",
        "hour",
        "cnt",
        "math_sum",
        F.lit(None).cast("string").alias("src"),
        F.lit(None).cast("long").alias("t_epoch"),
        F.lit(None).cast("double").alias("trend"),
        F.lit(None).cast("double").alias("seasonal"),
        F.lit(None).cast("double").alias("resid"),
    )
    hourly = ev.groupBy(
        F.col("event_type").alias("source"),
        F.date_trunc("hour", "ts").alias("bucket_ts"),
    ).agg(F.count("*").alias("cnt"))
    dec = seasonal_decompose(
        hourly, period=24, value_col="cnt", key="source",
        ts_col="bucket_ts", scale=1,
    ).select(
        F.lit("dec").alias("kind"),
        F.lit(None).cast("long").alias("dow"),
        F.col("phase").cast("long").alias("hour"),
        "cnt",
        F.lit(None).cast("double").alias("math_sum"),
        F.col("source").alias("src"),
        F.col("bucket_ts").cast("timestamp").cast("long").alias("t_epoch"),
        "trend",
        "seasonal",
        "resid",
    )
    return dh.unionByName(dec)


# Window-function family the reference lacks entirely (SURVEY §2: closest
# thing is the sequential port counter O17 ≈ row_number): lag/lead frame
# navigation, a running count, and ntile bucketing per user stream —
# the per-key ordered-scan shape tier gap-fill is built from.
@query(
    "q19_window_funcs",
    """
    SELECT event_id, user_id,
           LAG(value) OVER w AS prev_value,
           ROUND(value - LAG(value) OVER w, 6) AS delta,
           LEAD(event_type) OVER w AS next_type,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_cnt,
           NTILE(4) OVER w AS qtile
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q19_window_funcs(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
        F.lead("event_type").over(w).alias("next_type"),
        F.count("*").over(run).alias("run_cnt"),
        F.ntile(4).over(w).alias("qtile"),
    )


# -- Function-surface parity (array / string / null semantics) -------------
# The reference's expression surface is tiny (casts + string probes,
# SURVEY §1.2); the engine exposes Spark's full function families. These
# pin cross-engine semantics for the ones the training pipeline leans on:
# higher-order array ops, string editing, and three-valued null logic.

# Higher-order array ops + string-editing family in one per-doc projection.
# Gate-canonicalization rule: gate queries emit SCALAR columns only — the
# external driver's pandas canonicalizer cannot sort/hash list cells, so
# the two array-valued results are array_join'd to strings (the array
# semantics under test are identical; only the emission is flattened).
@query(
    "q57_string_array_funcs",
    """
    SELECT doc_id,
           len(ws) AS n_words,
           array_to_string(list_sort(list_distinct(ws)), ',') AS distinct_sorted,
           len(list_filter(ws, x -> length(x) > 6)) AS n_long,
           array_to_string(list_sort(ws)[1:3], ',') AS first3,
           upper(source) AS src_upper,
           lpad(source, 12, '*') AS src_pad,
           translate(source, 'aeiou', 'AEIOU') AS src_tr,
           levenshtein(source, 'webcrawl') AS src_dist,
           split_part(text, ' ', 2) AS second_word,
           regexp_extract(text, '([a-z]+)$', 1) AS last_word
    FROM (SELECT doc_id, source, text, string_split(text, ' ') AS ws FROM documents)
    """,
)
def q57_string_array_funcs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(ws).alias("n_words"),
        F.array_join(F.array_sort(F.array_distinct(ws)), ",").alias("distinct_sorted"),
        F.size(F.filter(ws, lambda x: F.length(x) > 6)).alias("n_long"),
        F.array_join(F.slice(F.array_sort(ws), 1, 3), ",").alias("first3"),
        F.upper("source").alias("src_upper"),
        F.lpad("source", 12, "*").alias("src_pad"),
        F.translate("source", "aeiou", "AEIOU").alias("src_tr"),
        F.levenshtein("source", F.lit("webcrawl")).alias("src_dist"),
        F.split_part(F.col("text"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.regexp_extract("text", r"([a-z]+)$", 1).alias("last_word"),
    )


# Range join: equi key + time-range predicate (ship within 30 days of the
# order date) — the join shape between pure equi (q03) and as-of (q47).
# The equi key keeps it a hash join with the range as residual; a pure
# range-only join would need a broadcast range join / binning strategy.
# Range join UNION-TAGGED with interval-union coverage (operators/
# interval.py interval_union): per order a 7-day activity window
# [o_orderdate, +7d) in integer day-space; overlapping windows merge into
# islands via the running-max sweep, and the per-priority coverage (union
# length, island count) is exact integer arithmetic — the utilization
# number a naive SUM of durations double-counts.
@query(
    "q66_range_join",
    """
    WITH iv AS (
      SELECT o_orderpriority AS p,
             date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS s,
             date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) + 7 AS e
      FROM orders
    ),
    sw AS (
      SELECT p, s, e,
             MAX(e) OVER (PARTITION BY p ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
      FROM iv
    ),
    fl AS (
      SELECT p, s, e,
             CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS nw
      FROM sw
    ),
    isl AS (
      SELECT p, s, e,
             SUM(nw) OVER (PARTITION BY p ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM fl
    ),
    g AS (
      SELECT p, island, MIN(s) AS ist, MAX(e) AS ien, COUNT(*) AS ni
      FROM isl GROUP BY 1, 2
    ),
    cov AS (
      SELECT p, COUNT(*) AS n_islands,
             CAST(SUM(ien - ist) AS BIGINT) AS cov_days,
             CAST(SUM(ni) AS BIGINT) AS n_iv
      FROM g GROUP BY p
    )
    SELECT 'rj' AS kind, o_orderpriority, COUNT(*) AS n_lines,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 AS revenue,
           CAST(NULL AS BIGINT) AS n_islands, CAST(NULL AS BIGINT) AS cov_days,
           CAST(NULL AS BIGINT) AS n_iv
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate < o_orderdate + INTERVAL 30 DAY
    GROUP BY 2
    UNION ALL
    SELECT 'cov', p, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
           n_islands, cov_days, n_iv
    FROM cov
    """,
)
def q66_range_join(spark, sf_dir):
    from workbook_exporter_fe_spark.operators.interval import interval_union

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(
        o,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("interval 30 days")),
    )
    rj = j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        _isum(F.col("l_extendedprice"), "revenue"),
    ).select(
        F.lit("rj").alias("kind"),
        "o_orderpriority",
        "n_lines",
        "revenue",
        F.lit(None).cast("long").alias("n_islands"),
        F.lit(None).cast("long").alias("cov_days"),
        F.lit(None).cast("long").alias("n_iv"),
    )
    day0 = F.lit("1992-01-01").cast("date")
    iv = o.select(
        F.col("o_orderpriority").alias("p"),
        F.datediff("o_orderdate", day0).cast("long").alias("s"),
        (F.datediff("o_orderdate", day0) + 7).cast("long").alias("e"),
    )
    cov = (
        interval_union(iv, "s", "e", key="p", as_long=True)
        .groupBy("p")
        .agg(
            F.count("*").alias("n_islands"),
            F.sum(F.col("island_end") - F.col("island_start")).alias("cov_days"),
            F.sum("n_intervals").alias("n_iv"),
        )
        .select(
            F.lit("cov").alias("kind"),
            F.col("p").alias("o_orderpriority"),
            F.lit(None).cast("long").alias("n_lines"),
            F.lit(None).cast("double").alias("revenue"),
            "n_islands",
            "cov_days",
            "n_iv",
        )
    )
    return rj.unionByName(cov)


# Correlated subqueries through the SQL surface, union-tagged: Catalyst
# de-correlates the EXISTS into a left-semi join and the scalar subquery
# into a broadcast of the 1-row aggregate — plan shapes distinct from the
# explicit joins above.
@query(
    "q67_subqueries",
    """
    SELECT 'exists' AS variant, c_mktsegment AS grp, COUNT(*) AS cnt
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    UNION ALL
    SELECT 'scalar', p_brand, COUNT(*)
    FROM part
    WHERE p_retailprice > (SELECT SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) * 1.0
                              / (100.0 * COUNT(*)) FROM part)
    GROUP BY p_brand
    """,
)
def q67_subqueries(spark, sf_dir):
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    _t(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    return spark.sql(
        """
        SELECT 'exists' AS variant, c_mktsegment AS grp, COUNT(*) AS cnt
        FROM customer_v c
        WHERE EXISTS (SELECT 1 FROM orders_v o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
        UNION ALL
        SELECT 'scalar', p_brand, COUNT(*)
        FROM part_v
        WHERE p_retailprice > (SELECT SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) * 1.0
                              / (100.0 * COUNT(*)) FROM part_v)
        GROUP BY p_brand
        """
    )
