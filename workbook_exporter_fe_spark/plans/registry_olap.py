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


@query(
    "q40_cube",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
           SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q40_cube(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"), _isum(F.col("l_quantity"), "sum_qty")
    )


@query(
    "q41_rollup",
    """
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
    FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def q41_rollup(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(F.count("*").alias("cnt"))


@query(
    "q42_grouping_sets",
    """
    SELECT event_type, user_id % 10 AS cohort, COUNT(*) AS cnt
    FROM events GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
    """,
)
def q42_grouping_sets(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_gs")
    return spark.sql(
        """
        SELECT event_type, user_id % 10 AS cohort, COUNT(*) AS cnt
        FROM events_gs GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        """
    )


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


@query(
    "q44_pivot",
    """
    SELECT user_id % 5 AS cohort,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error
    FROM events GROUP BY 1
    """,
)
def q44_pivot(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = (
        ev.withColumn("cohort", F.col("user_id") % 5)
        .groupBy("cohort")
        .pivot("event_type", ["click", "view", "purchase", "error"])
        .count()
    )
    # pivot yields nulls for empty cells; oracle's FILTER yields 0
    return out.select(
        "cohort",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ["click", "view", "purchase", "error"]],
    )


@query(
    "q45_unpivot",
    """
    SELECT c_custkey, f.metric, f.val
    FROM customer, LATERAL (VALUES
      ('acctbal', c_acctbal),
      ('nationkey', CAST(c_nationkey AS DOUBLE))) AS f(metric, val)
    """,
)
def q45_unpivot(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.selectExpr(
        "c_custkey",
        "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, val)",
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


@query(
    "q48_percentiles",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.95), 6) AS p95,
           MIN(value) AS lo, MAX(value) AS hi
    FROM events GROUP BY event_type
    """,
)
def q48_percentiles(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


# Approximate sketches: engine-specific internals (HLL/KLL vs t-digest), so
# no cross-engine oracle is possible — the EXACT counterparts are oracled in
# q48/q03; this entry is rows-only and exists to exercise the sketch path.
@query("q49_approx_sketches")
def q49_approx_sketches(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.percentile_approx("value", 0.5).alias("approx_p50"),
    )


@query(
    "q50_datetime_math",
    """
    SELECT extract(isodow FROM ts) AS dow, extract(hour FROM ts) AS hour,
           COUNT(*) AS cnt,
           ROUND(CAST(SUM(CAST(sqrt(abs(value)) + ln(1 + abs(value)) AS DECIMAL(28,6))) AS DOUBLE), 6) AS math_sum
    FROM events GROUP BY 1, 2
    """,
)
def q50_datetime_math(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    expr = (F.sqrt(F.abs("value")) + F.log(F.lit(1) + F.abs("value"))).cast(
        "decimal(28,6)"
    )
    return ev.groupBy(
        (F.weekday("ts") + 1).cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hour"),
    ).agg(
        F.count("*").alias("cnt"),
        F.round(F.sum(expr), 6).cast("double").alias("math_sum"),
    )


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

@query(
    "q57_array_funcs",
    """
    SELECT doc_id,
           len(ws) AS n_words,
           list_sort(list_distinct(ws)) AS distinct_sorted,
           len(list_filter(ws, x -> length(x) > 6)) AS n_long,
           list_sort(ws)[1:3] AS first3
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    """,
)
def q57_array_funcs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(ws).alias("n_words"),
        F.array_sort(F.array_distinct(ws)).alias("distinct_sorted"),
        F.size(F.filter(ws, lambda x: F.length(x) > 6)).alias("n_long"),
        F.slice(F.array_sort(ws), 1, 3).alias("first3"),
    )


@query(
    "q58_string_funcs",
    """
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lpad(p_brand, 12, '*') AS brand_pad,
           translate(p_type, 'AEIOU', 'aeiou') AS type_tr,
           levenshtein(p_brand, 'Brand#13') AS brand_dist,
           split_part(p_type, ' ', 2) AS type_mid,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word
    FROM part
    """,
)
def q58_string_funcs(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.translate("p_type", "AEIOU", "aeiou").alias("type_tr"),
        F.levenshtein("p_brand", F.lit("Brand#13")).alias("brand_dist"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(2)).alias("type_mid"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
    )


@query(
    "q59_null_semantics",
    """
    SELECT coalesce(nullif(event_type, 'view'), 'other') AS et,
           COUNT(*) AS cnt,
           COUNT(nullif(user_id, 7)) AS cnt_nonnull,
           CAST(COUNT(DISTINCT nullif(user_id, 7)) AS BIGINT) AS distinct_nonnull
    FROM events GROUP BY 1
    """,
)
def q59_null_semantics(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    nn = F.expr("nullif(user_id, 7)")
    return ev.groupBy(
        F.coalesce(F.expr("nullif(event_type, 'view')"), F.lit("other")).alias("et")
    ).agg(
        F.count("*").alias("cnt"),
        F.count(nn).alias("cnt_nonnull"),
        F.countDistinct(nn).alias("distinct_nonnull"),
    )


# Range join: equi key + time-range predicate (ship within 30 days of the
# order date) — the join shape between pure equi (q03) and as-of (q47).
# The equi key keeps it a hash join with the range as residual; a pure
# range-only join would need a broadcast range join / binning strategy.
@query(
    "q66_range_join",
    """
    SELECT o_orderpriority, COUNT(*) AS n_lines,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate < o_orderdate + INTERVAL 30 DAY
    GROUP BY 1
    """,
)
def q66_range_join(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(
        o,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("interval 30 days")),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lines"),
        _isum(F.col("l_extendedprice"), "revenue"),
    )


# Correlated subqueries through the SQL surface: Catalyst de-correlates
# EXISTS into a left-semi join and a scalar subquery into a broadcast of
# the 1-row aggregate — plan shapes distinct from the explicit joins above.
@query(
    "q67_exists_semijoin",
    """
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
)
def q67_exists_semijoin(spark, sf_dir):
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM customer_v c
        WHERE EXISTS (SELECT 1 FROM orders_v o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
        """
    )


@query(
    "q68_scalar_subquery",
    """
    SELECT p_brand, COUNT(*) AS n_above
    FROM part
    WHERE p_retailprice > (SELECT SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) * 1.0
                              / (100.0 * COUNT(*)) FROM part)
    GROUP BY p_brand
    """,
)
def q68_scalar_subquery(spark, sf_dir):
    _t(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    return spark.sql(
        """
        SELECT p_brand, COUNT(*) AS n_above
        FROM part_v
        WHERE p_retailprice > (SELECT SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) * 1.0
                              / (100.0 * COUNT(*)) FROM part_v)
        GROUP BY p_brand
        """
    )
