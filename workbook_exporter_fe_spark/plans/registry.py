"""Query registry: (PySpark, DuckDB-oracle-SQL) pairs for the driver gate.

Every operator claimed in SURVEY.md §2 gets a named query here; the driver
runs the Spark side and the SQL side on the same parquet tables at sf0.01
and compares row-count + schema + order-insensitive value hash.

Determinism rules (so value hashes match bit-exactly):
- Sums over float columns are order-independent: columns with a known
  decimal scale use ``_isum`` (int64-scaled exact sum, whole-stage-codegen
  fast); general columns use ``_dsum`` (DECIMAL accumulate, rounded to 6dp
  BEFORE the double cast). Oracles mirror the exact same expression shape.
- Averages divide the exact sum by the exact count (identical doubles on
  both sides), then ``round(..., 6)``.
- Every computed column is aliased identically on both sides.
- Hash-dependent logic uses ``md5`` only (identical hex in Spark and DuckDB);
  never xxhash64/hash (engine-specific).
- Session timezone is pinned to UTC (timestamps in the test tables are NTZ).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dsum(col, alias: str, scale: int = 6):
    """Order-independent float sum: decimal-exact accumulate, double out.

    The sum is rounded to scale 6 BEFORE the double cast so the scaled
    integer stays < 2^53 — above that, DuckDB's decimal→double conversion
    is not correctly rounded and drifts a ULP from Spark's."""
    return F.round(F.sum(col.cast(f"decimal(28,{scale})")), 6).cast("double").alias(alias)


def _isum(col, alias: str, scale: int = 2):
    """Order-independent float sum via int64 — for columns with a KNOWN
    decimal scale. 2.2× faster than the decimal path (long sums stay in
    whole-stage codegen; decimal aggregation does not): round(x·10^s) is
    exact for s-decimal doubles, the int64 sum is associative, and
    int/10^s is one correctly-rounded division — bit-identical to the
    decimal path and to DuckDB's SUM(CAST(ROUND(x·10^s) AS BIGINT))/10^s.
    """
    f = 10 ** scale
    return (F.sum(F.round(col * f).cast("long")) / float(f)).alias(alias)


# =========================================================================
# Operator parity (SURVEY §2a) over the TPC-H-ish driver tables
# =========================================================================

# O1/O7/O20 — scan, projection (column pruning), grouped aggregation —
# plus O8 (null-coalescing default, listen-port default workbook_exporter-
# fe.py:200, :1679-1687) as the sum_eff_tax measure.
# Reference: full-CSV parse + in-memory filter (workbook_exporter-fe.py:1708);
# here the filter and the 7-column projection push into the parquet scan.
@query(
    "q01_scan_agg",
    """
    SELECT l_returnflag, l_linestatus,
           SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) / 10000.0 AS sum_disc,
           SUM(CAST(ROUND(COALESCE(NULLIF(l_tax, 0.0), 0.05) * 100) AS BIGINT)) / 100.0 AS sum_eff_tax,
           COUNT(*) AS cnt
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_scan_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    # int64-scaled exact sums (_isum): 2.2× faster than the decimal path,
    # bit-identical results — see _isum. The product term stays exact at
    # scale 4 (< 2^53), so the final division is correctly rounded in both
    # engines without a decimal detour.
    eff = F.coalesce(F.nullif(F.col("l_tax"), F.lit(0.0)), F.lit(0.05))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _isum(F.col("l_quantity"), "sum_qty"),
            _isum(F.col("l_extendedprice"), "sum_base"),
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("long")
                    * F.round((F.lit(1) - F.col("l_discount")) * 100).cast("long")
                )
                / 10000.0
            ).alias("sum_disc"),
            _isum(eff, "sum_eff_tax"),
            F.count("*").alias("cnt"),
        )
    )


# O4/O6 — equality + boolean-ish filters (filter_rows_by_exporter,
# workbook_exporter-fe.py:1691-1699; OR-filter :243) — plus O12 (concat
# probe keys f'{ip}:{port}', :282/:294) as the probe_key column.
@query(
    "q02_filter_or",
    """
    SELECT event_id, user_id, event_type, value,
           CAST(user_id AS VARCHAR) || ':' || CAST(event_id AS VARCHAR) AS probe_key
    FROM events
    WHERE event_type = 'error' OR value > 95.0 OR user_id = 7
    """,
)
def q02_filter_or(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.filter(
        (F.col("event_type") == "error") | (F.col("value") > 95.0) | (F.col("user_id") == 7)
    ).select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.concat_ws(":", F.col("user_id"), F.col("event_id")).alias("probe_key"),
    )


# Dimension joins with broadcast (engine addition; reference has no 2-table
# joins — SURVEY §2 "does NOT implement").
@query(
    "q03_join_dims",
    """
    SELECT r_name, n_name, COUNT(*) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q03_join_dims(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_orders"),
            _isum(F.col("o_totalprice"), "revenue"),
        )
    )


# O15 — anti-join vs existing state (ip_exists_in_yaml,
# workbook_exporter-fe.py:1741-1754) — set-based, not per-row.
@query(
    "q04_anti_join",
    """
    SELECT c_mktsegment, COUNT(*) AS n_lost,
           MIN(c_custkey) AS min_k, MAX(c_custkey) AS max_k
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    GROUP BY c_mktsegment
    """,
)
def q04_anti_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    from workbook_exporter_fe_spark.operators.merge import anti_join_state

    lost = anti_join_state(c, o.withColumnRenamed("o_custkey", "c_custkey"), ["c_custkey"])
    return lost.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_lost"),
        F.min("c_custkey").alias("min_k"),
        F.max("c_custkey").alias("max_k"),
    )


# O9/O10 — CASE/WHEN substring derive (exporter_acm host-type,
# workbook_exporter-fe.py:1006-1011) + conditional constant (:360).
@query(
    "q05_derive_case",
    """
    SELECT CASE WHEN lower(p_type) LIKE '%brass%' THEN 'brass'
                WHEN lower(p_type) LIKE '%steel%' THEN 'steel'
                ELSE 'other' END AS klass,
           CASE WHEN p_size > 25 THEN 8443 ELSE 443 END AS port,
           COUNT(*) AS cnt
    FROM part GROUP BY 1, 2
    """,
)
def q05_derive_case(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    klass = (
        F.when(F.lower("p_type").contains("brass"), "brass")
        .when(F.lower("p_type").contains("steel"), "steel")
        .otherwise("other")
    )
    port = F.when(F.col("p_size") > 25, 8443).otherwise(443)
    return p.select(klass.alias("klass"), port.alias("port")).groupBy(
        "klass", "port"
    ).agg(F.count("*").alias("cnt"))


# JSON field access (engine addition; sink-side YAML in the reference).
@query(
    "q07_json_extract",
    """
    SELECT event_type, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    """,
)
def q07_json_extract(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(F.sum(k).alias("sum_k"))


# O16 — dedup by key, last-write-wins (dict overwrite per hostname,
# workbook_exporter-fe.py:196-205) as row_number over a pinned order —
# plus O17 (hidden sequential counter / default_listen_port, :1664-1667)
# as a second row_number assigning ports over the deduped survivors.
# (O13 split+explode fan-out is gate-covered by q17 jmx_ports and q25.)
@query(
    "q09_dedup_lastwin",
    """
    SELECT source, lang, doc_id, n_chars,
           6000 + ROW_NUMBER() OVER (PARTITION BY source ORDER BY lang, doc_id) AS listen_port
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY source, lang ORDER BY doc_id DESC) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
)
def q09_dedup_lastwin(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source", "lang").orderBy(F.col("doc_id").desc())
    wp = Window.partitionBy("source").orderBy("lang", "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "source",
            "lang",
            "doc_id",
            "n_chars",
            (F.lit(6000) + F.row_number().over(wp)).alias("listen_port"),
        )
    )


# O18 + top-k — sort + limit per group (hostname sort :212 generalized).
@query(
    "q11_topk_per_group",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q11_topk_per_group(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


# O19 — merge-upsert: new rows win per key (write_yaml merge,
# workbook_exporter-fe.py:1758-1767), exercised through operators.merge.
# PLUS the state-diff CDC classification (sources/snapshots.py state_diff,
# the join row_diff time-travel audits run): each merged row is labelled
# insert / update_post / unchanged relative to the pre-merge state, via
# the REAL full-outer-join operator mirrored in the oracle.
@query(
    "q12_merge_upsert",
    """
    WITH existing AS (
      SELECT o_orderkey, o_totalprice AS price, 'old' AS origin
      FROM orders WHERE o_orderkey % 3 <> 0
    ), nu AS (
      SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(3,2)) AS DOUBLE) AS price, 'new' AS origin
      FROM orders WHERE o_orderkey % 2 = 0
    ), merged AS (
      SELECT * FROM nu
      UNION ALL
      SELECT e.* FROM existing e WHERE e.o_orderkey NOT IN (SELECT o_orderkey FROM nu)
    ), diff AS (
      SELECT COALESCE(m.o_orderkey, e.o_orderkey) AS k,
             CASE WHEN e.o_orderkey IS NULL THEN 'insert'
                  WHEN m.o_orderkey IS NULL THEN 'delete'
                  WHEN m.price IS DISTINCT FROM e.price
                       OR m.origin IS DISTINCT FROM e.origin THEN 'update_post'
             END AS op
      FROM merged m FULL OUTER JOIN existing e
        ON m.o_orderkey IS NOT DISTINCT FROM e.o_orderkey
    )
    SELECT m.*, COALESCE(d.op, 'unchanged') AS diff_op
    FROM merged m
    LEFT JOIN (SELECT k, op FROM diff WHERE op IS NOT NULL) d
      ON m.o_orderkey = d.k
    """,
)
def q12_merge_upsert(spark, sf_dir):
    from workbook_exporter_fe_spark.operators.merge import merge_upsert
    from workbook_exporter_fe_spark.sources.snapshots import state_diff

    o = _t(spark, sf_dir, "orders")
    existing = o.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", F.col("o_totalprice").alias("price"), F.lit("old").alias("origin")
    )
    new = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * F.lit(1.1).cast("decimal(3,2)"))
        .cast("double")
        .alias("price"),
        F.lit("new").alias("origin"),
    )
    merged = merge_upsert(existing, new, ["o_orderkey"])
    ops = state_diff(existing, merged, ["o_orderkey"]).select(
        "o_orderkey", F.col("_op").alias("diff_op")
    )
    return merged.join(ops, "o_orderkey", "left").withColumn(
        "diff_op", F.coalesce("diff_op", F.lit("unchanged"))
    )


# O14 — multi-branch fan-out: one row → N probe rows, each guarded
# (exporter_blackbox, workbook_exporter-fe.py:270-314).
@query(
    "q13_multibranch_union",
    """
    SELECT probe, COUNT(*) AS cnt,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS sum_v
    FROM (
      SELECT event_id, 'high_value' AS probe, value FROM events WHERE value > 90.0
      UNION ALL
      SELECT event_id, 'error' AS probe, value FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT event_id, 'vip_user' AS probe, value FROM events WHERE user_id % 10 = 0
    ) GROUP BY probe
    """,
)
def q13_multibranch_union(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    branches = [
        ev.filter(F.col("value") > 90.0).select(
            "event_id", F.lit("high_value").alias("probe"), "value"
        ),
        ev.filter(F.col("event_type") == "error").select(
            "event_id", F.lit("error").alias("probe"), "value"
        ),
        ev.filter(F.col("user_id") % 10 == 0).select(
            "event_id", F.lit("vip_user").alias("probe"), "value"
        ),
    ]
    fanned = branches[0].unionByName(branches[1]).unionByName(branches[2])
    return fanned.groupBy("probe").agg(
        F.count("*").alias("cnt"), _isum(F.col("value"), "sum_v")
    )


# O11 — SNMP v2/v3 credential branch producing different field sets
# (workbook_exporter-fe.py:140-147 et al.), flattened to nullable columns.
@query(
    "q14_cred_branch",
    """
    SELECT s_suppkey,
           CASE WHEN s_suppkey % 3 = 0 THEN s_name END AS username,
           CASE WHEN s_suppkey % 3 = 0 THEN 'sha' END AS auth_protocol,
           CASE WHEN s_suppkey % 3 = 0 THEN 'aes' END AS privacy_protocol,
           CASE WHEN s_suppkey % 3 <> 0 THEN 'ENC' END AS community
    FROM supplier
    """,
)
def q14_cred_branch(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    v3 = F.col("s_suppkey") % 3 == 0
    return s.select(
        "s_suppkey",
        F.when(v3, F.col("s_name")).alias("username"),
        F.when(v3, F.lit("sha")).alias("auth_protocol"),
        F.when(v3, F.lit("aes")).alias("privacy_protocol"),
        F.when(~v3, F.lit("ENC")).alias("community"),
    )
