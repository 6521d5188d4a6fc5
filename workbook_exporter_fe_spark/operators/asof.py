"""General as-of join: pandas ``merge_asof`` semantics, shuffle-lean.

Spark has no native as-of join; the naive formulation (range join + window
per left row) shuffles |L|·|matching window| rows. This operator uses the
union + running-window trick (the same shape the gate's q47 pins): tag
both inputs, union them into ONE relation, sort per key by (ts, side), and
carry the last (backward) or next (forward) right-side value onto each
left row with a running ``last(ignorenulls)`` frame — one shuffle on the
``by`` key, O(n log n) in the partition sort, no pair materialization.

Semantics match ``pandas.merge_asof(left, right, on=ts, by=key,
direction=..., tolerance=...)`` (pinned by tests against pandas itself):
backward takes the latest right row with ``r.ts <= l.ts``, forward the
earliest with ``r.ts >= l.ts``; ``tolerance`` (seconds) bounds the match
distance; unmatched left rows keep NULLs.

Scale notes: partitions by the ``by`` key — skew on a hot key is the same
skew the tier rollup handles (AQE skew split; or segment the window per
(key, time-slice) exactly like gapfill's segmented variants). The right
columns ride through the union as extra nullable fields, so the shuffled
width is left ∪ right — project before joining.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "event_ts",
    by: str = "source",
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_sec: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """As-of join `left` with `right` per ``by`` key along ``on`` time.

    Returns all left rows + for each ``value_cols`` column a
    ``<col><suffix>`` column from the as-of matched right row (NULL when
    no match / outside tolerance).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, by)
    ]

    lcols = left.columns
    tagged_l = left.select(
        *lcols,
        F.lit(1).alias("_is_left"),
        F.lit(None).cast("long").alias("_r_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    tagged_r = right.select(
        *[
            F.col(c).alias(c) if c in (on, by) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_is_left"),
        F.col(on).cast("timestamp").cast("long").alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    both = tagged_l.unionByName(tagged_r)

    # backward: right rows sort BEFORE a left row at the same ts (<=);
    # forward: scan descending, right rows still first at equal ts (>=)
    if direction == "backward":
        w = Window.partitionBy(by).orderBy(F.col(on).asc(), F.col("_is_left").asc())
    else:
        w = Window.partitionBy(by).orderBy(F.col(on).desc(), F.col("_is_left").asc())
    run = w.rowsBetween(Window.unboundedPreceding, 0)

    filled = both.withColumn("_m_ts", F.last("_r_ts", ignorenulls=True).over(run))
    for c in value_cols:
        filled = filled.withColumn(f"_m_{c}", F.last(f"_r_{c}", ignorenulls=True).over(run))

    out = filled.filter(F.col("_is_left") == 1)
    if tolerance_sec is not None:
        l_ts = F.col(on).cast("timestamp").cast("long")
        dist = (
            (l_ts - F.col("_m_ts"))
            if direction == "backward"
            else (F.col("_m_ts") - l_ts)
        )
        in_tol = F.col("_m_ts").isNotNull() & (dist <= tolerance_sec)
        for c in value_cols:
            out = out.withColumn(f"_m_{c}", F.when(in_tol, F.col(f"_m_{c}")))
    return out.select(
        *lcols, *[F.col(f"_m_{c}").alias(f"{c}{suffix}") for c in value_cols]
    )
