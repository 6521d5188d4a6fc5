"""Explicit skew-salted shuffle join: the hot-key escape hatch.

AQE's skew-join split (on in this engine's session factory, observed at
runtime in tests/test_plans.py) rescues most skew by splitting oversized
partitions — but it only balances the SHUFFLE READ of one join side. When
one join key carries a large share of the left table (the engine's
Zipf-hot `src-00` is ~30% of rows by design) and the right side is too
big to broadcast, the classic fix is explicit salting: split the hot
key's left rows across B sub-keys and replicate the right side's hot-key
rows B times, so the hot key becomes B tractable keys. This module makes
that a library operator instead of a hand-rolled pattern.

Same aggregate-side trick as tiers.rollup_tier1(salt_buckets=...); this
is the JOIN-side counterpart (SURVEY §7 milestone 5 / north-rule "skew
handled explicitly").

Scale notes:
- Replication cost is B × (right rows whose key is hot) — pass
  ``skewed_keys`` so cold keys join unreplicated; find hot keys with
  ``top_keys_by_count`` (a decomposable count aggregate, cheap).
- The left-side salt derives from xxhash64 of caller-named columns, so
  the plan is deterministic and repartition-stable (never
  spark_partition_id, which changes with layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_keys_by_count(df: DataFrame, keys: list[str], min_share: float = 0.05) -> list:
    """Key tuples holding ≥ min_share of rows (the salting candidates)."""
    total = df.count()
    rows = (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= total * min_share)
        .collect()
    )
    return [tuple(r[k] for k in keys) for r in rows]


def _key_filter(keys: list[str], key_tuples: list) -> F.Column:
    cond = F.lit(False)
    for kt in key_tuples:
        match = F.lit(True)
        for k, v in zip(keys, kt):
            match = match & (F.col(k) == F.lit(v))
        cond = cond | match
    # NULL keys must land in the cold branch (not vanish from both:
    # NULL == v is NULL, and filter(NULL) drops on BOTH ~/plain sides)
    return F.coalesce(cond, F.lit(False))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    salt_buckets: int = 8,
    salt_on: list[str] | None = None,
    skewed_keys: list | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot keys split across ``salt_buckets`` sub-keys.

    ``salt_on``: left columns whose xxhash64 spreads the hot key's rows
    (default: all non-key left columns). ``skewed_keys``: key tuples to
    salt (None → salt every key; fine when the right side is small
    relative to B× replication). Result rows are identical to the plain
    join — pinned by tests; only the shuffle layout changes."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt_on = salt_on or [c for c in left.columns if c not in keys]
    if not salt_on:
        raise ValueError("need at least one non-key left column to salt on")
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_on]), F.lit(salt_buckets))
    replicate = F.explode(
        F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<bigint>")
    )

    if skewed_keys is None:
        l_hot = left.withColumn("_salt", lsalt)
        r_hot = right.withColumn("_salt", replicate)
        return l_hot.join(r_hot, [*keys, "_salt"], how).drop("_salt")

    hot_cond = _key_filter(keys, skewed_keys)
    l_hot = left.filter(hot_cond).withColumn("_salt", lsalt)
    r_hot = right.filter(hot_cond).withColumn("_salt", replicate)
    hot = l_hot.join(r_hot, [*keys, "_salt"], how).drop("_salt")
    cold = left.filter(~hot_cond).join(right.filter(~hot_cond), keys, how)
    return hot.unionByName(cold)
