"""Z-order (Morton) clustering layout for multi-dimension scan pruning.

Parquet scans skip row groups whose column min/max stats exclude the
filter — but only if the physical layout makes those ranges NARROW. A
single-column sort (`repartitionByRange(source, event_ts)`, the layout the
tier bench uses) gives perfect pruning on the leading column and none on
the other; Z-ORDERING interleaves the bits of both dimensions so every
file/row-group covers a small rectangle in (source, time) space — filters
on EITHER dimension (or both) skip most of the data. This is the same
technique Delta's OPTIMIZE ZORDER BY and Iceberg's sort-order z-ordering
apply; here it is a pure-Column implementation (no per-row Python) for the
parquet fallback backend.

Scale notes: the z-value is ~10 narrow integer expressions per row inside
the scan stage; the write is one `repartitionByRange(zv)` (a range shuffle,
same cost class as any clustering rewrite) + `sortWithinPartitions(zv)` so
row groups inside each file stay rectangle-local too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPREAD_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(x: Column) -> Column:
    """Spread a 16-bit value's bits to even positions of a 32-bit value
    (classic Morton bit-twiddling, as Column ops)."""
    out = x.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_MASKS:
        out = (out.bitwiseOR(F.shiftleft(out, shift))).bitwiseAND(F.lit(mask))
    return out


def morton2(a: Column, b: Column) -> Column:
    """Interleave two 16-bit bucket ids into one 32-bit Morton code
    (a in even bits, b in odd bits)."""
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1))


def _bucket16(col: Column, lo: Column, hi: Column) -> Column:
    """Scale a numeric column into [0, 65535] given global lo/hi."""
    span = (hi - lo).cast("double")
    frac = F.when(span > 0, (col.cast("double") - lo.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    return F.least(F.floor(frac * 65536).cast("long"), F.lit(65535))


def zorder_value(
    df: DataFrame, cat_col: str, ts_col: str
) -> tuple[DataFrame, Column]:
    """Attach `_zv`: Morton code of (rank-binned category, scaled time
    bucket).

    The categorical dimension bins by SORTED RANK of the value, not by
    hash: parquet prunes `cat = x` via the file's min/max on the raw
    string, and only rank binning keeps those ranges tight (a hash bin
    scatters lexicographically-far values into the same file and widens
    every file's min/max to the full domain). The category list is a tiny
    distinct (low-cardinality by assumption — 64 sources here; up to
    65,536 supported) collected once; the time dimension scales linearly
    over its global [min, max] (two scalars, one tiny aggregate)."""
    lo, hi = df.agg(
        F.min(F.col(ts_col).cast("long")), F.max(F.col(ts_col).cast("long"))
    ).first()
    cats = sorted(r[0] for r in df.select(cat_col).distinct().collect())
    if len(cats) > 65536:
        raise ValueError(f"{cat_col}: {len(cats)} categories exceed 16-bit binning")
    scale = 65535 // max(len(cats) - 1, 1)
    cat_arr = F.array(*[F.lit(c) for c in cats])
    cat16 = (F.array_position(cat_arr, F.col(cat_col)) - 1) * scale
    t16 = _bucket16(F.col(ts_col).cast("long"), F.lit(lo), F.lit(hi))
    zv = morton2(cat16, t16)
    return df.withColumn("_zv", zv), zv


def write_zordered(
    df: DataFrame, path: str, cat_col: str, ts_col: str, n_files: int = 64
) -> None:
    """Write `df` z-ordered on (cat_col, ts_col): range-partitioned AND
    sorted by the Morton code, so both files and row groups cover small
    (category, time) rectangles."""
    with_zv, _ = zorder_value(df, cat_col, ts_col)
    (
        with_zv.repartitionByRange(n_files, "_zv")
        .sortWithinPartitions("_zv")
        .drop("_zv")
        .write.mode("overwrite")
        .parquet(path)
    )


# ------------------------------------------------- generalized N-column form
# zorder_value above is the specialized 2-dim (category, time) layout the
# event corpus uses (rank-binned category + linearly-scaled time).
# with_zvalue generalizes it for SnapshotTable.compact(zorder_by=...):
# any number of NUMERIC/timestamp columns, each rank-binned by EQUI-DEPTH
# quantile boundaries (one approxQuantile pass) so a skewed column cannot
# collapse its bits into one bucket the way linear min/max scaling does.

_Z_NUMERIC = {"int", "bigint", "smallint", "tinyint", "float", "double"}


def _as_double(df: DataFrame, col: str) -> Column:
    dt = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    if col not in dt:
        raise ValueError(f"unknown z-order column {col!r}")
    t = dt[col]
    if t.startswith("decimal") or t in _Z_NUMERIC:
        return F.col(col).cast("double")
    if t in ("timestamp", "timestamp_ntz", "date"):
        # TIMESTAMP_NTZ cannot cast straight to double — hop through
        # timestamp (sessions are UTC-pinned, so the hop is lossless)
        return F.col(col).cast("timestamp").cast("double")
    raise ValueError(
        f"z-order column {col!r} has type {t}; use numeric/timestamp "
        "columns (for string equality skipping use manifest blooms — "
        "snapshots.bloom_stats_for_files — or the 2-dim zorder_value)"
    )


def with_zvalue(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    relative_error: float = 1e-3,
    out: str = "__z",
) -> DataFrame:
    """``df`` plus a Morton-code column ``out`` interleaving ``cols``.

    One ``approxQuantile`` pass computes all columns' equi-depth bucket
    boundaries (the driver holds ``len(cols) * 2^bits`` doubles —
    metadata-sized). Bucketing is a small HOF fold over the boundary
    array; the per-row scalar referenced inside the lambda is a
    pre-materialized attribute (``__zd<i>``), not an expression, so
    CollapseProject inlining costs nothing per element (the
    operators/drift.py trap). NULLs land in bucket 0 — deterministic,
    clustered together. Bit interleave is round-robin (col0 bit0, col1
    bit0, col0 bit1, ...), the curve Delta OPTIMIZE ZORDER BY walks.
    """
    if not cols:
        raise ValueError("z-order needs at least one column")
    if not 1 <= bits * len(cols) <= 63:
        raise ValueError(
            f"{len(cols)} columns x {bits} bits per column must fit a long"
        )
    tmp_cols = [f"__zd{i}" for i in range(len(cols))]
    staged = df.select(
        "*", *[_as_double(df, c).alias(t) for c, t in zip(cols, tmp_cols)]
    )
    qs = [j / (1 << bits) for j in range(1, 1 << bits)]
    cuts = staged.stat.approxQuantile(tmp_cols, qs, relative_error)
    z = F.lit(0).cast("long")
    n = len(cols)
    for j, (tmp, bnds) in enumerate(zip(tmp_cols, cuts)):
        # dedup tied boundaries (heavy skew): fewer, still-sorted cuts
        uniq = sorted(set(b for b in bnds if b is not None))
        if not uniq:
            continue  # constant/all-null column contributes no bits
        val = F.col(tmp)
        bucket = F.aggregate(
            F.array(*[F.lit(float(b)) for b in uniq]),
            F.lit(0),
            lambda acc, x: acc + F.when(val > x, 1).otherwise(0),
        ).cast("long")
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(bucket, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return staged.withColumn(out, z).drop(*tmp_cols)
