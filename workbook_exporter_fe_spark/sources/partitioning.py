"""Iceberg-style hidden partitioning for the snapshot log.

The reference engine (a per-row CSV/Excel→YAML converter,
workbook_exporter-fe.py) has no table layout at all; this module
re-expresses the public Iceberg *partition spec* idea for the
from-scratch SnapshotTable (sources/snapshots.py): a table PROPERTY
declares transforms over source columns —

    partition.spec = ["day(event_ts)", "bucket(16, doc_id)", "source"]

and every commit through the table fans its data out one directory per
partition TUPLE, recording the tuple in the manifest file entry. The
partitioning is *hidden*: the derived values never appear in the data
files or the read schema — readers filter on the SOURCE columns
(``ts between ...``, ``doc_id = ...``) and the planner converts those
predicates through the transforms to skip whole files, exactly like
Iceberg's scan planning. Partition evolution is free the same way it is
in Iceberg: the spec is write-configuration, old files simply carry no
tuple (or an older tuple) and never partition-prune — the superset
guard keeps them until rewritten.

Transforms (names follow the public Iceberg spec):

- ``identity(col)`` / bare ``col`` — the value itself
- ``day(col)`` / ``hour(col)`` / ``month(col)`` — calendar buckets of a
  timestamp/date column, canonicalized to zero-padded strings
  (``yyyy-MM-dd`` / ``yyyy-MM-dd-HH`` / ``yyyy-MM``) so LEXICAL order is
  chronological order and range pruning is a string compare
- ``bucket(N, col)`` — md5-slice hash mod N (md5, not murmur3/xxhash64:
  it is this repo's one cross-engine hash, so the driver-side probe in
  pure Python recomputes the Spark-side value bit-exactly — same
  discipline as the manifest blooms). Equality pruning only.
- ``truncate(W, col)`` — first W chars of a string, or ``W``-wide
  integer bins (``floor(v / W) * W``). Monotone, so range pruning works.

Why this matters at 100 TB: min/max stats prune only when the layout
clusters the column, and blooms serve only equality. A partition spec
makes the WRITE path produce the clustered layout (one shuffle per
commit, Iceberg's ``write.distribution-mode=hash``), gives the planner
file skipping that needs no stats at all, and makes retention a
metadata-only operation — ``SnapshotTable.drop_partitions`` deletes a
day of data by publishing a manifest that omits its files, touching
zero bytes of parquet.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass
from datetime import date, datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: manifest value for "the source column was NULL for every row"
NULL_PARTITION = None

#: prefix for the transient write-side columns (stripped by partitionBy)
PCOL_PREFIX = "__p_"

_SPEC_RE = re.compile(
    r"^\s*(?:(?P<fn>identity|day|hour|month|bucket|truncate)\s*\(\s*"
    r"(?:(?P<param>\d+)\s*,\s*)?(?P<col>[A-Za-z_][A-Za-z0-9_]*)\s*\)"
    r"|(?P<bare>[A-Za-z_][A-Za-z0-9_]*))\s*$"
)

_FMT = {"day": "yyyy-MM-dd", "hour": "yyyy-MM-dd-HH", "month": "yyyy-MM"}
_PYFMT = {"day": "%Y-%m-%d", "hour": "%Y-%m-%d-%H", "month": "%Y-%m"}

#: transforms whose canonical form preserves source order (range-prunable)
ORDERED_TRANSFORMS = {"identity", "day", "hour", "month", "truncate"}


@dataclass(frozen=True)
class PartitionField:
    """One spec entry: ``name`` keys the manifest tuple and the
    partition directory (``__p_<name>=<value>``)."""

    name: str
    transform: str
    param: int | None
    source: str


def parse_spec(spec: list[str]) -> list[PartitionField]:
    """``["day(ts)", "bucket(16, doc_id)", "source"]`` → fields. Names
    are derived (``ts_day``, ``doc_id_bucket16``, ``source``) and must
    be unique — two transforms of one column are allowed (e.g. day +
    hour) because the names differ."""
    fields: list[PartitionField] = []
    for raw in spec or []:
        m = _SPEC_RE.match(raw)
        if not m:
            raise ValueError(f"unparseable partition transform: {raw!r}")
        if m.group("bare"):
            fn, param, col = "identity", None, m.group("bare")
        else:
            fn = m.group("fn")
            param = m.group("param")
            col = m.group("col")
            if fn in ("bucket", "truncate"):
                if param is None:
                    raise ValueError(f"{fn}() needs a numeric first arg: {raw!r}")
                param = int(param)
                if param <= 0:
                    raise ValueError(f"{fn}() arg must be positive: {raw!r}")
            elif param is not None:
                raise ValueError(f"{fn}() takes one column only: {raw!r}")
        name = (
            col
            if fn == "identity"
            else f"{col}_{fn}{param if param is not None else ''}"
        )
        fields.append(PartitionField(name, fn, param, col))
    seen: set[str] = set()
    for f in fields:
        if f.name in seen:
            raise ValueError(f"duplicate partition field name {f.name!r}")
        seen.add(f.name)
    return fields


def _md5_bucket(canon: str, n: int) -> int:
    return int(hashlib.md5(canon.encode("utf-8")).hexdigest()[:8], 16) % n


def partition_expr(field: PartitionField, df: DataFrame) -> Column:
    """The Spark-side derived column. Its CAST-AS-STRING form (what the
    partition directory name carries) must equal ``partition_value``'s
    output on the same raw value — the pair is pinned by
    tests/test_partitioning.py's twin sweep."""
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    if field.source not in types:
        raise ValueError(f"partition source column {field.source!r} missing")
    t = types[field.source]
    c = F.col(field.source)
    if field.transform == "identity":
        return c
    if field.transform in _FMT:
        if t not in ("timestamp", "timestamp_ntz", "date", "string"):
            raise ValueError(
                f"{field.transform}() needs a timestamp/date column, "
                f"{field.source!r} is {t}"
            )
        # TIMESTAMP_NTZ cannot cast straight to double but CAN cast to
        # timestamp (sessions are UTC-pinned, so the hop is lossless)
        return F.date_format(c.cast("timestamp"), _FMT[field.transform])
    if field.transform == "bucket":
        if t not in ("string", "int", "bigint", "smallint", "tinyint"):
            raise ValueError(
                f"bucket() needs a string/integer column (portable "
                f"CAST-AS-STRING), {field.source!r} is {t}"
            )
        return (
            F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
            .cast("long")
            % F.lit(field.param)
        )
    if field.transform == "truncate":
        if t == "string":
            return F.substring(c, 1, field.param)
        if t in ("int", "bigint", "smallint", "tinyint"):
            return (F.floor(c / F.lit(field.param)) * field.param).cast("long")
        raise ValueError(
            f"truncate() needs a string/integer column, {field.source!r} is {t}"
        )
    raise ValueError(field.transform)  # pragma: no cover


def partition_columns(df: DataFrame, fields: list[PartitionField]) -> list[Column]:
    return [
        partition_expr(f, df).alias(PCOL_PREFIX + f.name) for f in fields
    ]


def _canon_dt(value, fmt: str) -> str | None:
    """Canonical calendar-bucket string for a PREDICATE value: datetime,
    date, or an ISO-ish string. None = unprobeable (keep the file)."""
    if isinstance(value, datetime):
        return value.strftime(fmt)
    if isinstance(value, date):
        return datetime(value.year, value.month, value.day).strftime(fmt)
    if isinstance(value, str):
        v = value.replace("T", " ")
        for pat in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S",
                    "%Y-%m-%d %H:%M", "%Y-%m-%d %H", "%Y-%m-%d"):
            try:
                return datetime.strptime(v, pat).strftime(fmt)
            except ValueError:
                continue
    return None


def partition_value(field: PartitionField, value):
    """Python twin of ``partition_expr`` on one raw predicate value:
    the canonical manifest/dir-name form, or None when the value's type
    can't be canonicalized portably (caller must keep the file)."""
    if value is None or isinstance(value, bool):
        return None
    if field.transform == "identity":
        return str(value) if isinstance(value, (str, int)) else None
    if field.transform in _PYFMT:
        return _canon_dt(value, _PYFMT[field.transform])
    if field.transform == "bucket":
        if isinstance(value, (str, int)):
            return str(_md5_bucket(str(value), field.param))
        return None
    if field.transform == "truncate":
        if isinstance(value, str):
            return value[: field.param]
        if isinstance(value, int):
            return str((value // field.param) * field.param)
        return None
    return None  # pragma: no cover


def _as_domain(field: PartitionField, stored: str, probe: str):
    """Comparable (stored, probe) pair in the transform's ordered
    domain: integer transforms compare numerically, calendar/string
    transforms lexically (their canonical form is zero-padded)."""
    if field.transform == "truncate" and not stored.lstrip("-").isdigit():
        return stored, probe  # string truncate: prefix order
    if field.transform in ("identity", "truncate"):
        try:
            return int(stored), int(probe)
        except ValueError:
            return stored, probe
    return stored, probe


def file_survives_partition(
    fp: dict | None,
    fields: list[PartitionField],
    col_eq: dict | None,
    col_between: dict | None,
) -> bool:
    """Partition pruning for one manifest file entry. ``fp`` is the
    recorded tuple ({field name: canonical string | None}); files
    predating the spec (no tuple / missing field) always survive —
    same superset-guard contract as stats and blooms. A NULL partition
    value proves every row's source column is null, and neither
    equality nor BETWEEN matches null, so such files prune on ANY
    probe of that field."""
    if not fields or fp is None:
        return True
    by_source: dict[str, list[PartitionField]] = {}
    for f in fields:
        by_source.setdefault(f.source, []).append(f)
    for col, value in (col_eq or {}).items():
        for f in by_source.get(col, []):
            if f.name not in fp:
                continue
            stored = fp[f.name]
            if stored is NULL_PARTITION:
                return False
            probe = partition_value(f, value)
            if probe is not None and stored != probe:
                return False
    for col, (lo, hi) in (col_between or {}).items():
        for f in by_source.get(col, []):
            if f.transform not in ORDERED_TRANSFORMS or f.name not in fp:
                continue
            stored = fp[f.name]
            if stored is NULL_PARTITION:
                return False
            try:
                if lo is not None:
                    plo = partition_value(f, lo)
                    if plo is not None:
                        s, p = _as_domain(f, stored, plo)
                        if s < p:
                            return False
                if hi is not None:
                    phi = partition_value(f, hi)
                    if phi is not None:
                        s, p = _as_domain(f, stored, phi)
                        if s > p:
                            return False
            except TypeError:
                continue  # incomparable: keep the file
    return True
