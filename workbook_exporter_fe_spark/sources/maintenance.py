"""Metadata-only table health + policy-driven auto-maintenance.

The snapshot log's merge-on-read features (position vectors, equality
deletes, micro-batch appends) deliberately defer physical work to
maintenance: deletes cost kilobytes NOW because a compaction pays the
rewrite LATER, on a schedule. At 100 TB "later" must be decided by a
policy over metadata, not by a human reading directory listings — this
module is that policy seam:

- ``table_health`` reads ONE manifest (plus the metadata dir listing)
  and answers the operational questions: small-file buildup, masked-row
  fraction (position deletes), outstanding equality-delete entries and
  their read-tax (anti-joins per scan), snapshot count vs retention.
  Zero data files are opened — the same metadata-only discipline as
  stats pruning and ``column_ndv``.
- ``auto_maintain`` applies a threshold policy: compact when small
  files or delete masks cross their ratios (one rewrite materializes
  every mask and retires the entries — the standard MoR lifecycle),
  then expire + orphan-scan when a retention window is set. Every
  action is the table's own crash-safe primitive; the report says what
  ran and why, so a scheduler's log IS the audit trail.

CLI: ``run_maintenance --snapshot-table X --auto`` (thresholds
overridable; see --help).

Iceberg's analogue is the maintenance action suite (rewrite_data_files,
expire_snapshots, remove_orphan_files) that operators schedule by
table-metrics dashboards; here the trigger policy is in-engine and
testable.
"""

from __future__ import annotations

import os

from workbook_exporter_fe_spark.sources.snapshots import (
    SnapshotTable,
    dv_rows_by_file,
    live_rows_map,
    path_dseq,
)


def table_health(table: SnapshotTable) -> dict:
    """Operational metrics for one snapshot table, metadata-only."""
    seq = table.current_sequence()
    if seq == 0:
        return {"sequence": 0, "files": 0, "empty": True}
    m = table.snapshot()
    files = m["files"]
    total_bytes = sum(f["bytes"] for f in files)
    rows_footer = sum(f["rows"] for f in files)
    masked_rows = sum(dv_rows_by_file(m).values())
    live_rows = sum(live_rows_map(m).values())
    eq_entries = [d for d in m.get("deletes") or [] if "eq_cols" in d]
    pos_entries = [d for d in m.get("deletes") or [] if "eq_cols" not in d]
    # main-chain snapshot count (parent walk, like expire_snapshots)
    chain = 0
    s = seq
    while s > 0 and os.path.exists(table._manifest_path(s)):
        chain += 1
        s = int(table._load(s)["parent"])
    return {
        "sequence": seq,
        "files": len(files),
        "bytes": total_bytes,
        "avg_file_bytes": total_bytes // max(1, len(files)),
        "rows_footer": rows_footer,
        "live_rows_upper_bound": live_rows,
        "masked_rows": masked_rows,
        "masked_fraction": masked_rows / max(1, rows_footer),
        "position_delete_entries": len(pos_entries),
        "eq_delete_entries": len(eq_entries),
        "eq_delete_keys": sum(int(d.get("rows") or 0) for d in eq_entries),
        "snapshots_on_main": chain,
    }


def auto_maintain(
    table: SnapshotTable,
    target_file_bytes: int = 128 << 20,
    small_file_ratio: float = 0.5,
    masked_fraction: float = 0.05,
    max_delete_entries: int = 8,
    keep_last: int | None = None,
    orphan_grace_sec: float = 3600.0,
) -> dict:
    """Threshold policy over ``table_health``; returns the actions taken.

    Compaction triggers when ANY of:
    - > ``small_file_ratio`` of the files are smaller than half the
      target size (micro-batch buildup — footer planning cost grows),
    - the position-masked row fraction exceeds ``masked_fraction``
      (every scan is paying the anti-join for rows that could be gone),
    - outstanding delete entries (position + equality) exceed
      ``max_delete_entries`` (per-scan join count — equality entries
      merge per key set at read time, but retiring them is still the
      only way to stop paying).

    The rewrite is SCOPED to the files carrying the debt (Iceberg's
    bin-pack strategy picking its own input files): small files,
    position-masked files, and — only when the entry threshold tripped —
    files an equality delete applies to. Already-compacted clean files
    carry into the child manifest by reference; at 100 TB the compaction
    cost tracks the debt, never the table. (Retiring an equality entry
    inherently means rewriting every file it could mask — that is the
    MoR contract; the threshold decides when that price is paid.)

    ``keep_last`` additionally expires old snapshots and orphan-scans
    (time travel shrinks to the kept window — an explicit retention
    decision, so it is opt-in, never a default)."""
    health = table_health(table)
    report: dict = {"health": health, "actions": []}
    if health.get("empty"):
        return report
    m = table.snapshot()
    small = {
        f["path"] for f in m["files"] if f["bytes"] < target_file_bytes // 2
    }
    masked = set(dv_rows_by_file(m))
    eq_anchors = [
        int(d["seq"])
        for d in m.get("deletes") or []
        if "eq_cols" in d
    ]
    eq_applicable = (
        {
            f["path"]
            for f in m["files"]
            if path_dseq(f["path"]) <= max(eq_anchors)
        }
        if eq_anchors
        else set()
    )
    entries = (
        health["position_delete_entries"] + health["eq_delete_entries"]
    )
    reasons = []
    scope: set[str] = set()
    if len(small) / max(1, health["files"]) > small_file_ratio and (
        health["files"] > 1
    ):
        reasons.append(
            f"small_files {len(small)}/{health['files']} "
            f"(> {small_file_ratio:.0%} under {target_file_bytes // 2} B)"
        )
        scope |= small
    if health["masked_fraction"] > masked_fraction:
        reasons.append(
            f"masked_fraction {health['masked_fraction']:.3f} "
            f"(> {masked_fraction})"
        )
        scope |= masked
    if entries > max_delete_entries:
        reasons.append(
            f"delete_entries {entries} (> {max_delete_entries})"
        )
        # position-masked files must be rewritten to retire their
        # vectors; eq entries additionally need every applicable file
        scope |= masked | eq_applicable
    if reasons:
        before = table.current_sequence()
        after = table.compact(
            target_file_bytes=target_file_bytes,
            scope_paths=sorted(scope),
        )
        report["actions"].append({
            "action": "compact", "reasons": reasons,
            "files_in_scope": len(scope),
            "files_carried_clean": health["files"] - len(scope),
            "sequence": after, "ran": after != before,
        })
    if keep_last is not None:
        exp = table.expire_snapshots(keep_last=keep_last)
        orph = table.remove_orphan_files(grace_sec=orphan_grace_sec)
        report["actions"].append({
            "action": "expire+orphans", "keep_last": keep_last,
            **exp, **orph,
        })
    report["health_after"] = table_health(table)
    return report
