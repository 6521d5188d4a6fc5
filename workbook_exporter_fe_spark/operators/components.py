"""Connected components over candidate-pair graphs (dedup clustering).

LSH/Jaccard/SimHash emit duplicate PAIRS (operators/dedup.py); an actual
dedup pass needs duplicate CLUSTERS — the transitive closure of the pair
graph — so exactly one canonical document survives per cluster even when
A~B and B~C but A!~C never co-occurred in a bucket. That closure is
connected components, the standard final stage of a corpus dedup
pipeline.

Algorithm: iterated label propagation to the minimum ("hash-to-min"
style). Every vertex starts labeled with itself; each round every vertex
takes the min label in its closed neighborhood; converged when no label
changes. Rounds needed ≤ graph diameter (near-dup clusters are shallow —
star-ish around popular docs — so a handful of rounds suffices; the cap
is a safety rail, convergence is checked exactly).

Scale design per round: one groupBy over the (undirected) edge relation
joined to current labels — shuffle keyed by vertex id, partial-aggregated
map-side. Labels and edges are (long/string, long/string) pairs; no
driver-side graph, no RDDs. The vertex's previous label rides through the
same aggregate (min over a null-for-neighbors column), so the convergence
check is a count over the already-checkpointed round result — one shuffle
per round total. localCheckpoint() truncates the lineage each
round so the plan doesn't grow exponentially with iterations — the
standard Spark idiom for iterative algorithms (GraphFrames does the
same).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, functions as F


class NotConvergedError(RuntimeError):
    """Label propagation exhausted max_iter with labels still changing."""


def connected_components(
    pairs: DataFrame,
    left_col: str = "id_a",
    right_col: str = "id_b",
    max_iter: int = 20,
    checkpoint: bool = True,
    on_nonconverged: str = "raise",
) -> DataFrame:
    """(id, component): component = min vertex id reachable from id.

    ``pairs`` is an edge list (direction irrelevant, self-loops/dups
    fine). Vertices only ever appearing alone are absent — union the full
    id universe downstream if singletons matter (`dedup_canonical` does).

    Propagation advances one hop per round, so a chain deeper than
    ``max_iter`` would otherwise return silently-split components (and a
    downstream dedup would keep several docs per true cluster). If the
    loop exits via ``max_iter`` with labels still changing, the result is
    TRUNCATED, not converged — ``on_nonconverged`` controls the reaction:
    'raise' (default, NotConvergedError), 'warn' (RuntimeWarning, return
    the partial labels), or 'ignore'.
    """
    if on_nonconverged not in ("raise", "warn", "ignore"):
        raise ValueError(on_nonconverged)
    sc = pairs.sparkSession.sparkContext

    def _pids() -> set:
        """ids of currently-persisted RDDs (localCheckpoint blocks)."""
        return set(sc._jsc.getPersistentRDDs().keySet().toArray())

    def _unpersist(ids: set) -> None:
        jmap = sc._jsc.getPersistentRDDs()
        for rid in ids:
            jr = jmap.get(rid)
            if jr is not None:
                jr.unpersist(False)

    edges = (
        pairs.select(F.col(left_col).alias("src"), F.col(right_col).alias("dst"))
        .unionByName(
            pairs.select(
                F.col(right_col).alias("src"), F.col(left_col).alias("dst")
            )
        )
        .distinct()
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    prev_ids: set = set()
    if checkpoint:
        edges = edges.localCheckpoint()
        pre = _pids()
        labels = labels.localCheckpoint()
        prev_ids = _pids() - pre

    changed = 0
    for _ in range(max_iter):
        # min label over the closed neighborhood of each vertex. The
        # vertex's own previous label rides along as `old` (neighbor rows
        # carry NULL, and min() ignores nulls), so the convergence count
        # reads straight off the aggregated — and checkpointed — relation:
        # ONE shuffle per round, no old-vs-new re-join.
        neighbor_labels = (
            edges.join(
                labels.withColumnRenamed("id", "dst"), "dst"
            )
            .select(
                F.col("src").alias("id"),
                "component",
                F.lit(None).cast(labels.schema["component"].dataType).alias("old"),
            )
        )
        own = labels.select("id", "component", F.col("component").alias("old"))
        new_labels = (
            own.unionByName(neighbor_labels)
            .groupBy("id")
            .agg(
                F.min("component").alias("component"),
                F.min("old").alias("old"),
            )
        )
        new_ids: set = set()
        if checkpoint:
            pre = _pids()
            new_labels = new_labels.localCheckpoint()
            new_ids = _pids() - pre
        changed = new_labels.filter(
            F.col("component") != F.col("old")
        ).count()
        labels = new_labels.drop("old")
        if checkpoint:
            # the new round is materialized (eager checkpoint + the count
            # above read it); the previous round's blocks are unreachable
            # from here on — free them, or long/iterative runs accumulate
            # one full label-table copy PER ROUND in the block store
            _unpersist(prev_ids)
            prev_ids = new_ids
        if changed == 0:
            break
    if changed != 0:
        msg = (
            f"connected_components did not converge in max_iter={max_iter} "
            f"rounds ({changed} labels still changing) — labels are a "
            "truncated, possibly split, clustering"
        )
        if on_nonconverged == "raise":
            raise NotConvergedError(msg)
        if on_nonconverged == "warn":
            warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels


def dedup_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    left_col: str = "id_a",
    right_col: str = "id_b",
) -> DataFrame:
    """Rows of ``docs`` that survive near-dup clustering: one per
    component (the min id), plus every doc not in any pair (singletons).

    The components relation is cluster-membership-sized (docs that
    appeared in ≥1 candidate pair), usually a small fraction of the
    corpus — broadcast into the left-side join when small."""
    comp = connected_components(pairs, left_col, right_col)
    keep_clustered = comp.filter(F.col("id") == F.col("component")).select(
        F.col("id").alias(id_col)
    )
    in_graph = comp.select(F.col("id").alias(id_col))
    singletons = docs.select(id_col).join(in_graph, id_col, "left_anti")
    keep = keep_clustered.unionByName(singletons)
    return docs.join(keep, id_col, "leftsemi")
