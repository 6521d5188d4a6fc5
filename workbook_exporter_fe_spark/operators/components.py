"""Connected components over candidate-pair graphs (dedup clustering).

LSH/Jaccard/SimHash emit duplicate PAIRS (operators/dedup.py); an actual
dedup pass needs duplicate CLUSTERS — the transitive closure of the pair
graph — so exactly one canonical document survives per cluster even when
A~B and B~C but A!~C never co-occurred in a bucket. That closure is
connected components, the standard final stage of a corpus dedup
pipeline.

Algorithm: frontier (delta) min-label propagation — GraphX Pregel's
active-set semantics expressed in DataFrames. Every vertex starts
labeled with itself; each round only vertices whose label CHANGED last
round re-post their label to their neighbors (labels are monotone
non-increasing and min is idempotent, so posts from unchanged vertices
are information-free: their neighbors already folded them in). Converged
when no label changes; rounds needed ≤ graph diameter (near-dup clusters
are shallow — star-ish around popular docs — so a handful of rounds
suffices; the cap is a safety rail, convergence is checked exactly).

Scale design — the EDGE relation (the big side) never moves after init;
per round only frontier-sized and label-sized rows cross the wire:
- the (undirected, optionally deduped — see ``dedupe_edges``) edge
  relation is hash-partitioned by ``dst`` ONCE and persisted. Cached plans pin their output partitioning
  (`spark.sql.optimizer.canChangeCachedPlanOutputPartitioning` defaults
  false), so every round's edge⋈frontier ShuffledHashJoin probes the
  cached partitions in place — the only exchange feeding it is the
  (geometrically shrinking) frontier being hashed to ``dst``;
- posts are partial-aggregated map-side, then shuffled by vertex id —
  volume again bounded by the active neighborhood, not the graph;
- the convergence count reads `component != old` off the just-
  checkpointed round result (old rides the projection, no extra agg);
- AQE is switched OFF for the whole propagation (session value restored
  on exit). Every round's relations are thin and fixed-shape, so runtime
  re-planning has nothing to discover — but AQE re-optimizes every stage
  of every round on the driver and coalesces the thin per-round
  exchanges down to a handful of tasks; measured on the 24M-edge
  benchmark graph at local[16] that is ~2.2x wall-clock (88.5s → 40.1s,
  BENCH/BASELINE.md). Fixed shuffle partitions keep all cores busy on
  every round instead;
- the LABEL table is PERSISTED each round and lineage-truncated with a
  LAZY localCheckpoint only every ``checkpoint_every`` rounds, both
  materialized by the round's convergence count (one job per round; an
  eager checkpoint would add a second barrier). The split exists because
  the two mechanisms pay for different things:
  * plain ``persist()`` keeps the round's output partitioning —
    ``canChangeCachedPlanOutputPartitioning`` defaults false, so the
    cached label table stays HashPartitioning(id) and the next round's
    labels⋈posts join runs with NO label-side exchange (posts come out
    of groupBy(id) already co-partitioned). A localCheckpoint becomes a
    LogicalRDD, which DROPS partitioning info (verified empirically) and
    forces a full label-table exchange the following round;
  * the periodic checkpoint bounds the plan. The frontier and the label
    table both reference the previous round, so an untruncated plan
    doubles per round — measured on the sf0.001 minhash pair graph, the
    analyzed tree hits 7.8k nodes by round 7 and the driver OOMs
    rendering AQE plan strings by round 8; caching alone does NOT help
    (InMemoryRelation substitution happens below the analyzed plan that
    AQE logs/renders). Truncating every K rounds caps the tree at
    ~2^K references over a LogicalRDD base while paying the
    partitioning-losing exchange only on every K-th round.
  The base checkpoint's blocks stay alive until the NEXT checkpoint
  materializes (cached rounds' lineage bottoms out in them — freeing
  them early would make an evicted cached partition unrecomputable);
  in between, at most one previous cached round is held alongside the
  current one. Labels are a thin (id, component) relation, orders of
  magnitude under the edge relation, so the ≤(2 caches + 2 checkpoints)
  peak is small. The returned labels are always eagerly checkpointed, so
  callers read a self-contained LogicalRDD regardless of where the loop
  stopped in the checkpoint cycle.
- each round's checkpoint blocks are freed once the next round is
  materialized, so at most two label-table copies are ever held (on a
  real cluster swap localCheckpoint for reliable checkpoints — executor
  loss cannot recompute through a destroyed local checkpoint); the edge
  cache is dropped before returning.
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
    dedupe_edges: bool = True,
    checkpoint_every: int = 4,
) -> DataFrame:
    """(id, component): component = min vertex id reachable from id.

    ``pairs`` is an edge list (direction irrelevant, self-loops/dups
    fine). Vertices only ever appearing alone are absent — union the full
    id universe downstream if singletons matter (`dedup_canonical` does).

    ``dedupe_edges=False`` skips the init-time edge dropDuplicates — a
    graph-sized hash aggregate that is the single most expensive init
    stage. Duplicate edges never change the RESULT (min is idempotent),
    only the per-round post volume, so callers whose pair relation is
    already distinct — every producer in operators/dedup.py emits
    DISTINCT canonical (id_a < id_b) pairs — should pass False;
    the safe default keeps it for arbitrary edge lists.

    Propagation advances one hop per round, so a chain deeper than
    ``max_iter`` would otherwise return silently-split components (and a
    downstream dedup would keep several docs per true cluster). If the
    loop exits via ``max_iter`` with labels still changing, the result is
    TRUNCATED, not converged — ``on_nonconverged`` controls the reaction:
    'raise' (default, NotConvergedError), 'warn' (RuntimeWarning, return
    the partial labels), or 'ignore'.

    ``checkpoint=False`` disables materialization AND lineage truncation
    (pure lazy lineage, plan doubles per round — only sensible for tiny
    graphs / plan inspection at small max_iter). ``checkpoint_every``
    controls how often the label lineage is truncated with a
    localCheckpoint (losing the cached partitioning and paying a full
    label exchange on the following round) versus plain persist (keeps
    HashPartitioning(id), exchange-free next round) — see the module
    docstring; 1 truncates every round (round-2 behavior).
    """
    if on_nonconverged not in ("raise", "warn", "ignore"):
        raise ValueError(on_nonconverged)
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    spark = pairs.sparkSession
    # see module docstring: AQE's per-round driver re-planning/coalescing
    # is pure overhead on these fixed-shape thin relations (measured
    # ~2.2x); scoped off, previous session value restored on ANY exit
    aqe_key = "spark.sql.adaptive.enabled"
    aqe_before = spark.conf.get(aqe_key)
    spark.conf.set(aqe_key, "false")
    try:
        return _propagate(
            pairs, left_col, right_col, max_iter, checkpoint,
            on_nonconverged, dedupe_edges, checkpoint_every,
        )
    finally:
        spark.conf.set(aqe_key, aqe_before)


def _propagate(
    pairs: DataFrame,
    left_col: str,
    right_col: str,
    max_iter: int,
    checkpoint: bool,
    on_nonconverged: str,
    dedupe_edges: bool,
    checkpoint_every: int,
) -> DataFrame:
    spark = pairs.sparkSession
    sc = spark.sparkContext
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def _pids() -> set:
        """ids of currently-persisted RDDs (localCheckpoint blocks)."""
        return set(sc._jsc.getPersistentRDDs().keySet().toArray())

    def _unpersist(ids: set) -> None:
        jmap = sc._jsc.getPersistentRDDs()
        for rid in ids:
            jr = jmap.get(rid)
            if jr is not None:
                jr.unpersist(False)

    edges = pairs.select(
        F.col(left_col).alias("src"), F.col(right_col).alias("dst")
    ).unionByName(
        pairs.select(F.col(right_col).alias("src"), F.col(left_col).alias("dst"))
    ).repartition(n_part, "dst")
    if dedupe_edges:
        # dedup AFTER the dst-repartition: HashPartitioning(dst) satisfies
        # the (src, dst) clustered distribution, so this is one exchange
        # total and the result comes out partitioned the way every round
        # needs it
        edges = edges.dropDuplicates()
    # the edge relation carries BOTH directions, so set(dst) is already
    # the full vertex universe AND edges are partitioned by dst — this
    # distinct aggregates within partitions with NO exchange (the old
    # select(src).distinct() re-shuffled the whole doubled relation)
    labels = edges.select(F.col("dst").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    base_ids: set = set()
    if checkpoint:
        edges = edges.persist()
        edges.count()
        pre = _pids()
        labels = labels.localCheckpoint()
        base_ids = _pids() - pre

    # round 0: every vertex is active (each must post its label once;
    # after that, only changed vertices carry new information)
    frontier = labels

    changed = 0
    # cached rounds since the live base checkpoint: their lineage bottoms
    # out in base_ids' LogicalRDD, so those blocks stay alive until the
    # NEXT checkpoint materializes; only the immediately-previous cached
    # round is held (older caches fall back to lineage on eviction)
    prev_cache = None
    since_ckpt = 0
    for _ in range(max_iter):
        posts = (
            edges.join(
                frontier.withColumnRenamed("id", "dst").hint("shuffle_hash"),
                "dst",
            )
            .select(F.col("src").alias("id"), F.col("component").alias("post"))
            .groupBy("id")
            .agg(F.min("post").alias("post"))
        )
        new_labels = (
            labels.join(posts.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                # least() skips NULLs: a vertex with no posts keeps its label
                F.least(F.col("component"), F.col("post")).alias("component"),
                F.col("component").alias("old"),
            )
        )
        is_ckpt_round = False
        cur_cache = None
        new_ids: set = set()
        if checkpoint:
            is_ckpt_round = since_ckpt + 1 >= checkpoint_every
            if is_ckpt_round:
                # LAZY checkpoint: the convergence count below is the
                # round's ONE job — it computes the round, stores the
                # checkpoint blocks as a side effect, and returns the
                # changed count. An eager checkpoint would run the same
                # work as a separate job and then count over the blocks:
                # two barriers per round instead of one.
                pre = _pids()
                new_labels = new_labels.localCheckpoint(eager=False)
            else:
                # plain persist: keeps HashPartitioning(id) so the next
                # round's label join is exchange-free (module docstring)
                new_labels = new_labels.persist()
                cur_cache = new_labels
        changed = new_labels.filter(
            F.col("component") != F.col("old")
        ).count()
        if checkpoint:
            if is_ckpt_round:
                new_ids = _pids() - pre
                # the new checkpoint is self-contained: the old base and
                # every cached round since it are unreachable — free them
                _unpersist(base_ids)
                base_ids = new_ids
                since_ckpt = 0
            else:
                since_ckpt += 1
            if prev_cache is not None:
                prev_cache.unpersist(False)
            prev_cache = cur_cache
        frontier = new_labels.filter(F.col("component") != F.col("old")).select(
            "id", "component"
        )
        labels = new_labels.drop("old")
        if changed == 0:
            break
    if checkpoint:
        if prev_cache is not None:
            # the loop stopped on a cache round: pin the result into its
            # own checkpoint (one job reading the cached blocks) so the
            # returned labels are self-contained here too
            pre = _pids()
            labels = labels.localCheckpoint(eager=True)
            prev_cache.unpersist(False)
            _unpersist(base_ids)
            base_ids = _pids() - pre
        # the returned labels read only their own checkpoint blocks; the
        # (potentially large) cached edge partitions are no longer needed
        edges.unpersist(False)
    if changed != 0:
        msg = (
            f"connected_components did not converge in max_iter={max_iter} "
            f"rounds ({changed} labels still changing) — labels are a "
            "truncated, possibly split, clustering"
        )
        if on_nonconverged == "raise":
            raise NotConvergedError(msg)
        if on_nonconverged == "warn":
            warnings.warn(msg, RuntimeWarning, stacklevel=3)
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
    corpus — broadcast into the left-side join when small.

    ``pairs`` is expected to come from operators/dedup.py
    (lsh_candidate_pairs / jaccard_pairs / simhash pairs), all of which
    emit DISTINCT canonical (id_a < id_b) rows — so the closure skips
    its init-time edge dedup (dedupe_edges=False; duplicates would only
    cost post volume, never correctness)."""
    comp = connected_components(pairs, left_col, right_col, dedupe_edges=False)
    keep_clustered = comp.filter(F.col("id") == F.col("component")).select(
        F.col("id").alias(id_col)
    )
    in_graph = comp.select(F.col("id").alias(id_col))
    singletons = docs.select(id_col).join(in_graph, id_col, "left_anti")
    keep = keep_clustered.unionByName(singletons)
    return docs.join(keep, id_col, "leftsemi")
