"""Connected components + canonical dedup: pinned to a pure-python
union-find oracle on known graphs and on the real MinHash pair output."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.components import (
    NotConvergedError,
    connected_components,
    dedup_canonical,
)


def _uf_oracle(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_components_on_known_graph(spark):
    # two chains (transitive closure needed), one triangle, one self-loop
    edges = [
        (1, 2), (2, 3), (3, 4),          # chain -> comp 1
        (10, 11), (11, 12),              # chain -> comp 10
        (20, 21), (21, 22), (20, 22),    # triangle -> comp 20
        (30, 30),                        # self loop -> comp 30
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["id"]: r["component"] for r in connected_components(df).collect()
    }
    assert got == _uf_oracle(edges)
    assert got[4] == 1 and got[12] == 10 and got[22] == 20 and got[30] == 30


def test_components_match_union_find_on_random_graph(spark):
    # deterministic pseudo-random graph with long chains
    edges = [((i * 7919) % 500, (i * 104729) % 500) for i in range(400)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == _uf_oracle(edges)


def test_components_dedupe_edges_false_is_result_identical(spark):
    # duplicate edges (same AND reversed direction) + self-loops: skipping
    # the init dedup may only change post volume, never the labels
    edges = [
        (1, 2), (2, 1), (1, 2),          # duplicated both ways
        (2, 3), (2, 3),
        (10, 11), (11, 10),
        (30, 30), (30, 30),              # duplicated self loop
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = {
        r["id"]: r["component"]
        for r in connected_components(df, dedupe_edges=False).collect()
    }
    assert fast == _uf_oracle(edges)
    assert fast[3] == 1 and fast[11] == 10 and fast[30] == 30


def test_dedup_canonical_on_minhash_pairs(spark, sf_dir):
    from workbook_exporter_fe_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = lsh_candidate_pairs(minhash_signatures(docs))
    kept = dedup_canonical(docs, pairs)
    comp = connected_components(pairs)
    n_components = comp.select("component").distinct().count()
    n_in_graph = comp.count()
    # kept = canonical per component + all singletons; exact count identity
    assert kept.count() == docs.count() - n_in_graph + n_components
    # every kept doc in the graph is its component's min id
    mins = {r["component"] for r in comp.collect()}
    in_graph_kept = {
        r["doc_id"]
        for r in kept.join(
            comp.select(F.col("id").alias("doc_id")), "doc_id", "leftsemi"
        ).collect()
    }
    assert in_graph_kept == mins
    # idempotent: deduping the deduped set changes nothing
    pairs2 = lsh_candidate_pairs(minhash_signatures(kept))
    kept2 = dedup_canonical(kept, pairs2)
    assert kept2.count() <= kept.count()


def test_components_nonconvergence_is_signalled(spark):
    # a 6-chain needs ~3 doubling rounds; max_iter=1 must NOT be converged
    # — and must not return silently-split labels: default raises.
    edges = [(i, i + 1) for i in range(6)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    with pytest.raises(NotConvergedError):
        connected_components(df, max_iter=1).collect()
    with pytest.warns(RuntimeWarning, match="did not converge"):
        partial = {
            r["id"]: r["component"]
            for r in connected_components(
                df, max_iter=1, on_nonconverged="warn"
            ).collect()
        }
    full = {
        r["id"]: r["component"] for r in connected_components(df).collect()
    }
    assert full == {i: 0 for i in range(7)}
    assert partial != full


def test_components_frees_stale_round_checkpoints(spark):
    """Each round's localCheckpoint is unpersisted once the next round is
    materialized — iterative runs must not accumulate one label-table copy
    per round in the block store."""
    def n_persistent():
        return len(
            set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
        )

    base = n_persistent()
    # a 40-chain -> many propagation rounds
    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    labels = connected_components(df, max_iter=50)
    assert labels.select("component").distinct().count() == 1
    # left behind: the edges checkpoint + the final labels round only
    assert n_persistent() - base <= 2
