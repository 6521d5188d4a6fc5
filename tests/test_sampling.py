"""hash_sample determinism + pack_greedy layout invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from workbook_exporter_fe_spark.operators.sampling import hash_sample, pack_greedy


def test_hash_sample_stable_under_repartition(spark, sequences):
    a = hash_sample(sequences, rate=0.25, key_col="doc_id")
    b = hash_sample(sequences.repartition(17), rate=0.25, key_col="doc_id")
    ids_a = {r.doc_id for r in a.select("doc_id").collect()}
    ids_b = {r.doc_id for r in b.select("doc_id").collect()}
    assert ids_a == ids_b
    # rate lands near 25% (hash-uniform over doc_ids)
    frac = len(ids_a) / sequences.count()
    assert 0.2 < frac < 0.3


def test_hash_sample_is_subset(spark, sequences):
    small = {r.doc_id for r in hash_sample(sequences, 0.1).select("doc_id").collect()}
    big = {r.doc_id for r in hash_sample(sequences, 0.5).select("doc_id").collect()}
    assert small <= big


def test_pack_greedy_layout(spark, sequences):
    cap = 512
    packed = pack_greedy(sequences, capacity=cap, weight_col="n_tok").cache()
    rows = packed.collect()
    # offsets always inside the pack
    assert all(0 <= r.pack_offset < cap for r in rows)
    # per (source, pack) the packed weights tile the pack contiguously:
    # min offset of pack p+1 == 0 and start positions are the running sum
    by_key = {}
    for r in sorted(rows, key=lambda r: (r.source, r.doc_id)):
        start = by_key.get(r.source, 0)
        assert r.pack_id == start // cap
        assert r.pack_offset == start % cap
        by_key[r.source] = start + r.n_tok
    # total weight preserved
    got = packed.agg(F.sum("n_tok")).first()[0]
    want = sequences.agg(F.sum("n_tok")).first()[0]
    assert got == want


def test_pack_greedy_stable_under_repartition(spark, sequences):
    a = pack_greedy(sequences, 512).orderBy("source", "doc_id").collect()
    b = pack_greedy(sequences.repartition(13), 512).orderBy("source", "doc_id").collect()
    assert a == b


def test_hash_split_partitions_everything_once(spark, sequences):
    from workbook_exporter_fe_spark.operators.sampling import hash_split

    d = hash_split(sequences, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in d.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == sequences.count()
    n = sequences.count()
    assert 0.75 * n < counts["train"] < 0.85 * n
    # stable under repartitioning
    d2 = hash_split(sequences.repartition(19), {"train": 0.8, "val": 0.1, "test": 0.1})
    a = {(r.doc_id, r.split) for r in d.select("doc_id", "split").collect()}
    b = {(r.doc_id, r.split) for r in d2.select("doc_id", "split").collect()}
    assert a == b
    import pytest as _p

    with _p.raises(ValueError):
        hash_split(sequences, {"train": 0.5, "val": 0.1})


# ---------------------------------------------------------------------------
# Weighted / stratified sampling (Efraimidis–Spirakis + per-stratum gates)
# ---------------------------------------------------------------------------


def _es_ref(rows, k, weighted, strata=True):
    """Pure-python Efraimidis–Spirakis reference over (source, doc_id, n_tok)."""
    import hashlib
    import math
    from collections import defaultdict

    per = defaultdict(list)
    for src, doc, w in rows:
        h = int(hashlib.md5(doc.encode()).hexdigest()[:13], 16)
        u = (h + 1) / float(1 << 52)
        es = -math.log(u) / (w if weighted else 1.0)
        per[src if strata else None].append((es, doc))
    out = set()
    for _, lst in per.items():
        lst.sort()
        out |= {doc for _, doc in lst[:k]}
    return out


def test_sample_topk_matches_reference(spark, sequences):
    from workbook_exporter_fe_spark.operators.sampling import sample_topk

    rows = [
        (r.source, r.doc_id, r.n_tok)
        for r in sequences.select("source", "doc_id", "n_tok").collect()
    ]
    for weighted in (False, True):
        got = {
            r.doc_id
            for r in sample_topk(
                sequences, 25, "source", "n_tok" if weighted else None
            ).collect()
        }
        assert got == _es_ref(rows, 25, weighted)


def test_sample_topk_prefiltered_equals_exact(spark, sequences):
    from workbook_exporter_fe_spark.operators.sampling import (
        sample_topk,
        sample_topk_prefiltered,
    )

    for weighted in (False, True):
        wcol = "n_tok" if weighted else None
        exact = {r.doc_id for r in sample_topk(sequences, 40, "source", wcol).collect()}
        fast = {
            r.doc_id
            for r in sample_topk_prefiltered(sequences, 40, "source", wcol).collect()
        }
        assert fast == exact
    # fallback path: factor so small every stratum undersurvives
    tiny = sample_topk_prefiltered(sequences, 40, "source", None, factor=0.001)
    exact = sample_topk(sequences, 40, "source", None)
    assert {r.doc_id for r in tiny.collect()} == {r.doc_id for r in exact.collect()}


def test_weighted_sampling_prefers_heavy_rows(spark, sequences):
    from workbook_exporter_fe_spark.operators.sampling import sample_topk

    n = 400
    uni = sample_topk(sequences, n, None, None)
    wtd = sample_topk(sequences, n, None, "n_tok")
    mu_u = uni.agg(F.avg("n_tok")).first()[0]
    mu_w = wtd.agg(F.avg("n_tok")).first()[0]
    assert mu_w > mu_u  # weight-proportional inclusion shifts the mean up


def test_stratified_sample_rates_and_determinism(spark, sequences):
    from workbook_exporter_fe_spark.operators.sampling import (
        hash_sample,
        stratified_sample,
    )

    fr = {"src-00": 0.5, "src-01": 0.05}
    s = stratified_sample(sequences, fr, default_rate=0.2)
    # per-stratum behavior identical to hash_sample at that stratum's rate
    for src, rate in [("src-00", 0.5), ("src-01", 0.05), ("src-03", 0.2)]:
        sub = sequences.filter(F.col("source") == src)
        want = {r.doc_id for r in hash_sample(sub, rate).collect()}
        got = {r.doc_id for r in s.filter(F.col("source") == src).collect()}
        assert got == want
    # stable under repartitioning
    s2 = stratified_sample(sequences.repartition(17), fr, default_rate=0.2)
    assert {r.doc_id for r in s.collect()} == {r.doc_id for r in s2.collect()}


def test_mixture_budgets_rounding():
    from workbook_exporter_fe_spark.operators.sampling import mixture_budgets

    b = mixture_budgets(100, {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3})
    assert sum(b.values()) == 100 and sorted(b.values()) == [33, 33, 34]
    assert mixture_budgets(10, {"a": 3.0, "b": 1.0}) == {"a": 8, "b": 2}
    import pytest

    with pytest.raises(ValueError):
        mixture_budgets(10, {"a": -1.0})
    with pytest.raises(ValueError):
        mixture_budgets(10, {})


def test_temperature_weights():
    from workbook_exporter_fe_spark.operators.sampling import (
        mixture_budgets,
        temperature_weights,
    )

    counts = {"en": 1_000_000, "fr": 10_000, "is": 100}
    # alpha=1 reproduces natural proportions
    w1 = temperature_weights(counts, alpha=1.0)
    tot = sum(counts.values())
    assert all(abs(w1[s] - counts[s] / tot) < 1e-12 for s in counts)
    # alpha=0 is uniform over non-empty sources
    w0 = temperature_weights(counts, alpha=0.0)
    assert all(abs(v - 1 / 3) < 1e-12 for v in w0.values())
    # intermediate alpha up-samples small sources monotonically
    w = temperature_weights(counts, alpha=0.3)
    assert w["is"] > counts["is"] / tot and w["en"] < counts["en"] / tot
    assert abs(sum(w.values()) - 1.0) < 1e-12
    # order preserved: bigger source never gets a smaller weight
    assert w["en"] > w["fr"] > w["is"]
    # composes with mixture_budgets into exact-sum integer budgets
    b = mixture_budgets(1000, w)
    assert sum(b.values()) == 1000 and b["is"] >= 1
    # empty sources are dropped, not NaN'd
    assert "z" not in temperature_weights({"a": 10, "z": 0}, 0.5)
    import pytest

    with pytest.raises(ValueError):
        temperature_weights({"a": 1}, alpha=-0.1)
    with pytest.raises(ValueError):
        temperature_weights({"a": 0})


def test_mixture_sample_matches_reference(spark, sequences):
    """Exact greedy fill vs a pure-python replay of the md5 order."""
    import hashlib

    from workbook_exporter_fe_spark.operators.sampling import mixture_sample

    budgets = {"src-00": 4000, "src-05": 1500, "src-09": 0}
    got = {
        r.doc_id
        for r in mixture_sample(sequences, budgets).select("doc_id").collect()
    }
    rows = sequences.select("source", "doc_id", "n_tok").collect()
    want, toks = set(), {}
    for src in budgets:
        ordered = sorted(
            (r for r in rows if r.source == src),
            key=lambda r: (hashlib.md5(r.doc_id.encode()).hexdigest(), r.doc_id),
        )
        cum = 0
        for r in ordered:
            if cum < budgets[src]:
                want.add(r.doc_id)
                toks[src] = toks.get(src, 0) + r.n_tok
            cum += r.n_tok
    assert got == want and len(got) > 0
    # budget reached (first-crossing inclusive) wherever supply allowed
    assert toks["src-00"] >= 4000 and toks["src-05"] >= 1500
    assert "src-09" not in toks
    # unlisted sources are dropped entirely
    srcs = {
        r.source
        for r in mixture_sample(sequences, budgets)
        .select("source")
        .distinct()
        .collect()
    }
    assert srcs <= {"src-00", "src-05"}


def test_mixture_sample_stable_under_repartition(spark, sequences):
    from workbook_exporter_fe_spark.operators.sampling import mixture_sample

    budgets = {"src-00": 2500, "src-05": 900}
    a = mixture_sample(sequences, budgets)
    b = mixture_sample(sequences.repartition(13), budgets)
    assert {r.doc_id for r in a.collect()} == {r.doc_id for r in b.collect()}


def test_mixture_oversample_epoch_repeats(spark, sequences):
    """Budget beyond the corpus: docs replay across epochs until the
    token budget is met; epoch 0 is exactly the single-pass selection."""
    from workbook_exporter_fe_spark.operators.sampling import (
        mixture_oversample,
        mixture_sample,
    )

    src = sequences.filter(F.col("source") == "src-00").select(
        "doc_id", "n_tok", "source"
    )
    tot = src.agg(F.sum("n_tok")).first()[0]
    budget = int(tot * 2.5)  # forces k = 3 replicas
    got = mixture_oversample(src, {"src-00": budget})
    rows = got.collect()
    sel_tok = sum(r.n_tok for r in rows)
    max_tok = src.agg(F.max("n_tok")).first()[0]
    assert budget <= sel_tok < budget + max_tok  # first-crossing inclusive
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r.mix_epoch, []).append(r.doc_id)
    assert set(by_epoch) == {0, 1, 2}
    n_docs = src.count()
    # full epochs replay the whole source; the last is a partial prefix
    assert len(by_epoch[0]) == len(by_epoch[1]) == n_docs
    assert 0 < len(by_epoch[2]) <= n_docs
    # within-budget case degenerates to mixture_sample + epoch 0
    small = int(tot * 0.4)
    a = sorted(
        r.doc_id
        for r in mixture_oversample(src, {"src-00": small}).collect()
    )
    b = sorted(
        r.doc_id for r in mixture_sample(src, {"src-00": small}).collect()
    )
    assert a == b


def test_mixture_oversample_max_epochs_guard(spark, sequences):
    """r5 ADVICE fix: a typo'd budget (1e12 over a tiny source) must
    raise instead of fabricating ~budget/corpus replica rows per input
    row; an explicit higher max_epochs re-enables it."""
    import pytest

    from workbook_exporter_fe_spark.operators.sampling import (
        mixture_oversample,
    )

    src = sequences.filter(F.col("source") == "src-00").select(
        "doc_id", "n_tok", "source"
    )
    tot = int(src.agg(F.sum("n_tok")).first()[0])
    with pytest.raises(ValueError, match="max_epochs"):
        mixture_oversample(src, {"src-00": tot * 1000})
    # explicit opt-in still works
    got = mixture_oversample(
        src, {"src-00": tot * 100}, max_epochs=128
    )
    assert got.agg(F.max("mix_epoch")).first()[0] == 99


def test_mixture_oversample_stable_under_repartition(spark, sequences):
    from workbook_exporter_fe_spark.operators.sampling import (
        mixture_oversample,
    )

    src = sequences.filter(F.col("source").isin("src-00", "src-01")).select(
        "doc_id", "n_tok", "source"
    )
    tots = {
        r.source: r.t
        for r in src.groupBy("source").agg(F.sum("n_tok").alias("t")).collect()
    }
    budgets = {"src-00": int(tots["src-00"] * 1.7),
               "src-01": int(tots["src-01"] * 0.6)}
    a = sorted(
        (r.source, r.mix_epoch, r.doc_id)
        for r in mixture_oversample(src.repartition(1), budgets).collect()
    )
    b = sorted(
        (r.source, r.mix_epoch, r.doc_id)
        for r in mixture_oversample(src.repartition(13), budgets).collect()
    )
    assert a == b and len(a) > 0
