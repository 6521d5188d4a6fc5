"""Deterministic corpus sampling + sequence packing for training pipelines.

Two operators a 100 TB training-data pipeline needs between dedup and
writing shards:

- ``hash_sample``: deterministic hash-gated downsampling. The reference's
  only "sampling" is manual row selection in the uploaded workbook; at
  cluster scale RNG-based ``df.sample()`` is neither reproducible across
  reruns nor stable under repartitioning, so the gate is a pure function
  of the row key: keep iff the first 16 bits of ``md5(key)`` fall below
  ``rate * 2^16``. Same rows survive on any cluster size, any partition
  layout, any engine with md5 — which also makes it DuckDB-oracle-checkable.
- ``pack_greedy``: GPT-style sequence packing — concatenate documents in a
  stable per-source order and chunk the concatenation into fixed-capacity
  training examples; each doc gets (pack_id, pack_offset) from a running
  sum. One window scan per source, no shuffle beyond the per-source
  partition, and the assignment is again an exact integer function of the
  data (oracle-checkable).

Scale notes: ``hash_sample`` is a map-side filter — it pushes to the scan
and costs zero shuffles. ``pack_greedy``'s window partitions by ``source``;
for a Zipf-hot source at 10^12 rows, split the window key into
(source, shard = hash(doc_id) % N) and pack within shards — packing only
needs *some* stable grouping, not a single global order per source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id"
) -> DataFrame:
    """Deterministic sample: keep iff first-16-bits(md5(key)) < rate * 2^16."""
    gate = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 4), 16, 10
    ).cast("long")
    return df.filter(gate < int(rate * 65536))


def pack_greedy(
    df: DataFrame,
    capacity: int,
    weight_col: str = "n_tok",
    key_col: str = "doc_id",
    part_col: str = "source",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign (pack_id, pack_offset) by chunking the per-source running sum.

    Documents are laid head-to-tail in ``key_col`` order; a document's pack
    is the capacity-chunk its *first* token lands in (docs longer than
    ``capacity`` span packs, exactly like pretraining-corpus chunking).
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(F.col(weight_col)).over(w) - F.col(weight_col)).cast("long")
    # exact int64 division (`div`), NOT float `/` + floor: past 2^53 total
    # tokens per source a double division rounds and pack boundaries drift
    # off-by-one — at 10^12-row scale that is a real running-sum magnitude.
    return df.select(
        F.col(part_col),
        F.col(key_col),
        F.col(weight_col),
        start.alias("_start"),
        *[F.col(c) for c in carry_cols],
    ).select(
        part_col,
        key_col,
        weight_col,
        F.expr(f"_start div {int(capacity)}").alias("pack_id"),
        (F.col("_start") % capacity).alias("pack_offset"),
        *carry_cols,
    )


def _es_key(weight_col: str | None, key_col: str):
    """Efraimidis–Spirakis sampling key: exp(1)/w from a deterministic
    md5-derived uniform. u = (first-52-bits(md5(key)) + 1) / 2^52 ∈ (0, 1];
    es = -ln(u) / w. The k SMALLEST es keys are a weighted sample without
    replacement (w=1 → uniform). Pure function of (key, weight): stable
    under repartitioning and reproducible across engines."""
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 13), 16, 10).cast(
        "long"
    )
    u = (h + F.lit(1).cast("double")) / F.lit(float(1 << 52))
    es = -F.log(u)
    if weight_col is not None:
        es = es / F.col(weight_col)
    return es


def sample_topk(
    df: DataFrame,
    k: int,
    strata_col: str | None = None,
    weight_col: str | None = None,
    key_col: str = "doc_id",
) -> DataFrame:
    """Exact-size deterministic sample: k rows per stratum (or globally),
    weighted by ``weight_col`` when given (Efraimidis–Spirakis scheme —
    inclusion probability proportional to weight, without replacement).

    This is the exact path: a per-stratum window sort over all rows. For
    corpus scale use ``sample_topk_prefiltered`` (same answer, shuffles
    only ~factor·k rows per stratum)."""
    es = _es_key(weight_col, key_col).alias("_es")
    part = [strata_col] if strata_col else []
    w = Window.partitionBy(*part).orderBy("_es", key_col)
    return (
        df.withColumn("_es", es)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_es", "_rn")
    )


def sample_topk_prefiltered(
    df: DataFrame,
    k: int,
    strata_col: str,
    weight_col: str | None = None,
    key_col: str = "doc_id",
    factor: float = 4.0,
) -> DataFrame:
    """``sample_topk`` with a map-side candidate prefilter — the scale path.

    The window sort in ``sample_topk`` shuffles EVERY row of a stratum to
    rank it; at 10^12 rows that is the whole corpus through one sort. But
    the k winners are the k smallest es keys, and P(es < t) ≈ t·w for
    small t, so with W = Σw per stratum the threshold t = factor·k / W
    keeps ~factor·k expected candidates. Survivors are a SUPERSET of the
    true top-k whenever ≥ k survive (everything below the threshold is
    kept — no false negatives, so the result is EXACT, not approximate);
    strata where fewer than k survived (probability e^-Θ(factor·k)) fall
    back to the full path for that stratum only. Costs one tiny
    decomposable per-stratum aggregate (W) + a broadcast join; the sort
    then sees ~factor·k rows per stratum instead of all of them."""
    es = _es_key(weight_col, key_col).alias("_es")
    wsum = (
        F.sum(F.col(weight_col)) if weight_col is not None else F.count("*")
    ).alias("_w")
    totals = df.groupBy(strata_col).agg(wsum)
    flagged = df.withColumn("_es", es).join(
        F.broadcast(totals), strata_col
    )
    cand = flagged.filter(F.col("_es") < F.lit(float(factor * k)) / F.col("_w"))
    # strata with < k survivors (vanishingly rare at factor≥4) re-run full
    short = {
        r[strata_col]
        for r in cand.groupBy(strata_col)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") < k)
        .collect()
    }
    missing = {r[strata_col] for r in totals.collect()} - {
        r[strata_col] for r in cand.select(strata_col).distinct().collect()
    }
    short |= missing
    w = Window.partitionBy(strata_col).orderBy("_es", key_col)
    out = (
        cand.filter(~F.col(strata_col).isin(list(short)) if short else F.lit(True))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_es", "_rn", "_w")
    )
    if short:
        fallback = sample_topk(
            df.filter(F.col(strata_col).isin(list(short))),
            k,
            strata_col,
            weight_col,
            key_col,
        )
        out = out.unionByName(fallback)
    return out


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic hash sampling: stratum s keeps rows whose
    16-bit md5 gate falls below fractions[s]·2^16 (``default_rate`` for
    unlisted strata). Same map-side zero-shuffle gate as ``hash_sample``,
    with per-stratum rates — the standard source-rebalancing move for
    training mixes (e.g. downweight a crawl, upweight curated text)."""
    gate = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 4), 16, 10
    ).cast("long")
    expr = None
    for s, rate in fractions.items():
        cond = F.col(strata_col) == s
        thresh = F.lit(int(rate * 65536))
        expr = F.when(cond, thresh) if expr is None else expr.when(cond, thresh)
    expr = (
        F.lit(int(default_rate * 65536))
        if expr is None
        else expr.otherwise(int(default_rate * 65536))
    )
    return df.filter(gate < expr)


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment from the same md5 gate as
    ``hash_sample``: each row's 16-bit key hash falls into one of the
    cumulative weight ranges. Assignment is a pure function of the key —
    stable across cluster sizes, reruns, and engines — and filtering one
    split later is the same map-side gate (no materialized split tables
    needed, though writing partitioned-by-split is one `partitionBy` away).
    """
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError("split weights must sum to 1")
    gate = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 4), 16, 10
    ).cast("long")
    acc = 0.0
    expr = None
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = gate < int(acc * 65536)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def temperature_weights(
    source_tokens: dict[str, int], alpha: float = 0.3
) -> dict[str, float]:
    """Temperature-based mixture weights: p_i ∝ n_i^alpha (the mT5 /
    XLM-R multilingual sampling rule) from per-source token counts.

    alpha=1 reproduces natural proportions, alpha=0 is uniform; the
    usual range 0.2–0.7 up-samples small sources without letting them
    dominate. Compose with :func:`mixture_budgets` to get integer token
    budgets for :func:`mixture_sample`:

        budgets = mixture_budgets(total, temperature_weights(counts, 0.3))

    Driver-side pure function — ``source_tokens`` is the tiny per-source
    aggregate (one groupBy-sum collect at any corpus scale)."""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    if any(n < 0 for n in source_tokens.values()):
        raise ValueError("negative token count")
    pows = {s: float(n) ** alpha for s, n in source_tokens.items() if n > 0}
    tot = sum(pows.values())
    if tot <= 0:
        raise ValueError("need at least one source with tokens")
    return {s: v / tot for s, v in pows.items()}


def mixture_budgets(
    total_tokens: int, weights: dict[str, float]
) -> dict[str, int]:
    """Turn mixture weights (e.g. DoReMi / manual domain weights) into
    per-source token budgets for :func:`mixture_sample`. Largest-remainder
    rounding so the budgets sum exactly to ``total_tokens``."""
    if any(w < 0 for w in weights.values()):
        raise ValueError("negative mixture weight")
    tot = sum(weights.values())
    if tot <= 0:
        raise ValueError("mixture weights must sum > 0")
    raw = {s: total_tokens * w / tot for s, w in weights.items()}
    out = {s: int(v) for s, v in raw.items()}
    short = total_tokens - sum(out.values())
    for s in sorted(raw, key=lambda s: (out[s] - raw[s], s))[:short]:
        out[s] += 1
    return out


def mixture_sample(
    df: DataFrame,
    budgets: dict[str, int],
    token_col: str = "n_tok",
    source_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Materialize a training mixture: per source, greedily take documents
    in deterministic md5(key) order until the source's token budget is
    reached.

    The selection rule is *first-crossing inclusive*: a doc is kept iff
    the token sum of the docs BEFORE it (in md5 order) is still below the
    budget — so the selected set reaches ≥ budget whenever the source has
    enough tokens, overshooting by less than one document. Sources absent
    from ``budgets`` get 0 (dropped). The order key is engine-portable
    (md5 hex string), so the exact selected set is reproducible on any
    cluster size, partition layout, or SQL engine — same philosophy as
    hash_sample/hash_split, but hitting a token *count* target instead of
    a row *rate*.

    Scale: one RANGE-free running-sum window per source partition — the
    same class as pack_greedy. The per-source pass is sequential by
    definition (an exact greedy fill is order-dependent); for a
    pathological single hot source prefer the approximate path
    (stratified_sample at rate ≈ budget/source_tokens — zero-shuffle
    gates) or shard the source key upstream and split its budget.
    """
    order_h = F.md5(F.col(key_col).cast("string"))
    w = (
        Window.partitionBy(source_col)
        .orderBy(order_h, key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0).cast("long"))
    budget = F.create_map(
        *[F.lit(x) for kv in budgets.items() for x in kv]
    )
    return (
        df.withColumn("_cum_before", cum_before)
        .filter(
            F.col("_cum_before")
            < F.coalesce(
                F.element_at(budget, F.col(source_col)), F.lit(0)
            ).cast("long")
        )
        .drop("_cum_before")
    )


def mixture_oversample(
    df: DataFrame,
    budgets: dict[str, int],
    token_col: str = "n_tok",
    source_col: str = "source",
    key_col: str = "doc_id",
    max_epochs: int = 64,
) -> DataFrame:
    """:func:`mixture_sample` with EPOCH-REPEAT upsampling: a source
    whose budget exceeds its corpus is replayed across epochs until the
    token budget is met — the Pile/DoReMi recipe for weighting small
    high-quality sources above their natural share. Output adds
    ``mix_epoch`` (0-based replica index); selection order is
    (epoch, md5(key), key), so epoch 0 is exactly
    :func:`mixture_sample`'s selection whenever budget ≤ corpus tokens
    (one full pass of the source precedes any repeat).

    Replicas per source: ceil(budget / source_tokens) — computed from a
    broadcast per-source totals relation; the replication is a per-row
    ``explode(sequence(...))`` (no shuffle beyond mixture_sample's own
    per-source window sort, whose volume grows only by the oversample
    factor — bounded by budget/corpus, i.e. exactly the data a trainer
    would read anyway). ``max_epochs`` is a fat-finger guard: a typo'd
    budget over a tiny source would otherwise fabricate an unbounded
    number of replica rows per input row before the window sort ever
    runs — we validate the replica counts driver-side (the totals
    relation is per-source, tiny) and raise instead. The collected map
    is then REUSED as the broadcast totals relation, so the upstream
    chain (in curate_corpus: the whole dedup/filter pipeline) executes
    once for the totals, not once for the guard and again in the plan
    (the repo's persist-choice rule)."""
    tot_rows = (
        df.groupBy(source_col)
        .agg(F.sum(token_col).cast("long").alias("_tot"))
        .collect()
    )
    tot_map = {r[source_col]: r["_tot"] for r in tot_rows}
    for src, b in budgets.items():
        t = tot_map.get(src)
        if t and t > 0 and -(-int(b) // int(t)) > max_epochs:
            raise ValueError(
                f"mixture_oversample: source {src!r} needs "
                f"{-(-int(b) // int(t))} epochs (budget {b} over "
                f"{t} tokens) > max_epochs={max_epochs}; raise "
                "max_epochs if this is intentional"
            )
    spark = df.sparkSession
    totals = spark.createDataFrame(
        [(k, int(v)) for k, v in tot_map.items()],
        StructType([
            df.schema[source_col],
            StructField("_tot", LongType()),
        ]),
    )
    budget = F.create_map(
        *[F.lit(x) for kv in budgets.items() for x in kv]
    )
    bud = F.element_at(budget, F.col(source_col)).cast("long")
    k = F.ceil(bud.cast("double") / F.col("_tot")).cast("int")
    rep = (
        df.join(F.broadcast(totals), source_col)
        .withColumn("_k", k)
        .filter(F.col("_k") >= 1)  # unbudgeted / empty sources drop
        .withColumn(
            "mix_epoch",
            F.explode(F.sequence(F.lit(0), F.col("_k") - 1)),
        )
    )
    order_h = F.md5(F.col(key_col).cast("string"))
    w = (
        Window.partitionBy(source_col)
        .orderBy("mix_epoch", order_h, key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0).cast("long"))
    return (
        rep.withColumn("_cum_before", cum_before)
        .filter(F.col("_cum_before") < bud)
        .drop("_cum_before", "_tot", "_k")
    )
