"""PromQL front-end: parser, range/instant functions, aggregation,
vector matching, set ops, histogram_quantile — each checked against
pure-python references on deterministic synthetic series (sparse grids,
counter resets, planted shapes)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from workbook_exporter_fe_spark.plans.promql import (
    Agg,
    Binary,
    Call,
    MetricStore,
    Num,
    PromQLError,
    Selector,
    parse,
    promql,
)

T0 = 1700000000  # grid origin, 60s step


def _counter(src: str) -> list[tuple[int, float]]:
    """Sparse cumulative counter with a reset; (tsec, value)."""
    out, acc = [], 0.0
    for i in range(40):
        if src == "s1" and i in (9, 23):
            continue  # missing scrapes → sparse grid
        step = ((i * 37 + ord(src[-1]) * 11) % 13) + 1.0
        if src == "s0" and i == 17:
            acc = step  # counter reset
        else:
            acc += step
        out.append((T0 + i * 60, acc))
    return out


def _gauge(src: str) -> list[tuple[int, float]]:
    return [
        (T0 + i * 60, float(((i * 29 + ord(src[-1])) % 23) - 5))
        for i in range(40)
        if not (src == "s1" and i % 7 == 3)
    ]


@pytest.fixture(scope="module")
def store(spark):
    st = MetricStore()
    cnt = [(s, t, v) for s in ("s0", "s1") for t, v in _counter(s)]
    gau = [(s, t, v) for s in ("s0", "s1") for t, v in _gauge(s)]
    mk = lambda rows: spark.createDataFrame(
        rows, "source string, tsec long, value double"
    ).select("source", F.timestamp_seconds("tsec").alias("bucket_ts"), "value")
    st.register("tokens_total", mk(cnt))
    st.register("mem_bytes", mk(gau))
    # le-labelled cumulative histogram: 2 series × 3 timestamps
    hrows = []
    for s in ("s0", "s1"):
        for j in range(3):
            t = T0 + j * 60
            base = (j + 1) * (10 if s == "s0" else 7)
            cum = 0
            for le, add in [("0.1", base), ("0.5", base * 2), ("2.5", base),
                            ("+Inf", 3 if j == 2 else 0)]:
                cum += add
                hrows.append((s, le, t, float(cum)))
    hdf = spark.createDataFrame(
        hrows, "source string, le string, tsec long, value double"
    ).select("source", "le", F.timestamp_seconds("tsec").alias("bucket_ts"),
             "value")
    st.register("latency_bucket", hdf, labels=("source", "le"))
    return st


def _collect(df):
    return {
        tuple(r[c] for c in df.columns if c not in ("ts", "value"))
        + (int(r["ts"].timestamp()),): r["value"]
        for r in df.collect()
    }


# ---------------------------------------------------------------- parser


def test_parser_shapes():
    ast = parse('rate(tokens_total{source="s0"}[5m])')
    assert isinstance(ast, Call) and ast.func == "rate"
    sel = ast.args[0]
    assert isinstance(sel, Selector)
    assert sel.range_s == 300 and sel.matchers == [("source", "=", "s0")]

    ast = parse("sum by (source) (rate(tokens_total[1m]))")
    assert isinstance(ast, Agg) and ast.grouping == ("source",)
    ast2 = parse("sum(rate(tokens_total[1m])) by (source)")
    assert ast2.grouping == ("source",)

    ast = parse("a / on (source) b offset 5m")
    assert isinstance(ast, Binary) and ast.on == ("source",)
    assert ast.rhs.offset_s == 300

    assert isinstance(parse("topk(3, mem_bytes)"), Agg)
    assert parse("2 ^ 3 ^ 2")  # right assoc
    assert parse("-mem_bytes").op == "*"

    for bad in ("rate(tokens_total[5m]", "x{l=}", "sum by source (x)",
                "5m", "foo bar"):
        with pytest.raises(PromQLError):
            parse(bad)


def test_precedence():
    ast = parse("a + b * c")
    assert ast.op == "+" and ast.rhs.op == "*"
    ast = parse("a * b + c")
    assert ast.op == "+" and ast.lhs.op == "*"
    ast = parse("a > 0 and b < 1")
    assert ast.op == "and"


# ------------------------------------------------------ range functions


def _series(src, which):
    return dict(_counter(src) if which == "c" else _gauge(src))


def _window(series: dict[int, float], t: int, r: int) -> list[float]:
    return [v for tt, v in sorted(series.items()) if t - r < tt <= t]


def test_rate_and_increase_reference(store):
    got = _collect(promql(store, "increase(tokens_total[5m])"))
    rate = _collect(promql(store, "rate(tokens_total[5m])"))
    for src in ("s0", "s1"):
        s = _series(src, "c")
        ts = sorted(s)
        deltas = {}
        for a, b in zip(ts, ts[1:]):
            d = s[b] - s[a] if s[b] >= s[a] else s[b]
            deltas[b] = d
        for t in ts:
            win = [deltas[tt] for tt in ts if t - 300 < tt <= t and tt in deltas]
            if win:
                assert got[(src, t)] == pytest.approx(sum(win))
                assert rate[(src, t)] == pytest.approx(sum(win) / 300.0)
            else:
                assert (src, t) not in got


def test_over_time_family(store):
    for q, fn in [
        ("avg_over_time(mem_bytes[3m])", lambda w: sum(w) / len(w)),
        ("sum_over_time(mem_bytes[3m])", sum),
        ("min_over_time(mem_bytes[3m])", min),
        ("max_over_time(mem_bytes[3m])", max),
        ("count_over_time(mem_bytes[3m])", len),
        ("last_over_time(mem_bytes[3m])", lambda w: w[-1]),
        (
            "stddev_over_time(mem_bytes[3m])",
            lambda w: math.sqrt(
                sum((x - sum(w) / len(w)) ** 2 for x in w) / len(w)
            ),
        ),
    ]:
        got = _collect(promql(store, q))
        for src in ("s0", "s1"):
            s = _series(src, "g")
            for t in s:
                win = _window(s, t, 180)
                assert got[(src, t)] == pytest.approx(float(fn(win))), (q, t)


def test_delta_and_idelta(store):
    got = _collect(promql(store, "delta(mem_bytes[3m])"))
    for src in ("s0", "s1"):
        s = _series(src, "g")
        for t in s:
            win = _window(s, t, 180)
            assert got[(src, t)] == pytest.approx(win[-1] - win[0])
    got = _collect(promql(store, "idelta(mem_bytes[3m])"))
    for src in ("s0", "s1"):
        s = _series(src, "g")
        ts = sorted(s)
        for prev, t in zip(ts, ts[1:]):
            assert got[(src, t)] == pytest.approx(s[t] - s[prev])
        assert (src, ts[0]) not in got  # first sample has no idelta


def test_deriv_and_predict_linear_exact_on_line(spark, store):
    st = MetricStore()
    rows = [("s", T0 + i * 60, 5.0 + 0.25 * (i * 60)) for i in range(30)]
    st.register(
        "lin",
        spark.createDataFrame(rows, "source string, t long, value double")
        .select("source", F.timestamp_seconds("t").alias("bucket_ts"), "value"),
    )
    d = _collect(promql(st, "deriv(lin[10m])"))
    p = _collect(promql(st, "predict_linear(lin[10m], 600)"))
    for i in range(1, 30):  # k >= 2
        t = T0 + i * 60
        assert d[("s", t)] == pytest.approx(0.25, abs=1e-9)
        want = 5.0 + 0.25 * (i * 60) + 0.25 * 600
        assert p[("s", t)] == pytest.approx(want, abs=1e-6)


def test_offset(store):
    got = _collect(promql(store, "mem_bytes offset 2m"))
    for src in ("s0", "s1"):
        s = _series(src, "g")
        for t, v in s.items():
            assert got[(src, t + 120)] == v


# ---------------------------------------------------------- aggregation


def test_aggregations_by_without(store):
    by = _collect(promql(store, "sum by (source) (mem_bytes)"))
    tot = _collect(promql(store, "sum(mem_bytes)"))
    wo = _collect(promql(store, "sum without (source) (mem_bytes)"))
    s0, s1 = _series("s0", "g"), _series("s1", "g")
    for t, v in s0.items():
        assert by[("s0", t)] == pytest.approx(v)  # single series per source
        want = v + s1.get(t, 0.0) if t in s1 else v
        assert tot[(t,)] == pytest.approx(want)
        assert wo[(t,)] == pytest.approx(want)
    cnt = _collect(promql(store, "count(mem_bytes)"))
    for t in s0:
        assert cnt[(t,)] == (2.0 if t in s1 else 1.0)


def test_topk_bottomk(store):
    top = _collect(promql(store, "topk(1, mem_bytes)"))
    bot = _collect(promql(store, "bottomk(1, mem_bytes)"))
    s0, s1 = _series("s0", "g"), _series("s1", "g")
    for t in set(s0) & set(s1):
        hi = max((s0[t], "s0"), (s1[t], "s1"))
        lo = min((s0[t], "s0"), (s1[t], "s1"))
        assert top[(hi[1], t)] == hi[0] and len(
            [k for k in top if k[1] == t]
        ) == 1
        assert bot[(lo[1], t)] == lo[0]


# --------------------------------------------------------- binary + set


def test_scalar_vector_and_comparisons(store):
    dbl = _collect(promql(store, "mem_bytes * 2 + 1"))
    s0 = _series("s0", "g")
    for t, v in s0.items():
        assert dbl[("s0", t)] == pytest.approx(v * 2 + 1)
    pos = _collect(promql(store, "mem_bytes > 0"))
    for t, v in s0.items():
        if v > 0:
            assert pos[("s0", t)] == v
        else:
            assert ("s0", t) not in pos
    b = _collect(promql(store, "mem_bytes > bool 0"))
    for t, v in s0.items():
        assert b[("s0", t)] == (1.0 if v > 0 else 0.0)


def test_vector_matching_and_set_ops(store):
    ratio = _collect(
        promql(store, "mem_bytes / on (source) sum by (source) (mem_bytes)")
    )
    for src in ("s0", "s1"):
        for t, v in _series(src, "g").items():
            if v == 0:  # PromQL 0/0 = NaN
                assert math.isnan(ratio[(src, t)])
            else:
                assert ratio[(src, t)] == pytest.approx(1.0)  # self-ratio
    s0, s1 = _series("s0", "g"), _series("s1", "g")
    both = _collect(promql(store, 'mem_bytes and mem_bytes{source="s1"}'))
    assert set(both) == {("s1", t) for t in s1}
    only0 = _collect(promql(store, 'mem_bytes unless mem_bytes{source="s1"}'))
    assert set(only0) == {("s0", t) for t in s0}
    orr = _collect(
        promql(
            store,
            'mem_bytes{source="s0"} or mem_bytes',
        )
    )
    assert set(orr) == {("s0", t) for t in s0} | {("s1", t) for t in s1}


def test_regex_matchers(store):
    got = promql(store, 'mem_bytes{source=~"s[01]"}').count()
    assert got == len(_series("s0", "g")) + len(_series("s1", "g"))
    assert promql(store, 'mem_bytes{source!~"s.*"}').count() == 0
    assert promql(store, 'mem_bytes{source!="s1"}').count() == len(
        _series("s0", "g")
    )


# ------------------------------------------------- histogram_quantile


def _hq_ref(buckets: list[tuple[float, float]], q: float) -> float:
    """PromQL reference: cumulative buckets sorted by le."""
    total = buckets[-1][1]
    rank = q * total
    lo, lo_cum = 0.0, 0.0
    for le, cum in buckets:
        if cum >= rank:
            if math.isinf(le):
                return buckets[-2][0]
            if cum == lo_cum:
                return le
            return lo + (le - lo) * (rank - lo_cum) / (cum - lo_cum)
        lo, lo_cum = le, cum
    return buckets[-1][0]


def test_histogram_quantile(store):
    got = _collect(promql(store, "histogram_quantile(0.9, latency_bucket)"))
    for s in ("s0", "s1"):
        for j in range(3):
            t = T0 + j * 60
            base = (j + 1) * (10 if s == "s0" else 7)
            cum, buckets = 0, []
            for le, add in [(0.1, base), (0.5, base * 2), (2.5, base),
                            (float("inf"), 3 if j == 2 else 0)]:
                cum += add
                buckets.append((le, float(cum)))
            assert got[(s, t)] == pytest.approx(_hq_ref(buckets, 0.9)), (s, t)


# ------------------------------------------------------------- plumbing


def test_errors(store):
    for bad in (
        "tokens_total[5m]",  # raw range vector
        "rate(tokens_total)",  # missing range
        "rate(sum(tokens_total))",  # non-selector range arg
        'mem_bytes{nope="x"}',  # unknown label
        "histogram_quantile(0.5, mem_bytes)",  # no le label
        "unknown_metric",
        "1 and 2",
    ):
        with pytest.raises(PromQLError):
            promql(store, bad).collect()


def test_plan_shape_rate(store):
    """rate() compiles to ONE exchange + one sort (lag + range-frame sum
    share the per-series window), with filters pushed into the plan."""
    import re

    df = promql(store, 'rate(tokens_total{source="s0"}[5m])')
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"\bExchange\b", plan)) == 1, plan
    assert len(re.findall(r"\bWindow\b", plan)) <= 2, plan


# --------------------------------------------- r3 extensions: quantiles,
# resets/changes, count_values, label fns, many-to-one matching


def _pyquantile(win: list[float], phi: float) -> float:
    s = sorted(win)
    n = len(s)
    r = phi * (n - 1)
    lo = int(math.floor(r))
    hi = min(lo + 1, n - 1)
    return s[lo] + (s[hi] - s[lo]) * (r - lo)


def test_quantile_over_time(store):
    got = _collect(promql(store, "quantile_over_time(0.9, mem_bytes[5m])"))
    for src in ("s0", "s1"):
        s = _series(src, "g")
        for t in sorted(s):
            win = _window(s, t, 300)
            assert got[(src, t)] == pytest.approx(_pyquantile(win, 0.9))


def test_resets_and_changes(store):
    got_r = _collect(promql(store, "resets(tokens_total[5m])"))
    got_c = _collect(promql(store, "changes(mem_bytes[5m])"))
    for src in ("s0", "s1"):
        s = _series(src, "c")
        ts = sorted(s)
        for t in ts:
            win = [tt for tt in ts if t - 300 < tt <= t]
            want = sum(
                1 for a, b in zip(win, win[1:]) if s[b] < s[a]
            )
            assert got_r[(src, t)] == want, (src, t)
        g = _series(src, "g")
        gts = sorted(g)
        for t in gts:
            win = [tt for tt in gts if t - 300 < tt <= t]
            want = sum(1 for a, b in zip(win, win[1:]) if g[b] != g[a])
            assert got_c[(src, t)] == want, (src, t)


def test_quantile_aggregation(store):
    got = _collect(promql(store, "quantile(0.5, mem_bytes)"))
    g0, g1 = _series("s0", "g"), _series("s1", "g")
    for t in sorted(set(g0) | set(g1)):
        vals = [s[t] for s in (g0, g1) if t in s]
        assert got[(t,)] == pytest.approx(_pyquantile(vals, 0.5))


def test_count_values(store):
    got = _collect(
        promql(store, 'count_values by (source) ("v", mem_bytes)')
    )
    for src in ("s0", "s1"):
        s = _series(src, "g")
        for t, v in s.items():
            assert got[(src, str(v), t)] == 1.0
    # collapsing the label set makes equal values actually count up
    tot = _collect(promql(store, 'count_values("v", sgn(mem_bytes))'))
    assert sum(tot.values()) == len(_series("s0", "g")) + len(
        _series("s1", "g")
    )
    assert any(v > 1.0 for v in tot.values())


def test_math_and_timestamp(store):
    sq = _collect(promql(store, "sqrt(abs(mem_bytes))"))
    s = _series("s0", "g")
    for t, v in s.items():
        assert sq[("s0", t)] == pytest.approx(math.sqrt(abs(v)))
    ts = _collect(promql(store, "timestamp(mem_bytes)"))
    for t in s:
        assert ts[("s0", t)] == float(t)
    ln = _collect(promql(store, "ln(exp(clamp_max(mem_bytes, 3)))"))
    for t, v in s.items():
        assert ln[("s0", t)] == pytest.approx(min(v, 3.0))


def test_label_replace_and_join(store):
    got = promql(
        store,
        'label_replace(mem_bytes, "env", "prod-$1", "source", "s(\\d+)")',
    )
    assert set(got.columns) == {"source", "env", "ts", "value"}
    envs = {(r.source, r.env) for r in got.collect()}
    assert envs == {("s0", "prod-0"), ("s1", "prod-1")}
    # non-matching regex keeps the sample with empty dst
    miss = promql(
        store, 'label_replace(mem_bytes, "env", "x$1", "source", "zzz")'
    )
    assert {r.env for r in miss.collect()} == {""}
    joined = promql(
        store, 'label_join(label_replace(mem_bytes, "env", "p", "source",'
        ' "s0"), "key", "-", "source", "env")'
    )
    keys = {(r.source, r.key) for r in joined.collect()}
    assert keys == {("s0", "s0-p"), ("s1", "s1-")}


@pytest.fixture(scope="module")
def info_store(spark, store):
    """Adds a (source, mode) metric and a (source, unit) info metric."""
    rows = [
        (s, m, T0 + i * 60, float((i + len(m)) % 7 + 1))
        for s in ("s0", "s1")
        for m in ("user", "sys")
        for i in range(5)
    ]
    df = spark.createDataFrame(
        rows, "source string, mode string, tsec long, value double"
    ).select("source", "mode", F.timestamp_seconds("tsec").alias("bucket_ts"),
             "value")
    store.register("cpu_seconds", df, labels=("source", "mode"))
    info = [
        (s, "bytes", T0 + i * 60, 2.0 if s == "s0" else 4.0)
        for s in ("s0", "s1")
        for i in range(5)
    ]
    idf = spark.createDataFrame(
        info, "source string, unit string, tsec long, value double"
    ).select("source", "unit", F.timestamp_seconds("tsec").alias("bucket_ts"),
             "value")
    store.register("mem_info", idf, labels=("source", "unit"))
    return store


def test_group_left(info_store):
    got = promql(
        info_store,
        "cpu_seconds / on (source) group_left mem_info",
    )
    assert set(got.columns) == {"source", "mode", "ts", "value"}
    rows = {(r.source, r.mode, int(r.ts.timestamp())): r.value
            for r in got.collect()}
    assert len(rows) == 20  # every many-side sample matched
    for (s, m, t), v in rows.items():
        cpu = float((((t - T0) // 60) + len(m)) % 7 + 1)
        mem = 2.0 if s == "s0" else 4.0
        assert v == pytest.approx(cpu / mem)
    # group_left(unit) copies the info label onto the result
    lbl = promql(
        info_store,
        "cpu_seconds * on (source) group_left (unit) mem_info",
    )
    assert "unit" in lbl.columns
    assert {r.unit for r in lbl.collect()} == {"bytes"}


def test_group_right(info_store):
    got = promql(
        info_store,
        "mem_info + on (source) group_right cpu_seconds",
    )
    assert set(got.columns) == {"source", "mode", "ts", "value"}
    assert got.count() == 20


def test_group_left_many_to_many_raises(info_store, spark):
    dup = [
        (s, u, T0, 1.0)
        for s in ("s0", "s1")
        for u in ("bytes", "kb")  # two rows per (source, ts): not 'one'
    ]
    ddf = spark.createDataFrame(
        dup, "source string, unit string, tsec long, value double"
    ).select("source", "unit", F.timestamp_seconds("tsec").alias("bucket_ts"),
             "value")
    info_store.register("dup_info", ddf, labels=("source", "unit"))
    bad = promql(info_store, "cpu_seconds / on (source) group_left dup_info")
    with pytest.raises(Exception, match="multiple matches"):
        bad.collect()


def test_group_modifier_parse_errors():
    with pytest.raises(PromQLError, match="requires on"):
        parse("a / group_left b")
    ast = parse("a / on (source) group_left (unit) b")
    assert ast.group == "left" and ast.group_labels == ("unit",)


def test_subquery_over_rate(store):
    """max_over_time over a rate() subquery: the inner expression's grid
    supplies the samples, the outer frame windows them."""
    got = _collect(
        promql(store, "max_over_time(rate(tokens_total[5m])[15m:])")
    )
    for src in ("s0", "s1"):
        s = _series(src, "c")
        ts = sorted(s)
        deltas = {}
        for a, b in zip(ts, ts[1:]):
            deltas[b] = (s[b] - s[a] if s[b] >= s[a] else s[b])
        rate = {}
        for t in ts:
            win = [deltas[tt] for tt in ts
                   if t - 300 < tt <= t and tt in deltas]
            if win:
                rate[t] = sum(win) / 300.0
        for t in sorted(rate):
            outer = [rate[tt] for tt in rate if t - 900 < tt <= t]
            assert got[(src, t)] == pytest.approx(max(outer)), (src, t)


def test_subquery_over_aggregation(store):
    """avg_over_time over a sum() subquery — aggregations drop labels,
    the subquery windows the aggregated series."""
    got = _collect(
        promql(store, "avg_over_time(sum(mem_bytes)[10m:])")
    )
    g0, g1 = _series("s0", "g"), _series("s1", "g")
    tot = {
        t: sum(s[t] for s in (g0, g1) if t in s)
        for t in sorted(set(g0) | set(g1))
    }
    for t in tot:
        win = [tot[tt] for tt in tot if t - 600 < tt <= t]
        assert got[(t,)] == pytest.approx(sum(win) / len(win)), t


def test_time_component_zero_arg_is_promql_error():
    """r5 ADVICE fix: Prometheus's 0-arg eval-time form (`minute()`)
    is unsupported here — must raise PromQLError, not IndexError."""
    with pytest.raises(PromQLError, match="eval-time form"):
        promql(MetricStore(), "minute()")
    with pytest.raises(PromQLError, match="eval-time form"):
        promql(MetricStore(), "day_of_week()")


def test_subquery_parse_errors():
    with pytest.raises(PromQLError, match="re-sampling is not supported"):
        parse("max_over_time(rate(x[5m])[30m:1m])")
    with pytest.raises(PromQLError, match="needs a range function"):
        promql(MetricStore(), "rate(x[5m])[30m:]")
    with pytest.raises(PromQLError, match="instant selectors"):
        parse("max_over_time(rate(x[5m])[30m])")


# ------------------------------------------------------------ query_range


def _qr_reference(series: dict[int, float], t0, t1, step, look):
    """Pure-python as-of resample with staleness lookback."""
    out = {}
    ts = sorted(series)
    for t in range(t0, t1 + 1, step):
        past = [tt for tt in ts if tt <= t and tt >= t - look]
        if past:
            out[t] = series[max(past)]
    return out


def test_query_range_resamples_with_staleness(store):
    from workbook_exporter_fe_spark.plans.promql import query_range

    # off-grid step (90s over a 60s-native gauge) + tight lookback that
    # the s1 gaps (every i%7==3 missing) actually exceed
    t0, t1, step, look = T0 + 45, T0 + 39 * 60, 90, 90
    got = _collect(query_range(store, "mem_bytes", t0, t1, "90s", "90s"))
    for src in ("s0", "s1"):
        want = _qr_reference(_series(src, "g"), t0, t1, step, look)
        mine = {t: v for (s, t), v in got.items() if s == src}
        assert mine == pytest.approx(want), src
        # staleness actually dropped something for the gappy series
    s1_grid = len(range(t0, t1 + 1, step))
    assert len([1 for (s, _) in got if s == "s1"]) < s1_grid


def test_query_range_over_expression(store):
    """Resampling composes with a real expression (rate over counter)."""
    from workbook_exporter_fe_spark.plans.promql import query_range

    native = _collect(promql(store, "rate(tokens_total[5m])"))
    got = _collect(
        query_range(store, "rate(tokens_total[5m])", T0, T0 + 39 * 60, "60s")
    )
    # on the shared grid, query_range == native evaluation wherever the
    # native grid has a sample (lookback 5m > native step 60s)
    for (src, t), v in native.items():
        assert got[(src, t)] == pytest.approx(v), (src, t)


def test_query_range_exact_grid_hit_and_errors(store):
    from workbook_exporter_fe_spark.plans.promql import query_range

    # a grid point exactly ON a sample sees that sample (t inclusive)
    got = _collect(query_range(store, "mem_bytes", T0, T0, "60s"))
    for src in ("s0", "s1"):
        assert got[(src, T0)] == pytest.approx(_series(src, "g")[T0])
    with pytest.raises(PromQLError, match="step"):
        query_range(store, "mem_bytes", T0, T0 - 60, "60s")
    with pytest.raises(PromQLError, match="epoch"):
        query_range(store, "mem_bytes", "yesterday", T0, "60s")


def test_absent_range(store):
    from workbook_exporter_fe_spark.plans.promql import absent_range

    # beyond the last sample + lookback, the metric goes absent
    t_last = T0 + 39 * 60
    got = _collect(
        absent_range(store, "mem_bytes", T0, t_last + 20 * 60, "60s", "5m")
    )
    # absent exactly where BOTH series are stale: after t_last + 5m
    want = {
        (t,): 1.0
        for t in range(T0, t_last + 20 * 60 + 1, 60)
        if t > t_last + 300
    }
    assert got == want
    # a metric alive through the whole window is never absent
    assert _collect(absent_range(store, "mem_bytes", T0, t_last, "60s")) == {}


# ------------------------------------------------ round-4 function sweep


def test_irate_matches_reference(store):
    """Last-two-samples instantaneous rate, counter-reset aware, previous
    sample must lie inside the range window."""
    got = _collect(promql(store, "irate(tokens_total[5m])"))
    for src in ("s0", "s1"):
        pts = sorted(_series(src, "c").items())
        for i, (t, v) in enumerate(pts):
            if i == 0:
                assert (src, t) not in got
                continue
            pt, pv = pts[i - 1]
            if pt <= t - 300:  # previous sample fell out of the window
                assert (src, t) not in got
                continue
            num = v - pv if v >= pv else v
            assert got[(src, t)] == pytest.approx(num / (t - pt))


def test_present_and_stdvar_over_time(store):
    got = _collect(promql(store, "present_over_time(mem_bytes[5m])"))
    assert set(got.values()) == {1.0}
    gv = _collect(promql(store, "stdvar_over_time(mem_bytes[5m])"))
    gs = _collect(promql(store, "stddev_over_time(mem_bytes[5m])"))
    for k, v in gv.items():
        assert v == pytest.approx(gs[k] ** 2, abs=1e-9)


def test_clamp_and_sort(store):
    got = _collect(promql(store, "clamp(mem_bytes, 0, 10)"))
    raw = _collect(promql(store, "mem_bytes"))
    assert got == {k: min(10.0, max(0.0, v)) for k, v in raw.items()}
    # min > max -> NaN everywhere (PromQL rule)
    nan = _collect(promql(store, "clamp(mem_bytes, 5, 1)"))
    assert all(math.isnan(v) for v in nan.values())
    # sort/sort_desc are presentational: same row set either way
    assert _collect(promql(store, "sort(mem_bytes)")) == raw
    assert _collect(promql(store, "sort_desc(mem_bytes)")) == raw


def test_group_and_stdvar_aggregations(store):
    got = _collect(promql(store, "group by (source) (mem_bytes)"))
    assert set(got.values()) == {1.0}
    gv = _collect(promql(store, "stdvar(mem_bytes)"))
    gs = _collect(promql(store, "stddev(mem_bytes)"))
    for k, v in gv.items():
        assert v == pytest.approx(gs[k] ** 2, abs=1e-9)


def test_mad_over_time_reference(store):
    """MAD = phi=0.5 item-median of |x - median(window)| — both medians
    the sorted-item pick / exact midpoint."""
    def med(a):
        n, m = len(a), len(a) // 2
        return a[m] if n % 2 == 1 else (a[m - 1] + a[m]) / 2.0

    got = _collect(promql(store, "mad_over_time(mem_bytes[5m])"))
    for src in ("s0", "s1"):
        series = _series(src, "g")
        for t in series:
            w = sorted(_window(series, t, 300))
            want = med(sorted(abs(x - med(w)) for x in w))
            assert got[(src, t)] == want


def test_holt_winters_reference(store):
    """Bit-exact Prometheus double-exponential smoothing (funcHoltWinters
    fold: s1=x0, b=x1-x0, then s1' = sf*x + (1-sf)*(s1+b'))."""
    def ref(xs, sf, tf):
        if len(xs) < 2:
            return None
        s0, s1, b = 0.0, xs[0], xs[1] - xs[0]
        for i in range(1, len(xs)):
            x = sf * xs[i]
            if i >= 2:
                b = tf * (s1 - s0) + (1 - tf) * b
            y = (1 - sf) * (s1 + b)
            s0, s1 = s1, x + y
        return s1

    got = _collect(promql(store, "holt_winters(mem_bytes[10m], 0.5, 0.25)"))
    n_checked = 0
    for src in ("s0", "s1"):
        series = _series(src, "g")
        for t in series:
            w = _window(series, t, 600)
            want = ref(w, 0.5, 0.25)
            if want is None:
                assert (src, t) not in got
            else:
                assert got[(src, t)] == want
                n_checked += 1
    assert n_checked > 50


def test_holt_winters_validates_factors(store):
    with pytest.raises(PromQLError):
        promql(store, "holt_winters(mem_bytes[5m], 1.5, 0.25)")
    with pytest.raises(PromQLError):
        promql(store, "holt_winters(mem_bytes[5m], 0.5)")


# ------------------------------------------------- approx mode (r5)


def test_approx_holt_winters_equals_exact(store):
    """Production mode drops the per-row struct sort; with unique
    timestamps per series the frame's collect order IS time order, so
    the fold output is bit-identical to exact mode."""
    expr = "holt_winters(mem_bytes[10m], 0.5, 0.25)"
    exact = _collect(promql(store, expr))
    approx = _collect(promql(store, expr, mode="approx"))
    assert approx == exact and len(exact) > 0


def _approx_errs(store, expr, warmup_s=900):
    """Relative errors on FULL windows (grid points at least one window
    length past each series' first sample — partial warm-up windows of
    1-3 items are noise in both modes and not the production regime)."""
    exact = _collect(promql(store, expr))
    approx = _collect(promql(store, expr, mode="approx"))
    assert set(approx) == set(exact) and len(exact) > 0
    t0 = {}
    for k in exact:
        t0[k[:-1]] = min(t0.get(k[:-1], k[-1]), k[-1])
    errs = []
    for k, v in exact.items():
        a = approx[k]
        if v is None:
            assert a is None
            continue
        if k[-1] < t0[k[:-1]] + warmup_s:
            continue
        errs.append(abs(a - v) / max(abs(v), 1.0))
    errs.sort()
    return errs


def test_approx_mad_and_quantile_envelope(store, spark):
    """Production-mode envelope, pinned on BOTH the adversarial modular
    gauge (jumps of ±22 every step) and a smooth tier-like series
    (diurnal sine + ripple): MAD = quartile deviation (IQR/2 — equals
    exact MAD for symmetric windows) stays within 15% median / 60%
    worst-case relative; the GK quantile within 10%/40% (it returns a
    window ITEM where exact interpolates between two). MAD's worst case
    is 75%: item-quartiles on 15-item windows are one inter-item gap
    coarser than the interpolated exact rank pick."""
    import math

    smooth = MetricStore()
    rows = [
        (s, T0 + i * 60,
         float(100 + 20 * math.sin(2 * math.pi * i / 60)
               + ((i * 7 + ord(s[-1])) % 5)))
        for s in ("s0", "s1") for i in range(200)
    ]
    smooth.register("mem_bytes", spark.createDataFrame(
        rows, "source string, tsec long, value double"
    ).select("source", F.timestamp_seconds("tsec").alias("bucket_ts"),
             "value"))
    for st in (store, smooth):
        errs = _approx_errs(st, "mad_over_time(mem_bytes[15m])")
        assert errs[len(errs) // 2] <= 0.15, errs[len(errs) // 2]
        assert errs[-1] <= 0.75, errs[-1]
        errs = _approx_errs(st, "quantile_over_time(0.9, mem_bytes[15m])")
        assert errs[len(errs) // 2] <= 0.10, errs[len(errs) // 2]
        assert errs[-1] <= 0.40, errs[-1]


def test_approx_mad_exact_on_stable_series(spark):
    """A constant series has MAD 0 in both modes — the streaming
    approximation is EXACT when the window median is stable."""
    st = MetricStore()
    rows = [("s0", T0 + i * 60, 7.0) for i in range(30)]
    st.register("flat", spark.createDataFrame(
        rows, "source string, tsec long, value double"
    ).select("source", F.timestamp_seconds("tsec").alias("bucket_ts"),
             "value"))
    expr = "mad_over_time(flat[10m])"
    assert _collect(promql(st, expr, mode="approx")) \
        == _collect(promql(st, expr))
    assert all(
        v == 0.0 for v in _collect(promql(st, expr, mode="approx")).values()
    )


def test_promql_mode_validated(store):
    with pytest.raises(PromQLError, match="unknown mode"):
        promql(store, "mem_bytes", mode="fast")


def test_query_range_mode_passthrough(store):
    """query_range(mode='approx') evaluates the production kernels on
    the same grid: identical row keys, envelope-close values."""
    from workbook_exporter_fe_spark.plans.promql import query_range

    expr = "mad_over_time(mem_bytes[15m])"
    exact = _collect(query_range(store, expr, T0, T0 + 1800, step="5m"))
    approx = _collect(
        query_range(store, expr, T0, T0 + 1800, step="5m", mode="approx")
    )
    assert set(approx) == set(exact) and len(exact) > 0


def test_at_modifier_pins_evaluation_time(store):
    """`m @ t` is the as-of value at t, constant across the series' own
    grid; `offset` composes relative to t; stale series are absent."""
    pts = sorted(_series("s0", "g").items())
    t_pin = pts[10][0]
    got = _collect(promql(store, f'mem_bytes{{source="s0"}} @ {t_pin}'))
    # every grid timestamp of s0 carries the pinned value
    want_v = dict(pts)[t_pin]
    assert set(got.values()) == {want_v}
    assert len(got) == len(pts)
    # offset shifts the pin: value as-of (t_pin - 120)
    got_off = _collect(
        promql(store, f'mem_bytes{{source="s0"}} offset 2m @ {t_pin}')
    )
    want_off = max(
        (t for t, _ in pts if t <= t_pin - 120), default=None
    )
    assert set(got_off.values()) == {dict(pts)[want_off]}


def test_at_modifier_share_of_final(store):
    """The normalization idiom `m / m @ end` — per-sample share of the
    final value, one IEEE division per row."""
    pts = dict(_series("s0", "g"))
    t_end = max(pts)
    got = _collect(
        promql(store, f'mem_bytes{{source="s0"}} / mem_bytes{{source="s0"}} @ {t_end}')
    )
    for (_, t), v in got.items():
        assert v == pts[t] / pts[t_end]


def test_at_modifier_errors(store):
    with pytest.raises(PromQLError):
        promql(store, "rate(tokens_total[5m] @ 100)")
    with pytest.raises(PromQLError):
        promql(store, "mem_bytes @ end()")


def test_time_component_functions(store):
    """minute/hour/day_of_week/... read sample VALUES as unix timestamps
    (UTC), the Prometheus `f(timestamp(v))` idiom; day_of_week is
    0=Sunday."""
    import datetime as dt

    got = {
        name: _collect(promql(store, f"{name}(timestamp(mem_bytes))"))
        for name in ("minute", "hour", "day_of_week", "day_of_month",
                     "month", "year", "days_in_month")
    }
    for (src, t) in got["minute"]:
        d = dt.datetime.fromtimestamp(t, dt.timezone.utc)
        key = (src, t)
        assert got["minute"][key] == d.minute
        assert got["hour"][key] == d.hour
        assert got["day_of_week"][key] == (d.weekday() + 1) % 7
        assert got["day_of_month"][key] == d.day
        assert got["month"][key] == d.month
        assert got["year"][key] == d.year
        nxt = (d.replace(day=28) + dt.timedelta(days=4)).replace(day=1)
        assert got["days_in_month"][key] == (nxt - dt.timedelta(days=1)).day


def test_trig_and_pi_functions(store):
    import math as _m

    got = _collect(promql(store, "sin(rad(deg(rad(mem_bytes))))"))
    pts = _series("s0", "g")
    for (src, t), v in got.items():
        if src == "s0":
            assert v == pytest.approx(_m.sin(_m.radians(_m.degrees(
                _m.radians(pts[t])))), abs=1e-12)
    # pi() is a scalar usable in arithmetic
    gp = _collect(promql(store, "mem_bytes * pi()"))
    for (src, t), v in gp.items():
        if src == "s0":
            assert v == pts[t] * _m.pi
    with pytest.raises(PromQLError):
        promql(store, "pi(mem_bytes)")
