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
