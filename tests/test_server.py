"""HTTP facade (run_server.py): every reference route driven in-process.

The reference app's users interact through six Flask routes (SURVEY §3);
this suite uploads the reference's own dummy workbook over HTTP, runs
two exporters, downloads the YAML, and pins it byte-identical to the
direct pipeline call — the web path and the CLI path must be the same
engine.
"""

from __future__ import annotations

import os
import sys
import threading
import urllib.error
import urllib.request
from http.cookiejar import CookieJar

import pytest

sys.path.insert(0, "/root/repo")

from run_server import make_server  # noqa: E402

CSV = "/root/reference/dummy_data/dummy_data.csv"
BOUNDARY = "wbtestboundary42"


@pytest.fixture()
def served(spark, tmp_path):
    server, state = make_server(str(tmp_path / "uploads"), port=0)
    state.spark = spark  # share the test session; no second JVM
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    opener = urllib.request.build_opener(
        urllib.request.HTTPCookieProcessor(CookieJar())
    )
    yield base, opener, state
    server.shutdown()


def _multipart(fields: dict) -> tuple[bytes, str]:
    lines: list[bytes] = []
    for name, value in fields.items():
        lines.append(f"--{BOUNDARY}".encode())
        if isinstance(value, tuple):
            fname, payload = value
            lines.append(
                f'Content-Disposition: form-data; name="{name}"; '
                f'filename="{fname}"'.encode()
            )
            lines.append(b"Content-Type: application/octet-stream")
            lines.append(b"")
            lines.append(payload)
        else:
            lines.append(
                f'Content-Disposition: form-data; name="{name}"'.encode()
            )
            lines.append(b"")
            lines.append(str(value).encode())
    lines.append(f"--{BOUNDARY}--".encode())
    lines.append(b"")
    return b"\r\n".join(lines), f"multipart/form-data; boundary={BOUNDARY}"


def _post(opener, url, body, ctype):
    req = urllib.request.Request(url, data=body, method="POST")
    req.add_header("Content-Type", ctype)
    return opener.open(req)


def test_full_workflow_matches_direct_pipeline(served, spark, tmp_path):
    base, opener, state = served
    # EP1: upload the reference's dummy workbook
    with open(CSV, "rb") as f:
        csv_bytes = f.read()
    body, ctype = _multipart({"file": ("dummy_data.csv", csv_bytes)})
    resp = _post(opener, base + "/", body, ctype)
    # 303 → followed to GET /process: the picker page lists exporters
    page = resp.read().decode()
    assert "exporter_cms" in page and "exporter_vmware" in page

    # EP2: run two exporters (urlencoded, like a plain form post)
    form = (
        "exporters=exporter_cms&exporters=exporter_linux"
        "&default_listen_port=6001"
    )
    resp = _post(
        opener, base + "/process", form.encode(),
        "application/x-www-form-urlencoded",
    )
    served_yaml = resp.read()  # redirect followed → the document

    # EP3: explicit download fetches the same bytes
    got = opener.open(base + "/download/dummy_data_output.yaml").read()
    assert got == served_yaml and len(got) > 0

    # byte parity with the direct pipeline call (same engine, no drift)
    from workbook_exporter_fe_spark.plans.workbook_run import (
        run_workbook_pipeline,
    )

    direct = str(tmp_path / "direct.yaml")
    summary = run_workbook_pipeline(
        spark, CSV, direct, exporters="exporter_cms,exporter_linux"
    )
    with open(direct, "rb") as f:
        assert f.read() == got
    # the flash-message log carries the same host counts
    logs = opener.open(base + "/get_logs").read().decode()
    for exp, n in summary["hosts_processed"].items():
        assert f"Total number of hosts processed ({exp}): {n}" in logs
    assert "<pre>" in opener.open(base + "/terminal").read().decode()


def test_upload_rejects_bad_extension(served):
    base, opener, _ = served
    body, ctype = _multipart({"file": ("evil.exe", b"MZ")})
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(opener, base + "/", body, ctype)
    assert e.value.code == 400


def test_process_without_upload_is_400(served):
    base, opener, _ = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(
            opener, base + "/process", b"exporters=all",
            "application/x-www-form-urlencoded",
        )
    assert e.value.code == 400


def test_unknown_exporter_is_400(served):
    base, opener, _ = served
    body, ctype = _multipart({"file": ("wb.csv", open(CSV, "rb").read())})
    _post(opener, base + "/", body, ctype)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(
            opener, base + "/process", b"exporters=exporter_nope",
            "application/x-www-form-urlencoded",
        )
    assert e.value.code == 400


def test_finish_and_clean_removes_staged_files(served, spark):
    base, opener, state = served
    body, ctype = _multipart({"file": ("wb.csv", open(CSV, "rb").read())})
    _post(opener, base + "/", body, ctype)
    staged = os.path.join(state.upload_dir, "wb.csv")
    assert os.path.exists(staged)
    _post(
        opener, base + "/process", b"exporters=exporter_cms",
        "application/x-www-form-urlencoded",
    )
    out = os.path.join(state.upload_dir, "wb_output.yaml")
    assert os.path.exists(out)
    _post(opener, base + "/finish_and_clean", b"", "text/plain")
    assert not os.path.exists(staged) and not os.path.exists(out)


def test_oversize_upload_rejected(served, monkeypatch):
    import run_server as rs

    base, opener, _ = served
    monkeypatch.setattr(rs, "MAX_CONTENT_LENGTH", 10)
    body, ctype = _multipart({"file": ("wb.csv", b"x" * 100)})
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(opener, base + "/", body, ctype)
    assert e.value.code == 413


# ------------------------------------------------------- PromQL API (r5)


@pytest.fixture()
def tier1_path(spark, tmp_path):
    """Tiny tier-1-shaped table (mirrors tests/test_run_query.py)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "tier1")
    (
        spark.range(60)
        .select(
            F.concat(F.lit("s"), (F.col("id") % 2).cast("string"))
            .alias("source"),
            F.timestamp_seconds(
                1700000000 + (F.col("id") / 2).cast("long") * 60
            ).alias("bucket_ts"),
            (F.col("id") * 1.0).alias("sum_v"),
        )
        .write.parquet(path)
    )
    return path


@pytest.fixture()
def promql_served(spark, tmp_path, tier1_path):
    server, state = make_server(
        str(tmp_path / "uploads"), port=0,
        metrics_cfg={"metrics": [{
            "name": "tok", "table": tier1_path,
            "value": "sum_v", "labels": ["source"],
        }]},
    )
    state.spark = spark
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}", state
    server.shutdown()


def _get_json(url):
    import json

    with urllib.request.urlopen(url) as r:
        return json.loads(r.read())


def _series_map(payload):
    assert payload["status"] == "success"
    assert payload["data"]["resultType"] == "matrix"
    return {
        tuple(sorted(s["metric"].items())): s["values"]
        for s in payload["data"]["result"]
    }


def test_api_query_instant_matches_direct_eval(promql_served, spark):
    """HTTP /api/v1/query ≡ plans.promql.promql() over the same store
    (run_query.py's path) — VERDICT r4 item #7's pin."""
    from datetime import timezone
    from urllib.parse import quote

    from workbook_exporter_fe_spark.plans.promql import promql

    base, state = promql_served
    expr = "sum by (source) (sum_over_time(tok[5m]))"
    got = _series_map(_get_json(base + "/api/v1/query?query=" + quote(expr)))
    want: dict = {}
    for r in promql(state.get_store(), expr).collect():
        want.setdefault(
            (("source", r["source"]),), []
        ).append(
            [r["ts"].replace(tzinfo=timezone.utc).timestamp(),
             str(float(r["value"]))]
        )
    want = {k: sorted(v) for k, v in want.items()}
    assert got == want and len(got) == 2


def test_api_query_range_matches_direct_eval(promql_served, spark):
    from datetime import timezone
    from urllib.parse import quote, urlencode

    from workbook_exporter_fe_spark.plans.promql import query_range

    base, state = promql_served
    expr = "avg_over_time(tok[5m])"
    start, end = 1700000000, 1700001800
    qs = urlencode({
        "query": expr, "start": start, "end": end, "step": "5m",
    })
    got = _series_map(_get_json(base + "/api/v1/query_range?" + qs))
    want: dict = {}
    for r in query_range(
        state.get_store(), expr, start, end, step="5m"
    ).collect():
        want.setdefault((("source", r["source"]),), []).append(
            [r["ts"].replace(tzinfo=timezone.utc).timestamp(),
             str(float(r["value"]))]
        )
    want = {k: sorted(v) for k, v in want.items()}
    assert got == want
    # grid spacing is the step
    for vs in got.values():
        ts = [t for t, _ in vs]
        assert all(b - a == 300 for a, b in zip(ts, ts[1:]))
    # POST form works identically
    req = urllib.request.Request(
        base + "/api/v1/query_range", data=qs.encode(), method="POST"
    )
    req.add_header("Content-Type", "application/x-www-form-urlencoded")
    import json

    with urllib.request.urlopen(req) as r:
        assert _series_map(json.loads(r.read())) == want


def test_api_query_errors(promql_served, tmp_path, spark):
    base, state = promql_served
    # bad PromQL → 400 with the Prometheus error envelope
    with pytest.raises(urllib.error.HTTPError) as e:
        _get_json(base + "/api/v1/query?query=rate(")
    assert e.value.code == 400
    import json

    body = json.loads(e.value.read())
    assert body["status"] == "error" and body["errorType"] == "bad_data"
    # missing query param
    with pytest.raises(urllib.error.HTTPError) as e:
        _get_json(base + "/api/v1/query")
    assert e.value.code == 400
    # range without bounds
    with pytest.raises(urllib.error.HTTPError) as e:
        _get_json(base + "/api/v1/query_range?query=tok")
    assert e.value.code == 400
    # r5 review fix: malformed start/end → 400 envelope, not a dropped
    # connection (only PromQLError was caught before)
    with pytest.raises(urllib.error.HTTPError) as e:
        _get_json(base + "/api/v1/query_range?query=tok&start=abc&end=now")
    assert e.value.code == 400
    assert json.loads(e.value.read())["errorType"] == "bad_data"
    # unconfigured server → 503
    server, st2 = make_server(str(tmp_path / "u2"), port=0)
    st2.spark = spark
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _get_json(
                f"http://127.0.0.1:{server.server_address[1]}"
                "/api/v1/query?query=tok"
            )
        assert e.value.code == 503
    finally:
        server.shutdown()


def test_api_sees_new_snapshots(spark, tmp_path):
    """The store is rebuilt per request, so a tier publish (new
    SnapshotTable commit) is visible to the NEXT query — the long-lived
    server never pins the first-seen snapshot (r5 freshness rule)."""
    import json

    from pyspark.sql import functions as F

    from workbook_exporter_fe_spark.sources.snapshots import SnapshotTable

    root = str(tmp_path / "tier1")
    t = SnapshotTable(spark, root)
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.lit("s0").alias("source"),
        F.timestamp_seconds(1700000000 + F.col("id") * 60)
        .alias("bucket_ts"),
        F.col("id").cast("double").alias("sum_v"),
    )
    t.commit(mk(0, 10))
    server, state = make_server(
        str(tmp_path / "uploads"), port=0,
        metrics_cfg={"metrics": [{
            "name": "tok", "table": root,
            "value": "sum_v", "labels": ["source"],
        }]},
    )
    state.spark = spark
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        def n_points():
            with urllib.request.urlopen(
                base + "/api/v1/query?query=tok"
            ) as r:
                data = json.loads(r.read())["data"]["result"]
            return sum(len(s["values"]) for s in data)

        assert n_points() == 10
        t.commit(mk(10, 25))  # append AFTER the first query
        assert n_points() == 25
    finally:
        server.shutdown()
