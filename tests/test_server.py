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
