#!/usr/bin/env python
"""HTTP facade: the reference's Flask endpoints over the Spark engine.

The reference (workbook_exporter-fe.py) is a Flask app; its users drive
the whole pipeline through six routes (SURVEY §3 EP1-EP3). This is the
same surface on the stdlib ``http.server`` — no new dependency — with
the execution swapped from the per-row pandas loop to
``plans/workbook_run.run_workbook_pipeline`` (one workbook read, one
merged YAML write):

- ``GET /``                upload form          (reference :1940)
- ``POST /``               stage workbook (+ optional existing YAML),
                           extension allow-list + size cap (:1928, :2077),
                           path remembered per session cookie (:1959)
- ``GET/POST /process``    exporter pick list → run → redirect to
                           download (:2002-2015)
- ``GET /download/<file>`` fetch the produced document (:2073)
- ``GET /get_logs``        plain-text run log (:1984)
- ``GET /terminal``        log view page (:2068)
- ``POST /finish_and_clean`` delete the session's staged files (:2018)

r5 addition — the engine's PromQL surface over the same server
(Prometheus HTTP API shape, delegating to plans/promql over a
MetricStore built from ``--metric``/``--metrics-config``):

- ``GET/POST /api/v1/query``        params: query — the instant form,
                                    evaluated on the NATIVE tier grid
                                    (engine deviation 1), returned as a
                                    resultType=matrix over that grid
- ``GET/POST /api/v1/query_range``  params: query, start, end,
                                    step (default 1m), lookback (5m) —
                                    the explicit-grid as-of resample
                                    (promql.query_range)

Responses follow Prometheus's envelope: ``{"status": "success",
"data": {"resultType": "matrix", "result": [{"metric": {labels},
"values": [[epoch_sec, "value"], ...]}]}}``; PromQL errors come back
``{"status": "error", "errorType": "bad_data", "error": ...}`` with
HTTP 400. tests/test_server.py pins HTTP JSON ≡ the direct
promql()/query_range() evaluation (run_query.py's path).

Deliberate deviations, mirrored from the repo's Appendix-A
adjudications: the exporter list is the REAL spec registry (the
reference UI's `exporter_wmware` typo made vmware unreachable, and its
'all' list silently dropped 15 exporters — here 'all' means all), and
`.xlsx` uploads are accepted since the engine reads them (the
reference allow-list oddly admits `docx` it can never parse, kept for
compat). One Spark session is created lazily on first /process and
reused; concurrent requests are serialized by the handler's run lock
(the reference's Flask dev server is effectively single-worker too).

Usage: python run_server.py [--port 8001] [--upload-dir DIR] [--cores N]
Smoke: tests/test_server.py drives every route in-process over urllib.
"""

from __future__ import annotations

import argparse
import html
import json
import os
import re
import sys
import threading
import uuid
from email.parser import BytesParser
from email.policy import default as email_default
from http import HTTPStatus
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: reference :1928 (docx kept for compat) + the engine's real formats
ALLOWED_EXTENSIONS = {"csv", "docx", "yaml", "yml", "eyaml", "xlsx", "xls"}
MAX_CONTENT_LENGTH = 100 * 1024 * 1024  # reference :2077


def secure_filename(name: str) -> str:
    """Werkzeug-shaped sanitization: basename, keep [A-Za-z0-9._-]."""
    name = os.path.basename(name.replace("\\", "/"))
    name = re.sub(r"[^A-Za-z0-9._-]", "_", name).lstrip("._")
    return name or "upload"


class AppState:
    """Process-wide state: staged files per session, logs, lazy Spark."""

    def __init__(
        self, upload_dir: str, cores: str = "*",
        metrics_cfg: dict | None = None,
    ):
        self.upload_dir = upload_dir
        os.makedirs(upload_dir, exist_ok=True)
        self.cores = cores
        self.sessions: dict[str, dict] = {}
        self.logs: list[str] = []
        self.spark = None
        self.run_lock = threading.Lock()
        self.metrics_cfg = metrics_cfg
        self._store = None

    def log(self, msg: str) -> None:
        self.logs.append(msg)

    def get_spark(self):
        if self.spark is None:
            from workbook_exporter_fe_spark.session import get_spark

            self.spark = get_spark(app_name="run_server", cores=self.cores)
        return self.spark

    def get_store(self):
        """MetricStore over the configured tier tables (same loader as
        run_rules/run_query — parquet dirs or SnapshotTable roots).
        REBUILT per call: SnapshotTable metrics resolve their manifest at
        load time, and a long-lived server must see new tier publishes —
        registration itself is lazy, so a rebuild costs a manifest read
        only when the query actually touches the metric (run_rules
        --follow applies the same rebuild-per-pass rule)."""
        if not (self.metrics_cfg or {}).get("metrics"):
            return None
        from run_rules import build_store

        self._store = build_store(self.get_spark(), self.metrics_cfg)
        return self._store


def _allowed_file(name: str) -> bool:
    return "." in name and name.rsplit(".", 1)[1].lower() in ALLOWED_EXTENSIONS


def make_handler(state: AppState):
    class Handler(BaseHTTPRequestHandler):
        server_version = "workbook-exporter-fe-spark/1.0"

        # ------------------------------------------------------ plumbing
        def log_message(self, fmt, *args):  # quiet; state.logs is the log
            pass

        def _session(self) -> dict:
            sid = None
            cookie = self.headers.get("Cookie") or ""
            for part in cookie.split(";"):
                k, _, v = part.strip().partition("=")
                if k == "sid":
                    sid = v
            if sid not in state.sessions:
                sid = uuid.uuid4().hex
                state.sessions[sid] = {}
            self._sid = sid
            return state.sessions[sid]

        def _respond(
            self, body: bytes, status=HTTPStatus.OK,
            ctype="text/html; charset=utf-8", extra=None,
        ):
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            if getattr(self, "_sid", None):
                self.send_header(
                    "Set-Cookie", f"sid={self._sid}; Path=/; HttpOnly"
                )
            for k, v in (extra or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def _redirect(self, location: str):
            self._respond(
                f'<a href="{location}">see other</a>'.encode(),
                status=HTTPStatus.SEE_OTHER,
                extra={"Location": location},
            )

        def _error(self, status, msg: str):
            self._respond(
                f"<p>{html.escape(msg)}</p>".encode(), status=status
            )

        def _read_body(self) -> bytes | None:
            length = int(self.headers.get("Content-Length") or 0)
            if length > MAX_CONTENT_LENGTH:
                self._error(
                    HTTPStatus.REQUEST_ENTITY_TOO_LARGE,
                    "file exceeds the 100 MB limit",
                )
                return None
            return self.rfile.read(length)

        def _multipart(self, body: bytes) -> dict:
            """{field: (filename|None, bytes)} via the email parser —
            boundary handling without the deprecated cgi module."""
            msg = BytesParser(policy=email_default).parsebytes(
                b"Content-Type: "
                + (self.headers.get("Content-Type") or "").encode()
                + b"\r\nMIME-Version: 1.0\r\n\r\n"
                + body
            )
            out: dict = {}
            if not msg.is_multipart():
                return out
            for part in msg.iter_parts():
                name = part.get_param(
                    "name", header="content-disposition"
                )
                if not name:
                    continue
                fname = part.get_filename()
                payload = part.get_payload(decode=True) or b""
                out[name] = (fname, payload)
            return out

        # ------------------------------------------------------- routes
        def do_GET(self):
            sess = self._session()
            path = unquote(self.path.split("?", 1)[0])
            if path in ("/api/v1/query", "/api/v1/query_range"):
                qs = self.path.partition("?")[2]
                self._api_query(
                    parse_qs(qs), range_=path.endswith("_range")
                )
            elif path == "/":
                self._respond(self._upload_page())
            elif path == "/process":
                self._respond(self._process_page(sess))
            elif path.startswith("/download/"):
                self._download(path[len("/download/"):])
            elif path == "/get_logs":
                self._respond(
                    ("\n".join(state.logs) + "\n").encode(),
                    ctype="text/plain; charset=utf-8",
                )
            elif path == "/terminal":
                body = "<html><body><h3>log</h3><pre>{}</pre></body></html>".format(
                    html.escape("\n".join(state.logs))
                )
                self._respond(body.encode())
            else:
                self._error(HTTPStatus.NOT_FOUND, "not found")

        def do_POST(self):
            sess = self._session()
            path = unquote(self.path.split("?", 1)[0])
            body = self._read_body()
            if body is None:
                return
            if path in ("/api/v1/query", "/api/v1/query_range"):
                try:
                    params = parse_qs(body.decode())
                except UnicodeDecodeError:
                    self._api_error("request body is not valid UTF-8")
                    return
                self._api_query(params, range_=path.endswith("_range"))
            elif path == "/":
                self._upload(sess, body)
            elif path == "/process":
                self._process(sess, body)
            elif path == "/finish_and_clean":
                self._finish_and_clean(sess)
            else:
                self._error(HTTPStatus.NOT_FOUND, "not found")

        # ------------------------------------------------------ handlers
        def _upload(self, sess: dict, body: bytes):
            parts = self._multipart(body)
            if "file" not in parts or not parts["file"][0]:
                self._error(HTTPStatus.BAD_REQUEST, "no file part")
                return
            fname, payload = parts["file"]
            if not _allowed_file(fname):
                self._error(
                    HTTPStatus.BAD_REQUEST,
                    f"extension not allowed: {fname}",
                )
                return
            dest = os.path.join(state.upload_dir, secure_filename(fname))
            with open(dest, "wb") as f:
                f.write(payload)
            sess["csv_file_path"] = dest  # the reference's session key
            state.log(f"uploaded {os.path.basename(dest)} ({len(payload)} B)")
            ey = parts.get("existing_yaml")
            if ey and ey[0]:
                if not _allowed_file(ey[0]):
                    self._error(
                        HTTPStatus.BAD_REQUEST,
                        f"extension not allowed: {ey[0]}",
                    )
                    return
                ydest = os.path.join(
                    state.upload_dir, secure_filename(ey[0])
                )
                with open(ydest, "wb") as f:
                    f.write(ey[1])
                sess["existing_yaml_path"] = ydest
                state.log(f"staged existing YAML {os.path.basename(ydest)}")
            self._redirect("/process")

        def _process(self, sess: dict, body: bytes):
            src = sess.get("csv_file_path")
            if not src or not os.path.exists(src):
                self._error(
                    HTTPStatus.BAD_REQUEST, "upload a workbook first"
                )
                return
            ctype = self.headers.get("Content-Type") or ""
            if ctype.startswith("multipart/"):
                parts = self._multipart(body)
                exporters = [
                    v[1].decode() for k, v in parts.items() if k == "exporters"
                ] or ["all"]
                port_raw = (parts.get("default_listen_port") or (None, b""))[1]
            else:
                q = parse_qs(body.decode())
                exporters = q.get("exporters", ["all"])
                port_raw = (q.get("default_listen_port") or [""])[0].encode()
            try:
                port = int(port_raw or b"6001")  # reference :1786 default
            except ValueError:
                port = 6001
            stem = os.path.splitext(os.path.basename(src))[0]
            out_name = f"{stem}_output.yaml"  # reference :2007
            out_path = os.path.join(state.upload_dir, out_name)
            existing = sess.get("existing_yaml_path")
            if existing and not os.path.exists(out_path):
                # seed the merge target with the uploaded document
                with open(existing, "rb") as fsrc, open(out_path, "wb") as fdst:
                    fdst.write(fsrc.read())
            from workbook_exporter_fe_spark.plans.workbook_run import (
                run_workbook_pipeline,
            )

            try:
                with state.run_lock:
                    summary = run_workbook_pipeline(
                        state.get_spark(),
                        src,
                        out_path,
                        exporters=(
                            "all" if "all" in exporters
                            else ",".join(exporters)
                        ),
                        default_listen_port=port,
                    )
            except ValueError as e:
                self._error(HTTPStatus.BAD_REQUEST, str(e))
                return
            for exp, n in sorted(summary["hosts_processed"].items()):
                # the reference's per-exporter flash message (:1726)
                state.log(f"Total number of hosts processed ({exp}): {n}")
            sess["output_file"] = out_path
            self._redirect(f"/download/{out_name}")

        def _download(self, name: str):
            safe = secure_filename(name)
            path = os.path.join(state.upload_dir, safe)
            if safe != name or not os.path.exists(path):
                self._error(HTTPStatus.NOT_FOUND, f"no such file {name!r}")
                return
            with open(path, "rb") as f:
                data = f.read()
            self._respond(
                data,
                ctype="application/x-yaml",
                extra={
                    "Content-Disposition": f'attachment; filename="{safe}"'
                },
            )

        def _finish_and_clean(self, sess: dict):
            removed = []
            for key in ("csv_file_path", "existing_yaml_path", "output_file"):
                p = sess.pop(key, None)
                if p and os.path.exists(p):
                    os.remove(p)
                    removed.append(os.path.basename(p))
            state.log(f"cleaned: {removed}")
            self._redirect("/")

        # ------------------------------------------------- PromQL API
        def _api_json(self, obj: dict, status=HTTPStatus.OK):
            self._respond(
                json.dumps(obj).encode(),
                status=status,
                ctype="application/json",
            )

        def _api_error(self, msg: str, etype: str = "bad_data",
                       status=HTTPStatus.BAD_REQUEST):
            self._api_json(
                {"status": "error", "errorType": etype, "error": msg},
                status=status,
            )

        def _api_query(self, params: dict, range_: bool):
            """Prometheus HTTP API shape over plans/promql. Instant form
            evaluates on the native tier grid (engine deviation 1) and is
            returned as a matrix over that grid; range form is the
            explicit-grid as-of resample (promql.query_range)."""
            query = (params.get("query") or [None])[0]
            if not query:
                self._api_error("missing 'query' parameter")
                return
            store = state.get_store()
            if store is None:
                self._api_error(
                    "no metrics configured — start the server with "
                    "--metric/--metrics-config", etype="unavailable",
                    status=HTTPStatus.SERVICE_UNAVAILABLE,
                )
                return
            from workbook_exporter_fe_spark.plans.promql import (
                PromQLError,
                promql,
                query_range,
            )

            mode = (params.get("mode") or ["exact"])[0]
            try:
                with state.run_lock:
                    if range_:
                        start = (params.get("start") or [None])[0]
                        end = (params.get("end") or [None])[0]
                        if start is None or end is None:
                            self._api_error(
                                "query_range needs 'start' and 'end'"
                            )
                            return
                        from run_rules import _epoch

                        try:
                            t0, t1 = _epoch(start), _epoch(end)
                        except ValueError as e:
                            self._api_error(
                                f"invalid start/end: {e} (epoch seconds "
                                "or ISO-8601)"
                            )
                            return
                        df = query_range(
                            store, query, t0, t1,
                            step=(params.get("step") or ["1m"])[0],
                            lookback=(
                                params.get("lookback") or ["5m"]
                            )[0],
                            mode=mode,
                        )
                    else:
                        df = promql(store, query, mode=mode)
                    label_cols = [
                        c for c in df.columns if c not in ("ts", "value")
                    ]
                    rows = df.collect()
            except PromQLError as e:
                self._api_error(str(e))
                return
            from datetime import timezone

            series: dict = {}
            for r in rows:
                key = tuple(
                    (c, "" if r[c] is None else str(r[c]))
                    for c in sorted(label_cols)
                )
                ts = r["ts"]
                epoch = (
                    ts.replace(tzinfo=timezone.utc).timestamp()
                    if ts is not None else None
                )
                v = r["value"]
                series.setdefault(key, []).append(
                    [epoch, None if v is None else str(float(v))]
                )
            result = [
                {"metric": dict(k),
                 "values": sorted(vs, key=lambda t: (t[0] is None, t[0]))}
                for k, vs in sorted(series.items())
            ]
            self._api_json({
                "status": "success",
                "data": {"resultType": "matrix", "result": result},
            })

        # -------------------------------------------------------- pages
        def _upload_page(self) -> bytes:
            return (
                "<html><body><h3>workbook upload</h3>"
                '<form method="post" enctype="multipart/form-data">'
                '<p>workbook: <input type="file" name="file"></p>'
                '<p>existing YAML (optional): '
                '<input type="file" name="existing_yaml"></p>'
                '<p><input type="submit" value="upload"></p>'
                "</form></body></html>"
            ).encode()

        def _process_page(self, sess: dict) -> bytes:
            from workbook_exporter_fe_spark.operators.workbook import (
                EXPORTER_SPECS,
            )

            staged = html.escape(
                os.path.basename(sess.get("csv_file_path") or "(none)")
            )
            boxes = "".join(
                f'<label><input type="checkbox" name="exporters" '
                f'value="{n}"> {n}</label><br>'
                for n in sorted(EXPORTER_SPECS)
            )
            return (
                f"<html><body><h3>process {staged}</h3>"
                '<form method="post">'
                '<label><input type="checkbox" name="exporters" '
                'value="all" checked> all</label><br>'
                f"{boxes}"
                '<p>default listen port: <input name="default_listen_port" '
                'value="6001"></p>'
                '<p><input type="submit" value="process"></p>'
                "</form></body></html>"
            ).encode()

    return Handler


def make_server(
    upload_dir: str, host: str = "127.0.0.1", port: int = 8001,
    cores: str = "*", metrics_cfg: dict | None = None,
) -> tuple[ThreadingHTTPServer, AppState]:
    state = AppState(upload_dir, cores=cores, metrics_cfg=metrics_cfg)
    server = ThreadingHTTPServer((host, port), make_handler(state))
    return server, state


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8001)
    ap.add_argument(
        "--upload-dir", default="/tmp/workbook_uploads",
        help="staging dir (the reference used /tmp directly, :1927)",
    )
    ap.add_argument(
        "--metric", action="append", default=[],
        help="NAME=PATH[:VALUECOL[:LABEL1+LABEL2]] (repeatable) — tier "
        "tables served under /api/v1/query[_range] (run_query.py syntax)",
    )
    ap.add_argument(
        "--metrics-config",
        help="YAML with a metrics: section (run_rules.py shape) for the "
        "PromQL API",
    )
    ap.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "*"))
    args = ap.parse_args()
    metrics: list[dict] = []
    if args.metrics_config:
        import yaml

        with open(args.metrics_config) as fh:
            metrics += list(yaml.safe_load(fh).get("metrics", []))
    if args.metric:
        from run_query import _parse_metric

        metrics += [_parse_metric(s) for s in args.metric]
    server, state = make_server(
        args.upload_dir, host=args.host, port=args.port, cores=args.cores,
        metrics_cfg={"metrics": metrics} if metrics else None,
    )
    print(json.dumps({
        "listening": f"http://{args.host}:{server.server_address[1]}/",
        "upload_dir": args.upload_dir,
    }))
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()


if __name__ == "__main__":
    main()
