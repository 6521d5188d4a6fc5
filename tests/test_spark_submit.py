"""spark-submit --py-files launch path (north rule: the job is launched
with `spark-submit --py-files` on multi-executor clusters).

Packages the engine as a zip, copies run_tiers.py OUTSIDE the repo, and
submits with an explicit --master — verifying (a) the engine imports from
the zip alone, (b) get_spark does NOT override the submitted master, and
(c) a --resume resubmission is a manifest no-op. Skipped when the
spark-submit launcher is not on this box.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not available"
)


def _make_zip(path: str) -> None:
    pkg = os.path.join(REPO, "workbook_exporter_fe_spark")
    with zipfile.ZipFile(path, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))


def _submit(script: str, zip_path: str, *args: str) -> dict:
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_MASTER", None)
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            script, *args,
        ],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(script),  # NOT the repo: imports must come from the zip
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON summary from spark-submit: {out.stderr[-3000:]}")


def test_spark_submit_pyfiles_roundtrip(tmp_path):
    zip_path = str(tmp_path / "engine.zip")
    _make_zip(zip_path)
    script = str(tmp_path / "run_tiers.py")
    shutil.copy(os.path.join(REPO, "run_tiers.py"), script)
    out_dir = str(tmp_path / "tiers")

    summary = _submit(script, zip_path, "--generate", "3000", "--out", out_dir)
    assert summary["master"] == "local[4]"  # the submitted master won
    assert summary["rows"]["events"] == 3000
    assert summary["rows"]["tier1"] > 0
    assert os.path.exists(f"{out_dir}/_manifest/manifest.jsonl")

    # resubmission with --resume: same tables, no duplicate stage entries
    again = _submit(
        script, zip_path, "--generate", "3000", "--out", out_dir, "--resume"
    )
    assert again["rows"] == summary["rows"]
    with open(f"{out_dir}/_manifest/manifest.jsonl") as f:
        entries = [json.loads(line) for line in f if line.strip()]
    done = [(e["run_fp"], e["stage"]) for e in entries if e["status"] == "done"]
    assert len(done) == len(set(done))
