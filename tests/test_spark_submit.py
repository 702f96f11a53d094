"""True spark-submit --py-files deployment check (north rule: "run
via spark-submit --py-files on multi-executor clusters").

Everything in-process elsewhere assumes the repo is on sys.path; this
test removes that assumption: the library ships ONLY as the zip from
tools/package_pyfiles.py, the job scripts are copied to a temp dir
with no package next to them, and real ``spark-submit`` subprocesses
build an index and query it — exactly the cluster submission shape.
One cold JVM per subprocess (~30 s each), so the whole flow lives in
a single test.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit")


def _run(args, cwd):
    env = dict(os.environ)
    # the subprocess must NOT inherit an import path to the repo
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false", *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    return [
        json.loads(line)
        for line in proc.stdout.splitlines()
        if line.startswith("{")
    ]


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit")
def test_build_and_search_via_py_files_zip(tmp_path):
    from tools.package_pyfiles import build_zip

    zip_path = build_zip(tmp_path / "search_engine_spark.zip")
    jobs = tmp_path / "jobs"
    jobs.mkdir()
    for name in ("build_index.py", "search.py"):
        shutil.copy(REPO / "jobs" / name, jobs / name)
    assert not (tmp_path / "search_engine_spark").exists()

    idx = str(tmp_path / "idx")
    built = _run(
        ["--py-files", str(zip_path), str(jobs / "build_index.py"),
         "--output", idx, "--synthetic-pages", "200",
         "--analyzer", "tokens", "--buckets", "4", "--segments", "4"],
        cwd=tmp_path,
    )
    summary = built[-1]
    assert summary["n_docs"] == 200 and summary["postings"] > 0

    rows = _run(
        ["--py-files", str(zip_path), str(jobs / "search.py"),
         "--index", idx, "--query", "crystal meadow", "--limit", "5"],
        cwd=tmp_path,
    )
    assert 0 < len(rows) <= 5
    assert rows[0]["score"] >= rows[-1]["score"]
    assert all("url" in r for r in rows)
