"""The north rule's launch surface, exercised for real: ``spark-submit
--py-files pdf2dom_spark.zip job.py`` as a SUBPROCESS (fresh JVM, fresh
Python workers), with the package importable ONLY from the shipped zip —
the exact cluster submission shape (PDFToHTML.java:41-98's CLI analog).

The in-process ``job.main([...])`` tests in test_entry.py cover the CLI
semantics cheaply; this one proves the deployment artifact itself works:
zip layout, --py-files distribution, and a job.py that carries no hidden
dependence on the repo checkout being on sys.path.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _build_zip(path: str) -> None:
    pkg = os.path.join(REPO, "pdf2dom_spark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="no spark-submit binary on PATH")
@pytest.mark.skipif(not os.path.isdir("/root/testdata/sf0.001"),
                    reason="sandbox corpus not present (ADVICE r5)")
def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    zip_path = str(tmp_path / "pdf2dom_spark.zip")
    _build_zip(zip_path)
    # job.py copied OUT of the repo: spark-submit puts the script's own
    # directory on sys.path, so from tmp_path the package can resolve
    # only through --py-files — a stowaway repo import would fail loudly.
    job_copy = str(tmp_path / "job.py")
    shutil.copy(os.path.join(REPO, "job.py"), job_copy)
    out = str(tmp_path / "out")

    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)  # the zip must be the only package source

    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path, job_copy,
         "--synth", "/root/testdata/sf0.001",
         "--output", out, "--partitions", "4"],
        cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-4000:]

    got = spark.read.parquet(f"{out}/spans")
    lineage = spark.read.parquet(f"{out}/lineage")
    # same job in-process (the already-tested path) = the expected table
    import job as job_mod
    out2 = str(tmp_path / "out_inproc")
    assert job_mod.main(["--synth", "/root/testdata/sf0.001",
                         "--output", out2, "--partitions", "4"]) == 0
    want = spark.read.parquet(f"{out2}/spans")
    assert got.count() == want.count() > 0
    assert set(got.columns) == set(want.columns)
    # value-level: the span multiset must be identical across launch modes
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
    assert lineage.count() > 0
    assert {"part_id", "doc_count"} <= set(lineage.columns)
