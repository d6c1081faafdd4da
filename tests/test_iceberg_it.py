"""Iceberg integration test (VERDICT r2 #8): drives the REAL
``writeTo().create()/overwritePartitions()/append()`` paths in
pdf2dom_spark.tables end-to-end — CREATE, partition overwrite, append,
checkpoint-resume — against a local hadoop-type catalog.

SKIPS when the Iceberg Spark runtime is not on the classpath (this sandbox
ships no jars and has no network). To run for real:

    python -m pytest tests/test_iceberg_it.py -q \\
        --deselect nothing  # just make the jars visible:
    # PYSPARK_SUBMIT_ARGS="--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.8.0 pyspark-shell" \\
    #     python -m pytest tests/test_iceberg_it.py -q

Catalog configs are set at runtime on the shared session — Spark resolves
``spark.sql.catalog.<name>`` lazily at first use, so no session restart is
needed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf2dom_spark import tables

pytestmark = pytest.mark.filterwarnings("ignore")


@pytest.fixture()
def iceberg(spark, tmp_path):
    if not tables.iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime not on the classpath "
                    "(run with --packages org.apache.iceberg:"
                    "iceberg-spark-runtime-4.0_2.13:<v>)")
    spark.conf.set("spark.sql.catalog.it",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.it.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it.warehouse", str(tmp_path / "wh"))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS it.db")
    return spark


def _rows(spark, vals):
    return spark.createDataFrame(
        [(i, p, v) for i, p, v in vals], "id int, part_id int, v string")


def test_create_then_overwrite_partitions(iceberg):
    spark = iceberg
    t = "it.db.ow"
    df1 = _rows(spark, [(1, 0, "a"), (2, 0, "b"), (3, 1, "c")])
    tables.write_partitioned(df1, t, "part_id", spark)  # CREATE path
    assert spark.read.format("iceberg").load(t).count() == 3

    # dynamic overwrite: only partition 0 is replaced, partition 1 untouched
    df2 = _rows(spark, [(9, 0, "z")])
    tables.write_partitioned(df2, t, "part_id", spark)
    got = {(r.id, r.part_id, r.v)
           for r in spark.read.format("iceberg").load(t).collect()}
    assert got == {(9, 0, "z"), (3, 1, "c")}


def test_append_and_read_roundtrip(iceberg):
    spark = iceberg
    t = "it.db.ap"
    tables.append_table(_rows(spark, [(1, 0, "a")]), t, spark)  # CREATE
    tables.append_table(_rows(spark, [(2, 1, "b")]), t, spark)  # append
    assert tables.read_table(spark, t).count() == 2


def test_run_checkpointed_resume_via_iceberg(iceberg, tmp_path):
    """Failure-injection resume writing spans+lineage as Iceberg tables;
    final table bit-equal to the parquet-backed run."""
    from pdf2dom_spark.corpus import build_docs_df
    from pdf2dom_spark.pipeline import run_checkpointed

    spark = iceberg
    docs = build_docs_df(spark, "/root/testdata/sf0.001", mode="oracle")
    docs = docs.limit(60).cache()

    run_checkpointed(spark, docs, str(tmp_path / "pq"), num_partitions=4,
                     run_id="pq")
    run_checkpointed(spark, docs, "it.db.job", num_partitions=4,
                     run_id="i1", fail_parts={2})
    stats = run_checkpointed(spark, docs, "it.db.job", num_partitions=4,
                             run_id="i2")
    assert stats["parts_done"] == 4

    a = spark.read.parquet(str(tmp_path / "pq" / "spans"))
    b = spark.read.format("iceberg").load("it.db.job_spans")
    cols = sorted(a.columns)
    assert a.count() == b.count()
    assert a.select(cols).exceptAll(b.select(cols)).count() == 0
    lin = tables.read_table(spark, "it.db.job_lineage")
    by_run = {r["part_id"]: r["run_id"] for r in lin.collect()}
    assert by_run[2] == "i2"


def test_skip_reason_is_actionable(spark):
    """Always runs: the no-jars error message must tell the user what to
    add (read_table / write_partitioned raise rather than mis-route)."""
    if tables.iceberg_available(spark):
        pytest.skip("jars present — covered by the tests above")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        tables.read_table(spark, "it.db.whatever")
    with pytest.raises(RuntimeError, match="Iceberg"):
        tables.write_partitioned(
            _rows(spark, [(1, 0, "a")]), "it.db.x", "part_id", spark)
