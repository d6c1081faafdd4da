"""Driver-contract smoke: entry() runs and produces rows with SPAN_SCHEMA;
queries()/oracle_sql() keys line up; job.py CLI runs end-to-end."""

from __future__ import annotations


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.schema["style"].dataType.typeName() == "struct"
    rows = df.limit(50).collect()
    assert len(rows) > 0
    assert {"doc_id", "order", "kind", "text", "media_ref", "style",
            "page_no", "part_id"} <= set(df.columns)


def test_registry_alignment():
    import __spark_entry__ as e

    qs = e.queries()
    orc = e.oracle_sql()
    assert len(qs) >= 30
    assert set(orc) <= set(qs)
    # rows-only entries are the designated non-SQL-expressible ones
    assert set(qs) - set(orc) == {"extract_spans_rich"}


def test_job_cli(spark, tmp_path):
    import job

    out = str(tmp_path / "job_out")
    rc = job.main(["--synth", "/root/testdata/sf0.001", "--output", out,
                   "--partitions", "4", "--render-html"])
    assert rc == 0
    spans = spark.read.parquet(f"{out}/spans")
    lin = spark.read.parquet(f"{out}/lineage")
    assert spans.count() > 0
    assert lin.select("part_id").distinct().count() == 4
    html = spark.read.parquet(f"{out}/html")
    assert html.count() == spans.select("doc_id").distinct().count()
