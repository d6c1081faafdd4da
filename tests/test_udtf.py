"""PySpark 4 class-based Python UDTF surface (the literal UDTF API beside
the mapInPandas/mapInArrow kernels): Arrow-optimized table function,
registered for SQL and used with LATERAL, checked against the equivalent
built-in explode pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import lit, udtf

from tests.conftest import SF_SMOKE


@udtf(returnType="word: string, idx: int", useArrow=True)
class SplitWords:
    def eval(self, text: str):
        for i, w in enumerate((text or "").split(" ")):
            if w:
                yield w, i


def test_udtf_matches_builtin_explode(spark):
    spark.udtf.register("split_words", SplitWords)

    got = spark.sql("SELECT * FROM split_words('a bb  ccc')").collect()
    assert [(r.word, r.idx) for r in got] == [("a", 0), ("bb", 1), ("ccc", 3)]

    # LATERAL over the documents table == the built-in posexplode pipeline
    spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50) \
        .createOrReplaceTempView("docs_u")
    via_udtf = spark.sql("""
        SELECT doc_id, s.word, s.idx
        FROM docs_u, LATERAL split_words(text) AS s
    """)
    builtin = (spark.table("docs_u")
               .select("doc_id", F.posexplode(F.split("text", " ")))
               .where(F.col("col") != "")
               .select("doc_id", F.col("col").alias("word"),
                       F.col("pos").alias("idx")))
    assert via_udtf.count() == builtin.count()
    assert via_udtf.exceptAll(builtin).count() == 0
    assert builtin.exceptAll(via_udtf).count() == 0


def test_udtf_direct_call(spark):
    df = SplitWords(lit("x yy"))
    assert [(r.word, r.idx) for r in df.collect()] == [("x", 0), ("yy", 1)]
