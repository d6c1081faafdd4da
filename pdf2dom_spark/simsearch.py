"""Similarity search over the ``embeddings`` table (vec_id, embedding
float[64], label).

Two paths, as a 100 TB pipeline needs both:
  - ``knn_brute`` — exact cosine top-k against a query vector. The query side
    is one broadcast row; the scan side computes the dot product JVM-side via
    ``zip_with``/``aggregate`` higher-order functions (whole-stage codegen,
    no Python). At scale this is a single narrow pass + a tiny top-k.
  - ``knn_lsh`` — sign-random-projection LSH: 4 deterministic hyperplanes
    (embeddings 1..4) bucket every vector by the sign bits of its dots; only
    the query's bucket is scanned for the exact re-rank. The bucket join is
    broadcast (planes are tiny); at scale the bucketing is precomputed and
    the candidate scan prunes >90% of the corpus before the expensive
    re-rank.

Float parity with the DuckDB oracle: both sides cast elements to DOUBLE
before multiply and reduce left-to-right, then round scores to 3dp and
tie-break on vec_id so top-k sets are deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REGISTRY: dict = {}
ORACLES: dict[str, str] = {}


def _reg(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn
    return deco


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


_SQL_DOT = ("list_sum(list_transform(generate_series(1, len({a})), "
            "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))")
_SQL_NORM = ("sqrt(list_sum(list_transform({a}, "
             "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))")


@_reg("knn_brute", f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
         ROUND({_SQL_DOT.format(a='e.embedding', b='q.qv')}
               / ({_SQL_NORM.format(a='e.embedding')} * {_SQL_NORM.format(a='q.qv')}), 3) AS score
  FROM embeddings e, q WHERE e.vec_id <> 0
)
SELECT vec_id, score FROM s ORDER BY score DESC, vec_id ASC LIMIT 10
""")
def knn_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    joined = emb.where(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    score = F.round(
        _dot(F.col("embedding"), F.col("qv"))
        / (_norm(F.col("embedding")) * _norm(F.col("qv"))), 3)
    return (joined.select(F.col("vec_id").cast("long").alias("vec_id"),
                          score.alias("score"))
            .orderBy(F.desc("score"), F.asc("vec_id")).limit(10))


@_reg("dedup_embedding_cosine", f"""
WITH e AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, label, embedding,
         {_SQL_NORM.format(a='embedding')} AS nrm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND({_SQL_DOT.format(a='a.embedding', b='b.embedding')}
             / (a.nrm * b.nrm), 3) AS cos
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_SQL_DOT.format(a='a.embedding', b='b.embedding')} / (a.nrm * b.nrm) >= 0.9
""")
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs. Candidates are bounded per
    label group (at 100 TB scale the label becomes an LSH bucket — same
    join shape, bounded fan-out)."""
    e = _emb(spark, sf_dir).select(
        F.col("vec_id").cast("long").alias("vec_id"), "label", "embedding",
        _norm(F.col("embedding")).alias("nrm"))
    a, b = e.alias("a"), e.alias("b")
    cos = _dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm"))
    return (a.join(b, (F.col("a.label") == F.col("b.label"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
            .where(cos >= 0.9)
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b"),
                    F.round(cos, 3).alias("cos")))


@_reg("knn_lsh", f"""
WITH planes AS (
  SELECT vec_id AS plane_id, embedding AS pv FROM embeddings
  WHERE vec_id BETWEEN 1 AND 4
),
sig AS (
  SELECT CAST(e.vec_id AS BIGINT) AS vec_id, e.embedding,
         string_agg(CASE WHEN {_SQL_DOT.format(a='e.embedding', b='p.pv')} >= 0
                    THEN '1' ELSE '0' END, '' ORDER BY p.plane_id) AS bucket
  FROM embeddings e, planes p GROUP BY e.vec_id, e.embedding
),
q AS (SELECT s.embedding AS qv, s.bucket AS qb FROM sig s WHERE s.vec_id = 0),
cand AS (
  SELECT s.vec_id,
         ROUND({_SQL_DOT.format(a='s.embedding', b='q.qv')}
               / ({_SQL_NORM.format(a='s.embedding')} * {_SQL_NORM.format(a='q.qv')}), 3) AS score
  FROM sig s, q WHERE s.bucket = q.qb AND s.vec_id <> 0
)
SELECT vec_id, score FROM cand ORDER BY score DESC, vec_id ASC LIMIT 5
""")
def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).select(
        F.col("vec_id").cast("long").alias("vec_id"), "embedding")
    planes = emb.where(F.col("vec_id").between(1, 4)).select(
        F.col("vec_id").alias("plane_id"), F.col("embedding").alias("pv"))
    sig = (
        emb.crossJoin(F.broadcast(planes))
        .withColumn("bit", F.when(_dot(F.col("embedding"), F.col("pv")) >= 0,
                                  F.lit("1")).otherwise(F.lit("0")))
        .groupBy("vec_id", "embedding")
        .agg(F.concat_ws("", F.transform(
            F.array_sort(F.collect_list(F.struct("plane_id", "bit"))),
            lambda s: s.bit)).alias("bucket"))
    )
    q = sig.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"), F.col("bucket").alias("qb"))
    cand = sig.join(F.broadcast(q), sig.bucket == F.col("qb")).where(
        F.col("vec_id") != 0)
    score = F.round(
        _dot(F.col("embedding"), F.col("qv"))
        / (_norm(F.col("embedding")) * _norm(F.col("qv"))), 3)
    return (cand.select("vec_id", score.alias("score"))
            .orderBy(F.desc("score"), F.asc("vec_id")).limit(5))
