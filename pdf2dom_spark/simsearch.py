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


def _rot(col, k: int):
    """Circular left-rotation of an array column by k (k=0 passthrough);
    length-agnostic (slice length = size of the column)."""
    if k == 0:
        return col
    return F.concat(F.slice(col, k + 1, F.size(col)), F.slice(col, 1, k))


def lsh_signed(df: DataFrame, emb_col: str, n_bits: int = 4,
               planes_from: DataFrame | None = None) -> DataFrame:
    """Append a sign-random-projection ``bucket`` column in ONE projection —
    no explode, no groupBy, no shuffle of the embedding arrays.

    The base hyperplanes are the table's own rows vec_id 1..4 (deterministic,
    oracle-reproducible); they are collapsed to a single broadcast row via a
    tiny aggregate, then each input row computes its sign bits as plain
    column expressions inside whole-stage codegen. Bits beyond the first 4
    reuse the same planes against circularly-rotated embeddings —
    dot(rot(v,k), p) == dot(v, rot(p,-k)), i.e. genuinely distinct fixed
    hyperplanes, still derivable in ANSI SQL. At 10^12-vector scale this is a
    narrow map over the scan plus one sub-kilobyte broadcast, and the bucket
    count (2^n_bits) scales candidate-join fan-out down exponentially."""
    src = planes_from if planes_from is not None else df
    planes_row = (src.where(F.col("vec_id").between(1, 4))
                  .agg(F.sort_array(F.collect_list(
                      F.struct("vec_id", F.col(emb_col).alias("pv"))))
                      .alias("ps")))
    bits = []
    for i in range(n_bits):
        plane = F.element_at("ps", i % 4 + 1).pv
        shifted = _rot(F.col(emb_col), (i // 4) * 7)
        bits.append(F.when(_dot(shifted, plane) >= 0, F.lit("1"))
                    .otherwise(F.lit("0")))
    return (df.crossJoin(F.broadcast(planes_row))
            .withColumn("bucket", F.concat(*bits))
            .drop("ps"))


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


# --- embedding-cosine near-dup via LSH blocking ------------------------------
# Candidates = vectors sharing an 8-bit sign-projection bucket (256 buckets,
# bucket count grows with n_bits, NOT with any data attribute) — the
# quadratic all-pairs join keyed on the 10-value `label` column is gone.
# The corpus has no planted near-dups, so the fixture is augmented in-query
# with deterministic twins (vec_id+1000000, embedding scaled by 1.01): a
# positive scalar multiple has cosine exactly 1.0 and identical sign bits,
# guaranteeing a non-empty, cross-engine-stable expected pair set.

_TWIN_MOD = 37
_DEDUP_BITS = 8

def _sql_bucket(v: str) -> str:
    bits = []
    for i in range(_DEDUP_BITS):
        p = f"p.p{i % 4 + 1}"
        k = (i // 4) * 7
        sv = v if k == 0 else f"({v}[{k + 1}:] || {v}[:{k}])"
        bits.append(f"(CASE WHEN {_SQL_DOT.format(a=sv, b=p)} >= 0 "
                    f"THEN '1' ELSE '0' END)")
    return " || ".join(bits)

@_reg("dedup_embedding_cosine", f"""
WITH base AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding FROM embeddings
),
aug AS (
  SELECT * FROM base
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(embedding, x -> CAST(x * 1.01 AS FLOAT)) AS embedding
  FROM base WHERE vec_id % {_TWIN_MOD} = 0
),
p AS (
  SELECT (SELECT embedding FROM embeddings WHERE vec_id = 1) AS p1,
         (SELECT embedding FROM embeddings WHERE vec_id = 2) AS p2,
         (SELECT embedding FROM embeddings WHERE vec_id = 3) AS p3,
         (SELECT embedding FROM embeddings WHERE vec_id = 4) AS p4
),
sig AS (
  SELECT a.vec_id, a.embedding, {_SQL_NORM.format(a='a.embedding')} AS nrm,
         {_sql_bucket('a.embedding')} AS bucket
  FROM aug a, p
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND({_SQL_DOT.format(a='a.embedding', b='b.embedding')}
             / (a.nrm * b.nrm), 3) AS cos
FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_SQL_DOT.format(a='a.embedding', b='b.embedding')} / (a.nrm * b.nrm) >= 0.9
""")
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-blocked: the self-join key
    is the 8-bit sign-projection bucket, so candidate fan-out is N²/256 per
    bucket in expectation instead of N²/|labels| — and n_bits turns the knob
    at larger scale (16 bits -> 65k buckets). Exact cosine verifies within
    the bucket."""
    base = _emb(spark, sf_dir).select(
        F.col("vec_id").cast("long").alias("vec_id"), "embedding")
    twins = (base.where(F.col("vec_id") % _TWIN_MOD == 0)
             .select((F.col("vec_id") + 1000000).alias("vec_id"),
                     F.transform("embedding",
                                 lambda x: (x * F.lit(1.01)).cast("float"))
                     .alias("embedding")))
    aug = base.unionByName(twins)
    sig = lsh_signed(aug, "embedding", n_bits=_DEDUP_BITS,
                     planes_from=base).withColumn(
        "nrm", _norm(F.col("embedding")))
    a, b = sig.alias("a"), sig.alias("b")
    cos = _dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm"))
    return (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
            .where(cos >= 0.9)
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b"),
                    F.round(cos, 3).alias("cos")))


# --- IVF (inverted-file) ANN: coarse-quantize to centroid lists, probe the
# query's nprobe nearest lists, exact re-rank inside them. Centroids are the
# table's own rows vec_id 1..8 (deterministic, oracle-reproducible); at
# production scale they come from a k-means job and the assignment column is
# precomputed + partitioned-by, so a query touches nprobe/k of the corpus.

_IVF_K = 8
_IVF_NPROBE = 2

_SQL_D2 = ("list_sum(list_transform(generate_series(1, len({a})), "
           "i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
           "* (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))))")

@_reg("knn_ivf", f"""
WITH c AS (
  SELECT list(struct_pack(cid := CAST(vec_id AS BIGINT), pv := embedding)
              ORDER BY vec_id) AS cents
  FROM embeddings WHERE vec_id BETWEEN 1 AND {_IVF_K}
),
a AS (
  SELECT CAST(e.vec_id AS BIGINT) AS vec_id, e.embedding,
         list_sort(list_transform(c.cents,
             x -> struct_pack(d := {_SQL_D2.format(a='e.embedding', b='x.pv')},
                              cid := x.cid)))[1].cid AS assigned
  FROM embeddings e, c
),
q AS (
  SELECT e.embedding AS qv,
         list_transform(list_sort(list_transform(c.cents,
             x -> struct_pack(d := {_SQL_D2.format(a='e.embedding', b='x.pv')},
                              cid := x.cid)))[:{_IVF_NPROBE}],
             s -> s.cid) AS probes
  FROM embeddings e, c WHERE e.vec_id = 0
)
SELECT a.vec_id,
       ROUND({_SQL_DOT.format(a='a.embedding', b='q.qv')}
             / ({_SQL_NORM.format(a='a.embedding')} * {_SQL_NORM.format(a='q.qv')}), 3) AS score
FROM a, q
WHERE list_contains(q.probes, a.assigned) AND a.vec_id <> 0
ORDER BY score DESC, vec_id ASC LIMIT 5
""")
def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).select(
        F.col("vec_id").cast("long").alias("vec_id"), "embedding")
    cents_row = (emb.where(F.col("vec_id").between(1, _IVF_K))
                 .agg(F.sort_array(F.collect_list(F.struct(
                     F.col("vec_id").alias("cid"),
                     F.col("embedding").alias("pv")))).alias("cents")))

    def d2(v, p):
        return F.aggregate(
            F.zip_with(v, p, lambda x, y: (x.cast("double") - y.cast("double"))
                       * (x.cast("double") - y.cast("double"))),
            F.lit(0.0), lambda acc, x: acc + x)

    scored = F.array_sort(F.transform(
        "cents", lambda x: F.struct(d2(F.col("embedding"), x.pv).alias("d"),
                                    x.cid.alias("cid"))))
    a = (emb.crossJoin(F.broadcast(cents_row))
         .withColumn("assigned", F.element_at(scored, 1).cid)
         .drop("cents"))
    q = (a.where(F.col("vec_id") == 0)
         .crossJoin(F.broadcast(cents_row))
         .select(F.col("embedding").alias("qv"),
                 F.transform(F.slice(scored, 1, _IVF_NPROBE),
                             lambda s: s.cid).alias("probes")))
    cand = (a.crossJoin(F.broadcast(q))
            .where(F.array_contains("probes", F.col("assigned"))
                   & (F.col("vec_id") != 0)))
    score = F.round(
        _dot(F.col("embedding"), F.col("qv"))
        / (_norm(F.col("embedding")) * _norm(F.col("qv"))), 3)
    return (cand.select("vec_id", score.alias("score"))
            .orderBy(F.desc("score"), F.asc("vec_id")).limit(5))


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
    sig = lsh_signed(emb, "embedding")
    q = sig.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"), F.col("bucket").alias("qb"))
    cand = sig.join(F.broadcast(q), sig.bucket == F.col("qb")).where(
        F.col("vec_id") != 0)
    score = F.round(
        _dot(F.col("embedding"), F.col("qv"))
        / (_norm(F.col("embedding")) * _norm(F.col("qv"))), 3)
    return (cand.select("vec_id", score.alias("score"))
            .orderBy(F.desc("score"), F.asc("vec_id")).limit(5))


# --- per-label centroids: elementwise vector aggregation ---------------------
# The vector-average building block (IVF training step / class prototypes).
# Scale shape: 64 map-side-combinable SUM aggregates over element_at
# projections — ONE hash aggregate of the scan, no row explosion, no
# shuffle of the embedding arrays; the 10-row result explodes to
# (label, dim) only at the very end. Elements are quantized to milli units
# BEFORE summing: integer sums are exact and associative, so the result is
# bit-stable under any partial-aggregation order on either engine (a raw
# float sum is order-dependent and could flip the rounding).

_EMB_DIM = 64

@_reg("embedding_centroids", f"""
WITH q AS (
  SELECT label, i AS dim,
         CAST(SUM(CAST(FLOOR(CAST(embedding[i + 1] AS DOUBLE) * 1000 + 0.5)
              AS BIGINT)) AS BIGINT) AS sum_milli,
         CAST(COUNT(*) AS BIGINT) AS n_vecs
  FROM embeddings, (SELECT unnest(generate_series(0, {_EMB_DIM - 1})) AS i)
  GROUP BY label, i
)
SELECT CAST(label AS INT) AS label, CAST(dim AS INT) AS dim, n_vecs,
       CAST(FLOOR(CAST(sum_milli AS DOUBLE) / n_vecs + 0.5) AS BIGINT)
           AS centroid_milli
FROM q
""")
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    sums = emb.groupBy(F.col("label").cast("int").alias("label")).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        *[F.sum(F.floor(F.element_at("embedding", i + 1).cast("double")
                        * 1000 + 0.5).cast("long")).alias(f"s{i}")
          for i in range(_EMB_DIM)])
    exploded = sums.select(
        "label", "n_vecs",
        F.posexplode(F.array(*[F.col(f"s{i}") for i in range(_EMB_DIM)]))
        .alias("dim", "sum_milli"))
    return exploded.select(
        "label", F.col("dim").cast("int").alias("dim"), "n_vecs",
        F.floor(F.col("sum_milli").cast("double") / F.col("n_vecs") + 0.5)
         .cast("long").alias("centroid_milli"))


# ---------------------------------------------------------------------------
# int8 embedding quantization: per-vector symmetric scale (max |x|), the
# storage/serving compression step before ANN indexing. Pure narrow map —
# zero Exchange; the quantized vector is summarized by order-independent
# integer aggregates (sum, sum of squares, count of saturated lanes) so the
# result stays value-checkable without shipping arrays.
# ---------------------------------------------------------------------------

@_reg("embedding_quantize", """
WITH s AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         list_max(list_transform(embedding,
                                 x -> ABS(CAST(x AS DOUBLE)))) AS sc
  FROM embeddings
),
q AS (
  SELECT vec_id, sc,
         CASE WHEN sc = 0 THEN list_transform(e, x -> CAST(0 AS BIGINT))
              ELSE list_transform(e,
                   x -> CAST(FLOOR(x / sc * 127 + 0.5) AS BIGINT)) END AS qv
  FROM s
)
SELECT vec_id,
       CAST(FLOOR(sc * 1000000 + 0.5) AS BIGINT) AS scale_x1e6,
       CAST(list_sum(qv) AS BIGINT) AS q_sum,
       CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS q_norm2,
       CAST(len(list_filter(qv, v -> ABS(v) = 127)) AS BIGINT) AS n_sat
FROM q
""")
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"))
    sc = F.array_max(F.transform("e", F.abs))
    d = e.select("vec_id", "e", sc.alias("sc"))
    qv = F.when(F.col("sc") == 0, F.transform(
        "e", lambda x: F.lit(0).cast("long"))).otherwise(
        F.transform("e", lambda x: F.floor(x / F.col("sc") * 127 + 0.5)
                    .cast("long")))
    d = d.select("vec_id", "sc", qv.alias("qv"))
    return d.select(
        "vec_id",
        F.floor(F.col("sc") * 1000000 + 0.5).cast("long")
        .alias("scale_x1e6"),
        F.aggregate("qv", F.lit(0).cast("long"), lambda a, v: a + v)
        .alias("q_sum"),
        F.aggregate("qv", F.lit(0).cast("long"), lambda a, v: a + v * v)
        .alias("q_norm2"),
        F.size(F.filter("qv", lambda v: F.abs(v) == 127)).cast("long")
        .alias("n_sat"))
