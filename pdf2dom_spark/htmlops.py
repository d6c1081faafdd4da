"""HTML main-content extraction (boilerplate strip).

The north rule's main-content extraction triple is "HTML boilerplate strip,
PDF/layout parse, DOM heuristics"; the PDF side is the Pdf2Dom kernel, this
module is the HTML side: a boilerpipe-style block filter — drop chrome
elements (head/nav/footer), split the remainder into text blocks, keep
blocks that read like content (enough words, low link density), join the
survivors in document order.

Scale shape: the whole operator is JVM higher-order functions over one
projected column — regexp_replace + regexp_extract_all + transform/filter
on arrays. No explode, no groupBy, no shuffle, no Python: a pure narrow
map over the corpus, which is exactly what a 100 TB boilerplate pass must
be. The synthetic corpus is plain word soup, so both engines first wrap
each doc in an identical deterministic HTML page (nav + link-farm div +
two content paragraphs + short div + footer) — the planted-fixture device
used by pii_scrub — keeping the oracle non-vacuous: the link-farm and the
short block must be dropped, the paragraphs kept.

The block heuristic (min words + link-density < 1/3) is the classic
boilerpipe/jusText density rule expressed engine-portably.
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


# chrome elements removed wholesale (covers <script>/<style> inside <head>)
_BOILER = "<head>.*?</head>|<nav>.*?</nav>|<footer>.*?</footer>"
# non-nested text blocks of the cleaned body
_BLOCK = "<(?:p|div)[^>]*>(.*?)</(?:p|div)>"
_TAG = "<[^>]*>"
_MIN_WORDS = 5  # jusText-style short-block cutoff


@_reg("html_main_content", f"""
WITH h AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         '<html><head><script>var x=1;</script><style>.a{{color:red}}</style></head><body>'
         || '<nav><a href="/">home</a> <a href="/a">about</a> <a href="/c">contact</a></nav>'
         || '<div><a href="/buy">buy</a> <a href="/now">now</a> <a href="/d">deals</a> today</div>'
         || '<p>' || substr(text, 1, 120) || '</p>'
         || '<p>' || substr(text, 121, 120) || '</p>'
         || '<div>tiny</div>'
         || '<footer>copyright site inc</footer></body></html>' AS html
  FROM documents
),
b AS (
  SELECT doc_id,
         regexp_extract_all(regexp_replace(html, '{_BOILER}', '', 'g'),
                            '{_BLOCK}', 1) AS blocks
  FROM h
),
m AS (
  SELECT doc_id, blocks,
         list_transform(blocks,
             x -> trim(regexp_replace(x, '{_TAG}', '', 'g'))) AS stripped,
         list_transform(blocks,
             x -> len(regexp_extract_all(x, '<a '))) AS links
  FROM b
),
k AS (
  SELECT doc_id,
         CAST(len(blocks) AS INT) AS n_blocks,
         list_filter(stripped, (t, i) ->
             len(string_split(t, ' ')) >= {_MIN_WORDS}
             AND links[i] * 3 < len(string_split(t, ' '))) AS kept
  FROM m
)
SELECT doc_id, n_blocks,
       CAST(len(kept) AS INT) AS n_kept,
       CAST(CASE WHEN len(kept) = 0 THEN 0
            ELSE len(string_split(array_to_string(kept, ' '), ' ')) END
            AS INT) AS n_words_main,
       md5(array_to_string(kept, ' ')) AS main_hash
FROM k
""")
def html_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    html = F.concat(
        F.lit('<html><head><script>var x=1;</script>'
              '<style>.a{color:red}</style></head><body>'
              '<nav><a href="/">home</a> <a href="/a">about</a> '
              '<a href="/c">contact</a></nav>'
              '<div><a href="/buy">buy</a> <a href="/now">now</a> '
              '<a href="/d">deals</a> today</div>'
              '<p>'),
        F.substring("text", 1, 120), F.lit("</p><p>"),
        F.substring("text", 121, 120),
        F.lit("</p><div>tiny</div>"
              "<footer>copyright site inc</footer></body></html>"))
    cleaned = F.regexp_replace(html, _BOILER, "")
    blocks = F.regexp_extract_all(cleaned, F.lit(_BLOCK), F.lit(1))
    d = d.select("doc_id", blocks.alias("blocks"))
    stripped = F.transform(
        "blocks", lambda x: F.trim(F.regexp_replace(x, _TAG, "")))
    links = F.transform(
        "blocks",
        lambda x: F.size(F.regexp_extract_all(x, F.lit("<a "), F.lit(0))))
    d = d.select("doc_id", "blocks", stripped.alias("stripped"),
                 links.alias("links"))
    # index-paired filter: Spark lambda index is 0-based, element_at is
    # 1-based — mirrors DuckDB's 1-based (t, i) list_filter exactly
    kept = F.filter(
        "stripped",
        lambda t, i: (F.size(F.split(t, " ")) >= _MIN_WORDS)
        & (F.element_at("links", i + F.lit(1)) * 3 < F.size(F.split(t, " "))))
    d = d.select("doc_id", F.size("blocks").cast("int").alias("n_blocks"),
                 kept.alias("kept"))
    main = F.array_join("kept", " ")
    return d.select(
        "doc_id", "n_blocks",
        F.size("kept").cast("int").alias("n_kept"),
        F.when(F.size("kept") == 0, F.lit(0))
         .otherwise(F.size(F.split(main, " "))).cast("int")
         .alias("n_words_main"),
        F.md5(main).alias("main_hash"))
