"""Driver-facing query registry: ``queries()`` / ``oracle_sql()``.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI-SQL string DuckDB runs on the same parquet tables.
Column names and types are aligned on both sides (the driver's compare sorts
columns by name and hashes values); floats are rounded explicitly.

Groups:
  1. extraction semantics — the mono-grid oracle corpus makes the FULL
     kernel (tokenizer -> interpreter -> chunking -> emission order)
     reproducible in closed-form SQL; plus the relational re-expression of
     the T1/T2/T3 chunk-merge as window functions (gaps-and-islands), the
     page-range gate, scalar op parity (RTL reverse, color hex, font
     family/weight/style parsing, line classification, page rotation
     transforms);
  2. training-data ops (textops.py) and similarity search (simsearch.py);
  3. relational shapes the pipeline relies on: broadcast dim join,
     checkpoint-resume anti-join, row_number de-dup naming, lineage
     aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import htmlops, multimodal, simsearch, textops
from .corpus import build_docs_df
from .extract import ExtractConfig
from .fonts import CSS_FONT_FAMILY, CSS_FONT_STYLE, CSS_FONT_WEIGHT, PD_FONT_TYPE
from .schema import SPAN_FLAT_SCHEMA

REGISTRY: dict = {}
ORACLES: dict[str, str] = {}


def _reg(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn
    return deco


def _extract_flat(spark: SparkSession, sf_dir: str,
                  cfg: ExtractConfig | None = None,
                  mode: str = "oracle") -> DataFrame:
    """ONE shuffle of the SMALL (doc_id, text) rows on the raw 64-bit hash
    (pmod into p values would leave ~1/e of tasks empty — Poisson
    occupancy), then ONE fused Python kernel that synthesizes the span
    stream and extracts it in the same worker call. Fusing matters: two
    chained mapInPandas nodes run in one stage but pay a full Arrow
    round-trip of the nested spans payload between them (worker -> JVM ->
    worker) — measured 34% of the sf0.1 query wall time."""
    import pandas as pd

    from .corpus import stream_fn
    from .extract import docs_frame_to_spans

    p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    kcfg = cfg or ExtractConfig()
    sgen = stream_fn(mode)
    src = (spark.read.parquet(f"{sf_dir}/documents.parquet")
           .select("doc_id", "text")
           .repartition(p, F.xxhash64("doc_id")))

    def kernel(batches):
        for pdf in batches:
            rows = {"doc_id": [], "spans": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                did = str(doc_id)
                rows["doc_id"].append(did)
                rows["spans"].append(sgen(did, text))
            yield docs_frame_to_spans(pd.DataFrame(rows), kcfg)

    return src.mapInPandas(kernel, SPAN_FLAT_SCHEMA)


# ---------------------------------------------------------------------------
# 1a. FULL kernel vs closed-form SQL on the mono-grid corpus
# ---------------------------------------------------------------------------

# ORACLE WORD DOMAIN: words are assumed free of mid-word combining marks.
# A dropped (uncontained) diacritic leaves its advance behind, and the
# resulting >1pt gap splits the box in the kernel EXACTLY like the
# reference (processTextPosition stores lastDia without updating lastText,
# so the next glyph's distx exceeds the threshold) — behavior pinned by
# test_dia_gap_splits_box; the per-word grid oracle deliberately does not
# model it.
# Per-page emission order (PDFBoxTree.java:208,639-644 — the last box of a
# page flushes only at the page's end-of-stream, AFTER that page's graphics):
# page span, word boxes 0..m-2, rect, image, last word box. Stride per full
# page (m=40) is 43 spans; the trailing font span sits at nw + 3*np.
_ORACLE_SPANS_SQL = """
WITH w0 AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         unnest(string_split(text,' ')) AS word,
         generate_subscripts(string_split(text,' '), 1) AS sidx
  FROM documents WHERE length(text) > 0
),
w AS (
  -- the kernel drops empty words (repeated/leading/trailing spaces):
  -- filter + renumber so widx matches the kernel's word stream
  SELECT doc_id, word,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sidx) - 1 AS widx
  FROM w0 WHERE word <> ''
),
n AS (SELECT doc_id, COUNT(*) AS nw,
             CAST(CEIL(COUNT(*) / 40.0) AS INT) AS np
      FROM w GROUP BY doc_id),
ws AS (
  SELECT w.doc_id, word, widx,
         CAST(widx // 40 + 1 AS INT) AS page_no,
         CAST((widx % 40) // 8 AS INT) AS line_no,
         CAST(widx % 8 AS INT) AS pos,
         CAST(widx % 40 AS INT) AS i,
         CAST(LEAST(n.nw - 40 * (widx // 40), 40) AS INT) AS m
  FROM w JOIN n ON w.doc_id = n.doc_id
),
boxes AS (
  SELECT doc_id,
         CAST((page_no - 1) * 43
              + CASE WHEN i < m - 1 THEN 1 + i ELSE m + 2 END AS INT) AS ord,
         'text' AS kind, word AS text, CAST(NULL AS VARCHAR) AS media_ref,
         page_no,
         ROUND(72 + 5.0 * COALESCE(SUM(LENGTH(word)) OVER
               (PARTITION BY doc_id, page_no, line_no ORDER BY widx
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + 5.0 * pos, 2) AS left_pt,
         ROUND(64 + 14.0 * line_no, 2) AS top_pt,
         ROUND(5.0 * LENGTH(word), 2) AS width_pt,
         CAST(NULL AS DOUBLE) AS height_pt,
         CAST(10.0 AS DOUBLE) AS line_height,
         CAST(10.0 AS DOUBLE) AS font_size,
         '#000000' AS color, 'Mono' AS font_family
  FROM ws
),
pg AS (
  SELECT doc_id, CAST(p AS INT) AS p,
         CAST(LEAST(nw - 40 * (p - 1), 40) AS INT) AS m
  FROM (SELECT doc_id, nw, unnest(generate_series(1, np)) AS p FROM n)
),
pages AS (
  SELECT doc_id, CAST((p - 1) * 43 AS INT) AS ord, 'page' AS kind,
         CAST(NULL AS VARCHAR) AS text, CAST(NULL AS VARCHAR) AS media_ref,
         p AS page_no,
         CAST(NULL AS DOUBLE) AS left_pt, CAST(NULL AS DOUBLE) AS top_pt,
         CAST(612.0 AS DOUBLE) AS width_pt, CAST(792.0 AS DOUBLE) AS height_pt,
         CAST(NULL AS DOUBLE) AS line_height, CAST(NULL AS DOUBLE) AS font_size,
         CAST(NULL AS VARCHAR) AS color, CAST(NULL AS VARCHAR) AS font_family
  FROM pg
),
rects AS (
  SELECT doc_id, CAST((p - 1) * 43 + m AS INT) AS ord, 'rect' AS kind,
         CAST(NULL AS VARCHAR) AS text, CAST(NULL AS VARCHAR) AS media_ref,
         p AS page_no,
         CAST(100 + 10 * ((p - 1) % 5) AS DOUBLE) AS left_pt,
         CAST(722.0 AS DOUBLE) AS top_pt,
         CAST(80 + 5 * (p % 3) AS DOUBLE) AS width_pt,
         CAST(20.0 AS DOUBLE) AS height_pt,
         CAST(NULL AS DOUBLE) AS line_height, CAST(NULL AS DOUBLE) AS font_size,
         '#3f7fbf' AS color, CAST(NULL AS VARCHAR) AS font_family
  FROM pg
),
imgs AS (
  SELECT doc_id, CAST((p - 1) * 43 + m + 1 AS INT) AS ord, 'image' AS kind,
         CAST(NULL AS VARCHAR) AS text,
         'sha:' || md5(doc_id || ':' || CAST(p AS VARCHAR)) AS media_ref,
         p AS page_no,
         CAST(200 + 10 * (p % 4) AS DOUBLE) AS left_pt,
         CAST(402.0 AS DOUBLE) AS top_pt,
         CAST(120.0 AS DOUBLE) AS width_pt, CAST(90.0 AS DOUBLE) AS height_pt,
         CAST(NULL AS DOUBLE) AS line_height, CAST(NULL AS DOUBLE) AS font_size,
         CAST(NULL AS VARCHAR) AS color, CAST(NULL AS VARCHAR) AS font_family
  FROM pg
),
fonts AS (
  SELECT doc_id, CAST(nw + 3 * np AS INT) AS ord, 'font' AS kind,
         'Mono' AS text, 'font:Mono' AS media_ref, CAST(NULL AS INT) AS page_no,
         CAST(NULL AS DOUBLE) AS left_pt, CAST(NULL AS DOUBLE) AS top_pt,
         CAST(NULL AS DOUBLE) AS width_pt, CAST(NULL AS DOUBLE) AS height_pt,
         CAST(NULL AS DOUBLE) AS line_height, CAST(NULL AS DOUBLE) AS font_size,
         CAST(NULL AS VARCHAR) AS color, CAST(NULL AS VARCHAR) AS font_family
  FROM n
)
SELECT * FROM boxes UNION ALL SELECT * FROM pages UNION ALL
SELECT * FROM rects UNION ALL SELECT * FROM imgs UNION ALL SELECT * FROM fonts
"""

@_reg("extract_spans_oracle", _ORACLE_SPANS_SQL)
def extract_spans_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    flat = _extract_flat(spark, sf_dir, mode="oracle")
    return flat.select(
        "doc_id",
        F.col("order").cast("int").alias("ord"),
        "kind", "text", "media_ref",
        F.col("page_no").cast("int").alias("page_no"),
        F.round(F.col("style_left").cast("double"), 2).alias("left_pt"),
        F.round(F.col("style_top").cast("double"), 2).alias("top_pt"),
        F.round(F.col("style_width").cast("double"), 2).alias("width_pt"),
        F.round(F.col("style_height").cast("double"), 2).alias("height_pt"),
        F.round(F.col("style_line_height").cast("double"), 2).alias("line_height"),
        F.round(F.col("style_font_size").cast("double"), 2).alias("font_size"),
        F.col("style_color").alias("color"),
        F.col("style_font_family").alias("font_family"),
    )


# 1a-flags. P4 graphics/image disable flags under the cross-engine gate:
# the kernel never creates rect/line/image records, the remaining records
# keep their relative order and renumber densely — the oracle filters the
# same closed form and re-ranks ord (previously pytest-only).

@_reg("extract_spans_nographics", f"""
WITH f AS (
  SELECT * FROM ({_ORACLE_SPANS_SQL}) WHERE kind NOT IN ('rect', 'image')
)
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY ord) - 1
            AS INT) AS ord,
       kind, text, media_ref, page_no, left_pt, top_pt, width_pt,
       height_pt, line_height, font_size, color, font_family
FROM f
""")
def extract_spans_nographics(spark: SparkSession, sf_dir: str) -> DataFrame:
    flat = _extract_flat(
        spark, sf_dir, mode="oracle",
        cfg=ExtractConfig(disable_graphics=True, disable_images=True))
    return _oracle_proj(flat)


# 1a-ignore. S9 ignore-resource handler under the cross-engine gate: image
# spans keep their slot and geometry but emit an EMPTY src
# (PDFDomTree.java:435-438, IgnoreResourceHandler) — previously
# pytest-only.

@_reg("extract_spans_ignore_images", f"""
SELECT doc_id, ord, kind, text,
       CASE WHEN kind = 'image' THEN '' ELSE media_ref END AS media_ref,
       page_no, left_pt, top_pt, width_pt, height_pt, line_height,
       font_size, color, font_family
FROM ({_ORACLE_SPANS_SQL})
""")
def extract_spans_ignore_images(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    flat = _extract_flat(spark, sf_dir, mode="oracle",
                         cfg=ExtractConfig(image_handler="ignore"))
    return _oracle_proj(flat)


# 1a-rich. FULL kernel vs closed-form SQL on the rich-lite corpus: every
# "rich" text feature with derivable geometry — Tr stroke-only rendering
# mode, Tw/Tc sticky spacing, TJ kerning splits, RTL reverse, diacritic
# merge, mid-line style-change splits — plus per-page rect + image.
# Per-line variant v = (global line index) % 9; see corpus.rich_lite_stream.
# Emission order per page: page, rect, image, line, boxes 0..nb-1; font last.
_RICH_LITE_SQL = """
WITH wr AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         unnest(string_split(text,' ')) AS word,
         generate_subscripts(string_split(text,' '), 1) AS sidx
  FROM documents WHERE length(text) > 0
),
w0 AS (
  -- kernel drops empty words: filter + renumber to match its word stream
  SELECT doc_id, word,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sidx) - 1 AS widx
  FROM wr WHERE word <> ''
),
b AS (
  SELECT doc_id, word, widx,
         CAST(widx // 24 + 1 AS INT) AS p,
         CAST((widx % 24) // 4 AS INT) AS li,
         CAST(widx % 4 AS INT) AS k,
         widx // 4 AS lid,
         LENGTH(word) AS L
  FROM w0
),
lw AS (
  SELECT doc_id, lid, COUNT(*) AS m, SUM(L) AS tot,
         CASE WHEN COUNT(*) = 4 THEN CAST(lid % 9 AS INT) ELSE 0 END AS v
  FROM b GROUP BY doc_id, lid
),
lines AS (
  SELECT doc_id, lid, m, tot, v,
         CAST(lid // 6 + 1 AS INT) AS p,
         CAST(lid % 6 AS INT) AS li,
         m + CASE WHEN v IN (4, 5) THEN 1 ELSE 0 END AS nb_line
  FROM lw
),
lineoff AS (
  SELECT *, COALESCE(SUM(nb_line) OVER (PARTITION BY doc_id, p ORDER BY li
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS loff
  FROM lines
),
pages0 AS (SELECT doc_id, p, SUM(nb_line) AS nb FROM lines GROUP BY doc_id, p),
pageoff AS (
  SELECT *, COALESCE(SUM(nb + 4) OVER (PARTITION BY doc_id ORDER BY p
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS poff
  FROM pages0
),
g AS (
  SELECT b.*, lw.v, lo.loff, po.poff,
         COALESCE(SUM(b.L) OVER (PARTITION BY b.doc_id, b.lid ORDER BY b.k
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum,
         SUM(CASE WHEN b.k <= 1 THEN b.L ELSE 0 END)
             OVER (PARTITION BY b.doc_id, b.lid) AS cum2
  FROM b
  JOIN lw USING (doc_id, lid)
  JOIN lineoff lo ON lo.doc_id = b.doc_id AND lo.lid = b.lid
  JOIN pageoff po ON po.doc_id = b.doc_id AND po.p = b.p
),
wordboxes AS (
  SELECT doc_id, CAST(poff + 4 + loff + k AS INT) AS ord,
         'text' AS kind, word AS text, CAST(NULL AS VARCHAR) AS media_ref,
         p AS page_no,
         ROUND(CASE WHEN v = 2 THEN 72 + 5.5 * cum + 7.0 * k
               WHEN v = 3 AND k >= 2 THEN 72 + 5.0 * (cum + k - 1) + 2.5
               WHEN v = 6 AND k = 3 THEN 72 + 5.0 * (cum + 2)
               WHEN v = 7 THEN 72 + 6.0 * (cum + k)
               WHEN v = 8 AND k >= 2 THEN 72 + 5.0 * (cum - cum2 + k - 2)
               ELSE 72 + 5.0 * (cum + k) END, 2) AS left_pt,
         CAST(64 + 16 * li
              + CASE WHEN v = 8 AND k >= 2 THEN 24 ELSE 0 END AS DOUBLE)
             AS top_pt,
         ROUND(CASE WHEN v = 2 THEN 5.5 * L WHEN v = 7 THEN 6.0 * L
               ELSE 5.0 * L END, 2) AS width_pt,
         CAST(NULL AS DOUBLE) AS height_pt,
         CAST(10.0 AS DOUBLE) AS line_height,
         CAST(CASE WHEN v = 7 THEN 12.0 ELSE 10.0 END AS DOUBLE) AS font_size,
         CASE WHEN v = 1 THEN 'rgba(0,0,0,0)'
              WHEN v = 6 AND k = 3 THEN '#7f0000'
              ELSE '#000000' END AS color,
         CASE WHEN v = 1 THEN '#000000' ELSE 'rgba(0,0,0,0)' END AS stroke_color,
         CAST(CASE WHEN v = 2 THEN 1.5 ELSE 0.0 END AS DOUBLE) AS wsp,
         CAST(CASE WHEN v = 2 THEN 0.5 ELSE 0.0 END AS DOUBLE) AS lsp,
         'Mono' AS font_family
  FROM g
),
extras AS (
  SELECT lo.doc_id, CAST(po.poff + 4 + lo.loff + lo.m AS INT) AS ord,
         'text' AS kind,
         CASE WHEN lo.v = 4 THEN reverse('שלום')
              ELSE 'e' || chr(769) END AS text,
         CAST(NULL AS VARCHAR) AS media_ref, lo.p AS page_no,
         CAST(CASE WHEN lo.v = 4 THEN 72 + 5.0 * (lo.tot + 3)
              ELSE 300.0 END AS DOUBLE) AS left_pt,
         CAST(CASE WHEN lo.v = 4 THEN 64 + 16 * lo.li
              ELSE 72 + 16 * lo.li END AS DOUBLE) AS top_pt,
         CAST(CASE WHEN lo.v = 4 THEN 20.0 ELSE 5.0 END AS DOUBLE) AS width_pt,
         CAST(NULL AS DOUBLE) AS height_pt,
         CAST(10.0 AS DOUBLE) AS line_height, CAST(10.0 AS DOUBLE) AS font_size,
         '#000000' AS color, 'rgba(0,0,0,0)' AS stroke_color,
         CAST(0.0 AS DOUBLE) AS wsp, CAST(0.0 AS DOUBLE) AS lsp,
         'Mono' AS font_family
  FROM lineoff lo JOIN pageoff po ON po.doc_id = lo.doc_id AND po.p = lo.p
  WHERE lo.v IN (4, 5)
),
pagespans AS (
  SELECT doc_id, CAST(poff AS INT) AS ord, 'page' AS kind,
         CAST(NULL AS VARCHAR) AS text, CAST(NULL AS VARCHAR) AS media_ref,
         p AS page_no, CAST(NULL AS DOUBLE) AS left_pt,
         CAST(NULL AS DOUBLE) AS top_pt,
         CAST(612.0 AS DOUBLE) AS width_pt, CAST(792.0 AS DOUBLE) AS height_pt,
         CAST(NULL AS DOUBLE) AS line_height, CAST(NULL AS DOUBLE) AS font_size,
         CAST(NULL AS VARCHAR) AS color, CAST(NULL AS VARCHAR) AS stroke_color,
         CAST(NULL AS DOUBLE) AS wsp, CAST(NULL AS DOUBLE) AS lsp,
         CAST(NULL AS VARCHAR) AS font_family
  FROM pageoff
),
rects AS (
  SELECT doc_id, CAST(poff + 1 AS INT) AS ord, 'rect' AS kind,
         CAST(NULL AS VARCHAR) AS text, CAST(NULL AS VARCHAR) AS media_ref,
         p AS page_no,
         CAST(100 + 10 * ((p - 1) % 5) AS DOUBLE) AS left_pt,
         CAST(722.0 AS DOUBLE) AS top_pt,
         CAST(80 + 5 * (p % 3) AS DOUBLE) AS width_pt,
         CAST(20.0 AS DOUBLE) AS height_pt,
         CAST(NULL AS DOUBLE) AS line_height, CAST(NULL AS DOUBLE) AS font_size,
         '#3f7fbf' AS color, CAST(NULL AS VARCHAR) AS stroke_color,
         CAST(NULL AS DOUBLE) AS wsp, CAST(NULL AS DOUBLE) AS lsp,
         CAST(NULL AS VARCHAR) AS font_family
  FROM pageoff
),
imgs AS (
  SELECT doc_id, CAST(poff + 2 AS INT) AS ord, 'image' AS kind,
         CAST(NULL AS VARCHAR) AS text,
         'sha:' || md5(doc_id || ':rl:' || CAST(p AS VARCHAR)) AS media_ref,
         p AS page_no,
         CAST(200 + 10 * (p % 4) AS DOUBLE) AS left_pt,
         CAST(402.0 AS DOUBLE) AS top_pt,
         CAST(120.0 AS DOUBLE) AS width_pt, CAST(90.0 AS DOUBLE) AS height_pt,
         CAST(NULL AS DOUBLE) AS line_height, CAST(NULL AS DOUBLE) AS font_size,
         CAST(NULL AS VARCHAR) AS color, CAST(NULL AS VARCHAR) AS stroke_color,
         CAST(NULL AS DOUBLE) AS wsp, CAST(NULL AS DOUBLE) AS lsp,
         CAST(NULL AS VARCHAR) AS font_family
  FROM pageoff
),
linespans AS (
  SELECT doc_id, CAST(poff + 3 AS INT) AS ord, 'line' AS kind,
         CAST(NULL AS VARCHAR) AS text, CAST(NULL AS VARCHAR) AS media_ref,
         p AS page_no,
         CAST(100 + 5 * (p % 4) AS DOUBLE) AS left_pt,
         CAST(312.0 AS DOUBLE) AS top_pt,
         CAST(200.0 AS DOUBLE) AS width_pt, CAST(0.0 AS DOUBLE) AS height_pt,
         CAST(NULL AS DOUBLE) AS line_height, CAST(NULL AS DOUBLE) AS font_size,
         CAST(NULL AS VARCHAR) AS color, '#19334c' AS stroke_color,
         CAST(NULL AS DOUBLE) AS wsp, CAST(NULL AS DOUBLE) AS lsp,
         CAST(NULL AS VARCHAR) AS font_family
  FROM pageoff
),
gd AS (
  -- trailing graphics-only rotated page: base ordinal after all text pages,
  -- rot = (90,180,270)[np % 3], page_no = np + 1
  SELECT doc_id, CAST(SUM(nb + 4) AS INT) AS base,
         CAST(MAX(p) + 1 AS INT) AS gpno,
         CAST(CASE (MAX(p)) % 3 WHEN 0 THEN 90 WHEN 1 THEN 180 ELSE 270 END
              AS INT) AS rot
  FROM pages0 GROUP BY doc_id
),
gpages AS (
  SELECT doc_id, base AS ord, 'page' AS kind,
         CAST(NULL AS VARCHAR) AS text, CAST(NULL AS VARCHAR) AS media_ref,
         gpno AS page_no, CAST(NULL AS DOUBLE) AS left_pt,
         CAST(NULL AS DOUBLE) AS top_pt,
         CAST(CASE WHEN rot = 180 THEN 612.0 ELSE 792.0 END AS DOUBLE)
             AS width_pt,
         CAST(CASE WHEN rot = 180 THEN 792.0 ELSE 612.0 END AS DOUBLE)
             AS height_pt,
         CAST(NULL AS DOUBLE) AS line_height, CAST(NULL AS DOUBLE) AS font_size,
         CAST(NULL AS VARCHAR) AS color, CAST(NULL AS VARCHAR) AS stroke_color,
         CAST(NULL AS DOUBLE) AS wsp, CAST(NULL AS DOUBLE) AS lsp,
         CAST(NULL AS VARCHAR) AS font_family
  FROM gd
),
grects AS (
  -- user rect (100,50)+(80,20) through the quadrant transform
  SELECT doc_id, base + 1 AS ord, 'rect' AS kind,
         CAST(NULL AS VARCHAR) AS text, CAST(NULL AS VARCHAR) AS media_ref,
         gpno AS page_no,
         CAST(CASE rot WHEN 90 THEN 50 WHEN 180 THEN 432 ELSE 722 END
              AS DOUBLE) AS left_pt,
         CAST(CASE rot WHEN 90 THEN 100 WHEN 180 THEN 50 ELSE 432 END
              AS DOUBLE) AS top_pt,
         CAST(CASE rot WHEN 180 THEN 80 ELSE 20 END AS DOUBLE) AS width_pt,
         CAST(CASE rot WHEN 180 THEN 20 ELSE 80 END AS DOUBLE) AS height_pt,
         CAST(NULL AS DOUBLE) AS line_height, CAST(NULL AS DOUBLE) AS font_size,
         '#3f7fbf' AS color, CAST(NULL AS VARCHAR) AS stroke_color,
         CAST(NULL AS DOUBLE) AS wsp, CAST(NULL AS DOUBLE) AS lsp,
         CAST(NULL AS VARCHAR) AS font_family
  FROM gd
),
gimgs AS (
  -- image placed at cm(120,0,0,90,200,300): user box (200,300)-(320,390)
  SELECT doc_id, base + 2 AS ord, 'image' AS kind,
         CAST(NULL AS VARCHAR) AS text,
         'sha:' || md5(doc_id || ':rlg') AS media_ref,
         gpno AS page_no,
         CAST(CASE rot WHEN 90 THEN 300 WHEN 180 THEN 292 ELSE 402 END
              AS DOUBLE) AS left_pt,
         CAST(CASE rot WHEN 90 THEN 200 WHEN 180 THEN 300 ELSE 292 END
              AS DOUBLE) AS top_pt,
         CAST(CASE rot WHEN 180 THEN 120 ELSE 90 END AS DOUBLE) AS width_pt,
         CAST(CASE rot WHEN 180 THEN 90 ELSE 120 END AS DOUBLE) AS height_pt,
         CAST(NULL AS DOUBLE) AS line_height, CAST(NULL AS DOUBLE) AS font_size,
         CAST(NULL AS VARCHAR) AS color, CAST(NULL AS VARCHAR) AS stroke_color,
         CAST(NULL AS DOUBLE) AS wsp, CAST(NULL AS DOUBLE) AS lsp,
         CAST(NULL AS VARCHAR) AS font_family
  FROM gd
),
glines AS (
  -- user segment (150,480)-(350,480): vertical under 90/270, horizontal 180
  SELECT doc_id, base + 3 AS ord, 'line' AS kind,
         CAST(NULL AS VARCHAR) AS text, CAST(NULL AS VARCHAR) AS media_ref,
         gpno AS page_no,
         CAST(CASE rot WHEN 90 THEN 480 WHEN 180 THEN 262 ELSE 312 END
              AS DOUBLE) AS left_pt,
         CAST(CASE rot WHEN 90 THEN 150 WHEN 180 THEN 480 ELSE 262 END
              AS DOUBLE) AS top_pt,
         CAST(CASE rot WHEN 180 THEN 200 ELSE 0 END AS DOUBLE) AS width_pt,
         CAST(CASE rot WHEN 180 THEN 0 ELSE 200 END AS DOUBLE) AS height_pt,
         CAST(NULL AS DOUBLE) AS line_height, CAST(NULL AS DOUBLE) AS font_size,
         CAST(NULL AS VARCHAR) AS color, '#19334c' AS stroke_color,
         CAST(NULL AS DOUBLE) AS wsp, CAST(NULL AS DOUBLE) AS lsp,
         CAST(NULL AS VARCHAR) AS font_family
  FROM gd
),
gcmykrects AS (
  -- device-CMYK fill 0.2/0.4/0.6/0.1 k -> naive device formula #b7895b;
  -- user rect (150,120)+(100,40) through the quadrant transform
  SELECT doc_id, base + 4 AS ord, 'rect' AS kind,
         CAST(NULL AS VARCHAR) AS text, CAST(NULL AS VARCHAR) AS media_ref,
         gpno AS page_no,
         CAST(CASE rot WHEN 90 THEN 120 WHEN 180 THEN 362 ELSE 632 END
              AS DOUBLE) AS left_pt,
         CAST(CASE rot WHEN 90 THEN 150 WHEN 180 THEN 120 ELSE 362 END
              AS DOUBLE) AS top_pt,
         CAST(CASE rot WHEN 180 THEN 100 ELSE 40 END AS DOUBLE) AS width_pt,
         CAST(CASE rot WHEN 180 THEN 40 ELSE 100 END AS DOUBLE) AS height_pt,
         CAST(NULL AS DOUBLE) AS line_height, CAST(NULL AS DOUBLE) AS font_size,
         '#b7895b' AS color, CAST(NULL AS VARCHAR) AS stroke_color,
         CAST(NULL AS DOUBLE) AS wsp, CAST(NULL AS DOUBLE) AS lsp,
         CAST(NULL AS VARCHAR) AS font_family
  FROM gd
),
gcmyklines AS (
  -- device-CMYK stroke 0.6/0.2/0/0.2 K -> #51a3cc; user segment
  -- (150,200)-(350,200)
  SELECT doc_id, base + 5 AS ord, 'line' AS kind,
         CAST(NULL AS VARCHAR) AS text, CAST(NULL AS VARCHAR) AS media_ref,
         gpno AS page_no,
         CAST(CASE rot WHEN 90 THEN 200 WHEN 180 THEN 262 ELSE 592 END
              AS DOUBLE) AS left_pt,
         CAST(CASE rot WHEN 90 THEN 150 WHEN 180 THEN 200 ELSE 262 END
              AS DOUBLE) AS top_pt,
         CAST(CASE rot WHEN 180 THEN 200 ELSE 0 END AS DOUBLE) AS width_pt,
         CAST(CASE rot WHEN 180 THEN 0 ELSE 200 END AS DOUBLE) AS height_pt,
         CAST(NULL AS DOUBLE) AS line_height, CAST(NULL AS DOUBLE) AS font_size,
         CAST(NULL AS VARCHAR) AS color, '#51a3cc' AS stroke_color,
         CAST(NULL AS DOUBLE) AS wsp, CAST(NULL AS DOUBLE) AS lsp,
         CAST(NULL AS VARCHAR) AS font_family
  FROM gd
),
fonts AS (
  SELECT doc_id, CAST(SUM(nb + 4) + 6 AS INT) AS ord, 'font' AS kind,
         'Mono' AS text, 'font:Mono' AS media_ref, CAST(NULL AS INT) AS page_no,
         CAST(NULL AS DOUBLE) AS left_pt, CAST(NULL AS DOUBLE) AS top_pt,
         CAST(NULL AS DOUBLE) AS width_pt, CAST(NULL AS DOUBLE) AS height_pt,
         CAST(NULL AS DOUBLE) AS line_height, CAST(NULL AS DOUBLE) AS font_size,
         CAST(NULL AS VARCHAR) AS color, CAST(NULL AS VARCHAR) AS stroke_color,
         CAST(NULL AS DOUBLE) AS wsp, CAST(NULL AS DOUBLE) AS lsp,
         CAST(NULL AS VARCHAR) AS font_family
  FROM pages0 GROUP BY doc_id
)
SELECT * FROM wordboxes UNION ALL SELECT * FROM extras
UNION ALL SELECT * FROM pagespans UNION ALL SELECT * FROM rects
UNION ALL SELECT * FROM imgs UNION ALL SELECT * FROM linespans
UNION ALL SELECT * FROM gpages UNION ALL SELECT * FROM grects
UNION ALL SELECT * FROM gimgs UNION ALL SELECT * FROM glines
UNION ALL SELECT * FROM gcmykrects UNION ALL SELECT * FROM gcmyklines
UNION ALL SELECT * FROM fonts
"""

@_reg("extract_spans_rich_lite", _RICH_LITE_SQL)
def extract_spans_rich_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    flat = _extract_flat(spark, sf_dir, mode="rich_lite")
    return flat.select(
        "doc_id",
        F.col("order").cast("int").alias("ord"),
        "kind", "text", "media_ref",
        F.col("page_no").cast("int").alias("page_no"),
        F.round(F.col("style_left").cast("double"), 2).alias("left_pt"),
        F.round(F.col("style_top").cast("double"), 2).alias("top_pt"),
        F.round(F.col("style_width").cast("double"), 2).alias("width_pt"),
        F.round(F.col("style_height").cast("double"), 2).alias("height_pt"),
        F.round(F.col("style_line_height").cast("double"), 2).alias("line_height"),
        F.round(F.col("style_font_size").cast("double"), 2).alias("font_size"),
        F.col("style_color").alias("color"),
        F.col("style_stroke_color").alias("stroke_color"),
        F.round(F.col("style_word_spacing").cast("double"), 2).alias("wsp"),
        F.round(F.col("style_letter_spacing").cast("double"), 2).alias("lsp"),
        F.col("style_font_family").alias("font_family"),
    )


# 1a-rot. FULL kernel vs closed-form SQL on the rotated-page TEXT corpus
# (PDFBoxTree.java:822-855): TextPosition.getX/getY is the page transform of
# the glyph's device origin — rot0 (x, h-y); rot90 (y, x); rot180 (w-x, y);
# rot270 (h-y, w-x) — while getWidth stays the un-rotated device-x
# displacement, so on rotated pages every glyph is its own box (disty=5>1 on
# 90/270, distx=-10<-6 on 180). One Mono-10 line per page at Tm(72,700);
# rotation cycles with the page index (corpus.rot_text_stream).
# top = getY - ascent (ascent = 0.8 * size = 8).

_ROT_TEXT_SQL = """
WITH w0 AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         unnest(string_split(text,' ')) AS word,
         generate_subscripts(string_split(text,' '), 1) AS sidx
  FROM documents WHERE length(text) > 0
),
w AS (
  SELECT doc_id, word,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sidx) - 1 AS widx
  FROM w0 WHERE word <> ''
),
ws AS (
  SELECT doc_id, word, widx,
         CAST(widx // 4 + 1 AS INT) AS page_no,
         CAST(widx % 4 AS INT) AS j,
         COALESCE(SUM(LENGTH(word)) OVER (PARTITION BY doc_id, widx // 4
             ORDER BY widx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) + (widx % 4) AS pre
  FROM w
),
pg AS (
  SELECT doc_id, page_no,
         ((page_no - 1) % 4) * 90 AS rot,
         COUNT(*) AS m, SUM(LENGTH(word)) AS nchars
  FROM ws GROUP BY doc_id, page_no
),
pgo AS (
  SELECT doc_id, page_no, rot,
         m, CASE WHEN rot = 0 THEN m ELSE nchars END AS nb,
         CAST(COALESCE(SUM(CASE WHEN rot = 0 THEN m ELSE nchars END + 1)
             OVER (PARTITION BY doc_id ORDER BY page_no
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS INT) AS base
  FROM pg
),
pages AS (
  SELECT doc_id, base AS ord, 'page' AS kind,
         CAST(NULL AS VARCHAR) AS text, CAST(NULL AS VARCHAR) AS media_ref,
         page_no,
         CAST(NULL AS DOUBLE) AS left_pt, CAST(NULL AS DOUBLE) AS top_pt,
         CASE WHEN rot IN (90, 270) THEN 792.0 ELSE 612.0 END AS width_pt,
         CASE WHEN rot IN (90, 270) THEN 612.0 ELSE 792.0 END AS height_pt,
         CAST(NULL AS DOUBLE) AS line_height, CAST(NULL AS DOUBLE) AS font_size,
         CAST(NULL AS VARCHAR) AS color, CAST(NULL AS VARCHAR) AS font_family
  FROM pgo
),
b0 AS (
  SELECT ws.doc_id, CAST(p.base + 1 + ws.j AS INT) AS ord, 'text' AS kind,
         ws.word AS text, CAST(NULL AS VARCHAR) AS media_ref, ws.page_no,
         ROUND(72 + 5.0 * ws.pre, 2) AS left_pt, 84.0 AS top_pt,
         ROUND(5.0 * LENGTH(ws.word), 2) AS width_pt,
         CAST(NULL AS DOUBLE) AS height_pt,
         10.0 AS line_height, 10.0 AS font_size,
         '#000000' AS color, 'Mono' AS font_family
  FROM ws JOIN pgo p USING (doc_id, page_no) WHERE p.rot = 0
),
gly0 AS (
  SELECT ws.doc_id, ws.page_no, p.rot, p.base, ws.word, ws.pre, ws.j,
         unnest(generate_series(1, LENGTH(ws.word))) AS gi
  FROM ws JOIN pgo p USING (doc_id, page_no)
  WHERE p.rot <> 0
),
bg AS (
  SELECT doc_id,
         CAST(base + 1 + (pre - j) + gi - 1 AS INT) AS ord, 'text' AS kind,
         substr(word, gi, 1) AS text, CAST(NULL AS VARCHAR) AS media_ref,
         page_no,
         ROUND(CASE rot WHEN 90 THEN 700.0
               WHEN 180 THEN 612.0 - (72 + 5.0 * (pre + gi - 1))
               ELSE 92.0 END, 2) AS left_pt,
         ROUND(CASE rot WHEN 90 THEN (72 + 5.0 * (pre + gi - 1)) - 8.0
               WHEN 180 THEN 692.0
               ELSE 612.0 - (72 + 5.0 * (pre + gi - 1)) - 8.0 END, 2) AS top_pt,
         5.0 AS width_pt, CAST(NULL AS DOUBLE) AS height_pt,
         10.0 AS line_height, 10.0 AS font_size,
         '#000000' AS color, 'Mono' AS font_family
  FROM gly0
),
fonts AS (
  SELECT doc_id, CAST(SUM(nb + 1) AS INT) AS ord, 'font' AS kind,
         'Mono' AS text, 'font:Mono' AS media_ref, CAST(NULL AS INT) AS page_no,
         CAST(NULL AS DOUBLE) AS left_pt, CAST(NULL AS DOUBLE) AS top_pt,
         CAST(NULL AS DOUBLE) AS width_pt, CAST(NULL AS DOUBLE) AS height_pt,
         CAST(NULL AS DOUBLE) AS line_height, CAST(NULL AS DOUBLE) AS font_size,
         CAST(NULL AS VARCHAR) AS color, CAST(NULL AS VARCHAR) AS font_family
  FROM pgo GROUP BY doc_id
)
SELECT * FROM pages UNION ALL SELECT * FROM b0
UNION ALL SELECT * FROM bg UNION ALL SELECT * FROM fonts
"""


def _oracle_proj(flat: DataFrame) -> DataFrame:
    return flat.select(
        "doc_id",
        F.col("order").cast("int").alias("ord"),
        "kind", "text", "media_ref",
        F.col("page_no").cast("int").alias("page_no"),
        F.round(F.col("style_left").cast("double"), 2).alias("left_pt"),
        F.round(F.col("style_top").cast("double"), 2).alias("top_pt"),
        F.round(F.col("style_width").cast("double"), 2).alias("width_pt"),
        F.round(F.col("style_height").cast("double"), 2).alias("height_pt"),
        F.round(F.col("style_line_height").cast("double"), 2).alias("line_height"),
        F.round(F.col("style_font_size").cast("double"), 2).alias("font_size"),
        F.col("style_color").alias("color"),
        F.col("style_font_family").alias("font_family"),
    )


@_reg("extract_spans_rot_text", _ROT_TEXT_SQL)
def extract_spans_rot_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _oracle_proj(_extract_flat(spark, sf_dir, mode="rot_text"))


# 1a-forms. FULL kernel vs closed-form SQL on the form-XObject corpus
# (PDFBoxTree.java:394-404; PDFBox showForm): a header form defined once per
# doc, invoked on every page via /F1 Do — expansion runs inline under an
# implicit q/Q, so the form's Mono-8 font + 0.25/0.5/0.75 fill are isolated
# from the Mono-10 black body (corpus.forms_stream). Per page: page span,
# header box (flushed when the body starts), body word boxes.

_FORMS_SQL = """
WITH w0 AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         unnest(string_split(text,' ')) AS word,
         generate_subscripts(string_split(text,' '), 1) AS sidx
  FROM documents WHERE length(text) > 0
),
w AS (
  SELECT doc_id, word,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sidx) - 1 AS widx
  FROM w0 WHERE word <> ''
),
ws AS (
  SELECT doc_id, word, widx,
         CAST(widx // 4 + 1 AS INT) AS page_no,
         CAST(widx % 4 AS INT) AS j,
         COALESCE(SUM(LENGTH(word)) OVER (PARTITION BY doc_id, widx // 4
             ORDER BY widx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) + (widx % 4) AS pre
  FROM w
),
pg AS (
  SELECT doc_id, page_no, COUNT(*) AS m FROM ws GROUP BY doc_id, page_no
),
pgo AS (
  SELECT doc_id, page_no, m,
         CAST(COALESCE(SUM(m + 2) OVER (PARTITION BY doc_id ORDER BY page_no
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT)
           AS base
  FROM pg
),
pages AS (
  SELECT doc_id, base AS ord, 'page' AS kind,
         CAST(NULL AS VARCHAR) AS text, CAST(NULL AS VARCHAR) AS media_ref,
         page_no,
         CAST(NULL AS DOUBLE) AS left_pt, CAST(NULL AS DOUBLE) AS top_pt,
         612.0 AS width_pt, 792.0 AS height_pt,
         CAST(NULL AS DOUBLE) AS line_height, CAST(NULL AS DOUBLE) AS font_size,
         CAST(NULL AS VARCHAR) AS color, CAST(NULL AS VARCHAR) AS font_family
  FROM pgo
),
hdrs AS (
  SELECT doc_id, CAST(base + 1 AS INT) AS ord, 'text' AS kind,
         'hdr' || doc_id AS text, CAST(NULL AS VARCHAR) AS media_ref, page_no,
         72.0 AS left_pt, 25.6 AS top_pt,
         ROUND(4.0 * LENGTH('hdr' || doc_id), 2) AS width_pt,
         CAST(NULL AS DOUBLE) AS height_pt,
         8.0 AS line_height, 8.0 AS font_size,
         '#3f7fbf' AS color, 'Mono' AS font_family
  FROM pgo
),
body AS (
  SELECT ws.doc_id, CAST(p.base + 2 + ws.j AS INT) AS ord, 'text' AS kind,
         ws.word AS text, CAST(NULL AS VARCHAR) AS media_ref, ws.page_no,
         ROUND(72 + 5.0 * ws.pre, 2) AS left_pt, 84.0 AS top_pt,
         ROUND(5.0 * LENGTH(ws.word), 2) AS width_pt,
         CAST(NULL AS DOUBLE) AS height_pt,
         10.0 AS line_height, 10.0 AS font_size,
         '#000000' AS color, 'Mono' AS font_family
  FROM ws JOIN pgo p USING (doc_id, page_no)
),
fonts AS (
  SELECT doc_id, CAST(SUM(m + 2) AS INT) AS ord, 'font' AS kind,
         'Mono' AS text, 'font:Mono' AS media_ref, CAST(NULL AS INT) AS page_no,
         CAST(NULL AS DOUBLE) AS left_pt, CAST(NULL AS DOUBLE) AS top_pt,
         CAST(NULL AS DOUBLE) AS width_pt, CAST(NULL AS DOUBLE) AS height_pt,
         CAST(NULL AS DOUBLE) AS line_height, CAST(NULL AS DOUBLE) AS font_size,
         CAST(NULL AS VARCHAR) AS color, CAST(NULL AS VARCHAR) AS font_family
  FROM pgo GROUP BY doc_id
)
SELECT * FROM pages UNION ALL SELECT * FROM hdrs
UNION ALL SELECT * FROM body UNION ALL SELECT * FROM fonts
"""


@_reg("extract_spans_forms", _FORMS_SQL)
def extract_spans_forms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _oracle_proj(_extract_flat(spark, sf_dir, mode="forms"))


# 1a-enc. FULL kernel vs closed-form SQL on the font-encoding corpus: a
# kind='cmap' span remaps Mono codes a/e/o -> Greek at show time (PDFBox
# font-encoding/ToUnicode resolution, PDFBoxTree.java:592-656). Advances
# stay keyed by the RAW glyph code (Mono: geometry unchanged); the span
# text is the decoded unicode — the oracle is the plain grid + translate().

_ENC_SQL = """
WITH w0 AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         unnest(string_split(text,' ')) AS word,
         generate_subscripts(string_split(text,' '), 1) AS sidx
  FROM documents WHERE length(text) > 0
),
w AS (
  SELECT doc_id, word,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sidx) - 1 AS widx
  FROM w0 WHERE word <> ''
),
ws AS (
  SELECT doc_id, word, widx,
         CAST(widx // 4 + 1 AS INT) AS page_no,
         CAST(widx % 4 AS INT) AS j,
         COALESCE(SUM(LENGTH(word)) OVER (PARTITION BY doc_id, widx // 4
             ORDER BY widx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) + (widx % 4) AS pre
  FROM w
),
pg AS (
  SELECT doc_id, page_no, COUNT(*) AS m FROM ws GROUP BY doc_id, page_no
),
pgo AS (
  SELECT doc_id, page_no, m,
         CAST(COALESCE(SUM(m + 1) OVER (PARTITION BY doc_id ORDER BY page_no
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT)
           AS base
  FROM pg
),
pages AS (
  SELECT doc_id, base AS ord, 'page' AS kind,
         CAST(NULL AS VARCHAR) AS text, CAST(NULL AS VARCHAR) AS media_ref,
         page_no,
         CAST(NULL AS DOUBLE) AS left_pt, CAST(NULL AS DOUBLE) AS top_pt,
         612.0 AS width_pt, 792.0 AS height_pt,
         CAST(NULL AS DOUBLE) AS line_height, CAST(NULL AS DOUBLE) AS font_size,
         CAST(NULL AS VARCHAR) AS color, CAST(NULL AS VARCHAR) AS font_family
  FROM pgo
),
body AS (
  SELECT ws.doc_id, CAST(p.base + 1 + ws.j AS INT) AS ord, 'text' AS kind,
         translate(ws.word, 'aeo', 'αεο') AS text,
         CAST(NULL AS VARCHAR) AS media_ref, ws.page_no,
         ROUND(72 + 5.0 * ws.pre, 2) AS left_pt, 84.0 AS top_pt,
         ROUND(5.0 * LENGTH(ws.word), 2) AS width_pt,
         CAST(NULL AS DOUBLE) AS height_pt,
         10.0 AS line_height, 10.0 AS font_size,
         '#000000' AS color, 'Mono' AS font_family
  FROM ws JOIN pgo p USING (doc_id, page_no)
),
fonts AS (
  SELECT doc_id, CAST(SUM(m + 1) AS INT) AS ord, 'font' AS kind,
         'Mono' AS text, 'font:Mono' AS media_ref, CAST(NULL AS INT) AS page_no,
         CAST(NULL AS DOUBLE) AS left_pt, CAST(NULL AS DOUBLE) AS top_pt,
         CAST(NULL AS DOUBLE) AS width_pt, CAST(NULL AS DOUBLE) AS height_pt,
         CAST(NULL AS DOUBLE) AS line_height, CAST(NULL AS DOUBLE) AS font_size,
         CAST(NULL AS VARCHAR) AS color, CAST(NULL AS VARCHAR) AS font_family
  FROM pgo GROUP BY doc_id
)
SELECT * FROM pages UNION ALL SELECT * FROM body
UNION ALL SELECT * FROM fonts
"""


@_reg("extract_spans_encoded", _ENC_SQL)
def extract_spans_encoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _oracle_proj(_extract_flat(spark, sf_dir, mode="enc"))


# 1a-paged. The page-split (monster-doc) path against the SAME closed-form
# oracle as the unsplit mono-grid kernel: puts pagesplit.extract_spans_paged
# under the cross-engine value-hash gate, not just the pytest equality gate.

@_reg("extract_spans_paged_oracle", _ORACLE_SPANS_SQL)
def extract_spans_paged_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .corpus import build_groups_df
    from .pagesplit import extract_groups

    p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # synthesis+split fused into one Python stage (corpus.build_groups_df):
    # the production scan->split shape — the generic DOC_SCHEMA entry point
    # (pagesplit.extract_spans_paged) stays bit-equal via tests/test_pagesplit
    groups = build_groups_df(spark, sf_dir, mode="oracle", pages_per_group=2,
                             min_bytes=0, num_partitions=p)
    flat = extract_groups(groups, ExtractConfig(), num_partitions=p)
    return _oracle_proj(flat)


# 1a-tail. The same split path in its PRODUCTION deployment shape: the
# routing predicate rides the SOURCE scan (pushed to parquet), the
# sub-threshold majority takes the plain unsplit kernel, and only the
# size tail (~top 20% of oracle docs by raw text length) pays the
# page-group fan-out + renumber. Output is routing-invariant, so the
# oracle is identical to the unsplit kernel's; the bench number reflects
# steady-state cost rather than the everything-splits stress shape of
# extract_spans_paged_oracle.

@_reg("extract_spans_paged_tail", _ORACLE_SPANS_SQL)
def extract_spans_paged_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .corpus import build_groups_df
    from .pagesplit import extract_groups
    from .pipeline import extract_spans

    p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    cfg = ExtractConfig()
    small = build_docs_df(spark, sf_dir, mode="oracle", num_partitions=p,
                          where="length(text) < 400")
    big_groups = build_groups_df(spark, sf_dir, mode="oracle",
                                 pages_per_group=1, min_bytes=0,
                                 num_partitions=p,
                                 where="length(text) >= 400")
    small_flat = extract_spans(small, cfg, num_partitions=p, nested=False,
                               presalted=True)
    # the tail branch holds ~20% of the corpus: partition it proportionally
    # (production sizing targets bytes/partition, not a global constant)
    big_flat = extract_groups(big_groups, cfg, num_partitions=max(8, p // 4))
    return _oracle_proj(small_flat.unionByName(
        big_flat.select(small_flat.columns)))


# 1b. page-range gate (S2; PDFBoxTree.java:200-210 — 1-based, inclusive)
@_reg("extract_page_range", """
WITH w0 AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         unnest(string_split(text,' ')) AS word,
         generate_subscripts(string_split(text,' '), 1) AS sidx
  FROM documents WHERE length(text) > 0
),
w AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sidx) - 1 AS widx
  FROM w0 WHERE word <> ''
)
SELECT doc_id,
       CAST(SUM(CASE WHEN widx < 40 THEN 1 ELSE 0 END) AS BIGINT) AS n_text,
       CAST(1 AS BIGINT) AS n_page
FROM w GROUP BY doc_id
""")
def extract_page_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    flat = _extract_flat(spark, sf_dir,
                         cfg=ExtractConfig(start_page=1, end_page=1),
                         mode="oracle")
    return flat.groupBy("doc_id").agg(
        F.sum(F.when(F.col("kind") == "text", 1).otherwise(0)).alias("n_text"),
        F.sum(F.when(F.col("kind") == "page", 1).otherwise(0)).alias("n_page"),
    )


# 1c. chunk-merge as pure window SQL (gaps-and-islands; SURVEY.md §2.h):
# lag-based split predicate -> running-sum box id -> ordered concat + metrics
@_reg("chunk_islands_sql", """
WITH w AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         unnest(string_split(text,' ')) AS word,
         generate_subscripts(string_split(text,' '), 1) - 1 AS widx
  FROM documents WHERE length(text) > 0
),
g AS (
  SELECT doc_id, word, widx,
         5.0 * LENGTH(word) AS xw,
         CASE WHEN widx % 5 = 0 THEN 0.5 ELSE 2.0 END AS gap,
         10.0 + 2.0 * ((widx // 7) % 2) AS fs
  FROM w
),
p AS (
  SELECT *, 72 + COALESCE(SUM(xw + gap) OVER
             (PARTITION BY doc_id ORDER BY widx
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS x
  FROM g
),
s AS (
  SELECT *, CASE WHEN LAG(widx) OVER win IS NULL
                   OR gap > 1.0
                   OR fs <> LAG(fs) OVER win
            THEN 1 ELSE 0 END AS split
  FROM p WINDOW win AS (PARTITION BY doc_id ORDER BY widx)
),
i AS (
  SELECT *, SUM(split) OVER (PARTITION BY doc_id ORDER BY widx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS box_id
  FROM s
)
SELECT doc_id, CAST(box_id AS INT) AS box_id,
       string_agg(word, '' ORDER BY widx) AS text,
       ROUND(MIN(x), 2) AS left_pt,
       ROUND(MAX(x + xw) - MIN(x), 2) AS width_pt,
       CAST(COUNT(*) AS BIGINT) AS n_glyphs
FROM i GROUP BY doc_id, box_id
""")
def chunk_islands_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.length("text") > 0)
    w = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.posexplode(F.split("text", " ")).alias("widx", "word"))
    g = w.select(
        "doc_id", "word", "widx",
        (5.0 * F.length("word")).alias("xw"),
        F.when(F.col("widx") % 5 == 0, 0.5).otherwise(2.0).alias("gap"),
        (10.0 + 2.0 * ((F.col("widx") / 7).cast("int") % 2)).alias("fs"))
    win = Window.partitionBy("doc_id").orderBy("widx")
    run = Window.partitionBy("doc_id").orderBy("widx").rowsBetween(
        Window.unboundedPreceding, -1)
    p = g.withColumn(
        "x", F.lit(72.0) + F.coalesce(
            F.sum(F.col("xw") + F.col("gap")).over(run), F.lit(0.0)))
    s = p.withColumn(
        "split",
        F.when(F.lag("widx").over(win).isNull()
               | (F.col("gap") > 1.0)
               | (F.col("fs") != F.lag("fs").over(win)), 1).otherwise(0))
    cur = Window.partitionBy("doc_id").orderBy("widx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    i = s.withColumn("box_id", (F.sum("split").over(cur) - 1).cast("int"))
    return i.groupBy("doc_id", "box_id").agg(
        F.array_join(F.transform(
            F.array_sort(F.collect_list(F.struct("widx", "word"))),
            lambda st: st.word), "").alias("text"),
        F.round(F.min("x"), 2).alias("left_pt"),
        F.round(F.max(F.col("x") + F.col("xw")) - F.min("x"), 2).alias("width_pt"),
        F.count(F.lit(1)).alias("n_glyphs"))


# 1d. scalar parity: RTL reverse (P8; PDFBoxTree.java:666-669)
@_reg("rtl_reverse", """
-- codepoint-order reversal (Java StringBuilder.reverse semantics, matching
-- Spark F.reverse); DuckDB's bare reverse() is grapheme-cluster based and
-- would keep combining marks attached to their base
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       array_to_string(list_reverse(string_split(text, '')), '') AS rev
FROM documents
""")
def rtl_reverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.reverse("text").alias("rev"))


# 1e. color hex formatting (M6; PDFBoxTree.java:915-930 int truncation)
@_reg("color_hex", """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       printf('#%02x%02x%02x',
              CAST(doc_id * 37 % 256 AS INT),
              CAST(doc_id * 59 % 256 AS INT),
              CAST(doc_id * 83 % 256 AS INT)) AS hex
FROM documents
""")
def color_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.format_string(
            "#%02x%02x%02x",
            (F.col("doc_id") * 37 % 256).cast("int"),
            (F.col("doc_id") * 59 % 256).cast("int"),
            (F.col("doc_id") * 83 % 256).cast("int")).alias("hex"))


def _doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id-only source, salted on the raw 64-bit hash — the shared
    scaffold of the synthesize-inside-the-query kernel gates."""
    p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id").repartition(p, F.xxhash64("doc_id")))


# 1e-cos. M7 COS value coercion under the cross-engine gate (previously
# pytest-only): per-doc streams exercise the full-tier tokenizer's string
# coercions — 3-digit octal escapes, escaped parens/backslash, and a
# <hex> string shown as a second Tj into the same box — and the decoded
# box text is compared to a chr()-arithmetic closed form.

@_reg("cos_coercion", """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       chr(CAST(65 + doc_id % 26 AS INT))
       || chr(CAST(66 + doc_id % 25 AS INT))
       || '()\\'
       || 'A' || chr(CAST(67 + doc_id % 24 AS INT)) || chr(255) AS text
FROM documents
""")
def cos_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from .extract import docs_frame_to_spans

    src = _doc_ids(spark, sf_dir)

    def kernel(batches):
        for pdf in batches:
            rows = {"doc_id": [], "spans": []}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                c1 = 65 + i % 26
                c2 = 66 + i % 25
                c3 = 67 + i % 24
                lit = (chr(c1) + "\\" + format(c2, "03o")
                       + "\\(" + "\\)" + "\\\\")
                frag = ("612 792 0 PG BT /Mono 10 Tf 1 0 0 1 72 700 Tm "
                        f"({lit}) Tj <41{c3:02x}ff> Tj ET")
                rows["doc_id"].append(str(i))
                rows["spans"].append([{"kind": "text", "text": frag,
                                       "media_ref": None, "offset": 0}])
            yield docs_frame_to_spans(pd.DataFrame(rows), ExtractConfig())

    flat = src.mapInPandas(kernel, SPAN_FLAT_SCHEMA)
    return flat.where(F.col("kind") == "text").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")


# 1e-embed. S7 embed resource handler under the cross-engine gate
# (previously pytest-only): the kernel runs with image_handler="embed",
# which must pass the image XObject's media_ref through UNCHANGED
# (EmbedAsBase64Handler keeps the payload inline,
# PDFDomTree.java:431-434); the data-URI is then assembled JVM-side from
# deterministic per-ref bytes — concat + base64(unhex(md5(ref))) — so the
# value hash covers both the handler passthrough and the base64 codec
# against DuckDB's to_base64/unhex/md5.

@_reg("resource_embed_datauri", """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       'data:image/png;base64,'
       || to_base64(unhex(md5('media:' || doc_id))) AS data_uri
FROM documents
""")
def resource_embed_datauri(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from .extract import docs_frame_to_spans

    src = _doc_ids(spark, sf_dir)

    def kernel(batches):
        for pdf in batches:
            rows = {"doc_id": [], "spans": []}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                rows["doc_id"].append(str(i))
                rows["spans"].append([
                    {"kind": "text", "text": "612 792 0 PG",
                     "media_ref": None, "offset": 0},
                    {"kind": "image", "text": f"64 48 Im{i % 7}",
                     "media_ref": f"media:{i}", "offset": 1},
                ])
            yield docs_frame_to_spans(
                pd.DataFrame(rows), ExtractConfig(image_handler="embed"))

    flat = src.mapInPandas(kernel, SPAN_FLAT_SCHEMA)
    return (flat.where(F.col("kind") == "image")
            .select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.concat(F.lit("data:image/png;base64,"),
                             F.base64(F.unhex(F.md5(F.col("media_ref")))))
                    .alias("data_uri")))


# 1e-dup. P2/P3 vestigial-filter discovery under the cross-engine gate:
# the reference's duplicate-overlap suppression and position sort are
# DEAD CODE (processTextPosition overridden without super,
# PDFBoxTree.java:158,592-656) — so a show sequence B, A, B where the two
# B's overlap EXACTLY and A sits above them must come out as THREE boxes
# in stream order, duplicates intact, never re-sorted by position. The
# oracle enumerates that order in closed form; any suppression (2 rows)
# or position sort (A first) breaks the value hash.

@_reg("dup_overlap_stream_order", """
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, o.ord,
       CASE WHEN o.ord = 1
            THEN 'A' || chr(CAST(65 + d.doc_id % 26 AS INT))
            ELSE 'B' || chr(CAST(65 + d.doc_id % 26 AS INT)) END AS text
FROM documents d
CROSS JOIN (SELECT unnest([0, 1, 2]) AS ord) o
""")
def dup_overlap_stream_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from .extract import docs_frame_to_spans

    src = _doc_ids(spark, sf_dir)

    def kernel(batches):
        for pdf in batches:
            rows = {"doc_id": [], "spans": []}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                c = chr(65 + i % 26)
                frag = ("612 792 0 PG BT /Mono 10 Tf "
                        f"1 0 0 1 72 700 Tm (B{c}) Tj "
                        f"1 0 0 1 72 750 Tm (A{c}) Tj "
                        f"1 0 0 1 72 700 Tm (B{c}) Tj ET")
                rows["doc_id"].append(str(i))
                rows["spans"].append([{"kind": "text", "text": frag,
                                       "media_ref": None, "offset": 0}])
            yield docs_frame_to_spans(pd.DataFrame(rows), ExtractConfig())

    flat = src.mapInPandas(kernel, SPAN_FLAT_SCHEMA)
    w = Window.partitionBy("doc_id").orderBy("order")
    return (flat.where(F.col("kind") == "text")
            .select(F.col("doc_id").cast("long").alias("doc_id"),
                    (F.row_number().over(w) - 1).cast("int").alias("ord"),
                    "text"))


# 1e-raster. G11 filled-path rasterizer under the cross-engine gate
# (previously pytest-only): each doc fills a right triangle
# (m/l/l/h f -> PathDrawer polygon, PathDrawer.java:43-136) with
# raster_paths=True; the kernel decodes ITS OWN emitted
# data:image/png;base64 URI (stdlib PNG reader) and reports the filled
# pixel count + int-truncated canvas bounds. The oracle replays the
# even-odd pixel-center scanline in closed form — per row r the span is
# [0, a - ((r+0.5)/b)*a), so the count is ceil(X-0.5) clamped at 0 —
# with IEEE-identical double arithmetic (validated exhaustively over the
# leg-size grid before registration). Any drift in polygon vertexing,
# bounds truncation, scanline sampling, or the PNG codec breaks the
# value hash.

@_reg("raster_fill_counts", """
WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  CAST(20 + doc_id % 13 AS DOUBLE) AS a,
                  CAST(10 + doc_id % 7 AS DOUBLE) AS b
           FROM documents),
rows AS (SELECT doc_id, a, b, r
         FROM d, generate_series(0, 15) g(r)
         WHERE r < CAST(b AS BIGINT))
SELECT doc_id, CAST(a AS INT) AS w, CAST(b AS INT) AS h,
       CAST(SUM(GREATEST(0, CAST(ceil((a + ((r + 0.5) / b) * (0 - a))
                                      - 0.5) AS BIGINT)))
            AS BIGINT) AS filled_px
FROM rows GROUP BY doc_id, a, b
""")
def raster_fill_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from .extract import docs_frame_to_spans

    src = _doc_ids(spark, sf_dir)

    def kernel(batches):
        import base64

        from .raster import decode_png_rgba

        for pdf in batches:
            rows = {"doc_id": [], "spans": []}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                a, b = 20 + i % 13, 10 + i % 7
                frag = (f"612 792 0 PG 72 700 m {72 + a} 700 l "
                        f"72 {700 - b} l h f")
                rows["doc_id"].append(str(i))
                rows["spans"].append([{"kind": "text", "text": frag,
                                       "media_ref": None, "offset": 0}])
            flat = docs_frame_to_spans(
                pd.DataFrame(rows), ExtractConfig(raster_paths=True))
            img = flat[flat["kind"] == "image"]
            out = {"doc_id": [], "w": [], "h": [], "filled_px": []}
            for _, rec in img.iterrows():
                png = base64.b64decode(rec["media_ref"].split(",", 1)[1])
                arr = decode_png_rgba(png)
                out["doc_id"].append(int(rec["doc_id"]))
                out["w"].append(int(rec["style_width"]))
                out["h"].append(int(rec["style_height"]))
                out["filled_px"].append(int((arr[:, :, 3] == 255).sum()))
            yield pd.DataFrame(out)

    import pyspark.sql.types as T
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("filled_px", T.LongType()),
    ])
    return src.mapInPandas(kernel, schema)


# 1f. font family parse (F1; FontTable.java:31,105-118)
_FAM_RE = "([^+^-]*)[+-]([^+]*)"

@_reg("font_family_parse", f"""
WITH f AS (SELECT DISTINCT 'ABCDEF+' || source || '-Oblique' AS name
           FROM documents)
SELECT name,
       CASE WHEN regexp_extract(name, '{_FAM_RE}', 1) <> '' OR
                 regexp_extract(name, '{_FAM_RE}', 2) <> ''
            THEN replace(regexp_extract(name, '{_FAM_RE}', 1) || ' ' ||
                         regexp_extract(name, '{_FAM_RE}', 2), '+', ' ')
            ELSE replace(name, '+', ' ') END AS family
FROM f
""")
def font_family_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.concat(F.lit("ABCDEF+"), F.col("source"), F.lit("-Oblique"))
        .alias("name")).distinct()
    g1 = F.regexp_extract("name", _FAM_RE, 1)
    g2 = F.regexp_extract("name", _FAM_RE, 2)
    fam = F.when((g1 != "") | (g2 != ""),
                 F.replace(F.concat(g1, F.lit(" "), g2), F.lit("+"), F.lit(" "))
                 ).otherwise(F.replace(F.col("name"), F.lit("+"), F.lit(" ")))
    return d.select("name", fam.alias("family"))


# 1g. font weight/style classification (P6; PDFBoxTree.java:719-735)
def _ws_case_sql() -> str:
    whens = " ".join(
        f"WHEN instr(lower(name), '{k}') > 0 THEN '{w}|{s}'"
        for k, w, s in zip(PD_FONT_TYPE, CSS_FONT_WEIGHT, CSS_FONT_STYLE))
    return f"CASE {whens} ELSE 'normal|normal' END"

@_reg("font_weight_style", f"""
WITH f AS (SELECT DISTINCT source || '-BoldItalic' AS name FROM documents
           UNION ALL SELECT DISTINCT source || '-italic' AS name FROM documents
           UNION ALL SELECT DISTINCT source AS name FROM documents)
SELECT name,
       string_split({_ws_case_sql()}, '|')[1] AS weight,
       string_split({_ws_case_sql()}, '|')[2] AS style
FROM f
""")
def font_weight_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    names = (d.select(F.concat("source", F.lit("-BoldItalic")).alias("name")).distinct()
             .unionAll(d.select(F.concat("source", F.lit("-italic")).alias("name")).distinct())
             .unionAll(d.select(F.col("source").alias("name")).distinct()))
    expr_w = None
    expr_s = None
    for k, w, s in zip(PD_FONT_TYPE, CSS_FONT_WEIGHT, CSS_FONT_STYLE):
        cond = F.instr(F.lower("name"), k) > 0
        expr_w = F.when(cond, w) if expr_w is None else expr_w.when(cond, w)
        expr_s = F.when(cond, s) if expr_s is None else expr_s.when(cond, s)
    return names.select(
        "name",
        expr_w.otherwise("normal").alias("weight"),
        expr_s.otherwise("normal").alias("style"))


# 1h. known-family projection (P5; PDFBoxTree.java:756-764)
def _known_case_sql() -> str:
    whens = " ".join(
        f"WHEN instr(lower(name), '{fam.lower().replace(' ', '')}') > 0 "
        f"THEN '{fam}'"
        for fam in CSS_FONT_FAMILY)
    return f"CASE {whens} ELSE '' END"

@_reg("known_family_map", f"""
WITH f AS (SELECT DISTINCT 'X' || source || 'ArialMT' AS name FROM documents
           UNION ALL SELECT DISTINCT source || '-TimesNewRomanPSMT' AS name FROM documents
           UNION ALL SELECT DISTINCT source AS name FROM documents)
SELECT name, {_known_case_sql()} AS family FROM f
""")
def known_family_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    names = (d.select(F.concat(F.lit("X"), F.col("source"), F.lit("ArialMT")).alias("name")).distinct()
             .unionAll(d.select(F.concat("source", F.lit("-TimesNewRomanPSMT")).alias("name")).distinct())
             .unionAll(d.select(F.col("source").alias("name")).distinct()))
    expr = None
    for fam in CSS_FONT_FAMILY:
        cond = F.instr(F.lower("name"), fam.lower().replace(" ", "")) > 0
        expr = F.when(cond, fam) if expr is None else expr.when(cond, fam)
    return names.select("name", expr.otherwise("").alias("family"))


# 1i. line classification (G10; HtmlDivLine.java:24-93)
@_reg("line_classify", """
WITH seg AS (
  SELECT CAST(event_id AS BIGINT) AS seg_id,
         CAST(event_id % 300 AS DOUBLE) AS x1,
         CAST((event_id * 7) % 300 AS DOUBLE) AS y1,
         CAST(event_id % 300 + (event_id % 3) * 50 AS DOUBLE) AS x2,
         CAST((event_id * 7) % 300 + (event_id % 5) * 25 AS DOUBLE) AS y2
  FROM events
),
c AS (
  SELECT *, ABS(x2 - x1) AS w, ABS(y2 - y1) AS h FROM seg
),
k AS (
  SELECT *, (h < 0.5) AS horiz, (w < 0.5) AS vert FROM c
)
SELECT seg_id,
       CASE WHEN vert THEN 'v' WHEN horiz THEN 'h' ELSE 'slant' END AS cls,
       ROUND(CASE WHEN vert THEN 0 WHEN horiz THEN w
                  ELSE sqrt((x1-x2)*(x1-x2) + (y1-y2)*(y1-y2)) END, 3) AS width_pt,
       ROUND(CASE WHEN vert THEN h ELSE 0 END, 3) AS height_pt,
       ROUND(CASE WHEN horiz OR vert THEN LEAST(x1, x2)
                  ELSE ABS((x2+x1)/2) - (CASE WHEN vert THEN 0 WHEN horiz THEN w
                       ELSE sqrt((x1-x2)*(x1-x2) + (y1-y2)*(y1-y2)) END)/2 END, 3) AS left_pt,
       ROUND(CASE WHEN horiz OR vert THEN 0
                  ELSE degrees(atan((y2-y1)/(x2-x1))) END, 3) AS angle_deg
FROM k
""")
def line_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    seg = ev.select(
        F.col("event_id").cast("long").alias("seg_id"),
        (F.col("event_id") % 300).cast("double").alias("x1"),
        ((F.col("event_id") * 7) % 300).cast("double").alias("y1"),
        (F.col("event_id") % 300 + (F.col("event_id") % 3) * 50).cast("double").alias("x2"),
        ((F.col("event_id") * 7) % 300 + (F.col("event_id") % 5) * 25).cast("double").alias("y2"))
    w = F.abs(F.col("x2") - F.col("x1"))
    h = F.abs(F.col("y2") - F.col("y1"))
    horiz = h < 0.5
    vert = w < 0.5
    slant_w = F.sqrt((F.col("x1") - F.col("x2")) ** 2 + (F.col("y1") - F.col("y2")) ** 2)
    width = F.when(vert, 0.0).when(horiz, w).otherwise(slant_w)
    return seg.select(
        "seg_id",
        F.when(vert, "v").when(horiz, "h").otherwise("slant").alias("cls"),
        F.round(width, 3).alias("width_pt"),
        F.round(F.when(vert, h).otherwise(0.0), 3).alias("height_pt"),
        F.round(F.when(horiz | vert, F.least("x1", "x2"))
                 .otherwise(F.abs((F.col("x2") + F.col("x1")) / 2) - width / 2),
                3).alias("left_pt"),
        F.round(F.when(horiz | vert, 0.0)
                 .otherwise(F.degrees(F.atan(
                     (F.col("y2") - F.col("y1")) / (F.col("x2") - F.col("x1"))))),
                3).alias("angle_deg"))


# 1j. page rotation transform (M2; PDFBoxTree.java:831-855). Spark applies the
# rotate-matrix trig; the oracle uses the closed forms per rotation.
@_reg("page_transform_quadrants", """
SELECT CAST(n_nationkey AS INT) AS pt_id,
       CAST(n_nationkey % 4 * 90 AS INT) AS rot,
       ROUND(CASE n_nationkey % 4
             WHEN 0 THEN n_nationkey * 20.0
             WHEN 1 THEN (n_nationkey % 7) * 100.0
             WHEN 2 THEN 612.0 - n_nationkey * 20.0
             ELSE 792.0 - (n_nationkey % 7) * 100.0 END, 2) AS dev_x,
       ROUND(CASE n_nationkey % 4
             WHEN 0 THEN 792.0 - (n_nationkey % 7) * 100.0
             WHEN 1 THEN n_nationkey * 20.0
             WHEN 2 THEN (n_nationkey % 7) * 100.0
             ELSE 612.0 - n_nationkey * 20.0 END, 2) AS dev_y
FROM nation
""")
def page_transform_quadrants(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").cast("int").alias("pt_id"),
        (F.col("n_nationkey") * 20.0).alias("x"),
        ((F.col("n_nationkey") % 7) * 100.0).alias("y"),
        (F.col("n_nationkey") % 4 * 90).cast("int").alias("rot"))
    w, h = F.lit(612.0), F.lit(792.0)
    # flip: (x, h - y); then rotate by rot; then rotation-dependent translate
    fx, fy = F.col("x"), h - F.col("y")
    rad = F.radians(F.col("rot").cast("double"))
    rx = fx * F.cos(rad) - fy * F.sin(rad)
    ry = fx * F.sin(rad) + fy * F.cos(rad)
    tx = (F.when(F.col("rot") == 90, h).when(F.col("rot") == 180, w)
           .otherwise(F.lit(0.0)))
    ty = (F.when(F.col("rot") == 180, h).when(F.col("rot") == 270, w)
           .otherwise(F.lit(0.0)))
    return n.select(
        "pt_id", "rot",
        F.round(rx + tx, 2).alias("dev_x"),
        F.round(ry + ty, 2).alias("dev_y"))


# 2b. G12 line-width transform under the cross-engine gate (previously
# pytest-only): per-doc synthesized streams draw one horizontal, slanted,
# or vertical line under a diagonal cm scale; the kernel's
# transformWidth (w * sqrt((a^2 + d^2) / 2), PDFBox
# PDFStreamEngine.transformWidth) and the full HtmlDivLine placement math
# (graphics.line_record) are compared to their closed forms.

@_reg("line_width_transform", """
WITH p AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         1.0 + (doc_id % 5) * 0.5 AS a,
         1.0 + (doc_id % 3) * 0.25 AS d,
         0.5 + (doc_id % 4) AS s,
         CAST(100 + (doc_id % 7) * 10 AS DOUBLE) AS x1,
         doc_id % 3 AS sel
  FROM documents
),
g AS (
  SELECT doc_id, sel,
         x1 * a AS X1, 792 - 100 * d AS Y1,
         CASE WHEN sel < 2 THEN 300 * a ELSE x1 * a END AS X2,
         792 - CASE WHEN sel = 0 THEN 100 ELSE 180 END * d AS Y2,
         GREATEST(s * sqrt((a * a + d * d) / 2), 0.5) AS sw
  FROM p
),
m AS (
  SELECT *, sqrt((X2 - X1) * (X2 - X1) + (Y2 - Y1) * (Y2 - Y1)) AS hyp
  FROM g
)
SELECT doc_id,
       ROUND(CASE WHEN sel = 1 THEN ABS((X2 + X1) / 2) - hyp / 2
                  ELSE LEAST(X1, X2) END, 2) AS left_pt,
       ROUND(CASE WHEN sel = 1 THEN ABS((Y2 + Y1) / 2) - sw / 2
                  ELSE LEAST(Y1, Y2) END, 2) AS top_pt,
       ROUND(CASE WHEN sel = 0 THEN ABS(X2 - X1)
                  WHEN sel = 1 THEN hyp ELSE 0.0 END, 2) AS width_pt,
       ROUND(CASE WHEN sel = 2 THEN ABS(Y2 - Y1) ELSE 0.0 END, 2)
           AS height_pt,
       ROUND(sw, 2) AS stroke_width,
       ROUND(CASE WHEN sel = 1
                  THEN degrees(atan((Y2 - Y1) / (X2 - X1)))
                  ELSE 0.0 END, 2) AS angle,
       '#0000e5' AS stroke_color
FROM m
""")
def line_width_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from .extract import docs_frame_to_spans

    src = _doc_ids(spark, sf_dir)

    def kernel(batches):
        for pdf in batches:
            rows = {"doc_id": [], "spans": []}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                a = 1.0 + (i % 5) * 0.5
                d = 1.0 + (i % 3) * 0.25
                s = 0.5 + (i % 4)
                x1 = 100 + (i % 7) * 10
                sel = i % 3
                x2 = 300 if sel < 2 else x1
                y2 = 100 if sel == 0 else 180
                frag = (f"612 792 0 PG q {a:g} 0 0 {d:g} 0 0 cm {s:g} w "
                        f"0 0 0.9 RG {x1:g} 100 m {x2:g} {y2:g} l S Q")
                rows["doc_id"].append(str(i))
                rows["spans"].append([{"kind": "text", "text": frag,
                                       "media_ref": None, "offset": 0}])
            yield docs_frame_to_spans(pd.DataFrame(rows), ExtractConfig())

    flat = src.mapInPandas(kernel, SPAN_FLAT_SCHEMA)
    return (flat.where(F.col("kind") == "line").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.round(F.col("style_left").cast("double"), 2).alias("left_pt"),
        F.round(F.col("style_top").cast("double"), 2).alias("top_pt"),
        F.round(F.col("style_width").cast("double"), 2).alias("width_pt"),
        F.round(F.col("style_height").cast("double"), 2).alias("height_pt"),
        F.round(F.col("style_stroke_width").cast("double"), 2)
            .alias("stroke_width"),
        F.round(F.col("style_angle").cast("double"), 2).alias("angle"),
        F.col("style_stroke_color").alias("stroke_color")))


# ---------------------------------------------------------------------------
# 3. relational shapes the pipeline relies on
# ---------------------------------------------------------------------------

# broadcast dim join (font-table lookup analog; SURVEY.md §2.h "Joins")
@_reg("broadcast_dim_join", """
SELECT p.p_brand AS brand,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""")
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    return (li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
            .groupBy(F.col("p_brand").alias("brand"))
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum(F.floor(F.col("l_extendedprice")
                               * (1 - F.col("l_discount")) * 100 + 0.5)
                       .cast("long")).cast("long").alias("revenue_cents")))


# checkpoint-resume anti-join shape (SURVEY.md §2.h)
@_reg("anti_join_pending", """
SELECT o.o_orderpriority AS priority, CAST(COUNT(*) AS BIGINT) AS n_pending
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
GROUP BY o.o_orderpriority
""")
def anti_join_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (o.join(li, o.o_orderkey == li.l_orderkey, "left_anti")
            .groupBy(F.col("o_orderpriority").alias("priority"))
            .agg(F.count(F.lit(1)).alias("n_pending")))


# row_number de-dup naming (F1 usedName analog; FontTable.java:77-88)
@_reg("window_rownum_dedup", """
WITH r AS (
  SELECT p_brand, CAST(p_partkey AS BIGINT) AS p_partkey,
         ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_partkey) AS rn
  FROM part
)
SELECT p_brand AS brand, p_partkey,
       CASE WHEN rn = 1 THEN p_brand ELSE p_brand || CAST(rn - 1 AS VARCHAR) END AS used_name
FROM r WHERE rn <= 3
""")
def window_rownum_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    win = Window.partitionBy("p_brand").orderBy("p_partkey")
    r = pt.select("p_brand", F.col("p_partkey").cast("long").alias("p_partkey"),
                  F.row_number().over(win).alias("rn"))
    used = F.when(F.col("rn") == 1, F.col("p_brand")).otherwise(
        F.concat(F.col("p_brand"), (F.col("rn") - 1).cast("string")))
    return r.where(F.col("rn") <= 3).select(
        F.col("p_brand").alias("brand"), "p_partkey", used.alias("used_name"))


# sessionization over the events stream table: the same gaps-and-islands
# shape as the T1 chunk merge, keyed by time gap instead of x-distance
# (SURVEY.md §2.h notes T1 is semantically a session window). In Structured
# Streaming this is session_window(); here it is the batch-backfill form.
@_reg("sessionize_events", """
WITH g AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, ts, value, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR FLOOR(epoch(ts)) - FLOOR(epoch(LAG(ts) OVER w)) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM g
)
SELECT user_id, CAST(session_id AS INT) AS session_id,
       CAST(MIN(FLOOR(epoch(ts))) AS BIGINT) AS start_epoch,
       CAST(MAX(FLOOR(epoch(ts))) AS BIGINT) AS end_epoch,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS total_value_milli
FROM s GROUP BY user_id, session_id
""")
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("long").alias("user_id"), "ts", "value",
        "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull()
               | ((F.unix_timestamp("ts")
                   - F.unix_timestamp(F.lag("ts").over(w))) > 1800),
               1).otherwise(0))
    cur = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    s = g.withColumn("session_id", F.sum("new_session").over(cur).cast("int"))
    return s.groupBy("user_id", "session_id").agg(
        F.min(F.unix_timestamp("ts")).alias("start_epoch"),
        F.max(F.unix_timestamp("ts")).alias("end_epoch"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 1000 + 0.5).cast("long"))
        .cast("long").alias("total_value_milli"))


# top-k per group (rank window; §2.h sort/limit/top-k beyond global knn)
@_reg("topk_per_group", """
WITH r AS (
  SELECT o_custkey, CAST(o_orderkey AS BIGINT) AS o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
SELECT CAST(o_custkey AS BIGINT) AS custkey, o_orderkey,
       ROUND(o_totalprice, 2) AS price, CAST(rn AS INT) AS rn
FROM r WHERE rn <= 2
""")
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    win = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (o.withColumn("rn", F.row_number().over(win))
            .where(F.col("rn") <= 2)
            .select(F.col("o_custkey").cast("long").alias("custkey"),
                    F.col("o_orderkey").cast("long").alias("o_orderkey"),
                    F.round("o_totalprice", 2).alias("price"),
                    F.col("rn").cast("int").alias("rn")))


# set operations (§2.h): intersect/except over key sets
@_reg("set_ops_customers", """
SELECT CAST(c AS BIGINT) AS custkey, tag FROM (
  SELECT o_custkey AS c, 'both' AS tag FROM orders
  INTERSECT
  SELECT c_custkey AS c, 'both' AS tag FROM customer
  UNION ALL
  SELECT * FROM (
    SELECT c_custkey AS c, 'no_orders' AS tag FROM customer
    EXCEPT
    SELECT o_custkey AS c, 'no_orders' AS tag FROM orders)
)
""")
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("c"))
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("c"))
    both = o.intersect(c).withColumn("tag", F.lit("both"))
    none = c.exceptAll(o).distinct().withColumn("tag", F.lit("no_orders"))
    return both.unionByName(none).select(
        F.col("c").cast("long").alias("custkey"), "tag")


# rect recognition as a relational op (G9; PDFBoxTree.java:325-348):
# synthesize 4-segment paths from events, test 2-distinct-x / 2-distinct-y
@_reg("rect_detect", """
WITH seg AS (
  SELECT CAST(event_id // 4 AS BIGINT) AS path_id,
         CAST(event_id % 4 AS INT) AS seg_no,
         -- even paths form axis-aligned rects, odd paths get a slanted edge
         CAST(CASE event_id % 4 WHEN 0 THEN 10 WHEN 1 THEN 60
              WHEN 2 THEN 60 ELSE 10 END
              + CASE WHEN event_id % 8 >= 4 AND event_id % 4 = 1
                     THEN 5 ELSE 0 END AS DOUBLE) AS x1,
         CAST(CASE event_id % 4 WHEN 0 THEN 20 WHEN 1 THEN 20
              WHEN 2 THEN 90 ELSE 90 END AS DOUBLE) AS y1
  FROM events
),
p AS (
  SELECT path_id,
         COUNT(DISTINCT x1) AS nx, COUNT(DISTINCT y1) AS ny,
         MIN(x1) AS minx, MIN(y1) AS miny, MAX(x1) AS maxx, MAX(y1) AS maxy,
         COUNT(*) AS nseg
  FROM seg GROUP BY path_id
)
SELECT path_id,
       (nseg = 4 AND nx = 2 AND ny = 2) AS is_rect,
       CASE WHEN nseg = 4 AND nx = 2 AND ny = 2 THEN minx END AS rx,
       CASE WHEN nseg = 4 AND nx = 2 AND ny = 2 THEN miny END AS ry,
       CASE WHEN nseg = 4 AND nx = 2 AND ny = 2 THEN maxx - minx END AS rw,
       CASE WHEN nseg = 4 AND nx = 2 AND ny = 2 THEN maxy - miny END AS rh
FROM p
""")
def rect_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    x_base = (F.when(F.col("event_id") % 4 == 0, 10)
               .when(F.col("event_id") % 4 == 1, 60)
               .when(F.col("event_id") % 4 == 2, 60).otherwise(10))
    x_skew = F.when((F.col("event_id") % 8 >= 4)
                    & (F.col("event_id") % 4 == 1), 5).otherwise(0)
    y_base = (F.when(F.col("event_id") % 4 == 0, 20)
               .when(F.col("event_id") % 4 == 1, 20)
               .when(F.col("event_id") % 4 == 2, 90).otherwise(90))
    seg = ev.select(
        (F.col("event_id") / 4).cast("long").alias("path_id"),
        (F.col("event_id") % 4).cast("int").alias("seg_no"),
        (x_base + x_skew).cast("double").alias("x1"),
        y_base.cast("double").alias("y1"))
    p = seg.groupBy("path_id").agg(
        F.countDistinct("x1").alias("nx"), F.countDistinct("y1").alias("ny"),
        F.min("x1").alias("minx"), F.min("y1").alias("miny"),
        F.max("x1").alias("maxx"), F.max("y1").alias("maxy"),
        F.count(F.lit(1)).alias("nseg"))
    is_rect = (F.col("nseg") == 4) & (F.col("nx") == 2) & (F.col("ny") == 2)
    return p.select(
        "path_id", is_rect.alias("is_rect"),
        F.when(is_rect, F.col("minx")).alias("rx"),
        F.when(is_rect, F.col("miny")).alias("ry"),
        F.when(is_rect, F.col("maxx") - F.col("minx")).alias("rw"),
        F.when(is_rect, F.col("maxy") - F.col("miny")).alias("rh"))


# tumbling-window aggregation, batch form (the streaming twin in
# streaming.windowed_event_counts runs the same shape under a watermark;
# this registers the cross-engine value gate for it)
@_reg("tumbling_window_counts", """
SELECT CAST(FLOOR(epoch(ts) / 600) * 600 AS BIGINT) AS win_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_milli
FROM events GROUP BY 1, 2
""")
def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.groupBy(
        F.window(F.col("ts").cast("timestamp"), "10 minutes").alias("win"),
        "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.floor(F.col("value") * 1000 + 0.5).cast("long"))
             .cast("long").alias("total_milli"))
        .select(F.unix_timestamp("win.start").alias("win_start"),
                "event_type", "n", "total_milli"))


# stream-stream interval join, batch form (the streaming twin in
# streaming.stream_stream_click_purchase_join runs the same predicate
# under two watermarks; tests/test_streaming.py pins streamed == batch,
# and this registers the cross-engine value gate on the shared semantics:
# click x purchase by the same user within the preceding hour)
@_reg("interval_join_events", """
SELECT c.event_id AS click_id, p.event_id AS purchase_id,
       c.user_id AS c_user,
       -- FLOOR before the cast: epoch() is fractional and CAST rounds,
       -- while Spark's unix_timestamp truncates
       CAST(FLOOR(epoch(c.ts)) AS BIGINT) AS c_epoch,
       CAST(FLOOR(epoch(p.ts)) AS BIGINT) AS p_epoch,
       CAST(FLOOR(p.value * 1000 + 0.5) AS BIGINT) AS p_milli
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts - INTERVAL 1 HOUR AND p.ts <= c.ts
""")
def interval_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    clicks = (ev.where(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("c_ts")))
    purchases = (ev.where(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("p_ts"),
                         F.floor(F.col("value") * 1000 + 0.5).cast("long")
                         .alias("p_milli")))
    return (clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("p_ts") <= F.col("c_ts")))
        .select("click_id", "purchase_id", "c_user",
                F.unix_timestamp("c_ts").alias("c_epoch"),
                F.unix_timestamp("p_ts").alias("p_epoch"), "p_milli"))


# The literal spark.sql(...) API surface: the classic TPC-H Q1 pricing
# summary expressed as ONE SQL text over a temp view — identical ANSI SQL
# runs on both engines (fixed-point sums keep the floats exact; count-only
# averages avoid cross-engine float division order).
_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_qty_c,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
           AS BIGINT) AS sum_base_c,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                * CAST(FLOOR((1 - l_discount) * 100 + 0.5) AS BIGINT))
           AS BIGINT) AS sum_disc_price_c4,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                * CAST(FLOOR((1 - l_discount) * 100 + 0.5) AS BIGINT)
                * CAST(FLOOR((1 + l_tax) * 100 + 0.5) AS BIGINT))
           AS BIGINT) AS sum_charge_c6,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '2024-09-02'
GROUP BY l_returnflag, l_linestatus
"""

@_reg("tpch_q1_pricing", _Q1_SQL)
def tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .createOrReplaceTempView("lineitem")
    return spark.sql(_Q1_SQL)


# TPC-H Q3 analog (shipping-priority top-k): selective filters pushed to
# all three scans, lineitem⋈orders shuffle join, the filtered BUILDING
# customer keys broadcast, then a hash agg and an exact fixed-point
# top-10 (Q1's FLOOR(x*100+0.5) centi-unit idiom — integer revenue makes
# the cross-engine ranking ulp-proof; a double SUM's addend order could
# flip ties). At 100 TB: the two date filters prune most of both fact
# scans before the only big shuffle, and the top-10 is a
# TakeOrderedAndProject (per-partition heaps, no global sort).
_REV_C4 = ("CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"
           " * CAST(FLOOR((1 - l_discount) * 100 + 0.5) AS BIGINT)")

@_reg("tpch_q3_shipping", f"""
SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(SUM({_REV_C4}) AS BIGINT) AS revenue_c4
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue_c4 DESC, l_orderkey
LIMIT 10
""")
def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (spark.read.parquet(f"{sf_dir}/customer.parquet")
            .where(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .where(F.col("o_orderdate")
                     < F.lit("1998-06-01").cast("timestamp"))
              .select("o_orderkey", "o_custkey", "o_orderdate"))
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .where(F.col("l_shipdate")
                 > F.lit("1998-06-01").cast("timestamp"))
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    rev = (F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
           * F.floor((1 - F.col("l_discount")) * 100 + 0.5).cast("long"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("l_orderkey", "o_orderdate")
            .agg(F.sum(rev).cast("long").alias("revenue_c4"))
            .select(F.col("l_orderkey").cast("long").alias("l_orderkey"),
                    F.date_format("o_orderdate", "yyyy-MM-dd")
                    .alias("o_orderdate"),
                    "revenue_c4")
            .orderBy(F.desc("revenue_c4"), "l_orderkey")
            .limit(10))


# TPC-H Q5 analog (local-supplier volume): the canonical
# big-facts × tiny-dims shape — region (5 rows) and nation (25 rows)
# BROADCAST so the region restriction prunes both key-joins without a
# shuffle; customer⋈orders⋈lineitem⋈supplier shuffle on their keys; the
# c_nationkey = s_nationkey "local" predicate rides the join. Exact
# centi-unit revenue as in Q1/Q3.
@_reg("tpch_q5_local_supplier", f"""
SELECT n_name, CAST(SUM({_REV_C4}) AS BIGINT) AS revenue_c4
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
""")
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey")
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .where((F.col("o_orderdate")
                      >= F.lit("1996-01-01").cast("timestamp"))
                     & (F.col("o_orderdate")
                        < F.lit("1997-01-01").cast("timestamp")))
              .select("o_orderkey", "o_custkey"))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey")
    reg = (spark.read.parquet(f"{sf_dir}/region.parquet")
           .where(F.col("r_name") == "ASIA").select("r_regionkey"))
    rev = (F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
           * F.floor((1 - F.col("l_discount")) * 100 + 0.5).cast("long"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(supp, (li.l_suppkey == supp.s_suppkey)
                  & (cust.c_nationkey == supp.s_nationkey))
            .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
            .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
            .groupBy("n_name")
            .agg(F.sum(rev).cast("long").alias("revenue_c4")))


# TPC-H Q10 analog (returned-item reporting): a quarter's returned
# lineitems joined to their customers, top 20 by lost revenue. Plan shape:
# the o_orderdate quarter filter and the l_returnflag filter both push to
# the fact scans, lineitem⋈orders shuffles on the orderkey, customer joins
# on custkey, the 25-row nation broadcast-decorates, and the top-20 is a
# TakeOrderedAndProject. Exact centi-unit revenue (Q1 idiom).
@_reg("tpch_q10_returns", f"""
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, n_name,
       CAST(SUM({_REV_C4}) AS BIGINT) AS revenue_c4
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_c4 DESC, c_custkey
LIMIT 20
""")
def tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_nationkey")
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .where((F.col("o_orderdate")
                      >= F.lit("1997-01-01").cast("timestamp"))
                     & (F.col("o_orderdate")
                        < F.lit("1997-04-01").cast("timestamp")))
              .select("o_orderkey", "o_custkey"))
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .where(F.col("l_returnflag") == "R")
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name")
    rev = (F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
           * F.floor((1 - F.col("l_discount")) * 100 + 0.5).cast("long"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(F.sum(rev).cast("long").alias("revenue_c4"))
            .select(F.col("c_custkey").cast("long").alias("c_custkey"),
                    "c_name", "n_name", "revenue_c4")
            .orderBy(F.desc("revenue_c4"), "c_custkey")
            .limit(20))


# TPC-H Q18 analog (large-volume orders): the self-semi-join shape — an
# aggregate over the biggest fact produces the qualifying keys, which
# then SEMI-join the same fact plus its dimensions. Quantities are stored
# integral, so summing them as BIGINT keeps the cross-engine ranking
# exact. At 100 TB the HAVING aggregate is map-side combinable and its
# survivor set is tiny by construction (the HAVING threshold), so the
# key list rides a broadcast into all three probe joins.
@_reg("tpch_q18_large_orders", """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
                     HAVING SUM(CAST(l_quantity AS BIGINT)) > 140)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_custkey, o_orderkey, o_orderdate
ORDER BY total_qty DESC, o_orderkey
LIMIT 50
""")
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", F.col("l_quantity").cast("long").alias("qty"))
    big_keys = (li.groupBy("l_orderkey")
                .agg(F.sum("qty").alias("tq"))
                .where(F.col("tq") > 140).select("l_orderkey"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderdate")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey")
    return (li.join(F.broadcast(big_keys), "l_orderkey")
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("c_custkey", "o_orderkey", "o_orderdate")
            .agg(F.sum("qty").alias("total_qty"))
            .select(F.col("c_custkey").cast("long").alias("c_custkey"),
                    F.col("o_orderkey").cast("long").alias("o_orderkey"),
                    F.date_format("o_orderdate", "yyyy-MM-dd")
                    .alias("o_orderdate"),
                    "total_qty")
            .orderBy(F.desc("total_qty"), "o_orderkey")
            .limit(50))


# KMV (k-minimum-values) distinct sketch — the "novel sketch" operator
# class, built to be CROSS-ENGINE EXACT: both engines hash with md5, take
# the k=64 lexicographically smallest hex digests per group (fixed-width
# hex ⇒ lexicographic = numeric order), and compute the classic estimator
# (k-1)/R(k) in pure 64-bit integer math — R(k) is the 52-bit prefix of
# the kth hash (52 bits so (k-1)·2^52 = 283726776524341248 fits a BIGINT
# exactly), divided with integer DIV on both sides. No float ever enters,
# so the ESTIMATE itself value-hash-matches DuckDB. Built-in HLL/approx
# sketches can't be gated this way (engine-specific internals). At scale:
# the gate also reports the exact count for comparison, which forces the
# full distinct; a production sketch-only variant is a combinable
# aggregate (per-partition 64-minima, merge = re-min) with no window.
@_reg("kmv_distinct_users", """
WITH h AS (
  SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS hh FROM events
),
r AS (
  SELECT event_type, hh,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hh) AS rn
  FROM h
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(CASE WHEN COUNT(*) <= 64 THEN COUNT(*)
            ELSE 283726776524341248 //
                 GREATEST(CAST('0x' || substr(
                     MAX(CASE WHEN rn = 64 THEN hh END), 1, 13) AS BIGINT), 1)
            END AS BIGINT) AS kmv_estimate
FROM r GROUP BY event_type
""")
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = (spark.read.parquet(f"{sf_dir}/events.parquet")
         .select("event_type",
                 F.md5(F.col("user_id").cast("string")).alias("hh"))
         .distinct())
    w = Window.partitionBy("event_type").orderBy("hh")
    r = h.withColumn("rn", F.row_number().over(w))
    agg = (r.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("n_exact"),
                F.max(F.when(F.col("rn") == 64, F.col("hh"))).alias("kth")))
    kth52 = F.greatest(
        F.conv(F.substring("kth", 1, 13), 16, 10).cast("long"), F.lit(1))
    est = F.when(F.col("n_exact") <= 64, F.col("n_exact")).otherwise(
        F.expr("283726776524341248 DIV kth52"))
    return (agg.withColumn("kth52", kth52)
            .select("event_type",
                    F.col("n_exact").cast("long").alias("n_exact"),
                    est.cast("long").alias("kmv_estimate")))


# Bloom-filter membership probe — the approximate-membership sketch
# class, CROSS-ENGINE EXACT like kmv_distinct_users: both engines derive
# k=4 bit positions per key from md5 hex prefixes (32-bit integer mod
# m=2048; identical salt strings), so the filter's false positives are
# deterministic and the probe counts value-hash-match DuckDB. m=2048 is
# sized so the FP arm is LIVE at sf0.01 (~15% FP over non-member probes)
# — all three report columns exercise their semantics. 100 TB shape: the
# build side reduces to a DISTINCT of at most m=2048 positions (one small
# shuffle of the dim table), the materialized 2 Kbit filter rides into
# the probe as a broadcast literal, and every probe row is then a pure
# narrow JVM expression — zero join, zero shuffle, zero Python on the
# 10^12-row probe side; only the final tiny per-priority aggregate
# exchanges. The truth columns (gate-only) use a broadcast semi-join.
_BLOOM_M = 2048
_BLOOM_SQL = f"""
WITH build AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
),
bits AS (
  SELECT DISTINCT CAST('0x' || substr(md5('b' || CAST(i AS VARCHAR) || '|' ||
       CAST(c_custkey AS VARCHAR)), 1, 8) AS BIGINT) % {_BLOOM_M} AS pos
  FROM build, (SELECT unnest([1,2,3,4]) AS i)
),
probe AS (
  SELECT o_orderkey, o_custkey, o_orderpriority,
    CAST('0x' || substr(md5('b' || CAST(i AS VARCHAR) || '|' ||
         CAST(o_custkey AS VARCHAR)), 1, 8) AS BIGINT) % {_BLOOM_M} AS pos
  FROM orders, (SELECT unnest([1,2,3,4]) AS i)
),
hit AS (
  SELECT o_orderkey, o_custkey, o_orderpriority,
         COUNT(*) FILTER (WHERE pos IN (SELECT pos FROM bits)) = 4 AS maybe
  FROM probe GROUP BY 1, 2, 3
)
SELECT o_orderpriority AS priority,
  CAST(COUNT(*) FILTER (WHERE maybe) AS BIGINT) AS bloom_positive,
  CAST(COUNT(*) FILTER (WHERE o_custkey IN (SELECT c_custkey FROM build))
       AS BIGINT) AS true_positive,
  CAST(COUNT(*) FILTER (WHERE maybe AND o_custkey NOT IN
       (SELECT c_custkey FROM build)) AS BIGINT) AS false_positive
FROM hit GROUP BY 1
"""


def _bloom_pos(col, i: int):
    """md5('b<i>|<key>') -> 32-bit hex prefix -> position in [0, m)."""
    s = F.md5(F.concat(F.lit(f"b{i}|"), col.cast("string")))
    return F.conv(F.substring(s, 1, 8), 16, 10).cast("long") % _BLOOM_M


@_reg("bloom_filter_probe", _BLOOM_SQL)
def bloom_filter_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    build = (spark.read.parquet(f"{sf_dir}/customer.parquet")
             .where(F.col("c_mktsegment") == "BUILDING")
             .select("c_custkey"))
    # Build the filter: distinct positions (<= m rows after the combine),
    # then materialize the 2 Kbit bitset on the driver — this collect IS
    # the broadcast-variable step of a real Bloom build, O(m) regardless
    # of build-side cardinality, not a data collect.
    pos_rows = (build.select(F.explode(F.array(
                    *[_bloom_pos(F.col("c_custkey"), i) for i in (1, 2, 3, 4)]
                )).alias("pos"))
                .distinct().collect())
    bitset = ["0"] * _BLOOM_M
    for r in pos_rows:
        bitset[int(r["pos"])] = "1"
    bitstr = F.lit("".join(bitset))

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderpriority")
    maybe = None
    for i in (1, 2, 3, 4):
        hit = F.substring(
            bitstr, (_bloom_pos(F.col("o_custkey"), i) + 1).cast("int"),
            1) == "1"
        maybe = hit if maybe is None else (maybe & hit)
    truth = build.withColumn("in_build", F.lit(True))
    probed = (orders.withColumn("maybe", maybe)
              .join(F.broadcast(truth),
                    orders.o_custkey == truth.c_custkey, "left")
              .withColumn("in_build", F.coalesce("in_build", F.lit(False))))
    return (probed.groupBy(F.col("o_orderpriority").alias("priority"))
            .agg(F.sum(F.when(F.col("maybe"), 1).otherwise(0))
                 .cast("long").alias("bloom_positive"),
                 F.sum(F.when(F.col("in_build"), 1).otherwise(0))
                 .cast("long").alias("true_positive"),
                 F.sum(F.when(F.col("maybe") & ~F.col("in_build"), 1)
                       .otherwise(0)).cast("long").alias("false_positive")))


# M9 CSS serialization (BoxStyle.toString, BoxStyle.java:88-114) through
# the REAL renderer: extraction output -> render_html.text_css per span,
# value-hash-checked against the closed-form CSS strings DuckDB builds
# from the mono-grid oracle geometry with REAL->VARCHAR shortest-repr
# casts (the conditional omissions — normal weight/style, zero spacings,
# default color, transparent stroke — all exercise their negative arms).
@_reg("render_css_text", """
WITH w0 AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         unnest(string_split(text,' ')) AS word,
         generate_subscripts(string_split(text,' '), 1) AS sidx
  FROM documents WHERE length(text) > 0
),
w AS (
  SELECT doc_id, word,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sidx) - 1 AS widx
  FROM w0 WHERE word <> ''
),
n AS (SELECT doc_id, COUNT(*) AS nw FROM w GROUP BY doc_id),
ws AS (
  SELECT w.doc_id, word, widx,
         CAST(widx // 40 + 1 AS INT) AS page_no,
         CAST((widx % 40) // 8 AS INT) AS line_no,
         CAST(widx % 8 AS INT) AS pos,
         CAST(widx % 40 AS INT) AS i,
         CAST(LEAST(n.nw - 40 * (widx // 40), 40) AS INT) AS m
  FROM w JOIN n ON w.doc_id = n.doc_id
)
SELECT doc_id,
       CAST((page_no - 1) * 43
            + CASE WHEN i < m - 1 THEN 1 + i ELSE m + 2 END AS INT) AS ord,
       'top:' || CAST(CAST(64 + 14.0 * line_no AS REAL) AS VARCHAR)
       || 'pt;left:' || CAST(CAST(72
           + 5.0 * COALESCE(SUM(LENGTH(word)) OVER
                 (PARTITION BY doc_id, page_no, line_no ORDER BY widx
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + 5.0 * pos AS REAL) AS VARCHAR)
       || 'pt;line-height:10.0pt;font-family:Mono;font-size:10.0pt;width:'
       || CAST(CAST(5.0 * LENGTH(word) AS REAL) AS VARCHAR) || 'pt;' AS css
FROM ws
""")
def render_css_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from pyspark.sql import types as T

    from .render_html import text_css

    flat = _extract_flat(spark, sf_dir, mode="oracle")
    text = flat.where(F.col("kind") == "text")

    def kernel(batches):
        for pdf in batches:
            recs = pdf.to_dict("records")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "ord": pdf["order"].astype("int32"),
                "css": [text_css(r) for r in recs],
            })

    return text.mapInPandas(kernel, T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("ord", T.IntegerType()),
        T.StructField("css", T.StringType()),
    ]))


# F3 @font-face emission (PDFDomTree.createFontFace, PDFDomTree.java:
# 473-492) cross-engine: the REAL render_html.font_face_css runs over the
# kernel's font spans (forms corpus — per-page F0/F1 registrations merge
# back to one used name, exercising the font-table de-dup upstream of the
# rule) and the oracle rebuilds the exact rule string: quote style, src
# url quoting, trailing semicolons — the format a browser actually parses.
@_reg("render_font_faces", """
WITH w0 AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         unnest(string_split(text,' ')) AS word,
         generate_subscripts(string_split(text,' '), 1) AS sidx
  FROM documents WHERE length(text) > 0
),
w AS (
  SELECT doc_id, word,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sidx) - 1 AS widx
  FROM w0 WHERE word <> ''
),
pg AS (
  SELECT doc_id, CAST(widx // 4 + 1 AS INT) AS page_no, COUNT(*) AS m
  FROM w GROUP BY doc_id, widx // 4
)
SELECT doc_id, CAST(SUM(m + 2) AS INT) AS ord,
       '@font-face {font-family:"Mono";src:url(''font:Mono'');}' AS css
FROM pg GROUP BY doc_id
""")
def render_font_faces(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from pyspark.sql import types as T

    from .render_html import font_face_css

    flat = _extract_flat(spark, sf_dir, mode="forms")
    fonts = flat.where(F.col("kind") == "font")

    def kernel(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "ord": pdf["order"].astype("int32"),
                "css": [font_face_css(t, m) for t, m in
                        zip(pdf["text"], pdf["media_ref"])],
            })

    return fonts.mapInPandas(kernel, T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("ord", T.IntegerType()),
        T.StructField("css", T.StringType()),
    ]))


# M8 length formatting (BoxStyle.formatLength, BoxStyle.java:132-136)
# cross-engine: the renderer's Java-Float.toString semantics (shortest
# round-trip float32 repr) run through the REAL render_html.fmt_len in an
# Arrow kernel; DuckDB's REAL->VARCHAR cast implements the same
# shortest-repr algorithm, so the oracle checks the exact CSS strings.
# Inputs stay in positional-notation range (page coordinates).
@_reg("render_css_lengths", """
SELECT CAST(n_nationkey AS INT) AS css_id,
       CAST(CAST((n_nationkey * 17 + 3) / 7.0 AS REAL) AS VARCHAR) || 'pt'
           AS css_len
FROM nation
""")
def render_css_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from pyspark.sql import types as T

    from .render_html import fmt_len

    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").cast("int").alias("css_id"),
        ((F.col("n_nationkey") * 17 + 3) / 7.0).alias("v"))

    def kernel(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "css_id": pdf["css_id"],
                "css_len": [fmt_len(float(v)) for v in pdf["v"]],
            })

    return n.mapInPandas(kernel, T.StructType([
        T.StructField("css_id", T.IntegerType()),
        T.StructField("css_len", T.StringType()),
    ]))


# exact distribution moments: quantize-then-sum keeps n / Σx / Σx² as
# exact integers (associative under any partial-agg order), from which
# mean/variance/stddev derive deterministically downstream — the float
# `stddev` aggregate itself is summation-order-dependent cross-engine.
@_reg("value_moments", """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_milli,
       CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)
                * CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_sq_milli
FROM events GROUP BY event_type
""")
def value_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.floor(F.col("value") * 1000 + 0.5).cast("long").alias("vm"))
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vm").cast("long").alias("sum_milli"),
        F.sum(F.col("vm") * F.col("vm")).cast("long").alias("sum_sq_milli"))


# semi-structured (JSON) extraction: the events.props column is a JSON
# blob; extract a typed field and aggregate — Spark get_json_object vs
# DuckDB json_extract.
@_reg("json_extract_props", """
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT)
           AS k_sum,
       CAST(MAX(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS k_max,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type
""")
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.get_json_object("props", "$.k").cast("int")
    return (ev.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.sum("k").cast("long").alias("k_sum"),
                 F.max("k").cast("int").alias("k_max"),
                 F.count(F.lit(1)).alias("n")))


# frame-bounded windows: 5-row moving sum (ROWS BETWEEN 4 PRECEDING AND
# CURRENT ROW) + ntile quartiles per event_type — quantized inputs keep
# the frame sum exact under any within-frame summation order.
@_reg("window_frames", """
SELECT CAST(event_id AS BIGINT) AS event_id, event_type,
       CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT))
            OVER (PARTITION BY event_type ORDER BY ts, event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS mov_sum_milli,
       CAST(NTILE(4) OVER (PARTITION BY event_type ORDER BY ts, event_id)
            AS INT) AS quartile
FROM events
""")
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("event_id").cast("long").alias("event_id"), "event_type",
        "ts", F.floor(F.col("value") * 1000 + 0.5).cast("long").alias("vm"))
    order = Window.partitionBy("event_type").orderBy("ts", "event_id")
    frame = order.rowsBetween(-4, Window.currentRow)
    return ev.select(
        "event_id", "event_type",
        F.sum("vm").over(frame).cast("long").alias("mov_sum_milli"),
        F.ntile(4).over(order).cast("int").alias("quartile"))


# sliding (hopping) windows: width 10 min, slide 5 min — every event lands
# in exactly TWO overlapping windows. Spark's native F.window(w, s) emits
# the duplication internally; the oracle reproduces it with an explicit
# 2-element window-start unnest per event.
@_reg("sliding_window_counts", """
WITH e AS (
  SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS ep, event_type,
         CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm
  FROM events
),
x AS (
  SELECT ep, event_type, vm,
         unnest([(ep // 300) * 300 - 300, (ep // 300) * 300]) AS win_start
  FROM e
)
SELECT CAST(win_start AS BIGINT) AS win_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(vm) AS BIGINT) AS total_milli
FROM x WHERE ep >= win_start AND ep < win_start + 600
GROUP BY 1, 2
""")
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.groupBy(
        F.window(F.col("ts").cast("timestamp"),
                 "10 minutes", "5 minutes").alias("win"),
        "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.floor(F.col("value") * 1000 + 0.5).cast("long"))
             .cast("long").alias("total_milli"))
        .select(F.unix_timestamp("win.start").alias("win_start"),
                "event_type", "n", "total_milli"))


# as-of join (task brief: "an operator Spark lacks — e.g., as-of join" —
# expressed as a composition of existing DataFrame ops): for every 'click'
# event, the latest 'purchase' value by the same user at ts <= click ts.
# Spark has no ASOF JOIN; the union + last(ignorenulls) window is the
# standard composition — ONE shuffle on user_id, no range join explosion.
# DuckDB verifies with its native ASOF LEFT JOIN. Purchases are pre-
# aggregated per (user, ts) so ties are deterministic on both engines.
@_reg("asof_join_events", """
WITH clicks AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, ts,
         CAST(event_id AS BIGINT) AS event_id
  FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, ts,
         CAST(FLOOR(MAX(value) * 1000 + 0.5) AS BIGINT) AS pvalue_milli
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.user_id, c.event_id, p.pvalue_milli AS last_purchase_milli
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
""")
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").cast("long").alias("user_id"), "ts",
        F.col("event_id").cast("long").alias("event_id"))
    purchases = (ev.where(F.col("event_type") == "purchase")
                 .groupBy(F.col("user_id").cast("long").alias("user_id"), "ts")
                 .agg(F.floor(F.max("value") * 1000 + 0.5).cast("long")
                      .alias("pvalue_milli")))
    # tag and union; at equal ts the purchase sorts first (is_click=0) so
    # 'ts >= p.ts' inclusivity matches the ASOF semantics
    u = (clicks.select("user_id", "ts", F.lit(1).alias("is_click"),
                       "event_id", F.lit(None).cast("long").alias("pv"))
         .unionByName(purchases.select(
             "user_id", "ts", F.lit(0).alias("is_click"),
             F.lit(None).cast("long").alias("event_id"),
             F.col("pvalue_milli").alias("pv"))))
    w = (Window.partitionBy("user_id").orderBy("ts", "is_click")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = u.withColumn("last_pv", F.last("pv", ignorenulls=True).over(w))
    return (carried.where(F.col("is_click") == 1)
            .select("user_id", "event_id",
                    F.col("last_pv").alias("last_purchase_milli")))


# rollup aggregation (multi-level hypertable-style summary in one pass:
# grouping-set partial aggregation, no per-level re-scan)
@_reg("events_rollup", """
SELECT event_type,
       CAST(CASE WHEN GROUPING(user_id % 10) = 1 THEN NULL
            ELSE user_id % 10 END AS BIGINT) AS user_bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_milli,
       CAST(GROUPING(event_type) * 2 + GROUPING(user_id % 10) AS INT)
           AS grouping_lvl
FROM events
GROUP BY ROLLUP(event_type, user_id % 10)
""")
def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", (F.col("user_id") % 10).alias("user_bucket"),
        F.floor(F.col("value") * 1000 + 0.5).cast("long").alias("milli"))
    return (ev.rollup("event_type", "user_bucket")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("milli").cast("long").alias("total_milli"),
                 (F.grouping("event_type") * 2
                  + F.grouping("user_bucket")).cast("int")
                 .alias("grouping_lvl"))
            .select("event_type",
                    F.col("user_bucket").cast("long").alias("user_bucket"),
                    "n", "total_milli", "grouping_lvl"))


# Salted skew join: the large-x-large join with hot keys that neither
# broadcast (both sides big) nor plain SMJ (one task per hot key drowns)
# survives. Fact rows carry a uniform salt pmod(xxhash64(id), S); the other
# side replicates S-fold with explode(sequence(0, S-1)); joining on
# (key, salt) splits every hot key across S tasks. Results are identical to
# the unsalted join — the oracle IS the plain join — and the fixed-point
# product terms keep the checksum order-independent. Forced .hint("merge")
# so the gate exercises the shuffle path, not a broadcast.
_SALT_S = 8

@_reg("skew_salted_join", """
WITH f AS (
  SELECT user_id % 5 AS k,
         CAST(FLOOR(value + 0.5) AS BIGINT) AS vq
  FROM events
),
d AS (
  SELECT o_custkey % 5 AS k,
         CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS pq
  FROM orders
)
SELECT CAST(f.k AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(f.vq * d.pq) AS BIGINT) AS product_sum
FROM f JOIN d ON f.k = d.k
GROUP BY f.k
""")
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    fact = ev.select(
        (F.col("user_id") % 5).alias("k"),
        F.floor(F.col("value") + 0.5).cast("long").alias("vq"),
        F.pmod(F.xxhash64("event_id"), F.lit(_SALT_S)).cast("int")
        .alias("salt"))
    dim = orders.select(
        (F.col("o_custkey") % 5).alias("k"),
        F.floor(F.col("o_totalprice") / 1000).cast("long").alias("pq"),
        F.explode(F.sequence(F.lit(0), F.lit(_SALT_S - 1))).alias("salt"))
    joined = fact.hint("merge").join(dim, ["k", "salt"])
    return joined.groupBy(F.col("k").cast("long").alias("k")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("vq") * F.col("pq")).cast("long").alias("product_sum"))


# DOM-heuristic outline: the reference's DOM implies a heading hierarchy
# (font-size tiers -> h1/h2/body); this operator rebuilds the document
# outline from a span stream — classify each span by size tier, then
# assign hierarchical section numbers with two running counts (the same
# gaps-and-islands window machinery as the chunk merge). Span stream is
# synthesized deterministically per doc (12 spans, integer-math sizes) so
# the oracle is closed-form.
@_reg("doc_outline", """
WITH s AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, i AS idx,
         CASE (doc_id * 7 + i * 3) % 7
              WHEN 0 THEN 24 WHEN 1 THEN 18 ELSE 10 END AS font_size
  FROM documents, (SELECT unnest(generate_series(0, 11)) AS i)
),
lv AS (
  SELECT doc_id, idx, font_size,
         CASE font_size WHEN 24 THEN 1 WHEN 18 THEN 2 ELSE 0 END AS level
  FROM s
)
SELECT doc_id, CAST(idx AS INT) AS idx, CAST(font_size AS INT) AS font_size,
       CAST(level AS INT) AS level,
       CAST(SUM(CASE WHEN level = 1 THEN 1 ELSE 0 END)
            OVER (PARTITION BY doc_id ORDER BY idx) AS INT) AS section,
       CAST(SUM(CASE WHEN level = 2 THEN 1 ELSE 0 END)
            OVER (PARTITION BY doc_id ORDER BY idx) AS INT) AS subsection
FROM lv
""")
def doc_outline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"))
    s = d.select("doc_id", F.explode(F.sequence(F.lit(0), F.lit(11)))
                 .alias("idx"))
    size = (F.when((F.col("doc_id") * 7 + F.col("idx") * 3) % 7 == 0, 24)
             .when((F.col("doc_id") * 7 + F.col("idx") * 3) % 7 == 1, 18)
             .otherwise(10))
    s = s.withColumn("font_size", size)
    level = (F.when(F.col("font_size") == 24, 1)
              .when(F.col("font_size") == 18, 2).otherwise(0))
    s = s.withColumn("level", level)
    w = Window.partitionBy("doc_id").orderBy("idx")
    return s.select(
        "doc_id", F.col("idx").cast("int").alias("idx"),
        F.col("font_size").cast("int").alias("font_size"),
        F.col("level").cast("int").alias("level"),
        F.sum(F.when(F.col("level") == 1, 1).otherwise(0)).over(w)
         .cast("int").alias("section"),
        F.sum(F.when(F.col("level") == 2, 1).otherwise(0)).over(w)
         .cast("int").alias("subsection"))


# pivot: long->wide per-type counts (Spark .pivot with an explicit value
# list so the plan is a single pass — no extra distinct-scan job; oracle is
# the equivalent conditional-aggregate form)
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

@_reg("pivot_event_counts", f"""
SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
       {', '.join(
           "CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) "
           "AS BIGINT) AS n_{t}".format(t=t) for t in _EVENT_TYPES)}
FROM events GROUP BY 1
""")
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        (F.col("user_id") % 10).alias("user_bucket"), "event_type")
    wide = (ev.groupBy("user_bucket")
            .pivot("event_type", _EVENT_TYPES)
            .agg(F.count(F.lit(1))))
    # pivot leaves NULL for empty cells; counts must read 0
    return wide.select(
        "user_bucket",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
          for t in _EVENT_TYPES])


# exact percentiles (linear interpolation — Spark `percentile` and DuckDB
# `quantile_cont` share the definition; fixed-point for cross-engine parity)
@_reg("percentile_value", """
SELECT event_type,
       CAST(FLOOR(quantile_cont(value, 0.25) * 1000 + 0.5) AS BIGINT) AS p25_milli,
       CAST(FLOOR(quantile_cont(value, 0.50) * 1000 + 0.5) AS BIGINT) AS p50_milli,
       CAST(FLOOR(quantile_cont(value, 0.75) * 1000 + 0.5) AS BIGINT) AS p75_milli
FROM events GROUP BY event_type
""")
def percentile_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    agg = ev.groupBy("event_type").agg(
        F.percentile("value", 0.25).alias("q1"),
        F.percentile("value", 0.50).alias("q2"),
        F.percentile("value", 0.75).alias("q3"))
    return agg.select(
        "event_type",
        F.floor(F.col("q1") * 1000 + 0.5).cast("long").alias("p25_milli"),
        F.floor(F.col("q2") * 1000 + 0.5).cast("long").alias("p50_milli"),
        F.floor(F.col("q3") * 1000 + 0.5).cast("long").alias("p75_milli"))


# histogram binning: explicit floor arithmetic (not width_bucket — its edge
# conventions differ across engines), clamped to [0, nbins+1] like the SQL
# width_bucket contract (underflow 0, overflow nbins+1)
_HIST_LO, _HIST_HI, _HIST_BINS = 0.0, 500.0, 20

@_reg("histogram_value", f"""
WITH b AS (
  SELECT CASE WHEN value < {_HIST_LO} THEN 0
              WHEN value >= {_HIST_HI} THEN {_HIST_BINS} + 1
              ELSE CAST(FLOOR((value - {_HIST_LO})
                   / (({_HIST_HI} - {_HIST_LO}) / {_HIST_BINS})) AS INT) + 1
         END AS bucket
  FROM events
)
SELECT CAST(bucket AS INT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n
FROM b GROUP BY 1
""")
def histogram_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    step = (_HIST_HI - _HIST_LO) / _HIST_BINS
    bucket = (F.when(F.col("value") < _HIST_LO, 0)
               .when(F.col("value") >= _HIST_HI, _HIST_BINS + 1)
               .otherwise(F.floor((F.col("value") - _HIST_LO) / step)
                          .cast("int") + 1))
    return (ev.select(bucket.cast("int").alias("bucket"))
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("n")))


# correlated EXISTS (semi-join): pairs with the anti-join resume shape;
# Spark expresses it as a left_semi hash join (broadcast when the filtered
# orders side is small)
@_reg("exists_semi_join", """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 400000)
""")
def exists_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_totalprice") > 400000)
    return (cust.join(orders, cust.c_custkey == orders.o_custkey,
                      "left_semi")
            .select(F.col("c_custkey").cast("long").alias("c_custkey"),
                    "c_name"))


# Bucketized range join (interval containment): the naive non-equi join is
# a nested loop (O(N*W) compares, BroadcastNestedLoop in Spark). The scale
# path bins the time axis: each window explodes into its <=6 covering
# 1-hour bins, events carry their single bin, and an EQUI-join on the bin
# plus an exact containment post-filter finds the same pairs — shuffle-
# partitionable, skew-free, no nested loop. Each (event, window) pair
# matches in exactly one bin (the event's), so no dedup is needed.
# The oracle is the plain BETWEEN join.
_RJ_T0 = 1704067200  # 2024-01-01 00:00:00 UTC, the corpus epoch

@_reg("range_join_events", f"""
WITH w AS (
  SELECT CAST(n_nationkey AS INT) AS window_id,
         {_RJ_T0} + n_nationkey * 100800 AS start_epoch,
         {_RJ_T0} + n_nationkey * 100800
             + (n_nationkey % 5 + 1) * 3600 AS end_epoch
  FROM nation
)
SELECT w.window_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_value_milli
FROM w JOIN events e
  ON FLOOR(epoch(e.ts)) >= w.start_epoch
 AND FLOOR(epoch(e.ts)) < w.end_epoch
GROUP BY w.window_id
""")
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    w = nation.select(
        F.col("n_nationkey").cast("int").alias("window_id"),
        (F.lit(_RJ_T0) + F.col("n_nationkey") * 100800).alias("start_epoch"),
        (F.lit(_RJ_T0) + F.col("n_nationkey") * 100800
         + (F.col("n_nationkey") % 5 + 1) * 3600).alias("end_epoch"))
    wb = w.withColumn(
        "bin", F.explode(F.sequence(
            F.floor(F.col("start_epoch") / 3600),
            F.floor((F.col("end_epoch") - 1) / 3600))))
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.unix_timestamp("ts").alias("e_epoch"),
        F.floor(F.col("value") * 1000 + 0.5).cast("long").alias("vm"))
    ev = ev.withColumn("bin", F.floor(F.col("e_epoch") / 3600))
    joined = (ev.join(wb, "bin")
              .where((F.col("e_epoch") >= F.col("start_epoch"))
                     & (F.col("e_epoch") < F.col("end_epoch"))))
    return joined.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("vm").cast("long").alias("total_value_milli"))


# Hypertable-style multi-resolution rollup cascade: minutely -> hourly ->
# daily continuous aggregates where each coarser level derives from the
# FINER AGGREGATE, not a re-scan — the TimescaleDB continuous-aggregate /
# streaming-rollup shape. At 100 TB the raw table is touched once; the
# cascade reuses the (tiny) minutely result twice, and counts/sums are
# decomposable so the derivation is exact. One tagged union returns all
# three resolutions; the oracle computes each level directly from raw.
@_reg("rollup_cascade", """
WITH m AS (
  -- NOTE: DuckDB's // on DOUBLE is plain division, so floor explicitly
  SELECT CAST(FLOOR(FLOOR(epoch(ts)) / 60) AS BIGINT) * 60 AS bucket_epoch,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS vm
  FROM events GROUP BY 1
),
h AS (
  SELECT CAST(FLOOR(bucket_epoch / 3600) AS BIGINT) * 3600 AS bucket_epoch,
         CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(vm) AS BIGINT) AS vm
  FROM m GROUP BY 1
),
d AS (
  SELECT CAST(FLOOR(bucket_epoch / 86400) AS BIGINT) * 86400 AS bucket_epoch,
         CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(vm) AS BIGINT) AS vm
  FROM h GROUP BY 1
)
SELECT 'minute' AS res, CAST(bucket_epoch AS BIGINT) AS bucket_epoch, n, vm FROM m
UNION ALL
SELECT 'hour', CAST(bucket_epoch AS BIGINT), n, vm FROM h
UNION ALL
SELECT 'day', CAST(bucket_epoch AS BIGINT), n, vm FROM d
""")
def rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.unix_timestamp("ts").alias("e"),
        F.floor(F.col("value") * 1000 + 0.5).cast("long").alias("vm"))
    minute = (ev.groupBy(((F.col("e") / 60).cast("long") * 60)
                         .alias("bucket_epoch"))
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum("vm").cast("long").alias("vm")))
    # one materialization: hourly and the union both reuse the minutely
    # aggregate (without it Spark recomputes the raw scan per branch)
    minute = minute.localCheckpoint(eager=True)
    hour = (minute.groupBy(((F.col("bucket_epoch") / 3600).cast("long")
                            * 3600).alias("bucket_epoch"))
            .agg(F.sum("n").cast("long").alias("n"),
                 F.sum("vm").cast("long").alias("vm")))
    hour = hour.localCheckpoint(eager=True)
    day = (hour.groupBy(((F.col("bucket_epoch") / 86400).cast("long")
                         * 86400).alias("bucket_epoch"))
           .agg(F.sum("n").cast("long").alias("n"),
                F.sum("vm").cast("long").alias("vm")))
    tag = lambda df, r: df.select(
        F.lit(r).alias("res"), F.col("bucket_epoch").cast("long"),
        "n", "vm")
    return tag(minute, "minute").unionByName(tag(hour, "hour")).unionByName(
        tag(day, "day"))


# CUBE grouping sets (the ROLLUP twin: all 2^k grouping combinations)
@_reg("events_cube", """
SELECT event_type,
       CAST(CASE WHEN GROUPING(user_id % 10) = 1 THEN NULL
            ELSE user_id % 10 END AS BIGINT) AS user_bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(GROUPING(event_type) * 2 + GROUPING(user_id % 10) AS INT)
           AS grouping_lvl
FROM events
GROUP BY CUBE(event_type, user_id % 10)
""")
def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", (F.col("user_id") % 10).alias("user_bucket"))
    return (ev.cube("event_type", "user_bucket")
            .agg(F.count(F.lit(1)).alias("n"),
                 (F.grouping("event_type") * 2
                  + F.grouping("user_bucket")).cast("int")
                 .alias("grouping_lvl"))
            .select("event_type",
                    F.col("user_bucket").cast("long").alias("user_bucket"),
                    "n", "grouping_lvl"))


# lineage aggregation shape (per-partition counters + checksums)
@_reg("lineage_agg", """
SELECT CAST(doc_id % 16 AS INT) AS part_id,
       CAST(COUNT(*) AS BIGINT) AS doc_count,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(md5(text)) AS checksum_lo, MAX(md5(text)) AS checksum_hi
FROM documents GROUP BY 1
""")
def lineage_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # digest projected once; min+max aggregates share it
    d = d.select("doc_id", "n_chars", F.md5("text").alias("h"))
    return (d.groupBy((F.col("doc_id") % 16).cast("int").alias("part_id"))
            .agg(F.count(F.lit(1)).alias("doc_count"),
                 F.sum("n_chars").cast("long").alias("total_chars"),
                 F.min("h").alias("checksum_lo"),
                 F.max("h").alias("checksum_hi")))


# Structure oracle for the FULL rich corpus: per-doc counts of every
# non-text span kind are closed-form in h = first-8-bytes-of-md5(doc_id)
# arithmetic (corpus.rich_stream's page/graphics selectors) — so the one
# remaining rows-only query's page structure, graphics mix, metadata
# titles, and crucially the 12x SKEW TAIL (h % 37 == 0 docs) are
# value-hash-gated cross-engine even though per-glyph text geometry is
# not SQL-expressible. The hash parses exactly via 16 per-position HUGEINT
# constants (16^k literals — power() in DOUBLE is inexact past 2^53).
_H16 = " + ".join(
    f"CAST(instr('0123456789abcdef', substr(h16, {i + 1}, 1)) - 1 "
    f"AS HUGEINT) * {16 ** (15 - i)}"
    for i in range(16))

@_reg("rich_structure", f"""
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 16) AS h16,
         GREATEST(len(list_filter(string_split(text, ' '), w -> w <> '')),
                  1) AS w
  FROM documents
),
hashed AS (
  SELECT doc_id, ({_H16}) AS h, w FROM base
),
sized AS (
  SELECT doc_id, h,
         (w * (CASE WHEN h % 37 = 0 THEN 12 ELSE 1 END) + 23) // 24
             AS n_pages
  FROM hashed
),
pages AS (
  SELECT doc_id, h, n_pages, unnest(generate_series(0, n_pages - 1)) AS p
  FROM sized
)
SELECT doc_id,
  CAST(MAX(n_pages) AS BIGINT) AS n_page,
  CAST(MAX(CASE WHEN h % 7 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_meta,
  CAST(SUM(CASE WHEN (h + p) % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rect,
  CAST(SUM(CASE WHEN (h + p) % 5 IN (1, 4) THEN 1 ELSE 0 END) AS BIGINT)
      AS n_line,
  CAST(SUM(CASE WHEN (h + p) % 5 IN (2, 3) THEN 1 ELSE 0 END) AS BIGINT)
      AS n_image
FROM pages GROUP BY doc_id
""")
def rich_structure(spark: SparkSession, sf_dir: str) -> DataFrame:
    flat = _extract_flat(spark, sf_dir, mode="rich")
    return flat.groupBy(F.col("doc_id").cast("long").alias("doc_id")).agg(
        *[F.sum((F.col("kind") == k).cast("long")).alias(f"n_{k}")
          for k in ("page", "meta", "rect", "line", "image")])


# O7 document skeleton / title / global style under the cross-engine gate
# (previously pytest-only): the REAL renderer (render_html_df ->
# render_doc_html, the endDocument transposition of PDFDomTree.java:
# 165-174 title override + createFontFaces) runs over the rich corpus and
# the skeleton is counted back out of the HTML with JVM string functions;
# the oracle derives title, page-div, graphics-div, img, and @font-face
# counts from the same md5 arithmetic rich_structure uses. Text-box
# counts stay rows-only by design (box splits are per-glyph geometry).

@_reg("render_doc_skeleton", f"""
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 16) AS h16,
         GREATEST(len(list_filter(string_split(text, ' '), w -> w <> '')),
                  1) AS w
  FROM documents
),
hashed AS (
  SELECT doc_id, ({{_H16_}}) AS h, w FROM base
),
sized AS (
  SELECT doc_id, h,
         (w * (CASE WHEN h % 37 = 0 THEN 12 ELSE 1 END) + 23) // 24
             AS n_pages
  FROM hashed
),
pages AS (
  SELECT doc_id, h, n_pages, unnest(generate_series(0, n_pages - 1)) AS p
  FROM sized
)
SELECT doc_id,
  CASE WHEN MAX(h) % 7 = 3 THEN 'Document ' || CAST(doc_id AS VARCHAR)
       ELSE 'PDF Document' END AS title,
  CAST(MAX(n_pages) AS BIGINT) AS n_page_divs,
  CAST(SUM(CASE WHEN (h + p) % 5 IN (0, 1, 4) THEN 1 ELSE 0 END)
       AS BIGINT) AS n_graphic_divs,
  CAST(SUM(CASE WHEN (h + p) % 5 IN (2, 3) THEN 1 ELSE 0 END) AS BIGINT)
      AS n_imgs,
  CAST(COUNT(DISTINCT (h + p) % 7)
       + CASE WHEN MAX(h) % 5 = 0
              AND SUM(CASE WHEN (h + p) % 7 = 1 THEN 1 ELSE 0 END) = 0
              THEN 1 ELSE 0 END AS BIGINT) AS n_font_faces
FROM pages GROUP BY doc_id
""".replace("{_H16_}", _H16))
def render_doc_skeleton(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .render_html import render_html_df

    flat = _extract_flat(spark, sf_dir, mode="rich")
    html = render_html_df(flat)

    def occ(lit: str):
        return (F.size(F.split(F.col("html"), F.lit(lit), -1)) - 1
                ).cast("long")

    return html.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.regexp_extract("html", "<title>([^<]*)</title>", 1).alias("title"),
        occ('<div id="page_').alias("n_page_divs"),
        occ('class="r"').alias("n_graphic_divs"),
        occ("<img ").alias("n_imgs"),
        occ("@font-face").alias("n_font_faces"))


# ---------------------------------------------------------------------------
# rows-only (non-SQL-expressible): full interleaved corpus extraction
# ---------------------------------------------------------------------------

@_reg("extract_spans_rich", None)
def extract_spans_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    flat = _extract_flat(spark, sf_dir, mode="rich")
    return flat.select(
        "doc_id", F.col("order").cast("int").alias("ord"), "kind", "text",
        "media_ref", F.col("page_no").cast("int").alias("page_no"))


def _merge(*regs: dict) -> dict:
    out: dict = {}
    for reg in regs:
        dup = out.keys() & reg.keys()
        assert not dup, f"duplicate query names across registries: {dup}"
        out.update(reg)
    return out


# The driver's per-round correctness sweep caps at ~50 queries taken in
# dict order, while the registry holds ~85 — so ordering decides which
# queries get a driver CORRECTNESS row each round. The sweep order is
# SELF-ROTATING: the full-kernel cross-engine gates stay pinned at the
# front (they must be green every round), and every other query sorts by
# the round it last had a green CORRECTNESS row (never-gated first,
# oldest next), read from the repo's own CORRECTNESS_r*.json files — so
# cumulative driver coverage converges over rounds with no manual list
# maintenance (VERDICT r3 "Next round" #1).
_ALWAYS_GATE = [
    "extract_spans_oracle", "extract_spans_rich_lite",
    "extract_spans_rot_text", "extract_spans_forms", "extract_spans_encoded",
    "extract_spans_paged_oracle", "extract_spans_paged_tail",
    "extract_spans_rich", "rich_structure", "extract_page_range",
]


def _last_gated_rounds(names) -> dict[str, int]:
    import glob
    import json
    import os
    import re

    roots = {os.getcwd(),
             os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))}
    last = {k: -1 for k in names}
    for root in roots:
        for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
            m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
            if not m:
                continue
            rnd = int(m.group(1))
            try:
                with open(path) as fh:
                    data = json.load(fh)
            except Exception:
                continue
            if not isinstance(data, dict):
                continue
            for k, v in data.items():
                if k in last and isinstance(v, dict) and v.get("rows_match"):
                    last[k] = max(last[k], rnd)
    return last


def _sweep_order(merged: dict) -> dict:
    last = _last_gated_rounds(merged.keys())
    pinned = [k for k in _ALWAYS_GATE if k in merged]
    rest = sorted((k for k in merged if k not in pinned),
                  key=lambda k: (last[k], k))
    out = {k: merged[k] for k in pinned}
    out.update({k: merged[k] for k in rest})
    return out


def all_queries() -> dict:
    return _sweep_order(_merge(REGISTRY, textops.REGISTRY, simsearch.REGISTRY,
                               multimodal.REGISTRY, htmlops.REGISTRY))


def all_oracles() -> dict[str, str]:
    return _sweep_order(_merge(ORACLES, textops.ORACLES, simsearch.ORACLES,
                               multimodal.ORACLES, htmlops.ORACLES))


# ---------------------------------------------------------------------------
# End-to-end training-data pipeline gate: the REAL extraction kernel feeds
# the downstream corpus stages — rebuild each document's text from its
# extracted word spans, quality-filter short docs, exact-dedup the rebuilt
# texts (keeper = min doc_id per md5), shard by a doc-hash hex char, and
# pack survivors into fixed-token bins per shard (pack_bins idiom). One
# value-hash gate over the COMPOSITION: proves extraction output drives
# filtering/dedup/packing with no seams, not just each stage alone. The
# oracle replays the chain off the closed-form word stream. 100 TB shape:
# kernel (one shuffle + one fused Python stage) -> two hash aggregates ->
# a 16-way partitioned running sum; no join wider than the doc list.
# ---------------------------------------------------------------------------

_E2E_SQL = """
WITH w0 AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         unnest(string_split(text,' ')) AS word,
         generate_subscripts(string_split(text,' '), 1) AS sidx
  FROM documents WHERE length(text) > 0
),
w AS (
  SELECT doc_id, word,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sidx) - 1 AS widx
  FROM w0 WHERE word <> ''
),
reb AS (
  SELECT CAST(doc_id AS BIGINT) AS did,
         string_agg(word, ' ' ORDER BY widx) AS rtext,
         COUNT(*) AS ntok
  FROM w GROUP BY doc_id
),
q AS (SELECT * FROM reb WHERE ntok >= 24),
k AS (SELECT *, MIN(did) OVER (PARTITION BY md5(rtext)) AS keeper FROM q),
s AS (
  SELECT did, ntok,
         substr(md5('pk|' || CAST(did AS VARCHAR)), 1, 1) AS shard
  FROM k WHERE did = keeper
)
SELECT did AS doc_id, CAST(ntok AS INT) AS tokens, shard,
       CAST(FLOOR(COALESCE(SUM(ntok) OVER (PARTITION BY shard
                   ORDER BY did ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) / 512) AS INT) AS bin_id
FROM s
"""


@_reg("corpus_pipeline_e2e", _E2E_SQL)
def corpus_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    flat = _extract_flat(spark, sf_dir, mode="oracle")
    reb = (flat.where(F.col("kind") == "text")
           .groupBy("doc_id")
           .agg(F.array_sort(F.collect_list(
                    F.struct(F.col("order").alias("o"),
                             F.col("text").alias("t")))).alias("ws"))
           .select(F.col("doc_id").cast("long").alias("did"),
                   F.concat_ws(" ", F.transform(
                       F.col("ws"), lambda x: x["t"])).alias("rtext"),
                   F.size("ws").alias("ntok")))
    q = reb.where(F.col("ntok") >= 24)
    wk = Window.partitionBy(F.md5("rtext"))
    s = (q.withColumn("keeper", F.min("did").over(wk))
         .where(F.col("did") == F.col("keeper"))
         .select("did", "ntok",
                 F.substring(F.md5(F.concat(
                     F.lit("pk|"), F.col("did").cast("string"))), 1, 1)
                 .alias("shard")))
    wp = (Window.partitionBy("shard").orderBy("did")
          .rowsBetween(Window.unboundedPreceding, -1))
    return s.select(
        F.col("did").alias("doc_id"),
        F.col("ntok").cast("int").alias("tokens"), "shard",
        F.floor(F.coalesce(F.sum("ntok").over(wp), F.lit(0)) / 512)
        .cast("int").alias("bin_id"))
