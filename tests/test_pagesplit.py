"""Page-split path (pagesplit.py): the split extraction must produce exactly
the unsplit result on the corpus classes where page boundaries always split
(the deterministic corpora do)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf2dom_spark.corpus import build_docs_df
from pdf2dom_spark.pagesplit import extract_spans_paged, split_doc
from pdf2dom_spark.pipeline import extract_spans
from tests.conftest import SF_SMOKE


def test_split_doc_structure():
    from pdf2dom_spark.corpus import rich_stream

    spans = rich_stream("42", "alpha beta gamma delta " * 40)
    groups = split_doc("42", spans, pages_per_group=2, min_bytes=0)
    assert len(groups) >= 2
    # offsets accumulate, fonts seed forward, only last group emits fonts
    assert groups[0]["page_offset"] == 0
    offs = [g["page_offset"] for g in groups]
    assert offs == sorted(offs)
    assert [g["emit_fonts"] for g in groups] == \
        [False] * (len(groups) - 1) + [True]
    assert groups[0]["font_seed"] == []
    assert len(groups[-1]["font_seed"]) >= len(groups[0]["font_seed"])


def test_small_docs_pass_through():
    from pdf2dom_spark.corpus import rich_stream

    spans = rich_stream("7", "just a few words")
    groups = split_doc("7", spans, pages_per_group=2, min_bytes=1 << 20)
    assert len(groups) == 1 and groups[0]["emit_fonts"]


def test_paged_equals_unsplit(spark):
    docs = build_docs_df(spark, SF_SMOKE, mode="rich").limit(150).cache()
    base = extract_spans(docs, num_partitions=8, nested=False)
    paged = extract_spans_paged(docs, num_partitions=8,
                                pages_per_group=2, min_bytes=0)
    cols = [c for c in base.columns if c != "part_id"]
    assert base.count() == paged.count()
    assert base.select(cols).exceptAll(paged.select(cols)).count() == 0
    assert paged.select(cols).exceptAll(base.select(cols)).count() == 0


def test_paged_oracle_corpus_too(spark):
    docs = build_docs_df(spark, SF_SMOKE, mode="oracle").limit(100).cache()
    base = extract_spans(docs, num_partitions=8, nested=False)
    paged = extract_spans_paged(docs, num_partitions=8,
                                pages_per_group=1, min_bytes=0)
    cols = [c for c in base.columns if c != "part_id"]
    assert base.select(cols).exceptAll(paged.select(cols)).count() == 0
    assert paged.select(cols).exceptAll(base.select(cols)).count() == 0


def test_paged_rich_lite_corpus_too(spark):
    docs = build_docs_df(spark, SF_SMOKE, mode="rich_lite").limit(100).cache()
    base = extract_spans(docs, num_partitions=8, nested=False)
    paged = extract_spans_paged(docs, num_partitions=8,
                                pages_per_group=2, min_bytes=0)
    cols = [c for c in base.columns if c != "part_id"]
    assert base.select(cols).exceptAll(paged.select(cols)).count() == 0
    assert paged.select(cols).exceptAll(base.select(cols)).count() == 0
