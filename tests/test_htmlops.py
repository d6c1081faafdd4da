"""Boilerplate-strip boundary semantics: the min-words and link-density
cutoffs pinned with crafted blocks (the oracle checks the corpus-wide
behavior; these pin the exact rule edges)."""

from __future__ import annotations

from pyspark.sql import Row

from pdf2dom_spark.htmlops import html_main_content


def _run(spark, tmp_path, text):
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return html_main_content(spark, str(tmp_path)).collect()[0]


def test_five_word_block_kept_four_dropped(spark, tmp_path):
    # first <p> gets chars 1..120 of text; craft texts so the paragraph
    # has exactly 5 (kept: >= _MIN_WORDS) vs 4 (dropped) words
    r5 = _run(spark, tmp_path, "one two three four five")
    r4 = _run(spark, tmp_path, "one two three four")
    assert (r5.n_kept, r5.n_words_main) == (1, 5)
    assert (r4.n_kept, r4.n_words_main) == (0, 0)


def test_link_density_boundary(spark, tmp_path):
    """links*3 < words: a 6-word block with 2 links is dropped (6 == 2*3 is
    NOT < ), with 1 link it is kept."""
    # wrap a text whose <p> contains inline <a> tags
    body2 = 'w1 <a href="x">l1</a> w2 w3 <a href="y">l2</a> w4'
    body1 = 'w1 <a href="x">l1</a> w2 w3 w4 w5'
    r2 = _run(spark, tmp_path, body2)
    r1 = _run(spark, tmp_path, body1)
    assert r1.n_kept == r2.n_kept + 1
