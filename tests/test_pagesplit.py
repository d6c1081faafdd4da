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


def test_page_bounds_tokenizer_consistent():
    """PG sequences inside comments, hex strings, nested-paren literals,
    and dicts are document content, not boundaries (code-review regression:
    the mask must use the SAME grammar as the full tokenizer)."""
    from pdf2dom_spark.pagesplit import _page_bounds
    from pdf2dom_spark.tokenizer import tokenize

    cases = [
        "(x) Tj ET % note 612 792 0 PG\n612 792 0 PG BT (y) Tj ET",
        "( a (b) 612 792 0 PG c ) Tj 612 792 0 PG BT (z) Tj ET",
        "/OC << /N (612 792 0 PG) >> BDC 612 792 0 PG BT (q) Tj ET",
        "612 792 0 PG BT (plain) Tj ET",
    ]
    for text in cases:
        n_tok = sum(1 for op, _ in tokenize(text) if op == "PG")
        assert len(_page_bounds(text)) == n_tok, text


def test_form_name_without_prefix_seeds_fonts():
    """A form media_ref lacking the 'form:' prefix must still be seen by
    the split-path font prescan (code-review regression)."""
    from pdf2dom_spark.pagesplit import split_doc

    spans = [
        {"kind": "form", "text": "/FormFont 9 Tf (h) Tj",
         "media_ref": "Hdr", "offset": 0},
        {"kind": "text", "text": "612 792 0 PG BT /Hdr Do /Main 10 Tf "
         "1 0 0 1 72 700 Tm (a) Tj ET "
         "612 792 0 PG BT /Main 10 Tf (b) Tj ET", "media_ref": None,
         "offset": 1},
    ]
    groups = split_doc("d", spans, pages_per_group=1, min_bytes=0)
    assert len(groups) == 2
    # group 1's seed must include the form's font first (first-use order)
    assert groups[1]["font_seed"] == ["FormFont", "Main"]


def test_paged_enc_corpus_replicates_cmaps(spark):
    """kind='cmap' definitions must replicate into every page-group exactly
    like form definitions — otherwise groups after the first would decode
    with the identity map."""
    docs = build_docs_df(spark, SF_SMOKE, mode="enc").limit(100).cache()
    base = extract_spans(docs, num_partitions=8, nested=False)
    paged = extract_spans_paged(docs, num_partitions=8,
                                pages_per_group=2, min_bytes=0)
    cols = [c for c in base.columns if c != "part_id"]
    assert base.select(cols).exceptAll(paged.select(cols)).count() == 0
    assert paged.select(cols).exceptAll(base.select(cols)).count() == 0
    # non-vacuous: the decoded Greek actually appears in the split output
    assert paged.where("kind = 'text' AND text LIKE '%α%'").count() > 0


def test_paged_rot_text_and_forms_corpora_too(spark):
    """Rotated-page splits and per-page form re-expansion must survive the
    page-split path bit-exactly (forms replicate into every group; page
    transforms reset at PG)."""
    for mode in ("rot_text", "forms"):
        docs = build_docs_df(spark, SF_SMOKE, mode=mode).limit(80).cache()
        base = extract_spans(docs, num_partitions=8, nested=False)
        paged = extract_spans_paged(docs, num_partitions=8,
                                    pages_per_group=3, min_bytes=0)
        cols = [c for c in base.columns if c != "part_id"]
        assert base.select(cols).exceptAll(paged.select(cols)).count() == 0, mode
        assert paged.select(cols).exceptAll(base.select(cols)).count() == 0, mode


def test_split_font_seed_respects_page_gate(spark):
    """The font seed must only contain fonts the unsplit kernel would
    register: content before the first PG and pages outside the
    start/end gate contribute nothing (review finding)."""
    from pdf2dom_spark.extract import ExtractConfig, extract_doc

    spans = [
        # pre-PG fragment referencing a font the interp never registers
        {"kind": "text", "text": "/Phantom 9 Tf", "media_ref": None,
         "offset": 0},
        {"kind": "text", "text": ("612 792 0 PG BT /Serif 10 Tf "
                                  "1 0 0 1 72 700 Tm (a) Tj ET"),
         "media_ref": None, "offset": 1},
        {"kind": "text", "text": ("612 792 0 PG BT /Gated 10 Tf "
                                  "1 0 0 1 72 700 Tm (b) Tj ET"),
         "media_ref": None, "offset": 2},
    ]
    cfg = ExtractConfig(start_page=1, end_page=1)
    base = extract_doc("d", spans, cfg)
    base_fonts = [r["text"] for r in base if r["kind"] == "font"]
    assert base_fonts == ["Serif"]

    groups = split_doc("d", spans, pages_per_group=1, min_bytes=0,
                       start_page=1, end_page=1)
    assert len(groups) == 2
    # neither Phantom (pre-PG) nor Gated (page 2, outside the range)
    # leaks into any group's seed
    all_seeds = [f for g in groups for f in g["font_seed"]]
    assert "Phantom" not in all_seeds and "Gated" not in all_seeds
    # split path reproduces the unsplit font records exactly
    from pdf2dom_spark.extract import extract_doc_columnar
    last = groups[-1]
    cols = extract_doc_columnar("d", last["spans"], cfg,
                                page_offset=last["page_offset"],
                                font_seed=list(last["font_seed"]),
                                emit_fonts=True)
    fonts = [t for t, k in zip(cols["text"], cols["kind"]) if k == "font"]
    assert list(fonts) == ["Serif"]


def test_split_definitions_only_doc_survives(spark):
    """A big document holding only definition/meta spans must pass
    through (previously it vanished: zero groups)."""
    spans = [
        {"kind": "fontfile", "text": "TrueType;QUJD", "media_ref":
         "fontfile:X", "offset": 0},
        {"kind": "meta", "text": "Title!", "media_ref": "title",
         "offset": 1},
    ]
    groups = split_doc("d", spans, pages_per_group=1, min_bytes=0)
    assert len(groups) == 1 and groups[0]["emit_fonts"]
    assert {s["kind"] for s in groups[0]["spans"]} == {"fontfile", "meta"}


def test_bounds_of_masked_equals_naive_regex():
    """The find("PG")-anchored fast scan must return EXACTLY what the
    naive whole-text finditer returned (hypothesis over adversarial
    number/PG/boundary soups, plus hand-picked edge shapes)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdf2dom_spark.pagesplit import _PG_RE, _bounds_of_masked

    def naive(masked: str) -> list[int]:
        return [m.start() for m in _PG_RE.finditer(masked)]

    edge = [
        "", "PG", " PG ", "1 2 3 PG", "1 2 3 PG 4 5 6 PG",
        "1 2 3PG", "1 2 3 PGX", "/XPG 1 2 3 PG", "5 1 2 3 PG",
        "612.0 792.0 0 PG q 1 0 0 1 cm", "+1 -2.5 .3 PG",
        "1 2 3 PG\n4 5 6 PG", "PG PG PG", "1 2 3  PG", "a b c PG",
        "1. .2 3. PG", "1 2 3 PG1 2 3 PG", "... PG", "- + . PG",
    ]
    for t in edge:
        assert _bounds_of_masked(t) == naive(t), t

    token = st.sampled_from(
        ["PG", "Tf", "1", "22.5", "+3", "-4.25", ".5", "q", "Q", "BT",
         "/F1", "PGX", "XPG", "7.", "0", "612.00", "PG2"])
    soup = st.lists(token, max_size=40).map(" ".join)
    sep = st.sampled_from([" ", "  ", "\n", "\t", "\r\n"])

    @settings(max_examples=300, deadline=None)
    @given(soup, sep)
    def check(text, s):
        t = text.replace(" ", s)
        assert _bounds_of_masked(t) == naive(t)

    check()
