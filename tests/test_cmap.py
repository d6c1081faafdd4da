"""Font-encoding hook (VERDICT r2 #5): per-font code->unicode maps supplied
as ``kind='cmap'`` spans, applied at show time — the transposition of
PDFBox's font-encoding / ToUnicode resolution feeding processTextPosition
(PDFBoxTree.java:592-656). Metrics stay indexed by the raw glyph code;
unicode-derived semantics (span text, whitespace drop, RTL reverse,
diacritic merge) use the mapped character."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf2dom_spark.extract import ExtractConfig, extract_doc

PG = "612 792 0 PG "


def cmap_span(font: str, mapping: dict[int, str], offset: int) -> dict:
    body = " ".join(f"{c}:{ord(u):04x}" for c, u in mapping.items())
    return {"kind": "cmap", "text": body, "media_ref": f"cmap:{font}",
            "offset": offset}


def text_span(frag: str, offset: int) -> dict:
    return {"kind": "text", "text": frag, "media_ref": None,
            "offset": offset}


def run(spans, cfg=None):
    return extract_doc("d", spans, cfg or ExtractConfig())


def boxes(rows):
    return [r for r in rows if r["kind"] == "text"]


def test_identity_without_cmap():
    rows = run([text_span(
        PG + "BT /Mono 10 Tf 1 0 0 1 72 700 Tm (AB) Tj ET", 0)])
    assert [b["text"] for b in boxes(rows)] == ["AB"]


def test_non_identity_remap_keeps_metrics():
    """Codes 65/66 remapped to Greek; geometry must be byte-identical to the
    unmapped run (advance widths read the raw code, PDFBox reads the
    embedded metrics by code before decoding)."""
    stream = text_span(
        PG + "BT /Mono 10 Tf 1 0 0 1 72 700 Tm (AB) Tj ET", 1)
    plain = boxes(run([stream]))
    mapped = boxes(run([
        cmap_span("Mono", {65: "Ω", 66: "β"}, 0), stream]))
    assert [b["text"] for b in mapped] == ["Ωβ"]
    for k in ("style_left", "style_top", "style_width", "style_font_size"):
        assert [b[k] for b in mapped] == [b[k] for b in plain]


def test_cmap_is_per_font():
    rows = boxes(run([
        cmap_span("Mono", {65: "Z"}, 0),
        text_span(PG + "BT /Mono 10 Tf 1 0 0 1 72 700 Tm (A) Tj "
                  "/Helvetica 10 Tf 1 0 0 1 72 600 Tm (A) Tj ET", 1)]))
    assert [b["text"] for b in rows] == ["Z", "A"]


def test_remap_to_space_drops_glyph():
    """PDFBoxTree.java:599 tests the DECODED unicode for emptiness: a code
    mapped to U+0020 is a whitespace glyph (dropped, advance kept)."""
    rows = boxes(run([
        cmap_span("Mono", {88: " "}, 0),
        text_span(PG + "BT /Mono 10 Tf 1 0 0 1 72 700 Tm (AXB) Tj ET", 1)]))
    # X vanished; A and B stay put at their original advances -> the 5pt gap
    # where X sat splits the box exactly like a real space
    assert [b["text"] for b in rows] == ["A", "B"]
    assert rows[1]["style_left"] - rows[0]["style_left"] == 10.0


def test_remap_to_rtl_reverses():
    rows = boxes(run([
        cmap_span("Mono", {65: "א", 66: "ב"}, 0),
        text_span(PG + "BT /Mono 10 Tf 1 0 0 1 72 700 Tm (AB) Tj ET", 1)]))
    # buffered RTL text is emitted reversed (PDFBoxTree RTL handling)
    assert [b["text"] for b in rows] == ["בא"]


@settings(max_examples=40, deadline=None)
@given(st.dictionaries(
    st.integers(min_value=33, max_value=126),
    st.characters(min_codepoint=0x100, max_codepoint=0x2FF),
    min_size=1, max_size=10))
def test_property_remap_is_exact_substitution(mapping):
    """For maps into strongly-LTR printable BMP chars, extraction text is
    EXACTLY the per-char substitution of the unmapped text, and geometry is
    unchanged."""
    src = "Hello brave new world"
    stream = text_span(
        PG + f"BT /Mono 10 Tf 1 0 0 1 72 700 Tm ({src}) Tj ET", 1)
    plain = boxes(run([stream]))
    mapped = boxes(run([cmap_span("Mono", mapping, 0), stream]))
    expect = "".join(mapping.get(ord(c), c) for c in src).split(" ")
    assert [b["text"] for b in mapped] == [w for w in expect if w]
    assert [(b["style_left"], b["style_width"]) for b in mapped] == \
        [(b["style_left"], b["style_width"]) for b in plain]


def multichar_cmap_span(font: str, mapping: dict[int, str],
                        offset: int) -> dict:
    body = " ".join(
        f"{c}:" + "+".join(f"{ord(ch):04x}" for ch in u)
        for c, u in mapping.items())
    return {"kind": "cmap", "text": body, "media_ref": f"cmap:{font}",
            "offset": offset}


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=65, max_codepoint=90),
               min_size=1, max_size=12),
       st.dictionaries(st.integers(65, 90),
                       st.text(alphabet="abÖ鱼", min_size=1, max_size=3),
                       max_size=8))
def test_multichar_cmap_text_and_geometry_property(word, mapping):
    """Property (ligature ToUnicode model): box text equals the per-code
    decode joined in order, while left/top/width stay byte-identical to
    the UNMAPPED run — advances key on raw codes, continuation chars are
    zero-width (PDFBox's one-TextPosition-per-code geometry)."""
    stream = text_span(
        PG + f"BT /Mono 10 Tf 1 0 0 1 72 700 Tm ({word}) Tj ET", 1)
    plain = boxes(run([stream]))
    mapped = boxes(run([multichar_cmap_span("Mono", mapping, 0), stream]))
    expected = "".join(mapping.get(ord(ch), ch) for ch in word)
    assert "".join(b["text"] for b in mapped) == expected
    assert len(mapped) == len(plain)
    for k in ("style_left", "style_top", "style_width"):
        assert [b[k] for b in mapped] == [b[k] for b in plain]
