"""HTML-render golden tests — structural assertions in the style of the
reference's Jsoup-based suite (TestPDFDomTree/TestFonts/TestImages)."""

from __future__ import annotations

from pdf2dom_spark.corpus import fixture_docs
from pdf2dom_spark.extract import ExtractConfig, extract_doc
from pdf2dom_spark.render_html import fmt_len, render_doc_html

FX = fixture_docs()


def render(name, cfg=None):
    return render_doc_html(extract_doc(name, FX[name], cfg or ExtractConfig()))


def test_fmt_len_java_float_semantics():
    # BoxStyle.formatLength: (float) + "pt" (BoxStyle.java:132-136)
    assert fmt_len(72.0) == "72.0pt"
    assert fmt_len(10.5) == "10.5pt"
    assert fmt_len(111.80339887498948) == "111.8034pt"  # float32 shortest


def test_document_skeleton():
    html = render("fx_rendering_mode_fill")
    assert html.startswith('<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.1//EN"')
    assert "<title>PDF Document</title>" in html
    assert ".page{position:relative; border:1px solid blue;margin:0.5em}" in html
    assert '<div id="page_0" class="page"' in html
    assert "overflow:hidden;" in html


def test_text_element_css_modes():
    # invisible: color + stroke both transparent -> color:rgba emitted,
    # no -webkit-text-stroke (TestPDFDomTree.java:28-35)
    html = render("fx_rendering_mode_neither")
    assert "color:rgba(0,0,0,0);" in html
    # (the default stylesheet's @supports rule mentions -webkit-text-stroke;
    # assert no stroke css on the element itself)
    assert "-webkit-text-stroke: #" not in html
    # fill: color #8000ff, no stroke (TestPDFDomTree.java:38-48)
    html = render("fx_rendering_mode_fill")
    assert "color:#8000ff;" in html and "-webkit-text-stroke: #" not in html
    # stroke: transparent fill + stroke css (TestPDFDomTree.java:50-61)
    html = render("fx_rendering_mode_stroke")
    assert "color:rgba(0,0,0,0);" in html
    assert "-webkit-text-stroke: #ff00ff 1px" in html
    assert "text-shadow:" in html


def test_rect_line_image_elements():
    html = render("fx_rect_vs_line_vs_path")
    assert 'class="r"' in html
    assert "background-color:#4c4c4c;" in html      # filled rect
    assert "border-bottom:" in html                  # horizontal line
    assert "transform:rotate(" in html               # slanted line
    assert '<img style="position:absolute;' in html  # rasterized path
    assert 'src="path:' in html


def test_font_faces_and_ignore_mode():
    html = render("fx_fonts")
    assert '@font-face {font-family:"EKCFJL Omsym2";' in html
    assert "src:url('font:EKCFJL+Omsym2');" in html
    html = render("fx_fonts", ExtractConfig(font_handler="ignore"))
    assert "@font-face" not in html  # PDFDomTree.java:456-462


def test_page_range_html():
    html = render("fx_3_pages", ExtractConfig(start_page=0, end_page=1))
    assert "#1" in html and "#2" not in html and "#3" not in html
    assert 'id="page_1"' not in html


def test_image_dedup_names_in_src():
    html = render("fx_images", ExtractConfig(image_handler="dir"))
    assert 'src="Untitled.png"' in html and 'src="Untitled1.png"' in html


def test_spark_render_df(spark):
    from pdf2dom_spark.corpus import build_docs_df
    from pdf2dom_spark.pipeline import extract_spans
    from pdf2dom_spark.render_html import render_html_df
    from tests.conftest import SF_SMOKE

    docs = build_docs_df(spark, SF_SMOKE, mode="oracle").limit(20)
    spans = extract_spans(docs, num_partitions=4, nested=False)
    html = render_html_df(spans)
    rows = html.collect()
    assert len(rows) == 20
    assert all(r["html"].startswith("<!DOCTYPE") for r in rows)
    assert all('class="p"' in r["html"] for r in rows)


# --- document-info title (PDFDomTree.java:165-174) ---------------------------

def test_title_from_metadata():
    from pdf2dom_spark.corpus import meta_span, text_span
    from pdf2dom_spark.extract import extract_doc
    from pdf2dom_spark.render_html import render_doc_html

    spans = [
        meta_span("My Report", 0),
        text_span("612 792 0 PG BT /Mono 10 Tf 1 0 0 1 72 700 Tm (x) Tj ET", 1),
    ]
    rows = extract_doc("t", spans)
    assert rows[-1]["kind"] == "meta" and rows[-1]["text"] == "My Report"
    html = render_doc_html(rows)
    assert "<title>My Report</title>" in html
    # blank title keeps the default (trim().length() > 0 gate)
    spans_blank = [meta_span("   ", 0), spans[1]]
    rows2 = extract_doc("t2", spans_blank)
    assert all(r["kind"] != "meta" for r in rows2)
    assert "<title>PDF Document</title>" in render_doc_html(rows2)


# --- TestFonts.java HTML-side assertions (bare-CFF -> WOFF pipeline) ---------

def test_cff_font_woff_in_style_and_readable():
    """convertPdfWithBareCffFont_*: the style carries an @font-face with an
    x-font-woff data URI whose payload re-parses as a WOFF with >1 tables,
    and the text div references a font-family (TestFonts.java:41-76)."""
    import base64
    import re
    from pdf2dom_spark.extract import ExtractConfig, extract_doc
    from pdf2dom_spark.fontbytes import parse_sfnt, woff_to_sfnt
    from pdf2dom_spark.render_html import render_doc_html

    frag = ("612 792 0 PG BT /EKCFJL+Omsym2-CFF 10 Tf "
            "1 0 0 1 72 700 Tm (cff text) Tj ET")
    rows = extract_doc("c", [{"kind": "text", "text": frag,
                              "media_ref": None, "offset": 0}],
                       ExtractConfig(font_payloads=True))
    html = render_doc_html(rows)
    assert "@font-face" in html and "x-font-woff" in html
    m = re.search(r"x-font-woff;base64,([^']*)'", html)
    assert m, html
    woff = base64.b64decode(m.group(1))
    tables = parse_sfnt(woff_to_sfnt(woff))
    assert len(tables) > 1
    # div style uses a font-family (font resolved through the table)
    assert re.search(r'class="p" style="[^"]*font-family:', html)


def test_font_save_to_dir_url():
    """convertPdf_withFontExtractToDirModeSet_*: @font-face url is the
    extract-dir file name <font>.woff (TestFonts.java:79-97)."""
    from pdf2dom_spark.extract import ExtractConfig, extract_doc
    from pdf2dom_spark.render_html import render_doc_html

    frag = ("612 792 0 PG BT /EKCFJL+Omsym2-CFF 10 Tf "
            "1 0 0 1 72 700 Tm (x) Tj ET")
    rows = extract_doc("d", [{"kind": "text", "text": frag,
                              "media_ref": None, "offset": 0}],
                       ExtractConfig(font_handler="dir"))
    fonts = [r for r in rows if r["kind"] == "font"]
    assert fonts[0]["media_ref"] == "EKCFJL+Omsym2-CFF.woff"
    assert "src:url('EKCFJL+Omsym2-CFF.woff')" in render_doc_html(rows)
