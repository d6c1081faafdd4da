"""The reference's REAL fixture PDFs through the real kernel.

Every other corpus in this repo is synthetic (corpus.py). Here the actual
bytes of /root/reference/src/test/resources/*.pdf are parsed by
pdf2dom_spark.pdfread (stdlib xref/objstm/flate reader) into DOC_SCHEMA
spans and run through the SAME extraction kernel the Spark pipeline uses —
then the reference's own test assertions are transposed verbatim:

- rendering-mode colors            TestPDFDomTree.java:28-74
- page-range keeps page 1 only     TestPDFDomTree.java:76-86
- rotation quadrants (delta=10pt)  TestPageRotation.java:15-97,
                                   TestUtils.java:90-159
"""

from __future__ import annotations

import os

import pytest

from pdf2dom_spark.extract import ExtractConfig, extract_doc
from pdf2dom_spark.pdfread import pdf_file_to_row

RES = "/root/reference/src/test/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference fixtures not present")

DELTA = 10.0  # TestUtils.java delta


def run(rel: str, cfg: ExtractConfig | None = None) -> list[dict]:
    row = pdf_file_to_row(f"{RES}/{rel}")
    return extract_doc(row["doc_id"], row["spans"], cfg or ExtractConfig())


def first_text(rows):
    return next(r for r in rows if r["kind"] == "text")


# --- rendering modes (TestPDFDomTree.java:28-74) ---------------------------

def test_real_mode_neither_invisible():
    r = first_text(run("text-rendering-mode-neither.pdf"))
    assert r["style_color"] == "rgba(0,0,0,0)"          # transparentColor
    assert r["style_stroke_color"] == "rgba(0,0,0,0)"


def test_real_mode_fill():
    r = first_text(run("text-rendering-mode-fill.pdf"))
    assert r["style_color"] in ("#8000fe", "#8000ff")   # platform envelope
    assert r["style_stroke_color"] == "rgba(0,0,0,0)"   # no text-stroke


def test_real_mode_stroke():
    r = first_text(run("text-rendering-mode-stroke.pdf"))
    assert r["style_color"] == "rgba(0,0,0,0)"
    assert r["style_stroke_color"] == "#ff00ff"


def test_real_mode_stroke_and_fill():
    r = first_text(run("text-rendering-mode-stroke-and-fill.pdf"))
    assert r["style_color"] in ("#9af0e6", "#9af0e7")   # HSV rounding
    assert r["style_stroke_color"] == "#ff00ff"


def test_real_mode_words_and_font():
    rows = run("text-rendering-mode-stroke.pdf")
    assert [r["text"] for r in rows if r["kind"] == "text"] == \
        ["Text", "Mode", "Stroke"]
    assert [r["text"] for r in rows if r["kind"] == "font"] == ["Helvetica"]


# --- page range on a real 3-page document (TestPDFDomTree.java:76-86) ------

def _page_text(rows, p=None):
    return " ".join(r["text"] for r in rows if r["kind"] == "text"
                    and (p is None or r["page_no"] == p))


def test_real_3page_cid_text_decodes():
    """Type0/Identity-H subset fonts (one per page, per-page ToUnicode):
    the 2-byte code path must decode every page's text."""
    rows = run("3-page-document.pdf")
    assert len([r for r in rows if r["kind"] == "page"]) == 3
    assert "Page #1" in _page_text(rows, 1)
    assert "Page #2" in _page_text(rows, 2)
    assert "#3" in _page_text(rows, 3)


def test_real_3page_range_keeps_first_page_only():
    rows = run("3-page-document.pdf", ExtractConfig(start_page=1, end_page=1))
    text = _page_text(rows)
    assert "#1" in text
    assert "#2" not in text
    assert "#3" not in text
    assert len([r for r in rows if r["kind"] == "page"]) == 1


# --- page rotation quadrants (TestPageRotation.java, TestUtils.java) --------

def _rects(rel):
    rows = run(f"page-rotation/object-page-rotate-{rel}.pdf")
    pg = next(r for r in rows if r["kind"] == "page")
    img = next(r for r in rows if r["kind"] == "image")
    rect = next(r for r in rows if r["kind"] == "rect")
    return pg, img, rect


def _in_top(r, pg):
    assert r["style_top"] < pg["style_height"] / 2
    assert r["style_top"] > -DELTA


def _in_bottom(r, pg):
    assert r["style_top"] > pg["style_height"] / 2
    assert r["style_top"] < pg["style_height"] + DELTA


def _in_left(r, pg):
    assert r["style_left"] < pg["style_width"] / 2
    assert r["style_left"] > -DELTA


def _in_right(r, pg):
    assert r["style_left"] > pg["style_width"] / 2
    assert r["style_left"] < pg["style_width"] + DELTA


def _not_outside(r, pg):
    assert r["style_left"] + r["style_width"] < pg["style_width"] + DELTA
    assert r["style_top"] + r["style_height"] < pg["style_height"] + DELTA


def test_real_rotation_0_image_top_left_rect_bottom_right():
    pg, img, rect = _rects(0)
    _in_top(img, pg); _in_left(img, pg)
    _not_outside(rect, pg); _in_bottom(rect, pg); _in_right(rect, pg)


def test_real_rotation_90_image_top_right_rect_bottom_left():
    pg, img, rect = _rects(90)
    # M3: 90-degree rotation swaps the page dims
    assert (pg["style_width"], pg["style_height"]) == \
        pytest.approx((160.583, 322.038), abs=0.01)
    _in_top(img, pg); _in_right(img, pg)
    _not_outside(rect, pg); _in_bottom(rect, pg); _in_left(rect, pg)


def test_real_rotation_180_image_bottom_right_rect_top_left():
    pg, img, rect = _rects(180)
    _in_bottom(img, pg); _in_right(img, pg)
    _not_outside(rect, pg); _in_top(rect, pg); _in_left(rect, pg)


def test_real_rotation_270_image_bottom_left_rect_top_right():
    pg, img, rect = _rects(270)
    _in_bottom(img, pg); _in_left(img, pg)
    _not_outside(rect, pg); _in_top(rect, pg); _in_right(rect, pg)


# --- broader fixtures: structural smoke -------------------------------------

def test_real_images_pdf_has_images():
    rows = run("images.pdf")
    imgs = [r for r in rows if r["kind"] == "image"]
    assert len(imgs) == 2
    for r in imgs:
        assert r["style_width"] > 0 and r["style_height"] > 0
        assert r["media_ref"].startswith("sha:")


def test_real_horarios_full_document_extracts():
    """206 KB classic-xref PDF with CID fonts, form XObjects, and images:
    the whole ingest + kernel path must survive a real-world document."""
    rows = run("HorariosMadrid_Segovia.pdf")
    kinds = {r["kind"] for r in rows}
    assert {"page", "text", "rect", "line", "image", "font"} <= kinds
    pg = next(r for r in rows if r["kind"] == "page")
    # one A3 landscape page
    assert (pg["style_width"], pg["style_height"]) == \
        pytest.approx((841.8, 595.2), abs=0.1)
    assert len([r for r in rows if r["kind"] == "text"]) > 200
    assert len([r for r in rows if r["kind"] == "image"]) > 10
    # the CID text decodes through ToUnicode maps cascaded into the form
    # XObjects (fonts live in the PAGE resources, used inside forms)
    text = _page_text(rows).upper()
    for word in ("MADRID", "SEGOVIA", "HORARIO"):
        assert word in text
    assert "6.30" in text  # the timetable's first departure


def test_real_pdf_deterministic():
    a = pdf_file_to_row(f"{RES}/3-page-document.pdf")
    b = pdf_file_to_row(f"{RES}/3-page-document.pdf")
    assert a == b


def test_real_pdf_spark_ingest(spark, tmp_path):
    """Distributed binaryFile -> mapInPandas ingest produces the same rows
    as the local parser, and feeds the Spark extraction pipeline."""
    import shutil

    from pdf2dom_spark.pdfread import pdf_docs_df
    from pdf2dom_spark.pipeline import extract_spans

    src = tmp_path / "pdfs"
    src.mkdir()
    for f in ["text-rendering-mode-stroke.pdf", "3-page-document.pdf"]:
        shutil.copy(f"{RES}/{f}", src / f)

    docs = pdf_docs_df(spark, str(src))
    got = {r.doc_id: [s.asDict() for s in r.spans] for r in docs.collect()}
    assert set(got) == {"text-rendering-mode-stroke.pdf",
                       "3-page-document.pdf"}
    for name in got:
        local = pdf_file_to_row(f"{RES}/{name}")
        assert got[name] == local["spans"]

    spans = extract_spans(docs, num_partitions=4, nested=False)
    texts = {r.text for r in spans.where("kind = 'text'").collect()}
    assert "Stroke" in texts


# --- real embedded font binaries (F2; TestFonts.java:30-86) -----------------

def _font_programs(rel):
    from pdf2dom_spark.pdfread import embedded_font_programs
    with open(f"{RES}/{rel}", "rb") as fh:
        return embedded_font_programs(fh.read())


def test_real_truetype_parses_and_roundtrips_woff():
    """A REAL embedded TrueType (46 KB Arial-BoldMT subset from the
    reference's own bare-cff.pdf) through the SFNT machinery: parse,
    normalize (checksum rebuild), WOFF1 convert, re-parse — every real
    table's bytes survive (TestFonts.java:39-53's FontVerter.readFont)."""
    from pdf2dom_spark import fontbytes as fb

    progs = _font_programs("fonts/bare-cff.pdf")
    ttf = next(p for p in progs if p["kind"] == "TrueType")
    assert ttf["base_font"] == "QRYINH+Arial-BoldMT"
    data = ttf["program"]
    assert data[:4] in (b"\x00\x01\x00\x00", b"true")

    tables = fb.parse_sfnt(data)
    # a real font: far more than the synthetic head+name model
    assert {b"glyf", b"loca", b"head", b"hmtx"} <= set(tables)

    norm = fb.normalize_sfnt(data)
    assert fb.sfnt_is_valid(norm)
    # lossless: every original table's bytes intact after normalize
    assert {t: v for t, v in fb.parse_sfnt(norm).items() if t != b"head"} \
        == {t: v for t, v in tables.items() if t != b"head"}

    back = fb.woff_to_sfnt(fb.sfnt_to_woff(norm))
    assert fb.parse_sfnt(back) == fb.parse_sfnt(norm)
    assert fb.sfnt_is_valid(back)


def test_real_bare_cff_to_woff():
    """The reference's bare-CFF fixture font (EKCFJL+Omsym2, FontFile3)
    through the real CFF -> WOFF1 conversion; the WOFF re-parses with >1
    tables and the CFF program bytes survive exactly
    (TestFonts.java:30-54, :70-77)."""
    from pdf2dom_spark import fontbytes as fb

    progs = _font_programs("fonts/bare-cff.pdf")
    cff = next(p for p in progs if p["kind"] == "Type1C")
    assert cff["base_font"] == "EKCFJL+Omsym2"
    assert cff["family"] == "Omsym2"          # subset prefix stripped
    assert cff["program"][:2] == b"\x01\x00"  # CFF header major.minor

    woff = fb.cff_to_woff(cff["program"], cff["base_font"])
    assert woff[:4] == b"wOFF"
    back = fb.woff_to_sfnt(woff)
    tables = fb.parse_sfnt(back)
    assert len(tables) > 1                    # WoffParser assertion analog
    assert tables[b"CFF "] == cff["program"]
    import struct
    assert struct.unpack(">I", back[:4])[0] == 0x4F54544F  # OTTO flavor


def test_real_horarios_font_programs():
    """Every embedded program in the 206 KB real-world document extracts
    with its declared type; TrueTypes all carry the SFNT magic."""
    progs = _font_programs("HorariosMadrid_Segovia.pdf")
    kinds = {p["kind"] for p in progs}
    assert "TrueType" in kinds and "CIDFontType0C" in kinds
    for p in progs:
        if p["kind"] == "TrueType":
            assert p["program"][:4] == b"\x00\x01\x00\x00"
        assert len(p["program"]) > 1000


# --- real advance widths (/Widths + CID /W) ---------------------------------

def test_real_cid_w_array_drives_geometry():
    """3-page-document's Type0 fonts carry /W arrays; a word box's width
    must equal the sum of its raw CIDs' /W advances (recomputed here
    independently from the font dict) scaled by the font size — the
    metrics-by-raw-code contract with REAL metrics."""
    from pdf2dom_spark.pdfread import PdfFile, font_widths

    with open(f"{RES}/3-page-document.pdf", "rb") as fh:
        data = fh.read()
    pdf = PdfFile(data)
    # page 2's font: MinionPro subset (C0_0), 12 pt, word "Page"
    page2 = pdf.pages()[1]
    fonts = pdf.resolve(pdf.resolve(page2["Resources"])["Font"])
    minion = next(pdf.resolve(f) for f in fonts.values()
                  if "MinionPro" in str(pdf.resolve(f).get("BaseFont")))
    dw, wmap = font_widths(pdf, minion)

    # decode "Page" -> CIDs via the font's own ToUnicode
    from pdf2dom_spark.pdfread import encoding_map
    cmap, cid2 = encoding_map(pdf, minion)
    assert cid2
    rev = {dec: c for c, dec in cmap.items()}
    cids = [rev[ch] for ch in "Page"]
    expected = sum(wmap.get(c, dw) for c in cids) / 1000.0 * 12.0

    rows = run("3-page-document.pdf")
    page_boxes = [r for r in rows if r["kind"] == "text"
                  and r["page_no"] == 2 and r["text"] == "Page"]
    assert page_boxes
    assert page_boxes[0]["style_width"] == pytest.approx(expected, abs=0.05)


def test_real_simple_widths_parse():
    """bare-cff.pdf's simple fonts declare /Widths; the parse keys them by
    byte code with the descriptor MissingWidth default."""
    from pdf2dom_spark.pdfread import PdfFile, font_widths

    with open(f"{RES}/fonts/bare-cff.pdf", "rb") as fh:
        pdf = PdfFile(fh.read())
    found = 0
    for page in pdf.pages():
        fonts = pdf.resolve(pdf.resolve(page.get("Resources"))["Font"])
        for fref in fonts.values():
            fw = font_widths(pdf, pdf.resolve(fref))
            if fw is not None:
                found += 1
                dflt, wmap = fw
                # symbol fonts legitimately exceed 1 em (Omsym2 peaks at
                # 5112 milli); just pin sanity bounds
                assert wmap and all(0 <= v <= 10000 for v in wmap.values())
    assert found >= 1


def test_base14_without_widths_keeps_heuristics():
    """The rendering-mode fixtures use non-embedded base-14 Helvetica with
    no /Widths — no widths span is emitted and geometry stays on the
    family heuristics (PDFBox reads AFM metrics there; this sandbox
    documents the fallback)."""
    row = pdf_file_to_row(f"{RES}/text-rendering-mode-stroke.pdf")
    assert not [s for s in row["spans"] if s["kind"] == "widths"]


def test_real_bare_cff_font_face_embeds_real_woff():
    """TestFonts.convertPdfWithBareCffFont_* end-to-end with REAL bytes:
    extraction with font payloads produces a font entry whose data URI is
    an x-font-woff whose decompressed CFF table IS the PDF's embedded
    program; the save-to-dir mode names it <family>.woff."""
    import base64

    from pdf2dom_spark import fontbytes as fb

    row = pdf_file_to_row(f"{RES}/fonts/bare-cff.pdf")
    prog = next(p for p in _font_programs("fonts/bare-cff.pdf")
                if p["kind"] == "Type1C")

    rows = run_spans(row, ExtractConfig(font_payloads=True))
    woff_fonts = [r for r in rows if r["kind"] == "font"
                  and "x-font-woff" in (r["media_ref"] or "")]
    assert woff_fonts, "no WOFF @font-face entry for the bare CFF"
    b64 = woff_fonts[0]["media_ref"].split("base64,", 1)[1]
    back = fb.woff_to_sfnt(base64.b64decode(b64))
    assert fb.parse_sfnt(back)[b"CFF "] == prog["program"]

    rows_dir = run_spans(row, ExtractConfig(font_handler="dir"))
    names = [r["media_ref"] for r in rows_dir if r["kind"] == "font"]
    assert any(n.endswith(".woff") and "Omsym2" in n for n in names)


def run_spans(row, cfg):
    return extract_doc(row["doc_id"], row["spans"], cfg)


# --- robustness: extra filters, xref repair, encryption ----------------------

def test_lzw_ascii85_runlength_filters():
    """PDF LZWDecode (early-change code widening), ASCII85Decode, and
    RunLengthDecode against independently-encoded payloads."""
    import base64

    from pdf2dom_spark.pdfread import _a85_decode, _lzw_decode, _rle_decode

    payload = b"BT /F1 12 Tf (ABABABABABAB hello hello) Tj ET " * 7

    # minimal PDF-flavor LZW encoder (9..12-bit, clear/EOD, early change)
    def lzw_encode(data: bytes) -> bytes:
        table = {bytes([i]): i for i in range(256)}
        nxt = 258
        width = 9
        out = []
        bits = []  # (code, width)
        bits.append((256, width))
        w = b""
        for ch in data:
            wc = w + bytes([ch])
            if wc in table:
                w = wc
            else:
                bits.append((table[w], width))
                table[wc] = nxt
                nxt += 1
                if nxt + 1 > (1 << width) and width < 12:
                    width += 1
                w = bytes([ch])
        if w:
            bits.append((table[w], width))
        bits.append((257, width))
        buf = cur = 0
        for code, wd in bits:
            cur = (cur << wd) | code
            buf += wd
            while buf >= 8:
                buf -= 8
                out.append((cur >> buf) & 0xFF)
        if buf:
            out.append((cur << (8 - buf)) & 0xFF)
        return bytes(out)

    assert _lzw_decode(lzw_encode(payload)) == payload
    assert _a85_decode(base64.a85encode(payload)) == payload
    assert _a85_decode(b"<~" + base64.a85encode(payload) + b"~>") == payload

    def rle_encode(data: bytes) -> bytes:
        out = bytearray()
        i = 0
        while i < len(data):
            j = i
            while j < len(data) and j - i < 127 and data[j] == data[i]:
                j += 1
            if j - i >= 2:
                out += bytes([257 - (j - i), data[i]])
                i = j
            else:
                k = i + 1
                while (k < len(data) and k - i < 128
                       and (k + 1 >= len(data) or data[k] != data[k + 1])):
                    k += 1
                out += bytes([k - i - 1]) + data[i:k]
                i = k
        out.append(128)
        return bytes(out)

    assert _rle_decode(rle_encode(payload)) == payload


def test_xref_repair_on_corrupted_offset():
    """Corrupting the startxref offset must not kill ingestion: the reader
    falls back to an object-header scan and still extracts every page."""
    from pdf2dom_spark.pdfread import pdf_to_spans

    with open(f"{RES}/HorariosMadrid_Segovia.pdf", "rb") as fh:
        data = bytearray(fh.read())
    i = data.rfind(b"startxref")
    j = data.find(b"\n", i) + 1
    k = data.find(b"\n", j)
    data[j:k] = b"9" * (k - j)  # bogus offset
    spans = pdf_to_spans(bytes(data))
    good = pdf_to_spans(open(f"{RES}/HorariosMadrid_Segovia.pdf", "rb").read())
    assert spans == good


def test_encrypted_pdf_raises_clear_error():
    from pdf2dom_spark.pdfread import EncryptedPdfError, PdfFile

    doc = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [] /Count 0 >>\nendobj\n"
           b"trailer\n<< /Root 1 0 R /Encrypt 9 0 R >>\n"
           b"startxref\n0\n%%EOF\n")
    with pytest.raises(EncryptedPdfError):
        PdfFile(doc)


def test_spark_ingest_skips_encrypted_and_broken(spark, tmp_path):
    """The distributed ingest never lets one bad file poison a batch."""
    import shutil

    from pdf2dom_spark.pdfread import pdf_docs_df

    src = tmp_path / "mix"
    src.mkdir()
    shutil.copy(f"{RES}/text-rendering-mode-fill.pdf", src / "good.pdf")
    (src / "garbage.pdf").write_bytes(b"%PDF-1.4 not really a pdf")
    (src / "encrypted.pdf").write_bytes(
        b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog >>\nendobj\n"
        b"trailer\n<< /Root 1 0 R /Encrypt 9 0 R >>\nstartxref\n0\n%%EOF\n")
    docs = pdf_docs_df(spark, str(src))
    ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert ids == {"good.pdf"}


def test_real_bare_cff_rendered_html_has_woff_font_face():
    """TestFonts.convertPdfWithBareCffFont_outputHtmlHasWoffFontInStyle,
    on the real fixture through the real renderer: the document HTML's
    style carries an @font-face with an x-font-woff data URI, and a text
    div uses a font-family."""
    from pdf2dom_spark.render_html import render_doc_html

    row = pdf_file_to_row(f"{RES}/fonts/bare-cff.pdf")
    rows = extract_doc(row["doc_id"], row["spans"],
                       ExtractConfig(font_payloads=True))
    html = render_doc_html(rows)
    assert "@font-face" in html
    assert "x-font-woff" in html
    assert "font-family:" in html


def test_real_pdf_pagesplit_bit_equal():
    """The monster-doc split path over REAL PDF spans (Horarios: forms,
    CID fonts, images) produces the identical span sequence as the
    unsplit kernel."""
    from pdf2dom_spark.extract import extract_doc_columnar
    from pdf2dom_spark.pagesplit import split_doc

    row = pdf_file_to_row(f"{RES}/HorariosMadrid_Segovia.pdf")
    base = extract_doc(row["doc_id"], row["spans"], ExtractConfig())

    groups = split_doc(row["doc_id"], row["spans"], pages_per_group=1,
                       min_bytes=0)
    assert groups  # single page -> one group, but the machinery must agree
    got: list[dict] = []
    order_base = 0
    for g in groups:
        cols = extract_doc_columnar(
            row["doc_id"], g["spans"], ExtractConfig(),
            page_offset=g["page_offset"], font_seed=list(g["font_seed"]),
            emit_fonts=g["emit_fonts"])
        n = len(cols["order"])
        for i in range(n):
            rec = {k: (v[i] if hasattr(v, "__len__") else v)
                   for k, v in cols.items()}
            rec["order"] = order_base + int(rec["order"])
            got.append(rec)
        order_base += n
    assert len(got) == len(base)
    for a, b in zip(sorted(got, key=lambda r: r["order"]), base):
        assert a["kind"] == b["kind"] and a["text"] == b["text"]


def test_real_vertical_metrics_from_descriptor():
    """FontDescriptor CapHeight/Ascent/Descent ride the widths span and
    drive box geometry: MinionPro's real ascent/descent (989/-360 milli)
    set the 12 pt line height, not the 800/-200 family constants."""
    from pdf2dom_spark.pdfread import PdfFile

    with open(f"{RES}/3-page-document.pdf", "rb") as fh:
        pdf = PdfFile(fh.read())
    page2 = pdf.pages()[1]
    fonts = pdf.resolve(pdf.resolve(page2["Resources"])["Font"])
    minion = next(pdf.resolve(f) for f in fonts.values()
                  if "MinionPro" in str(pdf.resolve(f).get("BaseFont")))
    desc = pdf.resolve(pdf.resolve(
        pdf.resolve(minion["DescendantFonts"])[0])["FontDescriptor"])
    asc = float(pdf.resolve(desc["Ascent"]))
    dsc = float(pdf.resolve(desc["Descent"]))
    assert (asc, dsc) == (989.0, -360.0)

    rows = run("3-page-document.pdf")
    t = next(r for r in rows if r["kind"] == "text"
             and r["page_no"] == 2 and r["text"] == "Page")
    # line height = (ascent - descent)/1000 * size — REAL Minion metrics,
    # not the 800/-200 family constants (which would give exactly 12.0)
    assert t["style_line_height"] == pytest.approx(
        (asc - dsc) / 1000.0 * 12.0, abs=0.01)
    assert t["style_line_height"] != pytest.approx(12.0, abs=0.5)


def test_winansi_base_encoding_maps_high_codes():
    """A named /WinAnsiEncoding (or /BaseEncoding in a dict, under
    /Differences) maps the cp1252 high range: curly quotes, dashes, and
    the euro decode even without a ToUnicode table."""
    from pdf2dom_spark.pdfread import Name, PdfFile, encoding_map

    pdf = PdfFile(open(f"{RES}/text-rendering-mode-fill.pdf", "rb").read())
    font = {"Subtype": Name("TrueType"),
            "Encoding": Name("WinAnsiEncoding")}
    m, cid2 = encoding_map(pdf, font)
    assert not cid2
    assert m[0x93] == "\u201c" and m[0x94] == "\u201d"  # curly quotes
    assert m[0x97] == "\u2014"                       # em dash
    assert m[0x80] == "\u20ac"                       # euro
    assert 0x41 not in m                              # ASCII untouched

    font2 = {"Subtype": Name("TrueType"),
             "Encoding": {"BaseEncoding": Name("WinAnsiEncoding"),
                          "Differences": [0x93, Name("space")]}}
    m2, _ = encoding_map(pdf, font2)
    assert m2[0x93] == " "          # Differences override the base
    assert m2[0x94] == "\u201d"     # rest of the base survives


def test_inline_image_spliced_as_image_span():
    """A BI/ID/EI inline image becomes an image span at its Do site with
    the surrounding cm placement applied — built as a real (classic-xref)
    PDF file and run through the full reader + kernel."""
    import zlib

    content = (b"q 40 0 0 20 100 700 cm "
               b"BI /W 2 /H 2 /BPC 8 /CS /RGB ID "
               b"\x00\x11\x22\x33\x44\x55\x66\x77\x88\x99\xaa\xbb"
               b" EI Q "
               b"BT /F1 10 Tf 72 650 Td (after) Tj ET")
    stream = zlib.compress(content)
    body = (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 "
            b"/MediaBox [0 0 612 792] >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"
            b"endobj\n"
            b"4 0 obj\n<< /Length " + str(len(stream)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + stream
            + b"\nendstream\nendobj\n"
            b"trailer\n<< /Root 1 0 R >>\nstartxref\n0\n%%EOF\n")

    from pdf2dom_spark.pdfread import pdf_to_spans

    spans = pdf_to_spans(body)
    imgs = [s for s in spans if s["kind"] == "image"]
    assert len(imgs) == 1
    assert imgs[0]["text"].startswith("2 2 InlImg0")
    assert imgs[0]["media_ref"].startswith("sha:")

    rows = extract_doc("d", spans, ExtractConfig())
    img = next(r for r in rows if r["kind"] == "image")
    # cm places the 2x2 image into a 40x20 box at (100, 700) -> top =
    # 792 - 700 - 20 = 72
    assert img["style_left"] == pytest.approx(100.0, abs=0.01)
    assert img["style_top"] == pytest.approx(72.0, abs=0.01)
    assert img["style_width"] == pytest.approx(40.0, abs=0.01)
    assert img["style_height"] == pytest.approx(20.0, abs=0.01)
    assert "after" in " ".join(r["text"] for r in rows
                               if r["kind"] == "text")


# --- written real PDFs: the full file path under the oracle gate ------------

def test_written_oracle_pdf_bit_equal_to_synthetic():
    """pdfwrite renders the oracle corpus as REAL PDF files; reading them
    back through the full file path (xref -> inflate -> tokenize ->
    extract) is BIT-EQUAL to the synthetic span path — which is itself
    value-hash-gated against the closed-form DuckDB oracle, so the whole
    file chain lands under the cross-engine gate transitively."""
    import duckdb

    from pdf2dom_spark.corpus import oracle_stream
    from pdf2dom_spark.pdfread import pdf_to_spans
    from pdf2dom_spark.pdfwrite import oracle_pdf_bytes

    rows = duckdb.sql(
        "select doc_id, text from "
        "'/root/testdata/sf0.001/documents.parquet' limit 50").fetchall()
    for d, t in rows:
        d = str(d)
        real = extract_doc(d, pdf_to_spans(oracle_pdf_bytes(d, t)),
                           ExtractConfig())
        synth = extract_doc(d, oracle_stream(d, t), ExtractConfig())
        assert len(real) == len(synth)
        for a, b in zip(real, synth):
            for k in a:
                va, vb = a[k], b[k]
                if va != vb and not (va != va and vb != vb):  # NaN==NaN
                    raise AssertionError(f"{d} order {a['order']} {k}: "
                                         f"{va!r} != {vb!r}")


def test_written_oracle_pdf_spark_roundtrip(spark, tmp_path):
    """Directory of written PDFs -> distributed ingest -> extraction ==
    the synthetic corpus pipeline, row for row."""
    from pyspark.sql import functions as F

    from pdf2dom_spark.corpus import build_docs_df
    from pdf2dom_spark.pdfread import pdf_docs_df
    from pdf2dom_spark.pdfwrite import write_oracle_pdf_dir
    from pdf2dom_spark.pipeline import extract_spans

    out = tmp_path / "pdfs"
    n = write_oracle_pdf_dir("/root/testdata/sf0.001", str(out), limit=40)
    assert n == 40

    docs = pdf_docs_df(spark, str(out)).withColumn(
        "doc_id", F.regexp_replace("doc_id", r"\.pdf$", ""))
    via_files = extract_spans(docs, num_partitions=4, nested=False)

    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    synth_docs = build_docs_df(spark, "/root/testdata/sf0.001",
                               mode="oracle").where(
        F.col("doc_id").isin(ids))
    via_synth = extract_spans(synth_docs, num_partitions=4, nested=False)

    cols = [c for c in via_files.columns if c != "part_id"]
    assert via_files.count() == via_synth.count() > 0
    assert via_files.select(cols).exceptAll(via_synth.select(cols)).count() \
        == 0
    assert via_synth.select(cols).exceptAll(via_files.select(cols)).count() \
        == 0


def test_written_rich_pdf_round_trip():
    """The generic writer covers the RICH corpus surface — rotated pages
    (/Rotate), form XObjects, rect fragments, images, the /Info title —
    and extraction of the written file matches the synthetic path on
    every column except image media_ref (rich refs are truncated hashes,
    not invertible into payload bytes). Documents whose fragments carry
    non-latin-1 text (the RTL/diacritic class) are excluded: a byte-level
    content stream cannot carry raw unicode — real PDFs express those via
    font encodings, which the cmap/enc kernel tests cover."""
    import duckdb

    from pdf2dom_spark.corpus import rich_stream
    from pdf2dom_spark.pdfread import pdf_to_spans
    from pdf2dom_spark.pdfwrite import rich_pdf_bytes

    rows = duckdb.sql(
        "select doc_id, text from "
        "'/root/testdata/sf0.001/documents.parquet' limit 120").fetchall()
    checked = 0
    covered_rot = covered_form = False
    for d, t in rows:
        d = str(d)
        spans = rich_stream(d, t)
        if any(ord(c) > 255 for sp in spans for c in (sp["text"] or "")):
            continue
        checked += 1
        covered_rot |= any(" 90 PG " in (sp["text"] or "")
                           or " 270 PG " in (sp["text"] or "")
                           for sp in spans)
        covered_form |= any(sp["kind"] == "form" for sp in spans)
        real = extract_doc(d, pdf_to_spans(rich_pdf_bytes(d, t)),
                           ExtractConfig())
        synth = extract_doc(d, spans, ExtractConfig())
        assert len(real) == len(synth), d
        for a, b in zip(real, synth):
            for k in a:
                if k == "media_ref":
                    continue
                va, vb = a[k], b[k]
                if va != vb and not (va != va and vb != vb):
                    raise AssertionError(
                        f"{d} order {a['order']} {k}: {va!r} != {vb!r}")
    assert checked >= 30          # the latin-1 majority is the gate
    assert covered_rot and covered_form


def test_form_internal_image_emits_placed_span():
    """An image XObject referenced from INSIDE a form's own resources is
    rewritten to the inline DoMedia pseudo-op, so it lands as a placed
    image span (previously a documented bound: the Do was ignored)."""
    import zlib

    form_content = b"q 30 0 0 15 10 20 cm /Im1 Do Q"
    fc = zlib.compress(form_content)
    page_content = zlib.compress(b"q 1 0 0 1 100 600 cm /Fm1 Do Q")
    imgdata = b"\x01\x02\x03\x04"
    body = (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 "
            b"/MediaBox [0 0 612 792] >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /XObject << /Fm1 5 0 R >> >> >>\nendobj\n"
            b"4 0 obj\n<< /Length " + str(len(page_content)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + page_content
            + b"\nendstream\nendobj\n"
            b"5 0 obj\n<< /Type /XObject /Subtype /Form "
            b"/BBox [0 0 612 792] "
            b"/Resources << /XObject << /Im1 6 0 R >> >> /Length "
            + str(len(fc)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + fc
            + b"\nendstream\nendobj\n"
            b"6 0 obj\n<< /Type /XObject /Subtype /Image /Width 2 "
            b"/Height 2 /BitsPerComponent 8 /ColorSpace /DeviceGray "
            b"/Length 4 >>\nstream\n" + imgdata + b"\nendstream\nendobj\n"
            b"trailer\n<< /Root 1 0 R >>\nstartxref\n0\n%%EOF\n")

    from pdf2dom_spark.pdfread import pdf_to_spans

    spans = pdf_to_spans(body)
    form = next(s for s in spans if s["kind"] == "form")
    assert "DoMedia" in form["text"]

    rows = extract_doc("d", spans, ExtractConfig())
    img = next(r for r in rows if r["kind"] == "image")
    # outer cm (100, 600) + inner cm (30x15 at 10, 20):
    # left = 100+10 = 110, top = 792 - (600+20) - 15 = 157
    assert img["style_left"] == pytest.approx(110.0, abs=0.01)
    assert img["style_top"] == pytest.approx(157.0, abs=0.01)
    assert img["style_width"] == pytest.approx(30.0, abs=0.01)
    assert img["style_height"] == pytest.approx(15.0, abs=0.01)


# --- review-driven robustness regressions ------------------------------------

def _mini_pdf(objs_body: bytes) -> bytes:
    return (b"%PDF-1.4\n" + objs_body
            + b"trailer\n<< /Root 1 0 R >>\nstartxref\n0\n%%EOF\n")


def test_circular_refs_resolve_to_null():
    from pdf2dom_spark.pdfread import PdfFile, pdf_to_spans

    doc = _mini_pdf(
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n3 0 R\nendobj\n"
        b"3 0 obj\n2 0 R\nendobj\n")
    # circular /Pages chain: resolves to null, no hang, zero pages
    assert pdf_to_spans(doc) == []
    pdf = PdfFile(doc)
    from pdf2dom_spark.pdfread import Ref
    assert pdf.resolve(Ref((2, 0))) is None


def test_cyclic_page_tree_terminates():
    import zlib

    from pdf2dom_spark.pdfread import pdf_to_spans

    c = zlib.compress(b"BT /F1 9 Tf (ok) Tj ET")
    doc = _mini_pdf(
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R 2 0 R] /Count 2 "
        b"/MediaBox [0 0 612 792] >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"
        b"endobj\n"
        b"4 0 obj\n<< /Length " + str(len(c)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + c
        + b"\nendstream\nendobj\n")
    spans = pdf_to_spans(doc)  # Kids cycle back to the Pages node
    assert len([s for s in spans if s["kind"] == "text"]) == 1


def test_decodeparms_array_with_scalar_filter():
    import zlib

    from pdf2dom_spark.pdfread import PdfFile, Stream, _decode_stream

    pdf = PdfFile(_mini_pdf(
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [] /Count 0 >>\nendobj\n"))
    payload = b"\x00ABCD" * 3  # predictor rows: 3 x (tag + 4 cols)
    d = {"Filter": "FlateDecode",
         "DecodeParms": [{"Predictor": 10, "Columns": 4}]}
    got = _decode_stream(d, zlib.compress(payload), pdf)
    assert got == b"ABCD" * 3


def test_tounicode_surrogate_pair_yields_real_codepoint():
    from pdf2dom_spark.pdfread import tounicode_map

    cmap = (b"1 beginbfchar\n<41> <D835DC00>\nendbfchar\n")
    m = tounicode_map(cmap)
    assert m[0x41] == "\U0001d400"  # MATHEMATICAL BOLD CAPITAL A, not a
    # lone surrogate that would poison later utf-8 encodes


def test_bi_inside_string_literal_is_preserved():
    from pdf2dom_spark.pdfread import _splice_inline_images

    raw = b"BT (no BI here) Tj ET"
    out, n = _splice_inline_images(raw, {}, 0)
    assert out == raw and n == 0


def test_free_xref_entry_shadows_prev_section():
    from pdf2dom_spark.pdfread import PdfFile, Ref

    base = (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [] /Count 0 >>\nendobj\n"
            b"5 0 obj\n(stale)\nendobj\n")
    off5 = base.find(b"5 0 obj")
    # newest xref marks object 5 FREE; /Prev section still points at it
    xref1 = (b"xref\n5 1\n%010d 00000 n \n" % off5
             + b"trailer\n<< /Root 1 0 R >>\n")
    x1_at = len(base)
    doc = base + xref1
    xref2_at = len(doc)
    xref2 = (b"xref\n5 1\n0000000000 65535 f \n"
             b"trailer\n<< /Root 1 0 R /Prev %d >>\n" % x1_at
             + b"startxref\n%d\n%%%%EOF\n" % xref2_at)
    pdf = PdfFile(doc + xref2)
    assert pdf.resolve(Ref((5, 0))) is None  # deleted, not resurrected


def test_chained_font_renames_single_pass():
    """{F1 -> Arial, Arial -> Arial.2} must not map F1's tokens through
    Arial.2 — all renames apply in one pass."""
    from pdf2dom_spark.pdfread import _apply_renames

    content = "/F1 10 Tf (a) Tj /Arial 10 Tf (b) Tj"
    out = _apply_renames(content, {"F1": "Arial", "Arial": "Arial.2"})
    assert out == "/Arial 10 Tf (a) Tj /Arial.2 10 Tf (b) Tj"


def test_same_form_name_different_content_per_page():
    """Two pages both naming their (different) form /Fm0: the second
    page's Do must expand ITS form, not page one's."""
    import zlib

    from pdf2dom_spark.pdfread import pdf_to_spans

    def stream_obj(num, extra, data):
        z = zlib.compress(data)
        return (b"%d 0 obj\n<< /Length %d%s /Filter /FlateDecode >>"
                b"\nstream\n" % (num, len(z), extra) + z
                + b"\nendstream\nendobj\n")

    body = (b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 "
            b"/MediaBox [0 0 612 792] >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /XObject << /Fm0 7 0 R >> >> >>\nendobj\n"
            + stream_obj(4, b"", b"/Fm0 Do")
            + b"5 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 6 0 R "
            b"/Resources << /XObject << /Fm0 8 0 R >> >> >>\nendobj\n"
            + stream_obj(6, b"", b"/Fm0 Do")
            + stream_obj(7, b" /Type /XObject /Subtype /Form "
                         b"/BBox [0 0 612 792]",
                         b"BT /F1 9 Tf 72 700 Td (FORM-A) Tj ET")
            + stream_obj(8, b" /Type /XObject /Subtype /Form "
                         b"/BBox [0 0 612 792]",
                         b"BT /F1 9 Tf 72 700 Td (FORM-B) Tj ET"))
    spans = pdf_to_spans(_mini_pdf(body))
    rows = extract_doc("d", spans, ExtractConfig())
    page_texts = {p: _page_text(rows, p) for p in (1, 2)}
    assert "FORM-A" in page_texts[1] and "FORM-B" not in page_texts[1]
    assert "FORM-B" in page_texts[2] and "FORM-A" not in page_texts[2]


# --- filled non-rect path rasterization (TestPaths.java:37-60) --------------

def _arrow_raster_image():
    rows = run("shapes/arrow-path.pdf", ExtractConfig(raster_paths=True))
    return next(r for r in rows if r["kind"] == "image")


def test_real_arrow_path_creates_image():
    """givenPdfFilledNonRectPath_whenConverted_thenImageCreatedForPath:
    the non-rectangular filled path must come out as an <img> element
    (kind='image' with a PNG data URI), not a rect or a dropped path."""
    r = _arrow_raster_image()
    assert r["media_ref"].startswith("data:image/png;base64,")
    assert r["style_width"] > 0 and r["style_height"] > 0


def test_real_arrow_path_fill_color_areas():
    """...thenImageFilledWithCorrectColor: the reference decodes the PNG
    and asserts Color(217,217,217) appears in the image's bottom and top
    areas (gfxassert bottomArea()/topArea()). Transposed with the repo's
    own stdlib PNG decoder; also pins that the fill is the ONLY opaque
    color (the scanline rasterizer paints nothing else)."""
    import base64

    import numpy as np

    from pdf2dom_spark.raster import decode_png_rgba

    r = _arrow_raster_image()
    img = decode_png_rgba(base64.b64decode(r["media_ref"].split(",", 1)[1]))
    h = img.shape[0]
    opaque = img[:, :, 3] > 0
    fill = opaque & (img[:, :, 0] == 217) & (img[:, :, 1] == 217) \
        & (img[:, :, 2] == 217)
    assert fill[: h // 3].any(), "fill color missing from topArea"
    assert fill[2 * h // 3:].any(), "fill color missing from bottomArea"
    # every opaque pixel is the fill color
    assert (fill == opaque).all()


# --- save-to-dir naming on the real fixtures (TestImages.java:38-75) --------

def test_real_images_dir_names_are_title_deduped():
    """TestImages asserts files Untitled.png and Untitled1.png exist after
    converting images.pdf with SaveResourceToDirHandler: the filename base
    is the DOCUMENT TITLE (images.pdf carries /Title (Untitled)), de-duped
    with numeric suffixes — never the XObject resource name."""
    rows = run("images.pdf", ExtractConfig(image_handler="dir"))
    refs = [r["media_ref"] for r in rows if r["kind"] == "image"]
    assert refs == ["Untitled.png", "Untitled1.png"]


def test_real_horarios_dir_names_default_title_and_pathimage():
    """TestImages' infinite-loop regression fixture: Horarios has NO /Title,
    so bitmap images fall back to getTitle()'s "PDF Document" default
    (PDFBoxTree.java:952-958) and the first two saved bitmaps are
    'PDF Document.png' / 'PDF Document1.png'; rasterized paths share the
    same handler under the fixed name 'PathImage' (PathDrawer.java:71)."""
    rows = run("HorariosMadrid_Segovia.pdf", ExtractConfig(image_handler="dir"))
    refs = [r["media_ref"] for r in rows if r["kind"] == "image"]
    bitmaps = [r for r in refs if r.startswith("PDF Document")]
    paths = [r for r in refs if r.startswith("PathImage")]
    assert bitmaps[:2] == ["PDF Document.png", "PDF Document1.png"]
    assert paths and paths[0] == "PathImage.png"
    # one shared namer, append order, no collisions
    assert len(set(refs)) == len(refs)


# --- ExtGState gs: /Font and /LW reach the output (PDFTextStripper base) ----

def test_extgstate_font_and_linewidth_apply():
    """PDFBoxTree extends PDFTextStripper, whose engine registers
    SetGraphicsStateParameters: an ExtGState's /Font [ref size] switches
    the text font exactly like Tf, and /LW sets the stroke line width
    exactly like w. The reader rewrites '/GS1 gs' into those inline ops."""
    import zlib

    from pdf2dom_spark.pdfread import pdf_to_spans

    def stream_obj(num, extra, data):
        z = zlib.compress(data)
        return (b"%d 0 obj\n<< /Length %d%s /Filter /FlateDecode >>"
                b"\nstream\n" % (num, len(z), extra) + z
                + b"\nendstream\nendobj\n")

    body = (b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 "
            b"/MediaBox [0 0 612 792] >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> "
            b"/ExtGState << /GS1 6 0 R >> >> >>\nendobj\n"
            + stream_obj(4, b"",
                         b"BT /F1 9 Tf 72 700 Td (before) Tj ET "
                         b"/GS1 gs "
                         b"BT 72 650 Td (after) Tj ET "
                         b"100 100 m 200 100 l S")
            + b"5 0 obj\n<< /Type /Font /Subtype /TrueType "
            b"/BaseFont /Helvetica >>\nendobj\n"
            + b"6 0 obj\n<< /Type /ExtGState /LW 5 "
            b"/Font [7 0 R 14] >>\nendobj\n"
            + b"7 0 obj\n<< /Type /Font /Subtype /TrueType "
            b"/BaseFont /Courier-Bold >>\nendobj\n")
    spans = pdf_to_spans(_mini_pdf(body))
    rows = extract_doc("d", spans, ExtractConfig())
    texts = {r["text"]: r for r in rows if r["kind"] == "text"}
    assert set(texts) == {"before", "after"}
    assert texts["before"]["style_font_size"] == pytest.approx(9.0)
    # gs /Font [Courier-Bold 14]: size AND family AND weight switch
    assert texts["after"]["style_font_size"] == pytest.approx(14.0)
    # a gs-only font is NOT in the reference's font table (the table
    # scans /Font resources only, PDFBoxTree.processFontResources), so
    # the family falls back to the RAW font name (PDFBoxTree.java:744-746)
    # while weight/style still classify from the name
    assert texts["after"]["style_font_family"] == "Courier-Bold"
    assert texts["after"]["style_font_weight"] == "bold"
    # ... and no @font-face rule is emitted for it
    faces = [r["text"] for r in rows if r["kind"] == "font"]
    assert faces == ["Helvetica"]
    # gs /LW 5: the stroked line is classified with the new line width
    line = next(r for r in rows if r["kind"] == "line")
    assert line["style_stroke_width"] == pytest.approx(5.0)


def test_extgstate_without_modeled_keys_is_dropped():
    """A gs whose dict carries only unmodeled parameters (alpha, blend
    mode) must vanish without disturbing surrounding state."""
    import zlib

    from pdf2dom_spark.pdfread import pdf_to_spans

    def stream_obj(num, extra, data):
        z = zlib.compress(data)
        return (b"%d 0 obj\n<< /Length %d%s /Filter /FlateDecode >>"
                b"\nstream\n" % (num, len(z), extra) + z
                + b"\nendstream\nendobj\n")

    body = (b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 "
            b"/MediaBox [0 0 612 792] >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> "
            b"/ExtGState << /GS1 6 0 R >> >> >>\nendobj\n"
            + stream_obj(4, b"",
                         b"BT /F1 9 Tf 72 700 Td (a) Tj "
                         b"/GS1 gs (b) Tj ET")
            + b"5 0 obj\n<< /Type /Font /Subtype /TrueType "
            b"/BaseFont /Helvetica >>\nendobj\n"
            + b"6 0 obj\n<< /Type /ExtGState /CA 0.5 /ca 0.5 "
            b"/BM /Multiply >>\nendobj\n")
    spans = pdf_to_spans(_mini_pdf(body))
    rows = extract_doc("d", spans, ExtractConfig())
    txt = [r for r in rows if r["kind"] == "text"]
    assert all(r["style_font_size"] == pytest.approx(9.0) for r in txt)
    assert "".join(r["text"] for r in txt) in ("ab", "a b", "ab ")


# --- ligature ToUnicode entries (multi-char decodes) -------------------------

def test_ligature_tounicode_expands_to_full_text():
    """A bfchar destination of two UTF-16 units (<0066 0069> = "fi") must
    reach the output text whole — PDFBox's showText yields the full
    string in one TextPosition — while the glyph's ADVANCE stays the one
    declared for its code, so the box geometry matches the
    one-TextPosition-per-code model (continuation chars are zero-width)."""
    import zlib

    from pdf2dom_spark.pdfread import pdf_to_spans

    def stream_obj(num, extra, data):
        z = zlib.compress(data)
        return (b"%d 0 obj\n<< /Length %d%s /Filter /FlateDecode >>"
                b"\nstream\n" % (num, len(z), extra) + z
                + b"\nendstream\nendobj\n")

    # code 0x01 -> "fi", with /Widths giving it a 600-milli advance
    body = (b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 "
            b"/MediaBox [0 0 612 792] >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n"
            + stream_obj(4, b"",
                         b"BT /F1 10 Tf 72 700 Td (x\x01n) Tj ET")
            + b"5 0 obj\n<< /Type /Font /Subtype /TrueType "
            b"/BaseFont /LigFont /FirstChar 1 /LastChar 120 "
            b"/Widths [600"
            + b" 500" * 119
            + b"] /ToUnicode 6 0 R >>\nendobj\n"
            + stream_obj(6, b"",
                         b"1 beginbfchar\n<01> <00660069>\nendbfchar\n"))
    spans = pdf_to_spans(_mini_pdf(body))
    rows = extract_doc("d", spans, ExtractConfig())
    t = next(r for r in rows if r["kind"] == "text")
    assert t["text"] == "xfin"
    # width = sum of the three CODE advances at 10pt: 500+600+500 milli
    assert t["style_width"] == pytest.approx(16.0, abs=1e-6)


def test_invalid_rotate_reads_as_zero():
    """PDPage.getRotation(): /Rotate 45 is invalid (not a multiple of
    90) and reads as 0; /Rotate -90 normalizes to 270 (dims swap)."""
    import zlib

    from pdf2dom_spark.pdfread import pdf_to_spans

    def doc(rot: int) -> bytes:
        z = zlib.compress(b"BT /F1 9 Tf 72 700 Td (r) Tj ET")
        body = (b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
                b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 "
                b"/MediaBox [0 0 612 792] >>\nendobj\n"
                b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
                b"/Rotate %d /Resources << /Font << /F1 5 0 R >> >> "
                b">>\nendobj\n" % rot
                + b"4 0 obj\n<< /Length %d /Filter /FlateDecode >>"
                b"\nstream\n" % len(z) + z + b"\nendstream\nendobj\n"
                + b"5 0 obj\n<< /Type /Font /Subtype /TrueType "
                b"/BaseFont /Helvetica >>\nendobj\n")
        return _mini_pdf(body)

    def page_dims(rot: int):
        rows = extract_doc("d", pdf_to_spans(doc(rot)), ExtractConfig())
        pg = next(r for r in rows if r["kind"] == "page")
        return pg["style_width"], pg["style_height"]

    assert page_dims(45) == page_dims(0) == (612.0, 792.0)
    assert page_dims(-90) == (792.0, 612.0)  # ((-90 % 360)+360)%360 = 270


def test_title_pdfdoc_encoding():
    """Text strings without a UTF-16 BOM decode as PDFDocEncoding: the
    0x80-0x9F typographic block (bullet, curly quotes, em dash) and the
    euro at 0xA0 differ from latin-1 (PDF 32000-1 Annex D.2)."""
    from pdf2dom_spark.pdfread import pdf_to_spans, pdfdoc_decode

    assert pdfdoc_decode(b"\x8dQ\x8e \x84 \x80 \xa0") == \
        "“Q” — • €"
    assert pdfdoc_decode(b"\xfe\xff\x20\x14") == "—"  # UTF-16BE BOM
    assert pdfdoc_decode(b"plain ascii") == "plain ascii"
    # e2e through the Info dict
    body = (b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [] /Count 0 >>\nendobj\n"
            b"7 0 obj\n<< /Title <8d50448e> >>\nendobj\n")
    doc = (b"%PDF-1.4\n" + body
           + b"trailer\n<< /Root 1 0 R /Info 7 0 R >>\nstartxref\n0\n%%EOF\n")
    spans = pdf_to_spans(doc)
    meta = [s for s in spans if s["kind"] == "meta"]
    assert meta and meta[0]["text"] == "“PD”"


def test_archive_ingest_zip_of_pdfs(spark, tmp_path):
    """pdf_archive_docs_df: a zip of reference PDFs (plus a corrupt
    member and a non-PDF member) ingests into DOC_SCHEMA with
    archive/member doc_ids; spans match the local parser; the bad
    members are skipped without poisoning the batch."""
    import zipfile

    from pdf2dom_spark.pdfread import pdf_archive_docs_df, pdf_file_to_row

    arch = tmp_path / "batch-0001.zip"
    with zipfile.ZipFile(arch, "w") as zf:
        for f in ("text-rendering-mode-stroke.pdf", "images.pdf"):
            zf.write(f"{RES}/{f}", f)
        zf.writestr("broken.pdf", b"%PDF-1.4 garbage with no objects")
        zf.writestr("notes.txt", b"not a pdf")
    docs = {d["doc_id"]: d["spans"]
            for d in pdf_archive_docs_df(spark, str(tmp_path)).collect()}
    # broken.pdf parses to zero spans (repair scan yields nothing) or is
    # skipped; the two real members must be present and exact
    for f in ("text-rendering-mode-stroke.pdf", "images.pdf"):
        key = f"batch-0001.zip/{f}"
        assert key in docs
        local = pdf_file_to_row(f"{RES}/{f}")["spans"]
        got = [dict(s.asDict()) for s in docs[key]]
        assert got == local
    assert "batch-0001.zip/notes.txt" not in docs


def test_archive_ingest_tar_gz_and_bare_gz(spark, tmp_path):
    """Container sniffing: tar.gz members and bare .pdf.gz blobs ingest
    through the same pdf_archive_docs_df; a garbage container yields
    nothing."""
    import gzip
    import tarfile

    from pdf2dom_spark.pdfread import pdf_archive_docs_df, pdf_file_to_row

    with tarfile.open(tmp_path / "dump.tar.gz", "w:gz") as tf:
        tf.add(f"{RES}/text-rendering-mode-stroke.pdf",
               arcname="a/stroke.pdf")
        tf.add(f"{RES}/images.pdf", arcname="b/images.pdf")
    with open(f"{RES}/3-page-document.pdf", "rb") as fh:
        (tmp_path / "single.pdf.gz").write_bytes(gzip.compress(fh.read()))
    (tmp_path / "junk.bin").write_bytes(b"\x00\x01garbage")

    docs = {d["doc_id"]: d["spans"]
            for d in pdf_archive_docs_df(spark, str(tmp_path)).collect()}
    assert set(docs) == {"dump.tar.gz/a/stroke.pdf",
                         "dump.tar.gz/b/images.pdf",
                         "single.pdf.gz/member.pdf"}
    local = pdf_file_to_row(f"{RES}/3-page-document.pdf")["spans"]
    got = [dict(s.asDict()) for s in docs["single.pdf.gz/member.pdf"]]
    assert got == local


def test_bfrange_past_unicode_max_is_clamped():
    """ADVICE r4: an adversarial bfrange whose base sits near 0x10FFFF
    must not raise ValueError from chr() past the Unicode ceiling —
    entries beyond the ceiling are dropped, ones below kept."""
    from pdf2dom_spark.pdfread import tounicode_map

    cmap = b"1 beginbfrange\n<41> <48> <DBFFDFFD>\nendbfrange\n"
    m = tounicode_map(cmap)  # base U+10FFFD: only +0..+2 stay valid
    assert m[0x41] == "\U0010FFFD"
    assert m[0x43] == "\U0010FFFF"
    assert 0x44 not in m and 0x48 not in m


def test_bfrange_into_surrogate_block_skips_lone_surrogates():
    """A range crossing U+D800..U+DFFF must not fabricate lone
    surrogates (they poison Arrow/utf-8 encodes downstream)."""
    from pdf2dom_spark.pdfread import tounicode_map

    cmap = b"1 beginbfrange\n<41> <50> <D7FE>\nendbfrange\n"
    m = tounicode_map(cmap)
    assert m[0x41] == "퟾" and m[0x42] == "퟿"
    # 0x43..0x50 would map into D800.. — all skipped
    assert all(c not in m for c in range(0x43, 0x51))


def test_archive_member_size_cap_skips_bombs():
    """ADVICE r4: a zip member whose EXPANDED size exceeds the cap is
    skipped like a corrupt one (no executor OOM from archive bombs);
    normal members around it still ingest."""
    import io
    import zipfile

    from pdf2dom_spark.pdfread import _container_pdf_members

    good = open(f"{RES}/3-page-document.pdf", "rb").read()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("bomb.pdf", b"\x00" * (4 << 20))
        zf.writestr("good.pdf", good)
    members = list(_container_pdf_members(buf.getvalue(), limit=1 << 20))
    assert [n for n, _ in members] == ["good.pdf"]
    assert members[0][1] == good


def test_gzip_bomb_bounded():
    import gzip

    from pdf2dom_spark.pdfread import _container_pdf_members

    bomb = gzip.compress(b"%PDF" + b"\x00" * (8 << 20))
    assert list(_container_pdf_members(bomb, limit=1 << 20)) == []
    ok = gzip.compress(b"%PDF-1.4 tiny")
    got = list(_container_pdf_members(ok, limit=1 << 20))
    assert got == [("member.pdf", b"%PDF-1.4 tiny")]


def test_tar_member_size_cap():
    import io
    import tarfile

    from pdf2dom_spark.pdfread import _container_pdf_members

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        data = b"\x00" * (2 << 20)
        info = tarfile.TarInfo("big.pdf")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
        small = b"%PDF-1.4 ok"
        info2 = tarfile.TarInfo("ok.pdf")
        info2.size = len(small)
        tf.addfile(info2, io.BytesIO(small))
    members = list(_container_pdf_members(buf.getvalue(), limit=1 << 20))
    assert [n for n, _ in members] == ["ok.pdf"]


def test_named_crypt_filter_uses_named_cfm():
    """ADVICE r4: a per-stream /Crypt filter naming a declared CF entry
    decrypts with THAT entry's CFM, not the default StmF method
    (PDF 32000-1 7.4.10). Built V4 file: StmF default AESV2, but one
    stream carries /Crypt /Name /RC4F (an RC4 /V2 CF entry)."""
    from pdf2dom_spark.pdfcrypt import (StdSecurityHandler, _r2r4_file_key,
                                        compute_o, compute_u, rc4)

    id0 = bytes(range(16))
    o = compute_o(b"", None, 4, 128)
    enc = {"Filter": "Standard", "V": 4, "R": 4, "Length": 128,
           "O": o, "P": -4, "EncryptMetadata": True,
           "CF": {"StdCF": {"CFM": "AESV2"}, "RC4F": {"CFM": "V2"}},
           "StmF": "StdCF", "StrF": "StdCF"}
    # derive U for the empty user password so authentication passes
    key = _r2r4_file_key(b"", o, -4, id0, 4, 128, True)
    enc["U"] = compute_u(key, id0, 4)
    h = StdSecurityHandler(enc, id0)
    assert h._stm_cfm == "AESV2"
    # named lookup exposes the non-default entry
    assert h.named_cfm("RC4F") == "V2"
    plain = b"named-filter-stream-payload"
    ciphertext = rc4(h.object_key(7, 0, aes=False), plain)
    # decrypt_stream with the override must use RC4, not AES
    assert h.decrypt_stream(ciphertext, 7, 0, cfm="V2") == plain


# --- image_pixels decode paths beyond 8-bit device spaces -------------------

def _image_pdf(extra: bytes, payload: bytes, w: int, h: int) -> bytes:
    """One-page PDF with a single image XObject built from a raw dict
    fragment — the harness for the Indexed / sub-byte / Decode paths."""
    from pdf2dom_spark.pdfwrite import _obj, _stream_obj

    objs = {
        1: _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        2: _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        3: _obj(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
                   b" /Resources << /XObject << /Im0 4 0 R >> >>"
                   b" /Contents 5 0 R >>"),
        4: _stream_obj(4, b" /Type /XObject /Subtype /Image /Width %d"
                          b" /Height %d %s" % (w, h, extra),
                       payload, compress=False),
        5: _stream_obj(5, b"", b"q %d 0 0 %d 10 10 cm /Im0 Do Q" % (w, h),
                       compress=False),
    }
    out = bytearray(b"%PDF-1.5\n")
    offs = {}
    for n in sorted(objs):
        offs[n] = len(out)
        out += objs[n]
    xa = len(out)
    out += b"xref\n0 6\n0000000000 65535 f \n"
    for n in range(1, 6):
        out += b"%010d 00000 n \n" % offs[n]
    out += b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xa
    return bytes(out)


def _pixels_of(pdf_bytes: bytes):
    import base64

    from pdf2dom_spark.pdfread import pdf_to_spans
    from pdf2dom_spark.raster import decode_png_rgba

    spans = pdf_to_spans(pdf_bytes, image_pixels=True)
    im = next(s for s in spans if s["kind"] == "image")
    if not im["media_ref"].startswith("data:image/png;base64,"):
        return None
    return decode_png_rgba(base64.b64decode(im["media_ref"].split(",", 1)[1]))


def test_pixels_indexed_palette():
    """/Indexed DeviceRGB palette lookup (PDF 32000-1 8.6.6.3) — the
    palette-PNG-in-PDF shape real documents use for screenshots."""
    import numpy as np

    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 17, 34, 51])
    idx = bytes([0, 1, 2, 3, 3, 2, 1, 0])  # 4x2
    pdf = _image_pdf(b"/BitsPerComponent 8 /ColorSpace"
                     b" [/Indexed /DeviceRGB 3 <%s>]"
                     % palette.hex().encode(), idx, 4, 2)
    px = _pixels_of(pdf)
    assert px is not None and px.shape == (2, 4, 4)
    assert tuple(px[0, 0, :3]) == (255, 0, 0)
    assert tuple(px[0, 3, :3]) == (17, 34, 51)
    assert tuple(px[1, 0, :3]) == (17, 34, 51)
    assert tuple(px[1, 3, :3]) == (255, 0, 0)
    assert (px[..., 3] == 255).all()


def test_pixels_1bit_gray_row_padded():
    """1-bit DeviceGray with byte-padded rows (8.9.5.2): 0 -> black,
    1 -> white after the max-value scale."""
    # 10x3: rows pad to 2 bytes; pattern row0 all 1s, row1 all 0s,
    # row2 alternating starting 1
    payload = bytes([0xFF, 0xC0, 0x00, 0x00, 0xAA, 0x80])
    pdf = _image_pdf(b"/BitsPerComponent 1 /ColorSpace /DeviceGray",
                     payload, 10, 3)
    px = _pixels_of(pdf)
    assert px is not None and px.shape == (3, 10, 4)
    assert (px[0, :, 0] == 255).all()
    assert (px[1, :, 0] == 0).all()
    assert list(px[2, :4, 0]) == [255, 0, 255, 0]


def test_pixels_1bit_decode_inverted():
    """/Decode [1 0] flips the gray ramp (scanned-fax polarity)."""
    payload = bytes([0xF0])  # 4x1? use 8x1 row: 11110000
    pdf = _image_pdf(b"/BitsPerComponent 1 /ColorSpace /DeviceGray"
                     b" /Decode [1 0]", payload, 8, 1)
    px = _pixels_of(pdf)
    assert px is not None
    assert list(px[0, :, 0]) == [0, 0, 0, 0, 255, 255, 255, 255]


def test_pixels_4bit_indexed():
    """4-bit Indexed samples pack two indices per byte, row-padded."""
    palette = bytes([0, 0, 0, 255, 255, 255, 200, 100, 50])
    # 3x2 image, indices: row0 = 0,1,2 ; row1 = 2,1,0 -> nibbles
    payload = bytes([0x01, 0x20, 0x21, 0x00])
    pdf = _image_pdf(b"/BitsPerComponent 4 /ColorSpace"
                     b" [/Indexed /DeviceRGB 2 <%s>]"
                     % palette.hex().encode(), payload, 3, 2)
    px = _pixels_of(pdf)
    assert px is not None and px.shape == (2, 3, 4)
    assert tuple(px[0, 2, :3]) == (200, 100, 50)
    assert tuple(px[1, 0, :3]) == (200, 100, 50)
    assert tuple(px[1, 2, :3]) == (0, 0, 0)


def test_pixels_unsupported_stays_sha():
    """An exotic image (16-bit samples) keeps the opaque sha ref."""
    from pdf2dom_spark.pdfread import pdf_to_spans

    pdf = _image_pdf(b"/BitsPerComponent 16 /ColorSpace /DeviceGray",
                     bytes(32), 4, 4)
    spans = pdf_to_spans(pdf, image_pixels=True)
    im = next(s for s in spans if s["kind"] == "image")
    assert im["media_ref"].startswith("sha:")


def test_pixels_smask_alpha_channel():
    """/SMask soft masks become the PNG alpha channel (the reference's
    getImage folds the mask before ImageIO's PNG re-encode)."""
    from pdf2dom_spark.pdfwrite import _obj, _stream_obj

    base = bytes(range(0, 48))            # 4x4 RGB ramp
    mask = bytes([0, 64, 128, 255] * 4)   # 4x4 gray mask
    objs = {
        1: _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        2: _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        3: _obj(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
                   b" /Resources << /XObject << /Im0 4 0 R >> >>"
                   b" /Contents 6 0 R >>"),
        4: _stream_obj(4, b" /Type /XObject /Subtype /Image /Width 4"
                          b" /Height 4 /BitsPerComponent 8"
                          b" /ColorSpace /DeviceRGB /SMask 5 0 R",
                       base, compress=False),
        5: _stream_obj(5, b" /Type /XObject /Subtype /Image /Width 4"
                          b" /Height 4 /BitsPerComponent 8"
                          b" /ColorSpace /DeviceGray",
                       mask, compress=False),
        6: _stream_obj(6, b"", b"q 4 0 0 4 10 10 cm /Im0 Do Q",
                       compress=False),
    }
    out = bytearray(b"%PDF-1.5\n")
    offs = {}
    for n in sorted(objs):
        offs[n] = len(out)
        out += objs[n]
    xa = len(out)
    out += b"xref\n0 7\n0000000000 65535 f \n"
    for n in range(1, 7):
        out += b"%010d 00000 n \n" % offs[n]
    out += (b"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % xa)
    px = _pixels_of(bytes(out))
    assert px is not None and px.shape == (4, 4, 4)
    assert list(px[0, :, 3]) == [0, 64, 128, 255]
    assert tuple(px[0, 0, :3]) == (0, 1, 2)  # base pixels untouched
