"""F2 font payload conversion (FontTable.java:141-256; TestFonts.java:39-53
transposed): SFNT build/validate/normalize, WOFF1 conversion + re-parse."""

from __future__ import annotations

import struct

from pdf2dom_spark import fontbytes as fb


def test_sfnt_build_is_valid_and_carries_name():
    data = fb.build_sfnt("Garamond-Italic")
    assert data[:4] == b"\x00\x01\x00\x00"
    assert fb.sfnt_is_valid(data)
    tables = fb.parse_sfnt(data)
    assert set(tables) == {b"head", b"name"}
    assert struct.unpack(">I", tables[b"head"][12:16])[0] == 0x5F0F3CF5
    assert "Garamond-Italic".encode("utf-16-be") in tables[b"name"]


def test_corrupted_sfnt_detected_and_normalized():
    data = bytearray(fb.build_sfnt("Verdana-Bold"))
    data[-1] ^= 0xFF  # flip a byte inside the name string
    assert not fb.sfnt_is_valid(bytes(data))
    fixed = fb.normalize_sfnt(bytes(data))
    assert fb.sfnt_is_valid(fixed)


def test_woff_roundtrip_preserves_tables():
    """Convert to WOFF, re-parse like FontVerter.readFont (TestFonts.java:
    39-53): the recovered font must be valid and keep the name."""
    sfnt = fb.build_sfnt("EKCFJL+Omsym2")
    woff = fb.sfnt_to_woff(sfnt)
    assert woff[:4] == b"wOFF"
    back = fb.woff_to_sfnt(woff)
    assert fb.sfnt_is_valid(back)
    assert "EKCFJL+Omsym2".encode("utf-16-be") in fb.parse_sfnt(back)[b"name"]
    # original table bytes survive the compression round trip
    assert fb.parse_sfnt(back)[b"name"] == fb.parse_sfnt(sfnt)[b"name"]


def test_convert_entry_dispatch():
    data, mime, ending = fb.convert_entry("Helvetica")
    assert data[:4] == b"\x00\x01\x00\x00" and mime.endswith("truetype")
    assert ending == "otf"
    data, mime, ending = fb.convert_entry("Noto-CID")
    assert data and ending == "ttf"
    data, mime, ending = fb.convert_entry("Bare-CFF")
    assert data[:4] == b"wOFF" and mime == "application/x-font-woff"
    data, mime, ending = fb.convert_entry("OldStyle-T1")
    assert data == b""  # Type1 -> invalid entry, dropped


def test_extraction_embeds_font_payloads():
    from pdf2dom_spark.extract import ExtractConfig, extract_doc

    frag = ("612 792 0 PG BT /Helvetica 12 Tf 1 0 0 1 72 700 Tm (a) Tj "
            "/Bare-CFF 10 Tf 1 0 0 1 72 650 Tm (b) Tj ET")
    spans = [{"kind": "text", "text": frag, "media_ref": None, "offset": 0}]
    rows = extract_doc("f", spans, ExtractConfig(font_payloads=True))
    refs = [r["media_ref"] for r in rows if r["kind"] == "font"]
    assert len(refs) == 2
    assert refs[0].startswith("data:application/x-font-truetype;base64,")
    assert refs[1].startswith("data:application/x-font-woff;base64,")
    # default keeps stable refs
    rows2 = extract_doc("f", spans)
    refs2 = [r["media_ref"] for r in rows2 if r["kind"] == "font"]
    assert refs2 == ["font:Helvetica", "font:Bare-CFF"]
