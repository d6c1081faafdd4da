"""Font payload load/convert (F2) — FontTable.Entry.getData transposed
(FontTable.java:141-256).

The reference pulls embedded font programs out of the PDF and runs them
through FontVerter: TrueType is normalized, Type0-with-TTF-descendant is
converted to OpenType, bare CFF (FontFile3) is converted to WOFF1, Type1
returns empty (the entry becomes invalid and is dropped). This container has
no font programs and no FontVerter, so the payloads are SYNTHETIC but the
FORMAT work is real:

  - ``build_sfnt`` emits a minimal valid SFNT (TrueType) binary — real
    offset table, per-table checksums, and head.checkSumAdjustment
    (0xB1B0AFBA - file checksum), with the font name carried in a spec-shaped
    ``name`` table (format 0, platform 3/1/0x409, nameID 4, UTF-16BE);
  - ``normalize_sfnt`` re-computes checksums when invalid — the
    ``font.isValid() || font.normalize()`` step (FontTable.java:241-256);
  - ``sfnt_to_woff`` performs a REAL WOFF1 conversion per the W3C WOFF 1.0
    spec: 44-byte header, 20-byte table directory entries, per-table zlib
    compression (kept only when smaller), 4-byte alignment;
  - ``woff_to_sfnt`` re-parses the WOFF back to SFNT — the transposition of
    TestFonts.java:39-53 (convert, then FontVerter.readFont the result).

Dispatch mirrors Entry.getData: TrueType -> normalized SFNT
(application/x-font-truetype, 'otf'); Type0/CID -> OpenType-converted SFNT
('ttf'); '-CFF' names (FontFile3 analog) -> WOFF1
(application/x-font-woff); Type1 -> empty payload -> entry invalid.
"""

from __future__ import annotations

import functools
import struct
import zlib

from . import fonts

_HEAD_MAGIC = 0x5F0F3CF5
_CHECKSUM_ADJ = 0xB1B0AFBA


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _table_checksum(b: bytes) -> int:
    b = _pad4(b)
    return sum(struct.unpack(f">{len(b) // 4}I", b)) & 0xFFFFFFFF


def _head_table(units_per_em: int = 1000) -> bytes:
    # version 1.0, fontRevision 1.0, checkSumAdjustment 0 (fixed up later),
    # magic, flags, unitsPerEm, created/modified, bbox, macStyle,
    # lowestRecPPEM, directionHint, indexToLocFormat, glyphDataFormat
    return struct.pack(
        ">IIIIHHQQhhhhHHhhh",
        0x00010000, 0x00010000, 0, _HEAD_MAGIC, 0, units_per_em,
        0, 0, 0, -200, 500, 800, 0, 8, 2, 0, 0)


def _name_table(font_name: str) -> bytes:
    s = font_name.encode("utf-16-be")
    # format 0, count 1, stringOffset 18; record: platform 3, encoding 1,
    # language 0x409, nameID 4 (full font name)
    return (struct.pack(">HHH", 0, 1, 18)
            + struct.pack(">HHHHHH", 3, 1, 0x409, 4, len(s), 0) + s)


def build_sfnt_from_tables(tables: list[tuple[bytes, bytes]],
                           flavor: int = 0x00010000) -> bytes:
    """Arbitrary {tag: data} tables -> valid SFNT: spec binary-search
    header fields, per-table checksums, head.checkSumAdjustment
    (0xB1B0AFBA - file checksum) when a head table is present. Works over
    REAL font binaries' tables, not just the synthetic head+name pair."""
    tables = sorted(tables, key=lambda t: t[0])
    n = len(tables)
    entry_selector = max(0, n.bit_length() - 1)
    search_range = (1 << entry_selector) * 16
    header = struct.pack(">IHHHH", flavor, n, search_range,
                         entry_selector, n * 16 - search_range)
    offset = len(header) + 16 * n
    records = b""
    body = b""
    head_offset = None
    for tag, data in tables:
        if tag == b"head":
            head_offset = offset
            # zero the stored adjustment before checksumming (spec)
            data = data[:8] + b"\x00" * 4 + data[12:]
        records += struct.pack(">4sIII", tag, _table_checksum(data), offset,
                               len(data))
        body += _pad4(data)
        offset += len(_pad4(data))
    font = bytearray(header + records + body)
    if head_offset is not None:
        # head.checkSumAdjustment = 0xB1B0AFBA - checksum(font with adj=0)
        total = _table_checksum(bytes(font))
        adj = (_CHECKSUM_ADJ - total) & 0xFFFFFFFF
        struct.pack_into(">I", font, head_offset + 8, adj)
    return bytes(font)


def build_sfnt(font_name: str, units_per_em: int = 1000) -> bytes:
    """Minimal valid SFNT with correct checksums and checkSumAdjustment."""
    return build_sfnt_from_tables([(b"head", _head_table(units_per_em)),
                                   (b"name", _name_table(font_name))])


def parse_sfnt(data: bytes) -> dict[bytes, bytes]:
    """SFNT -> {tag: table bytes} (unpadded)."""
    (version, n) = struct.unpack(">IH", data[:6])
    out: dict[bytes, bytes] = {}
    for i in range(n):
        tag, _cks, off, length = struct.unpack(
            ">4sIII", data[12 + 16 * i:28 + 16 * i])
        out[tag] = data[off:off + length]
    return out


def sfnt_is_valid(data: bytes) -> bool:
    """Per-table checksums + whole-file checkSumAdjustment verification."""
    try:
        (version, n) = struct.unpack(">IH", data[:6])
        if version not in (0x00010000, 0x4F54544F):
            return False
        head_off = None
        for i in range(n):
            tag, cks, off, length = struct.unpack(
                ">4sIII", data[12 + 16 * i:28 + 16 * i])
            tbl = data[off:off + length]
            if tag == b"head":
                head_off = off
                if struct.unpack(">I", tbl[12:16])[0] != _HEAD_MAGIC:
                    return False
                tbl = tbl[:8] + b"\x00" * 4 + tbl[12:]  # adj zeroed for cks
            if _table_checksum(tbl) != cks:
                return False
        if head_off is None:
            return False
        zeroed = (data[:head_off + 8] + b"\x00" * 4 + data[head_off + 12:])
        adj = struct.unpack(">I", data[head_off + 8:head_off + 12])[0]
        return adj == (_CHECKSUM_ADJ - _table_checksum(zeroed)) & 0xFFFFFFFF
    except Exception:
        return False


def normalize_sfnt(data: bytes) -> bytes:
    """Rebuild with recomputed checksums (tryNormalizeFVFont analog):
    LOSSLESS over every table — a real font's glyf/loca/cmap/... survive
    with their bytes intact; only directory checksums and the head
    adjustment are recomputed."""
    flavor = struct.unpack(">I", data[:4])[0]
    tables = parse_sfnt(data)
    return build_sfnt_from_tables(list(tables.items()), flavor=flavor)


def sfnt_to_woff(data: bytes) -> bytes:
    """SFNT -> WOFF 1.0 (W3C spec): zlib per table when smaller, 4-aligned."""
    (flavor, n) = struct.unpack(">IH", data[:6])
    entries = []
    for i in range(n):
        tag, cks, off, length = struct.unpack(
            ">4sIII", data[12 + 16 * i:28 + 16 * i])
        orig = data[off:off + length]
        comp = zlib.compress(orig, 9)
        if len(comp) >= len(orig):
            comp = orig
        entries.append((tag, cks, orig, comp))
    header_len = 44 + 20 * n
    offset = header_len
    dir_bytes = b""
    body = b""
    for tag, cks, orig, comp in entries:
        dir_bytes += struct.pack(">4sIIII", tag, offset, len(comp),
                                 len(orig), cks)
        body += _pad4(comp)
        offset += len(_pad4(comp))
    total_sfnt = 12 + 16 * n + sum(len(_pad4(o)) for _, _, o, _ in entries)
    header = struct.pack(
        ">4sIIHHIHHIIIII", b"wOFF", flavor, header_len + len(body), n, 0,
        total_sfnt, 1, 0, 0, 0, 0, 0, 0)
    return header + dir_bytes + body


def woff_to_sfnt(data: bytes) -> bytes:
    """WOFF 1.0 -> SFNT (FontVerter.readFont-style re-parse for tests)."""
    sig, flavor, _length, n = struct.unpack(">4sIIH", data[:14])
    if sig != b"wOFF":
        raise ValueError("not a WOFF file")
    tables: list[tuple[bytes, bytes]] = []
    for i in range(n):
        tag, off, clen, olen, _cks = struct.unpack(
            ">4sIIII", data[44 + 20 * i:64 + 20 * i])
        blob = data[off:off + clen]
        orig = zlib.decompress(blob) if clen < olen else blob
        if len(orig) != olen:
            raise ValueError(f"table {tag!r} length mismatch")
        tables.append((tag, orig))
    # rebuild a canonical SFNT from ALL recovered tables (lossless —
    # a real TrueType survives the WOFF round trip byte-preserved per
    # table, TestFonts.java:39-53's FontVerter.readFont re-parse)
    return build_sfnt_from_tables(tables, flavor=flavor)


def wrap_cff(cff: bytes, font_name: str) -> bytes:
    """Bare CFF (FontFile3) -> OTTO-flavor SFNT carrying the REAL CFF
    program as its ``CFF `` table (FontVerter's bare-CFF -> OpenType
    step, FontTable.java:205-213), plus spec-shaped head/name."""
    return build_sfnt_from_tables(
        [(b"CFF ", cff), (b"head", _head_table()),
         (b"name", _name_table(font_name))],
        flavor=0x4F54544F)  # 'OTTO'


def cff_to_woff(cff: bytes, font_name: str) -> bytes:
    """Real bare-CFF -> WOFF1 (the FontFile3 conversion the reference runs
    through FontVerter on /fonts/bare-cff.pdf, TestFonts.java:30-54)."""
    return sfnt_to_woff(wrap_cff(cff, font_name))


def convert_program(kind: str, program: bytes,
                    font_name: str) -> tuple[bytes, str, str]:
    """Entry.getData dispatch over a REAL embedded font program
    (FontTable.java:141-256 handing actual FontFile/2/3 bytes to
    FontVerter): returns (data, mime, file_ending); empty data = invalid
    entry, dropped.

    - Type1 -> empty (loadType1Font path, entry dropped);
    - TrueType -> normalized SFNT when checksums are stale
      (font.isValid() || normalize), x-font-truetype/'otf';
    - Type1C (bare CFF, FontFile3) -> OTTO-wrapped WOFF1, x-font-woff;
    - CIDFontType0C (Type0's CFF descendant) -> OTTO SFNT, 'ttf' (the
      Type0 convertToOpenType branch);
    - OpenType FontFile3 -> passthrough."""
    if kind == "Type1":
        return b"", "", ""
    if kind == "TrueType":
        data = program if sfnt_is_valid(program) else normalize_sfnt(program)
        return data, "application/x-font-truetype", "otf"
    if kind == "Type1C":
        return cff_to_woff(program, font_name), "application/x-font-woff", \
            "woff"
    if kind == "CIDFontType0C":
        return wrap_cff(program, font_name), "application/x-font-truetype", \
            "ttf"
    if kind == "OpenType":
        return program, "application/x-font-truetype", "otf"
    return b"", "", ""


@functools.lru_cache(maxsize=4096)
def convert_entry(font_name: str) -> tuple[bytes, str, str]:
    """Entry.getData dispatch (FontTable.java:141-256) over the synthetic
    payload model: returns (data, mime, file_ending); empty data means the
    entry is invalid and dropped (isEntryValid)."""
    ftype, subtype = fonts.font_type(font_name)
    if ftype == "Type1":
        return b"", "", ""  # loadType1Font -> empty -> dropped
    if font_name.endswith("-CFF"):
        # FontFile3 / bare CFF analog -> WOFF1 conversion
        sfnt = build_sfnt(font_name)
        return sfnt_to_woff(sfnt), "application/x-font-woff", "woff"
    sfnt = build_sfnt(font_name)
    if not sfnt_is_valid(sfnt):  # normalize-if-invalid step
        sfnt = normalize_sfnt(sfnt)
    ending = "ttf" if ftype == "Type0" else "otf"
    return sfnt, "application/x-font-truetype", ending
