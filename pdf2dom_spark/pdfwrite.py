"""Minimal PDF writer: render the oracle corpus as REAL PDF files.

The file-level twin of ``corpus.oracle_stream``: for a given (doc_id,
text) this emits an actual PDF (classic xref, FlateDecode content
streams, image XObjects, /Mono Type1 font) whose content streams are
token-for-token the fragments the synthetic generator produces — so

    pdfread.pdf_to_spans(oracle_pdf_bytes(d, t))
        ==  corpus.oracle_stream(d, t)        (span-for-span)

and extraction of the real file is BIT-EQUAL to the synthetic path,
which is itself value-hash-gated against the closed-form DuckDB oracle
(queries.extract_spans_oracle). That transitively puts the whole
file -> xref -> inflate -> tokenize -> extract chain under the
cross-engine gate (tests/test_realpdf.py::test_written_oracle_pdf_*).

Trick for media refs: the kernel's image media_ref is
``sha:md5(<raw stream bytes>)``; the synthetic corpus uses
``sha:md5("{doc_id}:{page}")``. The writer stores exactly those bytes as
the (opaque, unfiltered) image payload, so the refs agree by
construction.

The writer is also the generator for real-file ingest benchmarks: a
directory of these PDFs drives ``job.py --input-pdfs`` at any scale.
"""

from __future__ import annotations

import zlib

from .corpus import ORACLE_FONT, PAGE_H, PAGE_W, oracle_stream


def _obj(num: int, body: bytes) -> bytes:
    return b"%d 0 obj\n" % num + body + b"\nendobj\n"


def _stream_obj(num: int, extra: bytes, data: bytes,
                compress: bool = True, enc=None) -> bytes:
    if compress:
        data = zlib.compress(data)
        extra += b" /Filter /FlateDecode"
    if enc is not None:
        # encryption applies to the STORED bytes, after filters encode
        # (the reader decrypts before inflating — PDF 32000-1 7.6.2)
        data = enc(num, data)
    head = b"<< /Length %d%s >>" % (len(data), extra)
    return (b"%d 0 obj\n" % num + head + b"\nstream\n" + data
            + b"\nendstream\nendobj\n")


class _Encryptor:
    """Encrypt-direction standard security handler for the writer:
    RC4-128 /R 3 with the given user/owner passwords (empty by default —
    the kind of file PDFBox and this repo's reader open with no
    password). Reuses pdfcrypt's spec algorithms; per-object keys via
    Algorithm 1."""

    def __init__(self, file_id: bytes, user_pwd: bytes = b"",
                 owner_pwd: bytes | None = None):
        from .pdfcrypt import _r2r4_file_key, compute_o, compute_u
        self.id0 = file_id
        self.o = compute_o(user_pwd, owner_pwd, 3, 128)
        self.key = _r2r4_file_key(user_pwd, self.o, -1, file_id, 3, 128,
                                  True)
        self.u = compute_u(self.key, self.id0, 3)

    def __call__(self, num: int, data: bytes) -> bytes:
        import hashlib
        import struct

        from .pdfcrypt import rc4
        h = hashlib.md5(self.key + struct.pack("<I", num)[:3] + b"\x00\x00")
        return rc4(h.digest()[: min(len(self.key) + 5, 16)], data)

    def encrypt_obj(self, num: int) -> bytes:
        return (b"<< /Filter /Standard /V 2 /R 3 /Length 128 /P -1 /O <"
                + self.o.hex().encode() + b"> /U <"
                + self.u.hex().encode() + b"> >>")


def oracle_pdf_bytes(doc_id: str, text: str) -> bytes:
    """One oracle-corpus document as a complete real PDF file."""
    spans = oracle_stream(doc_id, text)
    pg_header = f"{PAGE_W:g} {PAGE_H:g} 0 PG "
    # regroup the interleaved spans into per-page (content, image) pairs:
    # the oracle layout is a strict [text(frags..cm), image, text(Q)]
    # triple per page, with the PG header opening each text span
    pages: list[tuple[str, tuple | None]] = []
    cur: list[str] = []
    img: tuple | None = None

    def flush() -> None:
        nonlocal cur, img
        if cur or img is not None:
            pages.append((" ".join(cur), img))
        cur, img = [], None

    for sp in sorted(spans, key=lambda s: s["offset"]):
        if sp["kind"] == "image":
            w, h, name = sp["text"].split()
            # payload chosen so sha:md5(payload) == the synthetic ref
            img = (int(w), int(h), name,
                   f"{doc_id}:{len(pages) + 1}".encode())
            cur.append(f"/{name} Do")
        else:
            t = sp["text"]
            if t.startswith(pg_header):
                flush()
                t = t[len(pg_header):]
            cur.append(t)
    flush()

    objs: dict[int, bytes] = {}
    nxt = 3  # 1 = catalog, 2 = pages
    font_num = nxt
    nxt += 1
    objs[font_num] = _obj(font_num, b"<< /Type /Font /Subtype /Type1 "
                          b"/BaseFont /" + ORACLE_FONT.encode() + b" >>")

    kid_nums: list[int] = []
    for content, image in pages:
        res = b"/Font << /" + ORACLE_FONT.encode() + b" %d 0 R >>" % font_num
        if image is not None:
            w, h, name, payload = image
            img_num = nxt
            nxt += 1
            objs[img_num] = _stream_obj(
                img_num,
                b" /Type /XObject /Subtype /Image /Width %d /Height %d "
                b"/BitsPerComponent 8 /ColorSpace /DeviceGray"
                % (w, h), payload, compress=False)
            res += b" /XObject << /" + name.encode() + b" %d 0 R >>" % img_num
        cont_num = nxt
        nxt += 1
        page_num = nxt
        nxt += 1
        objs[cont_num] = _stream_obj(cont_num, b"",
                                     content.encode("latin-1"))
        objs[page_num] = _obj(
            page_num,
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
            b"/Resources << %s >> /Contents %d 0 R >>"
            % (int(PAGE_W), int(PAGE_H), res, cont_num))
        kid_nums.append(page_num)

    objs[1] = _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    objs[2] = _obj(
        2, b"<< /Type /Pages /Count %d /Kids [%s] >>"
        % (len(kid_nums), b" ".join(b"%d 0 R" % k for k in kid_nums)))

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += objs[num]
    xref_at = len(out)
    maxnum = max(objs)
    out += b"xref\n0 %d\n" % (maxnum + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, maxnum + 1):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (maxnum + 1, xref_at))
    return bytes(out)


def write_oracle_pdf_dir(sf_dir: str, out_dir: str,
                         limit: int | None = None) -> int:
    """Materialize the sf corpus as real .pdf files (ingest-bench input)."""
    import os

    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    q = f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    if limit:
        q += f" LIMIT {limit}"
    n = 0
    for doc_id, text in duckdb.sql(q).fetchall():
        with open(os.path.join(out_dir, f"{doc_id}.pdf"), "wb") as fh:
            fh.write(oracle_pdf_bytes(str(doc_id), text))
        n += 1
    return n


def spans_to_pdf(doc_id: str, spans: list[dict],
                 payload_for=None, encrypt: bool = False,
                 user_pwd: bytes = b"",
                 owner_pwd: bytes | None = None) -> bytes:
    """Generic DOC_SCHEMA spans -> a real PDF file. Handles the full
    synthetic-corpus surface: multi-fragment pages, page rotations (PG
    header -> /Rotate), kind='rect' fragments (plain content), image
    spans (-> image XObjects spliced as ``/Name Do``), form definitions
    (-> Form XObjects in page resources), and the meta title (-> /Info).

    ``payload_for(media_ref, page_no) -> bytes`` chooses image payload
    bytes; default is the media_ref string itself (NOTE: the reader then
    derives ``sha:md5(payload)`` which only matches the original ref when
    the caller can invert it — oracle_pdf_bytes does; rich refs are
    truncated hashes, so rich round-trips compare modulo media_ref)."""
    import re as _re

    enc = None
    if encrypt:
        import hashlib
        enc = _Encryptor(hashlib.md5(doc_id.encode()).digest(),
                         user_pwd, owner_pwd)
    payload_for = payload_for or (lambda ref, p: (ref or "").encode())
    pg_re = _re.compile(r"^([\d.]+) ([\d.]+) (\d+) PG ")

    pages: list[dict] = []
    forms: list[tuple[str, str]] = []
    title: str | None = None
    cur: dict | None = None
    for sp in sorted(spans, key=lambda s: s["offset"]):
        kind = sp["kind"]
        if kind == "meta":
            if sp.get("media_ref") == "title":
                title = sp.get("text") or ""
            continue
        if kind == "form":
            name = (sp.get("media_ref") or "")
            name = name[5:] if name.startswith("form:") else name
            forms.append((name, sp.get("text") or ""))
            continue
        if kind == "image":
            w, h, name = (sp.get("text") or "1 1 Img").split()[:3]
            if cur is None:
                cur = {"w": PAGE_W, "h": PAGE_H, "rot": 0, "frags": [],
                       "images": []}
                pages.append(cur)
            cur["images"].append((int(float(w)), int(float(h)), name,
                                  payload_for(sp.get("media_ref"),
                                              len(pages))))
            cur["frags"].append(f"/{name} Do")
            continue
        # text / rect: content fragments, possibly opening a page
        t = sp.get("text") or ""
        m = pg_re.match(t)
        if m:
            cur = {"w": float(m.group(1)), "h": float(m.group(2)),
                   "rot": int(m.group(3)), "frags": [], "images": []}
            pages.append(cur)
            t = t[m.end():]
        if cur is None:
            cur = {"w": PAGE_W, "h": PAGE_H, "rot": 0, "frags": [],
                   "images": []}
            pages.append(cur)
        if t:
            cur["frags"].append(t)

    objs: dict[int, bytes] = {}
    nxt = 3  # 1 = catalog, 2 = pages
    form_nums: list[tuple[str, int]] = []
    for name, body in forms:
        num = nxt
        nxt += 1
        objs[num] = _stream_obj(
            num, b" /Type /XObject /Subtype /Form /BBox [0 0 %d %d]"
            % (int(PAGE_W), int(PAGE_H)), body.encode("latin-1"), enc=enc)
        form_nums.append((name, num))

    kid_nums: list[int] = []
    for pg in pages:
        xobjs: list[tuple[str, int]] = list(form_nums)
        for w, h, name, payload in pg["images"]:
            num = nxt
            nxt += 1
            objs[num] = _stream_obj(
                num, b" /Type /XObject /Subtype /Image /Width %d "
                b"/Height %d /BitsPerComponent 8 /ColorSpace /DeviceGray"
                % (w, h), payload, compress=False, enc=enc)
            xobjs.append((name, num))
        res = b""
        if xobjs:
            res = (b"/XObject << "
                   + b" ".join(b"/%s %d 0 R" % (n.encode(), x)
                               for n, x in xobjs) + b" >>")
        cont_num = nxt
        nxt += 1
        page_num = nxt
        nxt += 1
        objs[cont_num] = _stream_obj(
            cont_num, b"", " ".join(pg["frags"]).encode("latin-1"), enc=enc)
        rot = b" /Rotate %d" % pg["rot"] if pg["rot"] else b""
        objs[page_num] = _obj(
            page_num,
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d]%s "
            b"/Resources << %s >> /Contents %d 0 R >>"
            % (int(pg["w"]), int(pg["h"]), rot, res, cont_num))
        kid_nums.append(page_num)

    info_num = None
    if title:
        info_num = nxt
        nxt += 1
        if enc is not None:
            ct = enc(info_num, title.encode("latin-1"))
            objs[info_num] = _obj(info_num, b"<< /Title <%s> >>"
                                  % ct.hex().encode())
        else:
            esc = title.replace("\\", r"\\").replace("(", r"\(") \
                .replace(")", r"\)")
            objs[info_num] = _obj(info_num, b"<< /Title (%s) >>"
                                  % esc.encode("latin-1"))

    enc_num = None
    if enc is not None:
        enc_num = nxt
        nxt += 1
        objs[enc_num] = _obj(enc_num, enc.encrypt_obj(enc_num))
    objs[1] = _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    objs[2] = _obj(
        2, b"<< /Type /Pages /Count %d /Kids [%s] >>"
        % (len(kid_nums), b" ".join(b"%d 0 R" % k for k in kid_nums)))

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += objs[num]
    xref_at = len(out)
    maxnum = max(objs)
    out += b"xref\n0 %d\n" % (maxnum + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, maxnum + 1):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    trailer = b"<< /Size %d /Root 1 0 R" % (maxnum + 1)
    if info_num:
        trailer += b" /Info %d 0 R" % info_num
    if enc_num:
        trailer += (b" /Encrypt %d 0 R /ID [<%s> <%s>]"
                    % (enc_num, enc.id0.hex().encode(),
                       enc.id0.hex().encode()))
    trailer += b" >>"
    out += (b"trailer\n" + trailer + b"\nstartxref\n%d\n%%%%EOF\n"
            % xref_at)
    return bytes(out)


def rich_pdf_bytes(doc_id: str, text: str) -> bytes:
    """One rich-corpus document (rotations, forms, rects, images, title)
    as a real PDF file."""
    from .corpus import rich_stream

    return spans_to_pdf(doc_id, rich_stream(doc_id, text))


def dct_image_pdf_bytes(jpeg: bytes, w: int, h: int,
                        ncomp: int = 1) -> bytes:
    """Minimal one-page PDF embedding a baseline JPEG as a DCTDecode
    image XObject — the file shape real scanned/web PDFs use for
    photos. Drives the reference-parity DCT path end to end: file ->
    xref -> image XObject -> jpegdec decode -> PNG re-encode
    (ImageResource.java:38-51 semantics) under pdf_to_spans(
    image_pixels=True)."""
    cs = b"/DeviceRGB" if ncomp == 3 else b"/DeviceGray"
    objs: dict[int, bytes] = {}
    objs[1] = _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    objs[2] = _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    objs[3] = _obj(
        3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /XObject << /ImJ 4 0 R >> >> /Contents 5 0 R >>")
    objs[4] = _stream_obj(
        4, b" /Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/BitsPerComponent 8 /ColorSpace %s /Filter /DCTDecode"
        % (w, h, cs), jpeg, compress=False)
    content = b"q %d 0 0 %d 36 360 cm /ImJ Do Q" % (w, h)
    objs[5] = _stream_obj(5, b"", content, compress=False)
    out = bytearray(b"%PDF-1.5\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += objs[num]
    xref_at = len(out)
    out += b"xref\n0 6\n0000000000 65535 f \n"
    for num in range(1, 6):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % xref_at)
    return bytes(out)
