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
                compress: bool = True) -> bytes:
    if compress:
        data = zlib.compress(data)
        extra += b" /Filter /FlateDecode"
    head = b"<< /Length %d%s >>" % (len(data), extra)
    return (b"%d 0 obj\n" % num + head + b"\nstream\n" + data
            + b"\nendstream\nendobj\n")


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
