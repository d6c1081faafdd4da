"""Per-document extraction driver + the mapInPandas batch kernel.

``extract_doc_columnar`` mirrors the reference lifecycle
(``PDFDomTree.writeText``/``createDOM`` -> per-page processing -> endDocument,
PDFDomTree.java:180-217, PDFBoxTree.java:200-210): splice spans to tokens,
interpret, chunk text boxes, convert layout events, then materialize DOM
append order as the ``order`` column (appendChild order = content-stream
order, PDFDomTree.java:222-258). Assembly is columnar end-to-end: the only
Python-level loops are per *document* and per *layout event* (tens per doc);
all glyph/box work is numpy.

``extract_batch`` is the Spark-facing generator for
``DataFrame.mapInPandas(extract_batch, SPAN_SCHEMA)``.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd

from . import graphics, textpipe
from .interp import (DocInterp, doc_cid2_fonts, doc_cmaps,
                     doc_tokens, doc_vmetrics, doc_widths)
from .schema import SPAN_FLAT_COLUMNS, STYLE_FIELDS


@dataclass
class ExtractConfig:
    """PDFDomTreeConfig analog (reference defaults: embed-as-base64 for both
    handlers, PDFDomTreeConfig.java:32-38; page range open,
    PDFBoxTree.java:188-197)."""
    start_page: int = 0
    end_page: int = 2**31 - 1
    disable_graphics: bool = False
    disable_images: bool = False
    disable_image_data: bool = False
    image_handler: str = "embed"   # embed | dir | ignore
    font_handler: str = "embed"    # embed | dir | ignore
    # G11 filled-path raster: True embeds a real PNG data URI (PathDrawer
    # transposition, pure numpy+zlib); False keeps the deterministic
    # content-hash ref the cross-engine oracles rely on
    raster_paths: bool = False
    # F2 font bytes: True converts the synthetic font payload (SFNT build /
    # normalize / WOFF1 for CFF — fontbytes.py) and embeds it as a data URI;
    # False keeps the stable "font:<name>" ref
    font_payloads: bool = False


DEFAULT_CONFIG = ExtractConfig()

_FLOAT_STYLE = {"font_size", "word_spacing", "letter_spacing", "line_height",
                "left", "top", "width", "height", "angle", "stroke_width"}
_STYLE_COLS = [f"style_{f}" for f in STYLE_FIELDS]
_REC_COLS = ["key", "page_no", "kind", "text", "media_ref", *_STYLE_COLS]
_NUM_REC_COLS = {"page_no"} | {f"style_{f}" for f in _FLOAT_STYLE}
# records are fixed-order tuples (graphics.REC_FIELDS == _REC_COLS)
_REC_IDX = {c: i for i, c in enumerate(_REC_COLS)}
assert graphics.REC_FIELDS == _REC_COLS


def extract_doc_columnar(doc_id: str, spans: list[dict],
                         cfg: ExtractConfig = DEFAULT_CONFIG,
                         page_offset: int = 0,
                         font_seed: list[str] | None = None,
                         emit_fonts: bool = True) -> dict:
    """One document -> columnar span arrays (with dense ``order``).

    ``page_offset``/``font_seed``/``emit_fonts`` serve the page-split path
    (pagesplit.py): a page-group numbers its pages from the offset, seeds the
    font table with earlier groups' fonts, and only the last group emits the
    document's font spans."""
    tokens = doc_tokens(spans)
    interp = DocInterp(
        start_page=cfg.start_page, end_page=cfg.end_page,
        disable_graphics=cfg.disable_graphics,
        disable_images=cfg.disable_images,
        collect_fonts=cfg.font_handler != "ignore",  # PDFDomTree.java:456-462
        page_offset=page_offset, font_seed=font_seed,
        raster_paths=cfg.raster_paths,
        cmaps=doc_cmaps(spans),
        cid2_fonts=doc_cid2_fonts(spans),
        widths=doc_widths(spans),
        vmetrics=doc_vmetrics(spans),
    )
    glyphs, events, font_table, end_key, page_flush = interp.run(tokens)

    records: list[dict] = []
    namer = graphics.ImageNamer()
    # Save-to-dir filename base: bitmap images are named by the DOCUMENT
    # TITLE (ImageResource(getTitle(), ...), PDFBoxTree.java:554,952-958 —
    # null/empty falls back to "PDF Document"), never by the XObject
    # resource name. Path images share the same handler instance under the
    # fixed name "PathImage" (PathDrawer.java:71, PDFDomTree.java:399-433),
    # so both kinds de-dup through ONE namer in append order.
    img_name_base = "PDF Document"
    for sp in spans:
        if sp.get("kind") == "meta" and sp.get("media_ref") == "title":
            if sp.get("text"):
                img_name_base = sp["text"]
            break
    for ev in events:
        kind = ev[0]
        if kind == "page":
            records.append(graphics.page_record(ev))
        elif kind == "rect":
            records.append(graphics.rect_record(ev))
        elif kind == "line":
            records.append(graphics.line_record(ev))
        elif kind == "image":
            media_ref = ev[7]
            if cfg.disable_image_data or cfg.image_handler == "ignore":
                # empty src (PDFDomTree.java:435-438, IgnoreResourceHandler)
                out_ref = ""
            elif cfg.image_handler == "dir":
                # reference resourcePath = name + '.' + fileEnding
                # (SaveResourceToDirHandler.java:50-51; images are PNG)
                out_ref = namer.next_name(img_name_base) + ".png"
            else:
                out_ref = media_ref
            records.append(graphics.image_record(ev, out_ref))
        elif kind == "pathimg":
            if cfg.disable_image_data or cfg.image_handler == "ignore":
                out_ref = ""
            elif cfg.image_handler == "dir":
                out_ref = namer.next_name("PathImage") + ".png"
            else:
                out_ref = ev[7]
            records.append(graphics.image_record(ev, out_ref))

    # endDocument: @font-face per valid table entry (PDFDomTree.java:464-492),
    # skipped entirely under the ignore handler (PDFDomTree.java:456-462)
    if cfg.font_handler != "ignore" and emit_fonts:
        if cfg.font_payloads or cfg.font_handler == "dir":
            import base64
            from .fontbytes import convert_entry, convert_program

            # REAL embedded programs (kind='fontfile' spans from the PDF
            # reader) take precedence over the synthetic name-keyed model:
            # the @font-face payload is then the document's own converted
            # binary (FontTable.Entry.getData on actual FontFile bytes)
            real_progs: dict[str, tuple[str, bytes]] = {}
            for sp in spans:
                if sp.get("kind") != "fontfile":
                    continue
                nm = (sp.get("media_ref") or "")
                nm = nm[9:] if nm.startswith("fontfile:") else nm
                kindp, _, b64 = (sp.get("text") or "").partition(";")
                if nm not in real_progs and b64:
                    real_progs[nm] = (kindp, base64.b64decode(b64))

            def payload(name: str) -> tuple[bytes, str, str]:
                hit = real_progs.get(name)
                if hit is not None:
                    return convert_program(hit[0], hit[1], name)
                return convert_entry(name)
        # fonts go through their OWN handler instance (setFontHandler), so
        # their de-dup namespace is separate from the image namer's
        # (SaveResourceToDirHandler.writtenFileNames is per-instance)
        font_namer = graphics.ImageNamer()
        for i, entry in enumerate(font_table.entries):
            if cfg.font_handler == "dir":
                # SaveResourceToDirHandler: url points at <name>.<ending>
                # in the extract dir (TestFonts.java save-to-dir asserts);
                # the base is the RAW font name (FontTable.Entry passes
                # fontName to super — FontTable.java:131-134), de-duped
                # like any other saved resource
                data, mime, ending = payload(entry["name"])
                if not data:
                    continue
                ref = f"{font_namer.next_name(entry['name'])}.{ending}"
            elif cfg.font_payloads:
                data, mime, _ending = payload(entry["name"])
                if not data:
                    continue  # isEntryValid false -> dropped
                ref = (f"data:{mime};base64,"
                       + base64.b64encode(data).decode("ascii"))
            else:
                ref = "font:" + entry["name"]
            records.append(graphics.make_rec(
                end_key + 1 + i, "font", text=entry["used_name"],
                media_ref=ref))

    # document-info title (endDocument, PDFDomTree.java:165-174): a 'meta'
    # span models PDDocumentInformation; surfaced as a trailing record only
    # when non-blank (the reference keeps the default title otherwise)
    if emit_fonts:
        for sp in spans:
            if sp.get("kind") == "meta" and sp.get("media_ref") == "title":
                t = (sp.get("text") or "").strip()
                if t:
                    records.append(graphics.make_rec(
                        end_key + 1 + len(font_table.entries) + 1, "meta",
                        text=sp.get("text"), media_ref="title"))
                break

    boxes = textpipe.boxes_from_glyphs(glyphs, page_flush)
    nb = len(boxes["key"])
    ne = len(records)
    cols: dict[str, np.ndarray] = {}
    for c in _REC_COLS:
        if c == "key":
            continue
        bx_arr = boxes.get(c)
        j = _REC_IDX[c]
        if c in _NUM_REC_COLS:
            ev_arr = np.array(
                [np.nan if r[j] is None else float(r[j]) for r in records],
                dtype=np.float64)
            if bx_arr is None:
                bx_arr = np.full(nb, np.nan)
            cols[c] = np.concatenate((ev_arr, np.asarray(bx_arr, dtype=np.float64)))
        else:
            ev_arr = np.array([r[j] for r in records], dtype=object)
            if bx_arr is None:
                bx_arr = np.full(nb, None, dtype=object)
            cols[c] = np.concatenate((ev_arr, bx_arr))

    ev_keys = np.array([r[0] for r in records], dtype=np.int64)
    keys = np.concatenate((ev_keys, np.asarray(boxes["key"], dtype=np.int64)))
    order = np.argsort(keys, kind="stable")
    out = {c: cols[c][order] for c in _REC_COLS if c != "key"}
    out["order"] = np.arange(ne + nb, dtype=np.int32)
    return out


def extract_doc(doc_id: str, spans: list[dict],
                cfg: ExtractConfig = DEFAULT_CONFIG) -> list[dict]:
    """Test-facing wrapper: ordered span records as a list of dicts."""
    cols = extract_doc_columnar(doc_id, spans, cfg)
    n = len(cols["order"])
    rows = []
    for i in range(n):
        row = {"doc_id": doc_id, "part_id": None}
        for c, arr in cols.items():
            v = arr[i]
            if isinstance(v, (np.floating, np.integer)):
                v = v.item()
            if isinstance(v, float) and np.isnan(v):
                v = None
            row[c] = v
        rows.append(row)
    return rows


def docs_frame_to_spans(pdf: pd.DataFrame,
                        cfg: ExtractConfig = DEFAULT_CONFIG,
                        part_id: int | None = None,
                        page_offset: int = 0,
                        font_seed: list[str] | None = None,
                        emit_fonts: bool = True) -> pd.DataFrame:
    """A pandas batch of documents -> one flat span frame (columnar concat).

    A ``part_id`` column on the input (deterministic
    ``pmod(xxhash64(doc_id), P)`` computed by pipeline.py) takes precedence
    over the scalar ``part_id`` (TaskContext partition index): lineage must
    be stable across runs/schedulers for checkpoint-resume.
    """
    parts = pdf["part_id"].tolist() if "part_id" in pdf.columns else None
    per_doc: list[dict] = []
    doc_ids: list[str] = []
    doc_parts: list = []
    for i, (doc_id, spans) in enumerate(zip(pdf["doc_id"], pdf["spans"])):
        if isinstance(spans, np.ndarray):
            spans = list(spans)
        cols = extract_doc_columnar(str(doc_id), spans, cfg,
                                    page_offset=page_offset,
                                    font_seed=font_seed,
                                    emit_fonts=emit_fonts)
        per_doc.append(cols)
        doc_ids.append(str(doc_id))
        doc_parts.append(int(parts[i]) if parts is not None else part_id)

    return assemble_flat(per_doc, doc_ids, doc_parts)


def assemble_flat(per_doc: list[dict], doc_ids: list[str],
                  doc_parts: list) -> pd.DataFrame:
    """Per-document columnar arrays -> ONE flat pandas frame with the
    SPAN_FLAT schema dtypes (shared by the batch kernel and the page-split
    group kernel)."""
    if not per_doc:
        return pd.DataFrame({c: [] for c in SPAN_FLAT_COLUMNS})

    lens = [len(c["order"]) for c in per_doc]
    data: dict[str, np.ndarray] = {}
    data["doc_id"] = np.repeat(np.array(doc_ids, dtype=object), lens)
    pid_arr = np.repeat(np.array(doc_parts, dtype=object), lens)
    data["part_id"] = pid_arr
    for c in per_doc[0]:
        data[c] = np.concatenate([d[c] for d in per_doc])

    out = pd.DataFrame(data, columns=SPAN_FLAT_COLUMNS)
    # float32 style columns (reference float fidelity)
    for f in STYLE_FIELDS:
        col = f"style_{f}"
        if f in _FLOAT_STYLE:
            out[col] = pd.to_numeric(out[col], errors="coerce").astype(np.float32)
    out["order"] = out["order"].astype(np.int32)
    out["page_no"] = pd.to_numeric(out["page_no"], errors="coerce").astype("Int32")
    out["part_id"] = pd.to_numeric(out["part_id"], errors="coerce").astype("Int32")
    return out


def docs_to_arrow_spans(doc_ids, spans_col, parts, cfg: ExtractConfig):
    """Columnar core for the mapInArrow path: python lists in ->
    pyarrow arrays out (skips pandas block consolidation entirely)."""
    import pyarrow as pa

    per_doc: list[dict] = []
    lens: list[int] = []
    for doc_id, spans in zip(doc_ids, spans_col):
        cols = extract_doc_columnar(str(doc_id), spans, cfg)
        per_doc.append(cols)
        lens.append(len(cols["order"]))

    n = sum(lens)
    if n == 0:
        schema = _arrow_schema()
        return pa.RecordBatch.from_arrays(
            [pa.array([], type=f.type) for f in schema], schema=schema)

    did = np.repeat(np.array([str(d) for d in doc_ids], dtype=object), lens)
    pid = np.repeat(np.asarray(parts, dtype=np.int64), lens)
    arrays = {
        "doc_id": pa.array(did, type=pa.string()),
        "order": pa.array(np.concatenate([d["order"] for d in per_doc]),
                          type=pa.int32()),
        "part_id": pa.array(pid, type=pa.int32()),
    }
    for c in _REC_COLS:
        if c == "key":
            continue
        merged = np.concatenate([d[c] for d in per_doc])
        if c in _NUM_REC_COLS:
            if c == "page_no":
                arrays[c] = pa.array(merged, type=pa.int32(), from_pandas=True)
            else:
                arrays[c] = pa.array(merged.astype(np.float32),
                                     type=pa.float32(), from_pandas=True)
        else:
            arrays[c] = pa.array(merged, type=pa.string(), from_pandas=True)
    schema = _arrow_schema()
    return pa.RecordBatch.from_arrays(
        [arrays[f.name] for f in schema], schema=schema)


def _arrow_schema():
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    from .schema import SPAN_FLAT_SCHEMA

    return to_arrow_schema(SPAN_FLAT_SCHEMA)


def make_extract_arrow(cfg: ExtractConfig = DEFAULT_CONFIG):
    """mapInArrow kernel: pyarrow batches in/out, flat schema."""

    def extract_arrow(batches):
        import pyarrow as pa  # noqa: F401
        try:
            from pyspark import TaskContext
            tc = TaskContext.get()
            pid = tc.partitionId() if tc is not None else -1
        except Exception:  # pragma: no cover
            pid = -1
        for b in batches:
            names = b.schema.names
            doc_ids = b.column(names.index("doc_id")).to_pylist()
            spans_col = b.column(names.index("spans")).to_pylist()
            if "part_id" in names:
                parts = b.column(names.index("part_id")).to_pylist()
            else:
                parts = [pid] * len(doc_ids)
            yield docs_to_arrow_spans(doc_ids, spans_col, parts, cfg)

    return extract_arrow


def make_extract_batch(cfg: ExtractConfig = DEFAULT_CONFIG, nested: bool = True):
    """Build the mapInPandas kernel. ``nested=True`` emits the ``style``
    struct column (SPAN_SCHEMA); ``nested=False`` keeps flat style_* columns
    (SPAN_FLAT_SCHEMA) for SQL-oracle comparison."""

    def extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from pyspark import TaskContext
            tc = TaskContext.get()
            pid = tc.partitionId() if tc is not None else None
        except Exception:  # pragma: no cover - non-Spark context
            pid = None
        for pdf in batches:
            scalar_pid = None if "part_id" in pdf.columns else pid
            flat = docs_frame_to_spans(pdf, cfg, part_id=scalar_pid)
            if nested:
                style_cols = {f: flat[f"style_{f}"].tolist() for f in STYLE_FIELDS}
                style = pd.Series(
                    [
                        {f: style_cols[f][i] for f in STYLE_FIELDS}
                        for i in range(len(flat))
                    ],
                    dtype=object,
                )
                out = flat[["doc_id", "order", "kind", "text", "media_ref"]].copy()
                out["style"] = style
                out["page_no"] = flat["page_no"]
                out["part_id"] = flat["part_id"]
                yield out
            else:
                yield flat

    return extract_batch
