"""Per-document extraction driver + the mapInPandas batch kernel.

``extract_doc`` mirrors the reference lifecycle
(``PDFDomTree.writeText``/``createDOM`` -> per-page processing -> endDocument,
PDFDomTree.java:180-217, PDFBoxTree.java:200-210): splice spans to tokens,
interpret, chunk text boxes, convert layout events, then materialize DOM
append order as the ``order`` column (appendChild order = content-stream
order, PDFDomTree.java:222-258).

``extract_batch`` is the Spark-facing generator for
``DataFrame.mapInPandas(extract_batch, SPAN_SCHEMA)`` — columnar all the way;
the only Python-level loop is per *document*, with all high-cardinality work
vectorized in numpy/pandas inside.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd

from . import graphics, textpipe
from .interp import DocInterp, doc_tokens
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


DEFAULT_CONFIG = ExtractConfig()

_FLOAT_STYLE = {"font_size", "word_spacing", "letter_spacing", "line_height",
                "left", "top", "width", "height"}


def extract_doc(doc_id: str, spans: list[dict],
                cfg: ExtractConfig = DEFAULT_CONFIG) -> list[dict]:
    """One document -> ordered span records (flat style_* columns)."""
    tokens = doc_tokens(spans)
    interp = DocInterp(
        start_page=cfg.start_page, end_page=cfg.end_page,
        disable_graphics=cfg.disable_graphics,
        disable_images=cfg.disable_images,
        collect_fonts=cfg.font_handler != "ignore",  # PDFDomTree.java:456-462
    )
    glyphs, events, font_table, end_key, page_flush = interp.run(tokens)

    records: list[dict] = []
    namer = graphics.ImageNamer()
    for ev in events:
        kind = ev[0]
        if kind == "page":
            records.append(graphics.page_record(ev))
        elif kind == "rect":
            records.append(graphics.rect_record(ev))
        elif kind == "line":
            records.append(graphics.line_record(ev))
        elif kind == "image":
            media_ref, name = ev[7], ev[8]
            if cfg.disable_image_data or cfg.image_handler == "ignore":
                # empty src (PDFDomTree.java:435-438, IgnoreResourceHandler)
                out_ref = ""
            elif cfg.image_handler == "dir":
                out_ref = namer.next_name(name)
            else:
                out_ref = media_ref
            records.append(graphics.image_record(ev, out_ref))
        elif kind == "pathimg":
            out_ref = "" if cfg.disable_image_data else ev[7]
            records.append(graphics.image_record(ev, out_ref))

    records.extend(textpipe.boxes_from_glyphs(glyphs, page_flush))

    # endDocument: @font-face per valid table entry (PDFDomTree.java:464-492),
    # skipped entirely under the ignore handler (PDFDomTree.java:456-462)
    if cfg.font_handler != "ignore":
        for i, entry in enumerate(font_table.entries):
            records.append({
                "key": end_key + 1 + i, "page_no": None, "kind": "font",
                "text": entry["used_name"],
                "media_ref": "font:" + entry["name"],
                **{f"style_{f}": None for f in STYLE_FIELDS},
            })

    records.sort(key=lambda r: r["key"])
    out = []
    for order, r in enumerate(records):
        row = {"doc_id": doc_id, "order": order, "kind": r["kind"],
               "text": r.get("text"), "media_ref": r.get("media_ref"),
               "page_no": r.get("page_no"), "part_id": None}
        for f in STYLE_FIELDS:
            row[f"style_{f}"] = r.get(f"style_{f}")
        out.append(row)
    return out


def docs_frame_to_spans(pdf: pd.DataFrame,
                        cfg: ExtractConfig = DEFAULT_CONFIG,
                        part_id: int | None = None) -> pd.DataFrame:
    """A pandas batch of documents -> one flat span frame.

    A ``part_id`` column on the input (deterministic
    ``pmod(xxhash64(doc_id), P)`` computed by pipeline.py) takes precedence
    over the scalar ``part_id`` (TaskContext partition index): lineage must
    be stable across runs/schedulers for checkpoint-resume.
    """
    parts = pdf["part_id"].tolist() if "part_id" in pdf.columns else None
    all_rows: list[dict] = []
    for i, (doc_id, spans) in enumerate(zip(pdf["doc_id"], pdf["spans"])):
        if isinstance(spans, np.ndarray):
            spans = list(spans)
        rows = extract_doc(str(doc_id), spans, cfg)
        if parts is not None:
            p = int(parts[i])
            for r in rows:
                r["part_id"] = p
        all_rows.extend(rows)
    out = pd.DataFrame(all_rows, columns=SPAN_FLAT_COLUMNS)
    if len(out) == 0:
        out = pd.DataFrame({c: [] for c in SPAN_FLAT_COLUMNS})
    if part_id is not None:
        out["part_id"] = part_id
    # float32 style columns (reference float fidelity)
    for f in STYLE_FIELDS:
        col = f"style_{f}"
        if f in _FLOAT_STYLE:
            out[col] = out[col].astype(np.float32)
    out["order"] = out["order"].astype(np.int32)
    out["page_no"] = out["page_no"].astype("Int32")
    out["part_id"] = out["part_id"].astype("Int32")
    return out


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
