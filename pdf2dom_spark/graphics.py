"""Layout-event -> span-record conversion for non-text elements.

Reimplements the reference's DOM element builders as record constructors:
  - rectangles with stroke-width compensation
    (``createRectangleElement``, PDFDomTree.java:337-368),
  - orthogonal/slanted line divs (``createLineElement`` PDFDomTree.java:378-397
    + ``HtmlDivLine`` HtmlDivLine.java:24-98),
  - images (``createImageElement``, PDFDomTree.java:421-441) with the three
    resource-handler modes (embed / save-to-dir with de-dup naming / ignore;
    EmbedAsBase64Handler.java:24-31, SaveResourceToDirHandler.java:44-66,
    IgnoreResourceHandler.java:24),
  - rasterized filled non-rect paths (``createPathImage``,
    PDFDomTree.java:399-409) — the raster payload is a deterministic
    content-hash stub (no image libs in this container); geometry follows
    PathDrawer.java:43-136 exactly.
"""

from __future__ import annotations

import math

from .schema import STYLE_FIELDS

# Span records are FIXED-ORDER TUPLES aligned with REC_FIELDS (graphics
# events arrive tens of thousands per graphics-heavy doc; building a
# 20-key dict per event and re-reading it per column was ~25% of the
# single-core kernel on the graphics-heavy profile — tuples + positional
# column gathers are the columnar fast path). extract.py indexes these
# positions; values are unchanged.
REC_FIELDS = ["key", "page_no", "kind", "text", "media_ref",
              *[f"style_{f}" for f in STYLE_FIELDS]]
_R = {c: i for i, c in enumerate(REC_FIELDS)}
_NREC = len(REC_FIELDS)


def make_rec(key, kind, text=None, media_ref=None, page_no=None,
             **styles) -> tuple:
    """Sparse record constructor for the cold paths (fonts, meta)."""
    rec = [None] * _NREC
    rec[0], rec[1], rec[2], rec[3], rec[4] = key, page_no, kind, text, \
        media_ref
    for k, v in styles.items():
        rec[_R[f"style_{k}"]] = v
    return tuple(rec)


def rect_record(ev: tuple) -> tuple:
    """('rect', key, page, x, y, w, h, line_w, stroke, fill, scol, fcol)
    -> REC_FIELDS tuple."""
    _, key, page, x, y, w, h, lw, stroke, fill, scol, fcol = ev
    wcor = lw if stroke else 0.0
    stroke_offset = 0.0 if wcor == 0 else wcor / 2
    w = 1.0 if w - wcor < 0 else w - wcor
    h = 1.0 if h - wcor < 0 else h - wcor
    # order: key page_no kind text media_ref font_family font_size
    # font_weight font_style word_spacing letter_spacing color
    # stroke_color line_height left top width height angle stroke_width
    return (key, page, "rect", None, None,
            None, None, None, None, None, None,
            fcol if fill else None, scol if stroke else None, None,
            x - stroke_offset, y - stroke_offset, w, h,
            None, lw if stroke else None)


def line_record(ev: tuple) -> tuple:
    """('line', key, page, x1, y1, x2, y2, line_w, scol) — HtmlDivLine math."""
    _, key, page, x1, y1, x2, y2, lw, scol = ev
    width = abs(x2 - x1)
    height = abs(y2 - y1)
    horizontal = height < 0.5
    vertical = width < 0.5
    out_h = height if vertical else 0.0
    if vertical:
        out_w = 0.0
    elif horizontal:
        out_w = width
    else:
        try:
            out_w = math.sqrt((x1 - x2) ** 2 + (y1 - y2) ** 2)
        except OverflowError:
            # ~1e308 coordinates from a damaged stream: Python raises
            # where C would yield inf — match the C behavior
            out_w = math.inf
    stroke_w = max(lw, 0.5)  # HtmlDivLine.getLineStrokeWidth (:77-83)
    if horizontal or vertical:
        left = min(x1, x2)
        top = min(y1, y2)
        angle = 0.0
    else:
        left = abs((x2 + x1) / 2) - out_w / 2
        top = abs((y2 + y1) / 2) - (stroke_w + out_h) / 2
        angle = math.degrees(math.atan((y2 - y1) / (x2 - x1)))
    return (key, page, "line", None, None,
            None, None, None, None, None, None,
            None, scol, None,
            left, top, out_w, out_h, angle, stroke_w)


def image_record(ev: tuple, media_ref_out: str | None) -> tuple:
    """('image', key, page, x, y, w, h, media_ref, name, angle) or
    ('pathimg', key, page, x, y, w, h, media_ref). ``angle`` is the
    rotation-only CTM component minus the page rotation
    (rotateImage, PDFBoxTree.java:564-575)."""
    key, page, x, y, w, h = ev[1], ev[2], ev[3], ev[4], ev[5], ev[6]
    angle = ev[9] if len(ev) > 9 else None
    if angle is not None and abs(angle) < 1e-9:
        angle = 0.0
    return (key, page, "image", None, media_ref_out,
            None, None, None, None, None, None,
            None, None, None,
            x, y, w, h, angle, None)


def page_record(ev: tuple) -> tuple:
    """('page', key, page, w, h, rot) — page dims swap for 90/270
    (PDFDomTree.java:278-287)."""
    _, key, page, w, h, rot = ev
    if rot in (90, 270):
        w, h = h, w
    return (key, page, "page", None, None,
            None, None, None, None, None, None,
            None, None, None,
            None, None, w, h, None, None)


class ImageNamer:
    """Save-to-dir filename de-duplication
    (SaveResourceToDirHandler.java:44-66): append an increasing numeric
    suffix until unused."""

    def __init__(self) -> None:
        self._used: set[str] = set()

    def next_name(self, name: str) -> str:
        out, i = name, 0
        while out in self._used:
            i += 1
            out = f"{name}{i}"
        self._used.add(out)
        return out
