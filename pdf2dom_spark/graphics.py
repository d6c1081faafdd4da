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


def rect_record(ev: tuple) -> dict:
    """('rect', key, page, x, y, w, h, line_w, stroke, fill, scol, fcol)"""
    _, key, page, x, y, w, h, lw, stroke, fill, scol, fcol = ev
    wcor = lw if stroke else 0.0
    stroke_offset = 0.0 if wcor == 0 else wcor / 2
    w = 1.0 if w - wcor < 0 else w - wcor
    h = 1.0 if h - wcor < 0 else h - wcor
    return {
        "key": key, "page_no": page, "kind": "rect", "text": None,
        "media_ref": None,
        "style_left": x - stroke_offset, "style_top": y - stroke_offset,
        "style_width": w, "style_height": h,
        "style_stroke_color": scol if stroke else None,
        "style_color": fcol if fill else None,
        "style_stroke_width": lw if stroke else None,
        "style_angle": None,
        "style_line_height": None, "style_font_family": None,
        "style_font_size": None, "style_font_weight": None,
        "style_font_style": None, "style_word_spacing": None,
        "style_letter_spacing": None,
    }


def line_record(ev: tuple) -> dict:
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
    return {
        "key": key, "page_no": page, "kind": "line", "text": None,
        "media_ref": None,
        "style_left": left, "style_top": top,
        "style_width": out_w, "style_height": out_h,
        "style_stroke_color": scol, "style_color": None,
        "style_stroke_width": stroke_w, "style_angle": angle,
        "style_line_height": None, "style_font_family": None,
        "style_font_size": None, "style_font_weight": None,
        "style_font_style": None, "style_word_spacing": None,
        "style_letter_spacing": None,
    }


def image_record(ev: tuple, media_ref_out: str | None) -> dict:
    """('image', key, page, x, y, w, h, media_ref, name, angle) or
    ('pathimg', key, page, x, y, w, h, media_ref). ``angle`` is the
    rotation-only CTM component minus the page rotation
    (rotateImage, PDFBoxTree.java:564-575)."""
    key, page, x, y, w, h = ev[1], ev[2], ev[3], ev[4], ev[5], ev[6]
    angle = ev[9] if len(ev) > 9 else None
    if angle is not None and abs(angle) < 1e-9:
        angle = 0.0
    return {
        "key": key, "page_no": page, "kind": "image", "text": None,
        "media_ref": media_ref_out,
        "style_left": x, "style_top": y,
        "style_width": w, "style_height": h,
        "style_stroke_color": None, "style_color": None,
        "style_stroke_width": None, "style_angle": angle,
        "style_line_height": None, "style_font_family": None,
        "style_font_size": None, "style_font_weight": None,
        "style_font_style": None, "style_word_spacing": None,
        "style_letter_spacing": None,
    }


def page_record(ev: tuple) -> dict:
    """('page', key, page, w, h, rot) — page dims swap for 90/270
    (PDFDomTree.java:278-287)."""
    _, key, page, w, h, rot = ev
    if rot in (90, 270):
        w, h = h, w
    return {
        "key": key, "page_no": page, "kind": "page", "text": None,
        "media_ref": None,
        "style_left": None, "style_top": None,
        "style_width": w, "style_height": h,
        "style_stroke_color": None, "style_color": None,
        "style_stroke_width": None, "style_angle": None,
        "style_line_height": None, "style_font_family": None,
        "style_font_size": None, "style_font_weight": None,
        "style_font_style": None, "style_word_spacing": None,
        "style_letter_spacing": None,
    }


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
