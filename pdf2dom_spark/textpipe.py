"""Vectorized text-box pipeline: glyph frame -> text-box spans.

Reimplements the reference's mutable-accumulator chunking
(``processTextPosition`` PDFBoxTree.java:592-656, ``finishBox``
PDFBoxTree.java:661-679, ``TextMetrics`` TextMetrics.java:15-55) as the
gaps-and-islands pattern over a columnar glyph frame: lagged comparisons
produce a boolean ``split`` flag, its cumulative sum is the box id, and box
finalization is a segmented groupby-aggregate — exactly the shape Spark's
window + hash-agg would give, executed here in pandas/numpy inside the
Arrow UDF.

Rules, with the reference's exact constants:
  - whitespace glyphs are dropped entirely (PDFBoxTree.java:599) — they never
    reach the text buffer, so explicit space glyphs split words into separate
    boxes whenever the space advance exceeds 1pt;
  - pending diacritic merges into the following base glyph that contains it
    (PDFBoxTree.java:595-605);
  - split iff ``lastText == null || distx > 1.0 || distx < -6.0 ||
    |disty| > 1.0 || RTL-flip`` with ``distx = x - (last.x + last.width)``,
    ``disty = y - last.y`` (PDFBoxTree.java:623-633);
  - additional split when the 8-field style identity changes
    (PDFBoxTree.java:635-637; equality BoxStyle.java:366-405 — color,
    strokeColor, fontFamily, fontSize(=getXScale), fontStyle, fontWeight,
    letterSpacing, wordSpacing; NOT position/lineHeight);
  - page end forces a flush (PDFBoxTree.java:208) but does NOT refresh
    ``curstyle`` when the next glyph would not otherwise split — the new box
    inherits the stale previous style (mirrored bug-for-bug);
  - finishBox: concat glyphs, reverse when the first buffered char is RTL
    (PDFBoxTree.java:666-669), left = metrics.x, top = baseline - max ascent
    (with bbox fallback when ascent == 0, TextMetrics.java:41-47),
    line-height = bottom - top (TextMetrics.java:134-136), width telescopes
    to ``last.x + last.width - first.x`` (TextMetrics.java:30).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import fonts as fontmod

# BoxStyle identity fields (BoxStyle.java:366-405); font_size == getXScale
# (PDFBoxTree.java:713).
STYLE_ID_NUM = ["xscale", "word_spacing", "letter_spacing"]
STYLE_ID_STR = ["color", "stroke_color", "font_family", "font_weight", "font_style"]


def merge_diacritics(gl: pd.DataFrame) -> pd.DataFrame:
    """Pending-diacritic merge (PDFBoxTree.java:595-605).

    The diacritic precedes its base glyph in the stream; it merges into the
    next non-whitespace glyph when horizontally contained in it. Whitespace
    glyphs in between keep the diacritic pending; a second diacritic
    replaces the first.
    """
    if not gl["is_dia"].any():
        return gl[~gl["is_ws"]].reset_index(drop=True)
    sub = gl[gl["is_dia"] | ~gl["is_ws"]].reset_index(drop=True)
    prev_dia = sub["is_dia"].shift(fill_value=False)
    # containment: diacritic x-center within [x, x+width] of the base
    dia_center = (sub["x"] + sub["width"] / 2).shift()
    contains = (dia_center >= sub["x"]) & (dia_center <= sub["x"] + sub["width"])
    merge = prev_dia & ~sub["is_dia"] & contains
    if merge.any():
        dia_char = sub["unicode"].shift()
        sub.loc[merge, "unicode"] = sub.loc[merge, "unicode"] + dia_char[merge]
    return sub[~sub["is_dia"]].reset_index(drop=True)


def boxes_from_glyphs(glyphs: dict, page_flush: dict[int, int]) -> list[dict]:
    """Glyph frame -> list of text-box records
    ``{key, page_no, text, style fields...}``."""
    if len(glyphs["key"]) == 0:
        return []
    gl = pd.DataFrame(glyphs)
    gl = merge_diacritics(gl)
    if len(gl) == 0:
        return []

    x = gl["x"].to_numpy(dtype=np.float64)
    y = gl["y"].to_numpy(dtype=np.float64)
    w = gl["width"].to_numpy(dtype=np.float64)
    rtl = gl["rtl"].to_numpy(dtype=bool)
    page = gl["page_no"].to_numpy()

    # T1: geometric split (float32 arithmetic like the reference)
    distx = (x - np.roll(x + w, 1)).astype(np.float32)
    disty = (y - np.roll(y, 1)).astype(np.float32)
    split = (distx > 1.0) | (distx < -6.0) | (np.abs(disty) > 1.0)
    split |= rtl != np.roll(rtl, 1)
    # T2: style-identity split
    for c in STYLE_ID_NUM:
        v = gl[c].to_numpy(dtype=np.float32)
        split |= v != np.roll(v, 1)
    for c in STYLE_ID_STR:
        v = gl[c].to_numpy(dtype=object)
        split |= v != np.roll(v, 1)
    split[0] = True  # lastText == null

    page_changed = page != np.roll(page, 1)
    page_changed[0] = False
    start = split | page_changed
    inherit = page_changed & ~split  # stale-curstyle case

    box_id = np.cumsum(start) - 1
    gl["box_id"] = box_id
    gl["_inherit"] = inherit

    firsts = gl.groupby("box_id", sort=True).first()
    lasts = gl.groupby("box_id", sort=True).last()
    agg = gl.groupby("box_id", sort=True).agg(
        ascent=("ascent", "max"),
        descent=("descent", "min"),
        text=("unicode", lambda s: "".join(s)),
    )

    # emission key: the next box's start glyph if it is on the same page,
    # else this page's end-of-stream flush (PDFBoxTree.java:639-644,208)
    start_keys = firsts["key"].to_numpy()
    pages = firsts["page_no"].to_numpy()
    next_key = np.roll(start_keys, -1)
    next_page = np.roll(pages, -1)
    flush_keys = np.array([page_flush.get(int(p), 2**62) for p in pages])
    emit = np.where(
        (np.arange(len(pages)) < len(pages) - 1) & (next_page == pages),
        next_key, flush_keys,
    )

    # finishBox geometry (TextMetrics.java:28-55)
    bx = firsts["x"].to_numpy(dtype=np.float64)
    baseline = firsts["y"].to_numpy(dtype=np.float64)
    bwidth = lasts["x"].to_numpy() + lasts["width"].to_numpy() - bx
    ascent = agg["ascent"].to_numpy(dtype=np.float64)
    descent = agg["descent"].to_numpy(dtype=np.float64)
    # bbox fallback when ascent/descent == 0 (TextMetrics.java:41-55);
    # synthetic fonts always have nonzero metrics but mirror the branch
    ys_first = firsts["yscale"].to_numpy(dtype=np.float64)
    bbox_asc = fontmod.BBOX_ASCENT / 1000.0 * ys_first
    bbox_desc = fontmod.BBOX_DESCENT / 1000.0 * ys_first
    top = np.where(ascent != 0, baseline - ascent, baseline - bbox_asc)
    bottom = np.where(descent != 0, baseline - descent, baseline - bbox_desc)
    line_height = bottom - top

    # RTL reverse by the first buffered char (PDFBoxTree.java:666-669)
    texts = agg["text"].to_numpy(dtype=object)
    out_texts = [
        t[::-1] if t and _is_rtl_first(t) else t for t in texts
    ]

    # style columns from the first glyph; stale-style inheritance via ffill
    style = firsts[["font_family", "font_weight", "font_style", "xscale",
                    "word_spacing", "letter_spacing", "color",
                    "stroke_color", "_inherit"]].copy()
    if style["_inherit"].any():
        mask = style["_inherit"].to_numpy(dtype=bool)
        cols = ["font_family", "font_weight", "font_style", "xscale",
                "word_spacing", "letter_spacing", "color", "stroke_color"]
        style.loc[mask, cols] = np.nan
        style[cols] = style[cols].ffill()

    records = []
    for i in range(len(firsts)):
        records.append({
            "key": int(emit[i]),
            "page_no": int(pages[i]),
            "kind": "text",
            "text": out_texts[i],
            "media_ref": None,
            "style_font_family": style["font_family"].iloc[i],
            "style_font_size": float(style["xscale"].iloc[i]),
            "style_font_weight": style["font_weight"].iloc[i],
            "style_font_style": style["font_style"].iloc[i],
            "style_word_spacing": float(style["word_spacing"].iloc[i]),
            "style_letter_spacing": float(style["letter_spacing"].iloc[i]),
            "style_color": style["color"].iloc[i],
            "style_stroke_color": style["stroke_color"].iloc[i],
            "style_line_height": float(line_height[i]),
            "style_left": float(bx[i]),
            "style_top": float(top[i]),
            "style_width": float(bwidth[i]),
            "style_height": None,
        })
    return records


def _is_rtl_first(t: str) -> bool:
    import unicodedata
    return unicodedata.bidirectional(t[0]) in {"R", "AL", "RLE", "RLO"}
