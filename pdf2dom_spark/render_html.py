"""Optional HTML rendering of span sequences — the reference's DOM/serializer
path (PDFDomTree.createDocument:118-143, startNewPage/renderText/renderPath/
renderImage:222-258, element builders:266-441, createGlobalStyle:447-492,
BoxStyle.toString/CSS serialization BoxStyle.java:88-150) re-expressed as a
per-document aggregation over ordered span rows.

Span equality does not require HTML; this exists to close the sink-side
operator surface (S6/O1-O7, M8 length formatting, M9 CSS serialization) and
is exercised by structural golden tests (the reference's Jsoup-style
assertions).

Spark-side: ``render_html_df`` groups spans by doc_id and applies the pure
renderer per document (``applyInPandas`` — one small group per doc)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

TRANSPARENT = "rgba(0,0,0,0)"
DEFAULT_COLOR = "#000000"       # BoxStyle.defaultColor (BoxStyle.java:28)

# PDFDomTree.defaultStyle (PDFDomTree.java:56-62)
DEFAULT_STYLE = (
    ".page{position:relative; border:1px solid blue;margin:0.5em}\n"
    ".p,.r{position:absolute;}\n"
    ".p{white-space:nowrap;}\n"
    "@supports(-webkit-text-stroke: 1px black) {.p{text-shadow:none !important;}}"
)


def fmt_len(v: float) -> str:
    """BoxStyle.formatLength (BoxStyle.java:132-136): Java Float.toString
    semantics (shortest round-trip float32 repr) + unit."""
    f32 = np.float32(v)
    s = np.format_float_positional(f32, unique=True, trim="0")
    return s + "pt"


def _esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;"))


def _stroke_css(color: str) -> str:
    """BoxStyle.createTextStrokeCss (BoxStyle.java:138-150)."""
    return ("-webkit-text-stroke: %c% 1px ;text-shadow:"
            "-1px -1px 0 %c%, 1px -1px 0 %c%,"
            "-1px 1px 0 %c%, 1px 1px 0 %c%;").replace("%c%", color)


def text_css(r: dict) -> str:
    """BoxStyle.toString (BoxStyle.java:88-114) + width from
    createTextElement (PDFDomTree.java:303-312)."""
    out = []
    out.append(f"top:{fmt_len(r['style_top'])};")
    out.append(f"left:{fmt_len(r['style_left'])};")
    out.append(f"line-height:{fmt_len(r['style_line_height'])};")
    if r.get("style_font_family"):
        out.append(f"font-family:{r['style_font_family']};")
    if r.get("style_font_size"):
        out.append(f"font-size:{fmt_len(r['style_font_size'])};")
    if r.get("style_font_weight") and r["style_font_weight"] != "normal":
        out.append(f"font-weight:{r['style_font_weight']};")
    if r.get("style_font_style") and r["style_font_style"] != "normal":
        out.append(f"font-style:{r['style_font_style']};")
    if r.get("style_word_spacing"):
        out.append(f"word-spacing:{fmt_len(r['style_word_spacing'])};")
    if r.get("style_letter_spacing"):
        out.append(f"letter-spacing:{fmt_len(r['style_letter_spacing'])};")
    if r.get("style_color") and r["style_color"] != DEFAULT_COLOR:
        out.append(f"color:{r['style_color']};")
    sc = r.get("style_stroke_color")
    if sc and sc != TRANSPARENT:
        out.append(_stroke_css(sc))
    out.append(f"width:{fmt_len(r['style_width'])};")
    return "".join(out)


def font_face_css(family: str, url: str) -> str:
    """createFontFace @font-face rule (PDFDomTree.java:473-492): the
    font-table used_name as font-family, the handler's resource ref as
    src — one rule per registered font, emitted into the global style."""
    return f'@font-face {{font-family:"{family}";src:url(\'{url}\');}}'


def render_doc_html(rows: list[dict], title: str = "PDF Document") -> str:
    """Ordered span records (one document) -> XHTML string."""
    # document-info title overrides the default when non-blank
    # (endDocument, PDFDomTree.java:165-174)
    for r in rows:
        if r["kind"] == "meta" and r.get("media_ref") == "title":
            t = (r.get("text") or "").strip()
            if t:
                title = r["text"]
            break
    pages: list[str] = []
    cur: list[str] | None = None
    font_faces: list[str] = []
    pagecnt = textcnt = 0
    for r in rows:
        kind = r["kind"]
        if kind == "page":
            if cur is not None:
                pages.append("".join(cur) + "</div>\n")
            pstyle = (f"width:{fmt_len(r['style_width'])};"
                      f"height:{fmt_len(r['style_height'])};overflow:hidden;")
            cur = [f'<div id="page_{pagecnt}" class="page" style="{pstyle}">\n']
            pagecnt += 1
        elif kind == "text":
            if cur is None:
                continue
            cur.append(f'<div id="p{textcnt}" class="p" style="{text_css(r)}">'
                       f"{_esc(r['text'] or '')}</div>\n")
            textcnt += 1
        elif kind == "rect":
            # createRectangleElement (PDFDomTree.java:337-368)
            st = [f"left:{fmt_len(r['style_left'])};",
                  f"top:{fmt_len(r['style_top'])};",
                  f"width:{fmt_len(r['style_width'])};",
                  f"height:{fmt_len(r['style_height'])};"]
            if r.get("style_stroke_color"):
                st.append(f"border:{fmt_len(r['style_stroke_width'])} solid "
                          f"{r['style_stroke_color']};")
            if r.get("style_color"):
                st.append(f"background-color:{r['style_color']};")
            if cur is not None:
                cur.append(f'<div class="r" style="{"".join(st)}">&nbsp;</div>\n')
        elif kind == "line":
            # createLineElement (PDFDomTree.java:378-397)
            vertical = (r.get("style_width") or 0) == 0
            side = "border-right" if vertical else "border-bottom"
            st = [f"left:{fmt_len(r['style_left'])};",
                  f"top:{fmt_len(r['style_top'])};",
                  f"width:{fmt_len(r['style_width'])};",
                  f"height:{fmt_len(r['style_height'])};",
                  f"{side}:{fmt_len(r['style_stroke_width'])} solid "
                  f"{r['style_stroke_color']};"]
            if r.get("style_angle"):
                st.append(f"transform:rotate({r['style_angle']}deg);")
            if cur is not None:
                cur.append(f'<div class="r" style="{"".join(st)}">&nbsp;</div>\n')
        elif kind == "image":
            st = (f"position:absolute;left:{fmt_len(r['style_left'])};"
                  f"top:{fmt_len(r['style_top'])};"
                  f"width:{fmt_len(r['style_width'])};"
                  f"height:{fmt_len(r['style_height'])};")
            src = r.get("media_ref") or ""
            if cur is not None:
                cur.append(f'<img style="{st}" src="{_esc(src)}"/>\n')
        elif kind == "font":
            font_faces.append(font_face_css(r["text"], r["media_ref"]))
    if cur is not None:
        pages.append("".join(cur) + "</div>\n")

    global_style = "\n".join(font_faces) + "\n" + DEFAULT_STYLE
    return (
        '<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.1//EN" '
        '"http://www.w3.org/TR/xhtml11/DTD/xhtml11.dtd">\n'
        '<html xmlns="http://www.w3.org/1999/xhtml">\n<head>\n'
        '<meta http-equiv="content-type" content="text/html;charset=utf-8"/>\n'
        f"<title>{_esc(title)}</title>\n"
        f'<style type="text/css">{global_style}</style>\n'
        "</head>\n<body>\n" + "".join(pages) + "</body>\n</html>\n"
    )


HTML_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("html", T.StringType(), False),
])


def render_html_df(spans: DataFrame) -> DataFrame:
    """Flat span rows -> (doc_id, html), one row per document."""

    def render_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("order")
        rows = pdf.to_dict("records")
        for r in rows:
            for k, v in r.items():
                if isinstance(v, float) and np.isnan(v):
                    r[k] = None
        return pd.DataFrame({
            "doc_id": [str(pdf["doc_id"].iloc[0])],
            "html": [render_doc_html(rows)],
        })

    return spans.groupBy("doc_id").applyInPandas(render_group, HTML_SCHEMA)
