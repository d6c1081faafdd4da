"""Property-based tests (hypothesis): random content streams must never
crash the kernel and must satisfy structural invariants; metamorphic
properties pin the geometry semantics."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf2dom_spark.extract import extract_doc

PG = "612 792 0 PG "

_word = st.text(alphabet=string.ascii_letters + string.digits, min_size=1,
                max_size=8)
_num = st.floats(min_value=-1000, max_value=1000, allow_nan=False,
                 allow_infinity=False).map(lambda v: round(v, 2))


@st.composite
def _fragment(draw):
    ops = []
    n = draw(st.integers(1, 12))
    for _ in range(n):
        kind = draw(st.integers(0, 7))
        if kind == 0:
            x, y = draw(_num), draw(_num)
            ops.append(f"1 0 0 1 {x} {y} Tm ({draw(_word)}) Tj")
        elif kind == 1:
            ops.append(f"/{draw(_word)} {draw(st.integers(4, 30))} Tf")
        elif kind == 2:
            r = draw(st.floats(0, 1)); g = draw(st.floats(0, 1))
            ops.append(f"{r:.3f} {g:.3f} 0.5 rg")
        elif kind == 3:
            x, y, w, h = (draw(_num) for _ in range(4))
            ops.append(f"{x} {y} {abs(w)} {abs(h)} re f")
        elif kind == 4:
            ops.append(f"{draw(_num)} {draw(_num)} m {draw(_num)} {draw(_num)} l S")
        elif kind == 5:
            ops.append("q 2 0 0 2 10 10 cm")
        elif kind == 6:
            ops.append("Q")
        elif kind == 7:
            # full-scanner surface: hex show, nested parens, comment,
            # dict operand, unknown operator
            w = draw(_word)
            ops.append(draw(st.sampled_from([
                f"<{w.encode().hex()}> Tj",
                f"(a({w})b) Tj",
                f"% noise {w}\n({w}) Tj",
                f"/OC << /T /{w} >> BDC ({w}) Tj EMC",
                f"{draw(st.integers(0, 9))} zz9 ({w}) Tj",
            ])))
    return " ".join(ops)


@st.composite
def _doc(draw):
    n_pages = draw(st.integers(1, 3))
    frags = []
    for _ in range(n_pages):
        frags.append(PG + "BT " + draw(_fragment()) + " ET")
    return [{"kind": "text", "text": " ".join(frags), "media_ref": None,
             "offset": 0}]


@settings(max_examples=60, deadline=None)
@given(_doc())
def test_random_streams_invariants(spans):
    rows = extract_doc("prop", spans)
    # dense, zero-based, strictly ordered `order`
    orders = [r["order"] for r in rows]
    assert orders == list(range(len(rows)))
    kinds = {r["kind"] for r in rows}
    assert kinds <= {"page", "text", "rect", "line", "image", "font"}
    # every text box is non-empty (whitespace never enters the buffer)
    for r in rows:
        if r["kind"] == "text":
            assert r["text"] and r["text"].strip() == r["text"]
        if r["kind"] == "page":
            assert r["style_width"] == 612.0
    # page spans appear in increasing page order
    pages = [r["page_no"] for r in rows if r["kind"] == "page"]
    assert pages == sorted(pages)


@settings(max_examples=30, deadline=None)
@given(st.lists(_word, min_size=1, max_size=20),
       st.integers(-200, 200))
def test_translation_invariance(words, dx):
    """Shifting every Tm x by dx shifts box lefts by dx and changes nothing
    else (split decisions depend only on relative distances —
    PDFBoxTree.java:623-633)."""
    def mk(shift):
        frag = PG + "BT /Mono 10 Tf " + " ".join(
            f"1 0 0 1 {100 + shift + 60 * i} 700 Tm ({w}) Tj"
            for i, w in enumerate(words)) + " ET"
        return [{"kind": "text", "text": frag, "media_ref": None, "offset": 0}]
    a = extract_doc("a", mk(0))
    b = extract_doc("b", mk(dx))
    ta = [r for r in a if r["kind"] == "text"]
    tb = [r for r in b if r["kind"] == "text"]
    assert [r["text"] for r in ta] == [r["text"] for r in tb]
    for ra, rb in zip(ta, tb):
        assert abs((rb["style_left"] - ra["style_left"]) - dx) < 1e-6
        assert rb["style_top"] == ra["style_top"]
        assert rb["style_width"] == ra["style_width"]


@settings(max_examples=30, deadline=None)
@given(st.integers(2, 40), st.integers(6, 24))
def test_scale_homogeneity(n_chars, fs):
    """Box width scales linearly with font size for mono text; lineHeight
    equals fontsize (ascent 0.8 + |descent| 0.2)."""
    word = "a" * n_chars
    frag = PG + f"BT /Mono {fs} Tf 1 0 0 1 72 700 Tm ({word}) Tj ET"
    rows = extract_doc("s", [{"kind": "text", "text": frag,
                              "media_ref": None, "offset": 0}])
    box = [r for r in rows if r["kind"] == "text"][0]
    assert abs(box["style_width"] - 0.5 * fs * n_chars) < 1e-6
    assert abs(box["style_line_height"] - fs) < 1e-6


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(_word, st.integers(0, 1)), min_size=1, max_size=15))
def test_box_count_equals_split_count(pairs):
    """Alternate tight (0.5pt) and wide (5pt) gaps: the number of boxes must
    equal 1 + number of wide gaps (exact split rule)."""
    x = 100.0
    parts = [f"1 0 0 1 {x} 700 Tm ({pairs[0][0]}) Tj"]
    expected = 1
    for i in range(1, len(pairs)):
        w_prev = 5.0 * len(pairs[i - 1][0])
        gap = 5.0 if pairs[i][1] else 0.5
        if pairs[i][1]:
            expected += 1
        x += w_prev + gap
        parts.append(f"1 0 0 1 {x} 700 Tm ({pairs[i][0]}) Tj")
    frag = PG + "BT /Mono 10 Tf " + " ".join(parts) + " ET"
    rows = extract_doc("c", [{"kind": "text", "text": frag,
                              "media_ref": None, "offset": 0}])
    boxes = [r for r in rows if r["kind"] == "text"]
    assert len(boxes) == expected
