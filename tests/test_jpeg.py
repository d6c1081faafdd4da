"""Baseline JPEG (DCTDecode) codec + reference PNG re-encode parity.

The reference decodes EVERY image XObject to a BufferedImage and
re-encodes it as PNG (ImageResource.java:38-51, PDFBoxTree.java:544-562)
— so its media payloads are PNG pixels whatever the source codec.
jpegdec.py closes the dominant real-world case (baseline JPEG); these
tests cover the codec itself (round trips through the independent
encoder, hypothesis properties, restart markers, subsampling scope
guards) and the pdfread routing (DCT and raw-Flate XObjects ->
``data:image/png;base64`` media refs under ``image_pixels=True``; the
reference's OWN externally-produced fixture JPEGs decode).

No external JPEG decoder exists in this sandbox (no PIL/ImageIO), so
byte-parity vs libjpeg cannot be diffed; the external-validation
evidence is that real encoder output (images.pdf's camera JPEG with
JFIF/EXIF segments, the Adobe 4:2:0 + DRI thumbnail) decodes to
plausible, dimension-exact, deterministic pixels. Chroma upsampling is
nearest-neighbor (documented divergence envelope vs libjpeg's triangle
filter; luma and 4:4:4 are exact).
"""

from __future__ import annotations

import base64
import hashlib
import os

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf2dom_spark.jpegdec import (UnsupportedJpegError, decode_baseline,
                                   encode_baseline, jpeg_to_rgba)
from pdf2dom_spark.pdfread import PdfFile, Stream, pdf_file_to_row
from pdf2dom_spark.raster import decode_png_rgba

RES = "/root/reference/src/test/resources"

requires_fixtures = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference fixtures not present")


def _uniform_blocks(vals: np.ndarray) -> np.ndarray:
    return np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)


# --- codec round trips ------------------------------------------------------

def test_gray_uniform_blocks_bit_exact():
    """quant=1 uniform 8x8 blocks survive encode->decode EXACTLY (the
    DC coefficient of a constant block is 8*(v-128), an integer, so
    quantization is lossless) — the property the driver gate uses."""
    vals = (np.arange(20).reshape(4, 5) * 13 + 3) % 256
    img = _uniform_blocks(vals)
    assert np.array_equal(decode_baseline(encode_baseline(img, 1)), img)


def test_gray_negative_dc_diffs():
    """Descending block values force negative DC differences (the
    one's-complement EXTEND path)."""
    vals = np.array([[250, 180, 110, 40], [30, 100, 170, 240]])
    img = _uniform_blocks(vals)
    assert np.array_equal(decode_baseline(encode_baseline(img, 1)), img)


def test_gray_arbitrary_content_tight():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (24, 33)).astype(np.uint8)
    dec = decode_baseline(encode_baseline(img, 1))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_color_arbitrary_content_tight():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (17, 9, 3)).astype(np.uint8)
    dec = decode_baseline(encode_baseline(img, 1))
    assert dec.shape == img.shape
    # quant round + YCbCr forward/inverse float trip
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3


def test_restart_intervals_roundtrip():
    vals = (np.arange(35).reshape(5, 7) * 29 + 1) % 256
    img = _uniform_blocks(vals)
    for ri in (1, 3, 8):
        dec = decode_baseline(encode_baseline(img, 1, restart_interval=ri))
        assert np.array_equal(dec, img), f"restart_interval={ri}"


def test_non_multiple_of_8_dims():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (13, 21)).astype(np.uint8)
    dec = decode_baseline(encode_baseline(img, 1))
    assert dec.shape == (13, 21)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_decode_deterministic():
    img = _uniform_blocks(np.array([[9, 200], [77, 140]]))
    jp = encode_baseline(img, 1)
    assert decode_baseline(jp).tobytes() == decode_baseline(jp).tobytes()


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 3), st.integers(1, 3))
def test_prop_gray_roundtrip_bounded(seed, bh, bw):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (bh * 8, bw * 8)).astype(np.uint8)
    dec = decode_baseline(encode_baseline(img, 1))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_quantized_encode_decodes_close_on_smooth():
    xx, yy = np.meshgrid(np.arange(64), np.arange(48))
    img = (128 + 60 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(np.uint8)
    dec = decode_baseline(encode_baseline(img, 8))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 24  # ~3*q


# --- scope guards -----------------------------------------------------------

def test_relabeled_sof2_with_sequential_scan_raises():
    """A baseline stream relabeled SOF2 carries an Ss=0/Se=63 scan —
    invalid for progressive (a DC scan must have Se=0, G.1.1.1.1)."""
    jp = bytearray(encode_baseline(_uniform_blocks(np.array([[128]])), 1))
    i = jp.find(b"\xff\xc0")
    jp[i + 1] = 0xC2  # flip SOF0 -> SOF2
    with pytest.raises(UnsupportedJpegError):
        decode_baseline(bytes(jp))


def test_progressive_cross_mode_bit_identity():
    """Progressive transmission only reorders the same quantized
    coefficients, so progressive decode must equal baseline decode
    EXACTLY — this validates the multi-scan/EOBn/refinement machinery
    against the fixture-validated baseline path."""
    from pdf2dom_spark.jpegdec import encode_progressive

    rng = np.random.RandomState(42)
    for shape in ((24, 33), (16, 24, 3), (13, 21)):
        img = rng.randint(0, 256, shape).astype(np.uint8)
        for q in (1, 8):
            base = decode_baseline(encode_baseline(img, q))
            for succ in (False, True):
                prog = decode_baseline(
                    encode_progressive(img, q, successive=succ))
                assert np.array_equal(prog, base), (shape, q, succ)


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 30))
def test_prop_progressive_equals_baseline(seed, q):
    from pdf2dom_spark.jpegdec import encode_progressive

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    base = decode_baseline(encode_baseline(img, q))
    for succ in (False, True):
        prog = decode_baseline(encode_progressive(img, q, successive=succ))
        assert np.array_equal(prog, base)


def test_progressive_dct_pdf_chain():
    """A PROGRESSIVE JPEG inside a /DCTDecode XObject decodes through
    the whole file chain like a baseline one."""
    from pdf2dom_spark.jpegdec import encode_progressive
    from pdf2dom_spark.pdfread import pdf_to_spans
    from pdf2dom_spark.pdfwrite import dct_image_pdf_bytes

    vals = (np.arange(12).reshape(3, 4) * 23 + 5) % 256
    img = _uniform_blocks(vals)
    pdf = dct_image_pdf_bytes(encode_progressive(img, 1), 32, 24)
    spans = pdf_to_spans(pdf, image_pixels=True)
    im = next(s for s in spans if s["kind"] == "image")
    px = _datauri_png(im["media_ref"])
    assert np.array_equal(px[..., 0], img)


def test_non_jpeg_raises():
    with pytest.raises(UnsupportedJpegError):
        decode_baseline(b"\x89PNG\r\n\x1a\n")


def test_jpeg_to_rgba_gray_expands():
    img = _uniform_blocks(np.array([[50, 220]]))
    rgba = jpeg_to_rgba(encode_baseline(img, 1))
    assert rgba.shape == (8, 16, 4)
    assert np.array_equal(rgba[..., 0], img)
    assert np.array_equal(rgba[..., 0], rgba[..., 1])
    assert (rgba[..., 3] == 255).all()


# --- real fixture JPEGs (externally produced encoders) ----------------------

def _fixture_jpegs(rel: str) -> list[tuple[int, int, bytes]]:
    with open(f"{RES}/{rel}", "rb") as fh:
        pdf = PdfFile(fh.read())
    out = []
    for num in list(pdf.xref):
        try:
            obj = pdf.get(num)
        except Exception:
            continue
        if isinstance(obj, Stream) and str(
                pdf.resolve(obj.dict.get("Subtype")) or "") == "Image":
            if "DCT" in str(pdf.resolve(obj.dict.get("Filter"))):
                out.append((int(pdf.resolve(obj.dict.get("Width"))),
                            int(pdf.resolve(obj.dict.get("Height"))),
                            obj.data))
    return out


@requires_fixtures
def test_real_images_pdf_jpegs_decode():
    """images.pdf carries two externally-encoded baseline JPEGs: a
    336x334 camera photo (JFIF + EXIF) and a 25x25 Adobe 4:2:0
    thumbnail with DRI restart markers. Both must decode to
    dimension-exact uint8 RGB."""
    jpegs = _fixture_jpegs("images.pdf")
    assert len(jpegs) == 2
    for w, h, data in jpegs:
        img = decode_baseline(data)
        assert img.shape == (h, w, 3)
        assert img.dtype == np.uint8
        # a real photo/graphic, not a constant field or garbage
        assert 16 < img.mean() < 240
        assert img.std() > 5


@requires_fixtures
def test_real_adobe_420_thumbnail_shared_across_fixtures():
    """The SAME 25x25 Adobe JPEG bytes appear in images.pdf and all
    four page-rotation fixtures — they must decode identically (pure
    determinism over an external encoder's 4:2:0 + DRI output)."""
    ours = _fixture_jpegs("images.pdf")
    small = next(d for w, h, d in ours if (w, h) == (25, 25))
    rot = _fixture_jpegs("page-rotation/object-page-rotate-0.pdf")
    assert len(rot) == 1
    assert hashlib.md5(rot[0][2]).digest() == hashlib.md5(small).digest()
    assert np.array_equal(decode_baseline(small), decode_baseline(rot[0][2]))


# --- pdfread routing: image_pixels=True ------------------------------------

def _datauri_png(ref: str) -> np.ndarray:
    assert ref.startswith("data:image/png;base64,")
    return decode_png_rgba(base64.b64decode(ref.split(",", 1)[1]))


@requires_fixtures
def test_real_images_pdf_pixels_mode_emits_png_datauris():
    row = pdf_file_to_row(f"{RES}/images.pdf", image_pixels=True)
    imgs = [s for s in row["spans"] if s["kind"] == "image"]
    assert len(imgs) == 2
    dims = set()
    for s in imgs:
        px = _datauri_png(s["media_ref"])
        assert (px[..., 3] == 255).all()
        dims.add((px.shape[1], px.shape[0]))
    # payload pixel dims match the XObject declarations
    assert dims == {(25, 25), (336, 334)}


@requires_fixtures
def test_real_images_pdf_default_mode_still_sha():
    row = pdf_file_to_row(f"{RES}/images.pdf")
    refs = [s["media_ref"] for s in row["spans"] if s["kind"] == "image"]
    assert refs and all(r.startswith("sha:") for r in refs)


@requires_fixtures
def test_real_horarios_flate_bitmaps_decode():
    """Horarios' images are Flate-coded raw 8-bit DeviceRGB/DeviceGray
    bitmaps — the non-DCT half of the pixel path."""
    row = pdf_file_to_row(f"{RES}/HorariosMadrid_Segovia.pdf",
                          image_pixels=True)
    refs = {s["media_ref"] for s in row["spans"] if s["kind"] == "image"}
    assert refs
    assert all(r.startswith("data:image/png;base64,") for r in refs)
    for r in refs:
        px = _datauri_png(r)
        assert px.shape[2] == 4


def test_dct_pdf_chain_bit_exact():
    """writer (DCTDecode XObject) -> pdfread -> jpegdec -> PNG re-encode:
    uniform-block payload survives the WHOLE file chain bit-exactly."""
    from pdf2dom_spark.pdfwrite import dct_image_pdf_bytes
    from pdf2dom_spark.pdfread import pdf_to_spans

    vals = (np.arange(12).reshape(3, 4) * 19 + 7) % 256
    img = _uniform_blocks(vals)
    pdf = dct_image_pdf_bytes(encode_baseline(img, 1), 32, 24)
    spans = pdf_to_spans(pdf, image_pixels=True)
    im = next(s for s in spans if s["kind"] == "image")
    px = _datauri_png(im["media_ref"])
    assert np.array_equal(px[..., 0], img)
    # and the default mode keeps the opaque sha of the JPEG payload
    spans2 = pdf_to_spans(pdf)
    im2 = next(s for s in spans2 if s["kind"] == "image")
    assert im2["media_ref"].startswith("sha:")


def test_corrupt_jpeg_falls_back_to_sha():
    """A truncated/garbage DCT payload must not crash ingest — the ref
    degrades to the opaque hash."""
    from pdf2dom_spark.pdfwrite import dct_image_pdf_bytes
    from pdf2dom_spark.pdfread import pdf_to_spans

    pdf = dct_image_pdf_bytes(b"\xff\xd8\xff\xdb garbage", 8, 8)
    spans = pdf_to_spans(pdf, image_pixels=True)
    im = next(s for s in spans if s["kind"] == "image")
    assert im["media_ref"].startswith("sha:")


# --- damage hardening --------------------------------------------------------

@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_fuzz_random_bytes_never_hang(data):
    """Arbitrary bytes either decode or raise — never hang, never return
    a non-array (the pdfread image path catches any exception and falls
    back to the opaque sha ref)."""
    try:
        out = decode_baseline(b"\xff\xd8" + data)
    except Exception:
        return
    assert isinstance(out, np.ndarray)


@settings(max_examples=25, deadline=None)
@given(st.integers(2, 40), st.integers(0, 255))
def test_fuzz_truncated_valid_jpeg(cut_frac, fill):
    """A valid JPEG truncated mid-scan (the classic corrupt-crawl shape)
    must not hang or loop; zero-fill recovery or a raise are both fine."""
    vals = (np.arange(12).reshape(3, 4) * 31 + fill) % 256
    jp = encode_baseline(_uniform_blocks(vals), 1)
    cut = max(2, len(jp) * cut_frac // 41)
    try:
        out = decode_baseline(jp[:cut])
    except Exception:
        return
    assert isinstance(out, np.ndarray)


def test_subsampled_mcu_geometry_pinned():
    """Independent 4:2:0 / 4:2:2 / 4:4:0 emitter vs the decoder: an
    image whose color is uniform per MCU cell round-trips EXACTLY
    (chroma box-mean is lossless on uniform cells; NN upsample restores
    them) — pinning the interleaved-MCU block order the real Adobe
    fixture exercises but can't pixel-verify."""
    from pdf2dom_spark.jpegdec import encode_subsampled

    rng = np.random.RandomState(1)
    for sampling in ((2, 2), (2, 1), (1, 2)):
        hi, vi = sampling
        cells = rng.randint(0, 256, (3, 4, 3))
        img = np.repeat(np.repeat(cells, 8 * vi, 0),
                        8 * hi, 1).astype(np.uint8)
        dec = decode_baseline(encode_subsampled(img, 1, sampling))
        assert np.array_equal(dec, img), sampling
        # restart markers inside the subsampled MCU stream
        dec_r = decode_baseline(
            encode_subsampled(img, 1, sampling, restart_interval=2))
        assert np.array_equal(dec_r, img), sampling


def test_subsampled_nonaligned_dims():
    """Dims not multiple of the MCU cell: padded blocks encode, decode
    crops back to the declared size; uniform cells stay exact."""
    from pdf2dom_spark.jpegdec import encode_subsampled

    cells = (np.arange(36).reshape(3, 4, 3) * 19 + 7) % 256
    img = np.repeat(np.repeat(cells, 16, 0), 16, 1).astype(np.uint8)
    img = img[:41, :55]  # crop off MCU alignment
    dec = decode_baseline(encode_subsampled(img, 1, (2, 2)))
    assert dec.shape == img.shape
    assert np.array_equal(dec, img)
