"""Filled-path rasterizer (G11) without image libraries.

Transposes ``PathDrawer.drawPath`` (PathDrawer.java:43-136): the polygon
whose vertices are the int-truncated ``(x1, y1)`` of each path segment is
filled with the non-stroking color into an RGBA canvas of the path's
int-truncated bounds (translated to the origin), and embedded as a
``data:image/png;base64,...`` URI exactly like the reference's
EmbedAsBase64Handler PNG path.

No Pillow in this container, and none needed:
  - the fill is a vectorized even-odd scanline over pixel centers (numpy) —
    Java's ``Graphics2D.fillPolygon`` uses the same even-odd rule; its exact
    pixel-boundary conventions differ by at most the border pixels, which the
    transposed TestPaths assertions (color present in top/bottom areas) do
    not depend on;
  - PNG is written with the stdlib only (zlib + struct): 8-bit RGBA,
    no interlace, filter 0 per scanline. ``decode_png_rgba`` reads that
    subset back for the pixel tests.

Enabled via ``ExtractConfig(raster_paths=True)``; the default keeps the
deterministic content-hash ref (stable across runs and engines, which the
span-equality oracles rely on).
"""

from __future__ import annotations

import base64
import struct
import zlib

import numpy as np


def fill_polygon_mask(px: list[float], py: list[float],
                      w: int, h: int) -> np.ndarray:
    """Even-odd scanline fill at pixel centers -> bool mask (h, w)."""
    mask = np.zeros((h, w), dtype=bool)
    n = len(px)
    if n < 3 or w <= 0 or h <= 0:
        return mask
    yc = np.arange(h) + 0.5
    xc = np.arange(w) + 0.5
    crossings = []
    for i in range(n):
        x0, y0 = px[i], py[i]
        x1, y1 = px[(i + 1) % n], py[(i + 1) % n]
        if y0 == y1:
            continue
        lo, hi = (y0, y1) if y0 < y1 else (y1, y0)
        hit = (yc >= lo) & (yc < hi)
        t = (yc - y0) / (y1 - y0)
        xint = np.where(hit, x0 + t * (x1 - x0), np.inf)
        crossings.append(xint)
    if not crossings:
        return mask
    xs = np.sort(np.stack(crossings, axis=1), axis=1)  # (h, n_cross)
    for j in range(0, xs.shape[1] - 1, 2):
        xa = xs[:, j][:, None]
        xb = xs[:, j + 1][:, None]
        valid = np.isfinite(xa)
        mask |= valid & (xc[None, :] >= xa) & (xc[None, :] < xb)
    return mask


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png_rgba(img: np.ndarray) -> bytes:
    """(h, w, 4) uint8 -> PNG bytes (8-bit RGBA, filter 0, no interlace)."""
    h, w = img.shape[:2]
    body = img.astype(np.uint8, copy=False)
    raw = b"".join(b"\x00" + body[r].tobytes() for r in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))


def decode_png_rgba(data: bytes) -> np.ndarray:
    """Inverse of encode_png_rgba (that subset only) — for pixel tests."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])
        if crc != zlib.crc32(tag + payload) & 0xFFFFFFFF:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, bits, ctype = struct.unpack(">IIBB", payload[:10])
            assert bits == 8 and ctype == 6, "not the encoder's subset"
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 4 + 1
    rows = []
    for r in range(h):
        line = raw[r * stride:(r + 1) * stride]
        assert line[0] == 0, "only filter 0 supported"
        rows.append(np.frombuffer(line[1:], dtype=np.uint8))
    return np.stack(rows).reshape(h, w, 4)


def draw_path_png(path: list[tuple], fill_rgb: tuple,
                  x0: int, y0: int, w: int, h: int) -> str:
    """Rasterize the path (PathDrawer polygon = int (x1, y1) per segment)
    into the translated bounds and return the data URI."""
    px = [float(int(s[0])) - x0 for s in path]
    py = [float(int(s[1])) - y0 for s in path]
    mask = fill_polygon_mask(px, py, int(w), int(h))
    img = np.zeros((int(h), int(w), 4), dtype=np.uint8)
    r, g, b = (max(0, min(255, int(c * 255))) for c in fill_rgb)
    img[mask] = (r, g, b, 255)
    return ("data:image/png;base64,"
            + base64.b64encode(encode_png_rgba(img)).decode("ascii"))
