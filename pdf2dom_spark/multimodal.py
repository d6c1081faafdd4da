"""Multimodal column operations: opaque binary media + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as opaque
``binary`` columns with typed metadata beside them. This module implements
the Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures — for decode / feature-extract / resize / frame-sample. The
actual codec work is STUBBED deterministically (this container has no
image/audio libraries): ``_stub_decode`` derives metadata from the payload
bytes' digest, so every stage is fully testable and reproducible, and the
real decoder drops in behind the same signature.

Ops:
  - ``media_table``     — synthesize the binary media table (payload +
                          media_ref) from documents (deterministic).
  - ``decode_meta``     — mapInPandas decode stub: payload -> (format, width,
                          height, n_frames); Arrow-batched, no per-row Python
                          at the Spark level.
  - ``resize_plan``     — pure-DataFrame resize planning (target box fit,
                          scale factor, output dims) — JVM-side arithmetic.
  - ``frame_sample``    — every-k-th-frame sampling plan for video-like
                          payloads: posexplode of a sequence, one row per
                          sampled frame.
  - ``mm_decode_meta`` / ``mm_resize_plan`` / ``mm_frame_sample`` are
    registered as driver queries; the metadata derivation is reproduced in
    DuckDB oracle SQL (hex-nibble parsing of md5 digests is portable).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

REGISTRY: dict = {}
ORACLES: dict[str, str] = {}


def _reg(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn
    return deco


MEDIA_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), False),
])

META_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("format", T.StringType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("n_frames", T.IntegerType(), False),
])

_FORMATS = ["png", "jpeg", "webm", "wav"]


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic binary media rows derived from documents: payload =
    utf-8 text bytes, media_ref = md5 digest. (Stands in for an Iceberg
    side table of blobs; keeps span rows narrow — SURVEY.md §1.1.)"""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.md5("text").alias("media_ref"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.encode("text", "utf-8").alias("payload"),
    )


def _stub_decode(payload: bytes) -> tuple[str, int, int, int]:
    """Deterministic fake decoder: metadata from the payload digest.
    Replace with PIL/ffmpeg probing in production — same signature.

    width  = 256 + first digest byte * 4
    height = 256 + second digest byte * 2
    format = digest byte 3 % 4 -> png/jpeg/webm/wav
    n_frames = 1 for images, 24 + byte4 % 100 for webm, 1 for wav
    """
    h = hashlib.md5(payload).digest()
    fmt = _FORMATS[h[2] % 4]
    width = 256 + h[0] * 4
    height = 256 + h[1] * 2
    n_frames = (24 + h[3] % 100) if fmt == "webm" else 1
    return fmt, width, height, n_frames


def _salted(d: DataFrame) -> DataFrame:
    """Spread a small-file scan across the session's shuffle partitions
    before a Python kernel: one parquet file is ONE split, so a
    mapInPandas directly over the scan runs serially — the same salt
    the extraction pipeline uses (raw 64-bit hash, no pmod holes)."""
    spark = d.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return d.repartition(p, F.xxhash64(*d.columns[:1]))


def decode_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched decode stub over the binary column."""
    media = _salted(media)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_stub_decode(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(metas,
                               columns=["format", "width", "height", "n_frames"])
            out.insert(0, "media_ref", pdf["media_ref"].values)
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            out["n_frames"] = out["n_frames"].astype("int32")
            yield out

    return media.mapInPandas(kernel, META_SCHEMA)


def resize_plan(meta: DataFrame, box: int = 512) -> DataFrame:
    """Fit-into-box resize planning, JVM-side (no UDF): scale =
    min(box/w, box/h, 1), output dims floor(dim*scale)."""
    scale = F.least(F.lit(float(box)) / F.col("width"),
                    F.lit(float(box)) / F.col("height"), F.lit(1.0))
    return meta.select(
        "media_ref", "format", "width", "height",
        F.round(scale, 6).alias("scale"),
        F.floor(F.col("width") * scale).cast("int").alias("out_w"),
        F.floor(F.col("height") * scale).cast("int").alias("out_h"),
    )


def frame_sample(meta: DataFrame, every: int = 10) -> DataFrame:
    """One row per sampled frame (videos only): frames 0, k, 2k, ..."""
    v = meta.where(F.col("n_frames") > 1)
    return v.select(
        "media_ref",
        F.posexplode(F.sequence(
            F.lit(0), F.col("n_frames") - 1, F.lit(every))).alias("k", "frame_no"),
    ).select(
        "media_ref", F.col("k").cast("int").alias("k"),
        F.col("frame_no").cast("int").alias("frame_no"),
        F.concat(F.col("media_ref"), F.lit("#"),
                 F.col("frame_no").cast("string")).alias("frame_ref"),
    )


# --- REAL pixel path (no image libs needed: pdf2dom_spark.raster PNG codec) --
# The stub above models metadata-only probing; these ops do genuine codec
# work end-to-end: deterministic PNGs are ENCODED in one Arrow kernel,
# DECODED back in another (real byte parsing: zlib inflate + scanline
# unfilter), rotated with np.rot90 / resized with integer nearest-neighbor
# indexing, and summarized with position-weighted checksums the DuckDB
# oracle reproduces from the generation rule alone — if the encoder,
# decoder, rotation, or resample were wrong, the checksums would not match.

_PNG_MOD = 1 << 31


def _png_dims(doc_id: int) -> tuple[int, int]:
    return 8 + doc_id % 9, 8 + (doc_id * 3) % 9  # (w, h)


def _png_payload(doc_id: int) -> bytes:
    import numpy as np
    from .raster import encode_png_rgba

    w, h = _png_dims(doc_id)
    y, x = np.mgrid[0:h, 0:w]
    v = ((3 * y + 7 * x + doc_id) % 256).astype(np.uint8)
    img = np.dstack([v, v, v, np.full_like(v, 255)])
    return encode_png_rgba(img)


def png_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PNG payloads: gray gradient pix(y,x) = (3y + 7x + doc_id) % 256."""
    d = _salted(spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id")))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [(int(doc_id), _png_payload(int(doc_id)))
                    for doc_id in pdf["doc_id"]]
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return d.mapInPandas(gen, T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]))


def _fused_doc_query(spark: SparkSession, sf_dir: str, row_fn, schema):
    """ONE Python stage per media gate (r6): generate the payload and
    process it in the same worker call — the former media_table ->
    process chain was two chained Python stages paying a payload Arrow
    round-trip (worker -> JVM -> worker) per doc for byte-identical
    results (the codec encode/decode still runs inside row_fn)."""
    d = _salted(spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id")))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schema.fields]
        for pdf in batches:
            rows = [row_fn(int(doc_id)) for doc_id in pdf["doc_id"]]
            yield pd.DataFrame(rows, columns=cols)

    return d.mapInPandas(kernel, schema)


def _decode_row(transform):
    """Per-doc fused row: generate the PNG payload, decode it back through
    the real codec, apply ``transform(img, doc_id) -> img`` (numpy), emit
    dims + position-weighted checksum."""
    import numpy as np
    from .raster import decode_png_rgba

    def row_fn(doc_id: int):
        img = decode_png_rgba(_png_payload(doc_id))
        img = transform(img, doc_id)
        h, w = img.shape[:2]
        v = img[..., 0].astype(np.int64)
        weights = np.arange(h * w, dtype=np.int64).reshape(h, w)
        return (doc_id, w, h, int(v.sum()),
                int((v * weights).sum() % _PNG_MOD))

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("pix_sum", T.LongType(), False),
        T.StructField("weighted", T.LongType(), False),
    ])
    return row_fn, schema


_SQL_PIX = "((3 * {y} + 7 * {x} + doc_id) % 256)"


def _sql_sum2d(h_expr: str, w_expr: str, term: str) -> str:
    """SUM over y in 0..h-1, x in 0..w-1 of term(y, x) — nested list_sum."""
    inner = ("list_sum(list_transform(generate_series(0, {w} - 1), "
             "x -> CAST({t} AS BIGINT)))").format(w=w_expr, t=term)
    return ("list_sum(list_transform(generate_series(0, {h} - 1), "
            "y -> {i}))").format(h=h_expr, i=inner)


_PNG_DIMS_SQL = """
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         8 + CAST(doc_id AS BIGINT) % 9 AS w,
         8 + (CAST(doc_id AS BIGINT) * 3) % 9 AS h
  FROM documents
"""

@_reg("mm_png_decode", f"""
WITH m AS ({_PNG_DIMS_SQL})
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST({_sql_sum2d('h', 'w', _SQL_PIX.format(y='y', x='x'))} AS BIGINT)
           AS pix_sum,
       CAST({_sql_sum2d('h', 'w', f"{_SQL_PIX.format(y='y', x='x')} * (y * w + x)")}
            % {_PNG_MOD} AS BIGINT) AS weighted
FROM m
""")
def mm_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    row_fn, schema = _decode_row(lambda img, _d: img)
    return _fused_doc_query(spark, sf_dir, row_fn, schema)


# np.rot90(img, k): k=1 -> R[y,x] = img[x, w-1-y] (dims w x h);
# k=2 -> img[h-1-y, w-1-x]; k=3 -> img[h-1-x, y] (dims w x h)
_ROT_CASE = f"""
CASE CAST(doc_id AS BIGINT) % 4
  WHEN 0 THEN {{s0}}
  WHEN 1 THEN {{s1}}
  WHEN 2 THEN {{s2}}
  ELSE {{s3}}
END"""

@_reg("mm_png_rot90", f"""
WITH m AS ({_PNG_DIMS_SQL})
SELECT doc_id,
       CAST(CASE WHEN doc_id % 2 = 0 THEN w ELSE h END AS INT) AS width,
       CAST(CASE WHEN doc_id % 2 = 0 THEN h ELSE w END AS INT) AS height,
       CAST({_sql_sum2d('h', 'w', _SQL_PIX.format(y='y', x='x'))} AS BIGINT)
           AS pix_sum,
       CAST(({_ROT_CASE.format(
           s0=_sql_sum2d('h', 'w',
                         f"{_SQL_PIX.format(y='y', x='x')} * (y * w + x)"),
           s1=_sql_sum2d('w', 'h',
                         f"{_SQL_PIX.format(y='x', x='(w - 1 - y)')} * (y * h + x)"),
           s2=_sql_sum2d('h', 'w',
                         f"{_SQL_PIX.format(y='(h - 1 - y)', x='(w - 1 - x)')} * (y * w + x)"),
           s3=_sql_sum2d('w', 'h',
                         f"{_SQL_PIX.format(y='(h - 1 - x)', x='y')} * (y * h + x)"),
       )}) % {_PNG_MOD} AS BIGINT) AS weighted
FROM m
""")
def mm_png_rot90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 pixel rotation, real: np.rot90 by doc_id % 4 quadrants, re-encoded
    and re-decoded through the PNG codec before checksumming."""
    import numpy as np
    from .raster import decode_png_rgba, encode_png_rgba

    def rot(img, doc_id):
        out = np.rot90(img, k=doc_id % 4)
        # round-trip through the codec so encode+decode are exercised too
        return decode_png_rgba(encode_png_rgba(np.ascontiguousarray(out)))

    row_fn, schema = _decode_row(rot)
    return _fused_doc_query(spark, sf_dir, row_fn, schema)


@_reg("mm_png_resize_nn", f"""
WITH m AS ({_PNG_DIMS_SQL}),
r AS (
  SELECT doc_id, w, h,
         CAST(FLOOR(w * LEAST(8.0 / w, 8.0 / h, 1.0)) AS BIGINT) AS ow,
         CAST(FLOOR(h * LEAST(8.0 / w, 8.0 / h, 1.0)) AS BIGINT) AS oh
  FROM m
)
SELECT doc_id, CAST(ow AS INT) AS width, CAST(oh AS INT) AS height,
       CAST({_sql_sum2d('oh', 'ow',
                        _SQL_PIX.format(y='((y * h) // oh)',
                                        x='((x * w) // ow)'))} AS BIGINT)
           AS pix_sum,
       CAST({_sql_sum2d('oh', 'ow',
                        (_SQL_PIX.format(y='((y * h) // oh)',
                                         x='((x * w) // ow)')
                         + ' * (y * ow + x)'))}
            % {_PNG_MOD} AS BIGINT) AS weighted
FROM r
""")
def mm_png_resize_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real nearest-neighbor resample to fit an 8px box: out(y,x) =
    in((y*h)//oh, (x*w)//ow) via numpy integer indexing."""
    import numpy as np

    def resize(img, _doc_id):
        h, w = img.shape[:2]
        scale = min(8.0 / w, 8.0 / h, 1.0)
        ow, oh = int(w * scale), int(h * scale)
        ys = (np.arange(oh) * h) // oh
        xs = (np.arange(ow) * w) // ow
        return img[ys[:, None], xs[None, :]]

    row_fn, schema = _decode_row(resize)
    return _fused_doc_query(spark, sf_dir, row_fn, schema)


# Feature extraction over the REAL decoded pixels (completing the task's
# decode / feature-extract / resize / frame-sample verb list with genuine
# pixel math): per-image brightness statistics + horizontal gradient
# energy — exact integers the oracle reproduces from the generation rule,
# so a wrong decode or a wrong feature formula both surface as mismatches.
@_reg("mm_feature_extract", f"""
WITH m AS ({_PNG_DIMS_SQL})
SELECT doc_id,
       CAST({_sql_sum2d('h', 'w', _SQL_PIX.format(y='y', x='x'))}
            * 100 // (w * h) AS BIGINT) AS mean_x100,
       CAST({_sql_sum2d('h', 'w',
                        f"CASE WHEN {_SQL_PIX.format(y='y', x='x')} >= 128 "
                        "THEN 1 ELSE 0 END")} AS BIGINT) AS n_bright,
       CAST({_sql_sum2d('h', 'w - 1',
                        f"abs({_SQL_PIX.format(y='y', x='(x + 1)')} "
                        f"- {_SQL_PIX.format(y='y', x='x')})")} AS BIGINT)
           AS grad_energy
FROM m
""")
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    from .raster import decode_png_rgba

    def row_fn(doc_id: int):
        v = decode_png_rgba(_png_payload(doc_id))[..., 0].astype(np.int64)
        h, w = v.shape
        return (doc_id,
                int(v.sum()) * 100 // (w * h),
                int((v >= 128).sum()),
                int(np.abs(np.diff(v, axis=1)).sum()))

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("mean_x100", T.LongType(), False),
        T.StructField("n_bright", T.LongType(), False),
        T.StructField("grad_energy", T.LongType(), False),
    ])
    return _fused_doc_query(spark, sf_dir, row_fn, schema)


# Audio modality with REAL byte plumbing: deterministic int16 PCM payloads
# are packed to little-endian bytes in one Arrow kernel and parsed back
# with np.frombuffer in another; windowed energy (sum of squares per
# 16-sample frame) is the frame-level feature. The oracle reproduces the
# exact integers from the sample formula — wrong packing, wrong
# endianness, or a wrong window split all surface as mismatches.
_AU_WIN = 16
_AU_SAMPLE = "(((doc_id * 31 + {i} * 17) % 256) - 128)"


def _audio_payload(doc_id: int) -> bytes:
    import numpy as np

    n = 64 + doc_id % 64
    i = np.arange(n, dtype=np.int64)
    s = (((doc_id * 31 + i * 17) % 256) - 128).astype("<i2")
    return s.tobytes()


def audio_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PCM payloads: s[i] = ((doc_id*31 + i*17) % 256) - 128, int16 LE."""
    d = _salted(spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id")))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [(int(doc_id), _audio_payload(int(doc_id)))
                    for doc_id in pdf["doc_id"]]
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return d.mapInPandas(gen, T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]))


@_reg("mm_audio_energy", f"""
WITH m AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         64 + CAST(doc_id AS BIGINT) % 64 AS n
  FROM documents
),
w AS (
  SELECT doc_id, n, n // {_AU_WIN} AS n_windows,
         list_transform(generate_series(0, n // {_AU_WIN} - 1), w ->
             list_sum(list_transform(
                 generate_series(w * {_AU_WIN}, w * {_AU_WIN} + {_AU_WIN} - 1),
                 i -> CAST({_AU_SAMPLE.format(i='i')}
                           * {_AU_SAMPLE.format(i='i')} AS BIGINT))))
             AS win_sq
  FROM m
)
SELECT doc_id,
       CAST(n AS INT) AS n_samples,
       CAST(n_windows AS INT) AS n_windows,
       CAST(list_sum(win_sq) AS BIGINT) AS total_sq,
       CAST(list_max(win_sq) AS BIGINT) AS max_window_sq
FROM w
""")
def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    def row_fn(doc_id: int):
        s = np.frombuffer(_audio_payload(doc_id), dtype="<i2").astype(
            np.int64)
        n = len(s)
        nw = n // _AU_WIN
        win = (s[:nw * _AU_WIN] ** 2).reshape(nw, _AU_WIN).sum(axis=1)
        return (doc_id, n, nw, int(win.sum()), int(win.max()))

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("n_windows", T.IntegerType(), False),
        T.StructField("total_sq", T.LongType(), False),
        T.StructField("max_window_sq", T.LongType(), False),
    ])
    return _fused_doc_query(spark, sf_dir, row_fn, schema)


# Video modality with REAL byte plumbing (the triad's last member): a raw
# multi-frame payload (F frames of w*h gray bytes, frame f pixel (y,x) =
# (3y + 7x + doc_id + 11f) % 256) is assembled in one Arrow kernel and
# sliced back frame-by-frame in another; every SAMPLE_EVERY-th frame is
# kept (the frame-sampling verb) and summarized with an exact checksum.
_VID_W, _VID_H = 6, 4
_VID_EVERY = 3
_VID_PIX = "((3 * {y} + 7 * {x} + doc_id + 11 * {f}) % 256)"


def _video_payload(doc_id: int) -> tuple[int, bytes]:
    import numpy as np

    nf = 4 + doc_id % 9
    f = np.arange(nf)[:, None, None]
    y = np.arange(_VID_H)[None, :, None]
    x = np.arange(_VID_W)[None, None, :]
    vid = ((3 * y + 7 * x + doc_id + 11 * f) % 256).astype(np.uint8)
    return nf, vid.tobytes()


def video_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _salted(spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id")))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                nf, payload = _video_payload(int(doc_id))
                rows.append((int(doc_id), nf, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "n_frames",
                                              "payload"])

    return d.mapInPandas(gen, T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]))


@_reg("mm_video_frame_sample", f"""
WITH m AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         4 + CAST(doc_id AS BIGINT) % 9 AS nf
  FROM documents
),
s AS (
  SELECT doc_id, nf,
         list_transform(generate_series(0, (nf - 1) // {_VID_EVERY}), k ->
             k * {_VID_EVERY}) AS frames
  FROM m
)
SELECT doc_id, CAST(nf AS INT) AS n_frames,
       CAST(len(frames) AS INT) AS n_sampled,
       CAST(list_sum(list_transform(frames, f ->
            {_sql_sum2d(str(_VID_H), str(_VID_W),
                        _VID_PIX.format(y='y', x='x', f='f')
                        + ' * (1 + y * ' + str(_VID_W) + ' + x)')}))
            AS BIGINT) AS sampled_checksum
FROM s
""")
def mm_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    weights = 1 + np.arange(_VID_H * _VID_W, dtype=np.int64).reshape(
        _VID_H, _VID_W)

    def row_fn(doc_id: int):
        nf, payload = _video_payload(doc_id)
        vid = np.frombuffer(payload, dtype=np.uint8).reshape(
            nf, _VID_H, _VID_W).astype(np.int64)
        sampled = vid[::_VID_EVERY]
        return (doc_id, nf, sampled.shape[0],
                int((sampled * weights[None]).sum()))

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("n_sampled", T.IntegerType(), False),
        T.StructField("sampled_checksum", T.LongType(), False),
    ])
    return _fused_doc_query(spark, sf_dir, row_fn, schema)


# --- portable hex parsing for the oracle ------------------------------------

def _hexbyte_sql(expr: str, i: int) -> str:
    """Parse hex byte i (0-based) of an md5 hex string — portable."""
    c1 = f"(instr('0123456789abcdef', substr({expr}, {2*i+1}, 1)) - 1)"
    c2 = f"(instr('0123456789abcdef', substr({expr}, {2*i+2}, 1)) - 1)"
    return f"({c1} * 16 + {c2})"


_H = "md5(text)"
_FMT_SQL = (f"CASE {_hexbyte_sql(_H, 2)} % 4 WHEN 0 THEN 'png' WHEN 1 THEN "
            f"'jpeg' WHEN 2 THEN 'webm' ELSE 'wav' END")
_W_SQL = f"(256 + {_hexbyte_sql(_H, 0)} * 4)"
_HT_SQL = f"(256 + {_hexbyte_sql(_H, 1)} * 2)"
_NF_SQL = (f"CASE WHEN {_FMT_SQL} = 'webm' THEN 24 + {_hexbyte_sql(_H, 3)} % 100 "
           f"ELSE 1 END")


@_reg("mm_decode_meta", f"""
SELECT md5(text) AS media_ref, {_FMT_SQL} AS format,
       CAST({_W_SQL} AS INT) AS width, CAST({_HT_SQL} AS INT) AS height,
       CAST({_NF_SQL} AS INT) AS n_frames
FROM documents
""")
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_meta(media_table(spark, sf_dir))


@_reg("mm_resize_plan", f"""
WITH m AS (
  SELECT md5(text) AS media_ref, {_FMT_SQL} AS format,
         {_W_SQL} AS width, {_HT_SQL} AS height
  FROM documents
)
SELECT media_ref, format, CAST(width AS INT) AS width,
       CAST(height AS INT) AS height,
       ROUND(LEAST(512.0 / width, 512.0 / height, 1.0), 6) AS scale,
       CAST(FLOOR(width * LEAST(512.0 / width, 512.0 / height, 1.0)) AS INT) AS out_w,
       CAST(FLOOR(height * LEAST(512.0 / width, 512.0 / height, 1.0)) AS INT) AS out_h
FROM m
""")
def mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resize_plan(decode_meta(media_table(spark, sf_dir)))


@_reg("mm_frame_sample", f"""
WITH m AS (
  SELECT md5(text) AS media_ref, CAST({_NF_SQL} AS INT) AS n_frames
  FROM documents
),
v AS (SELECT * FROM m WHERE n_frames > 1),
x AS (SELECT media_ref,
             unnest(generate_series(0, n_frames - 1, 10)) AS frame_no
      FROM v)
SELECT media_ref, CAST(frame_no / 10 AS INT) AS k,
       CAST(frame_no AS INT) AS frame_no,
       media_ref || '#' || CAST(frame_no AS VARCHAR) AS frame_ref
FROM x
""")
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_sample(decode_meta(media_table(spark, sf_dir)))


# --- baseline JPEG (DCTDecode) through the REAL file chain ------------------
# The reference PNG re-encodes every image XObject whatever its codec
# (ImageResource.java:38-51); real web corpora are dominated by DCTDecode.
# This gate drives the whole chain: deterministic baseline JPEG encode ->
# a real PDF file with a /Filter /DCTDecode image XObject -> pdfread xref/
# object parse -> jpegdec Huffman+IDCT decode -> PNG re-encode -> PNG
# decode -> pixel checksums, value-hash-matched against a DuckDB closed
# form. Uniform 8x8 blocks make quant=1 JPEG bit-exact (the DC of a
# constant block is the integer 8*(v-128)), so the oracle is pure integer
# arithmetic. restart_interval varies by doc to exercise DRI/RSTn.
# 100 TB shape: doc-id scan -> ONE narrow mapInPandas (Arrow batches,
# no shuffle, no collect); media payloads never leave the executor.

_JPEG_V = ("(CAST(doc_id AS BIGINT) * 37 + r * 59 + c * 17 + 11) % 256")

@_reg("mm_jpeg_dct_chain", f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(32 AS INT) AS width, CAST(24 AS INT) AS height,
       CAST(SUM(64 * ({_JPEG_V})) AS BIGINT) AS pix_sum,
       CAST(SUM(({_JPEG_V}) * (64 * (256 * r + 8 * c) + 7392))
            % 1000003 AS BIGINT) AS weighted,
       CAST(MAX(CASE WHEN r = 0 AND c = 0 THEN ({_JPEG_V}) END) AS INT)
           AS corner_tl,
       CAST(MAX(CASE WHEN r = 2 AND c = 3 THEN ({_JPEG_V}) END) AS INT)
           AS corner_br
FROM documents, generate_series(0, 2) AS gr(r),
     generate_series(0, 3) AS gc(c)
GROUP BY doc_id
""")
def mm_jpeg_dct_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    import base64

    import numpy as np

    from .jpegdec import encode_baseline
    from .pdfread import pdf_to_spans
    from .pdfwrite import dct_image_pdf_bytes
    from .raster import decode_png_rgba

    d = _salted(spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id")))

    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("pix_sum", T.LongType(), False),
        T.StructField("weighted", T.LongType(), False),
        T.StructField("corner_tl", T.IntegerType(), False),
        T.StructField("corner_br", T.IntegerType(), False),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yidx, xidx = np.mgrid[0:24, 0:32]
        pos = (yidx * 32 + xidx).astype(np.int64)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                r, c = np.mgrid[0:3, 0:4]
                vals = (i * 37 + r * 59 + c * 17 + 11) % 256
                img = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(
                    np.uint8)
                jp = encode_baseline(img, quant=1,
                                     restart_interval=i % 4)
                file_bytes = dct_image_pdf_bytes(jp, 32, 24)
                spans = pdf_to_spans(file_bytes, image_pixels=True)
                ref = next(s["media_ref"] for s in spans
                           if s["kind"] == "image")
                px = decode_png_rgba(
                    base64.b64decode(ref.split(",", 1)[1]))
                ch = px[..., 0].astype(np.int64)
                rows.append((i, int(px.shape[1]), int(px.shape[0]),
                             int(ch.sum()),
                             int((ch * pos).sum() % 1000003),
                             int(ch[0, 0]), int(ch[23, 31])))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "pix_sum", "weighted",
                "corner_tl", "corner_br"])

    return d.mapInPandas(kernel, out_schema)
