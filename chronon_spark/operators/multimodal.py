"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched ``mapInPandas`` stages.

Decode support is tiered: ``fake=False`` REALLY decodes the codec-free
formats — uncompressed BMP (BITMAPINFOHEADER) and binary PPM/PGM — with
pure byte parsing (header metadata + raw pixel rasters, row padding
stripped); JPEG/PNG raise a clearly-marked NotImplementedError because
this container has no image codecs (swap in PIL later by extending
``_decode_image_bytes``/``_decode_pixels`` only). ``fake=True`` keeps the
deterministic byte-derived pseudo-decoder whose outputs a SQL oracle can
reproduce, used by the correctness gate.

Scale notes: binary payloads dominate I/O, so stages (a) select only the
columns they touch (column pruning works on parquet/Iceberg binary
columns), (b) use mapInPandas so one task streams Arrow batches instead
of materializing the partition, and (c) repartition by a size-aware key
before heavy decode so batch payload bytes, not row counts, are balanced.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def _parse_ppm_header(data: bytes):
    """P6/P5 (binary PPM/PGM) header: magic, whitespace/comment-separated
    width height maxval, then raster. Pure byte parsing, no codec."""
    pos = 2
    fields = []
    while len(fields) < 3 and pos < len(data):
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace before raster
    return fields[0], fields[1], pos


def _decode_image_bytes(data: bytes, fake: bool):
    """Decode image metadata. fake=True → deterministic pseudo-image derived
    from the byte content (for oracle-checkable plumbing tests).
    fake=False → REAL header parsing for codec-free formats: BMP
    (BITMAPINFOHEADER) and binary PPM/PGM (P6/P5); other formats raise
    NotImplementedError (JPEG/PNG need codecs absent in this container)."""
    if data is None:
        return None
    if fake:
        h = int(np.frombuffer(data[:8].ljust(8, b"\0"), dtype=np.uint64)[0])
        w = int(16 + h % 48)
        ht = int(16 + (h >> 8) % 48)
        return {"width": w, "height": ht, "channels": 3, "format": "fake"}
    import struct

    if data[:2] == b"BM" and len(data) >= 30:
        w, ht = struct.unpack_from("<ii", data, 18)
        bpp = struct.unpack_from("<H", data, 28)[0]
        return {"width": int(w), "height": abs(int(ht)), "channels": max(1, bpp // 8), "format": "bmp"}
    if data[:2] in (b"P6", b"P5"):
        w, ht, _ = _parse_ppm_header(data)
        return {
            "width": int(w),
            "height": int(ht),
            "channels": 3 if data[:2] == b"P6" else 1,
            "format": "ppm" if data[:2] == b"P6" else "pgm",
        }
    raise NotImplementedError(
        "only BMP/PPM/PGM decode without codecs in this environment; "
        "install PIL and extend _decode_image_bytes for JPEG/PNG"
    )


def _decode_pixels(data: bytes) -> np.ndarray | None:
    """Raw pixel bytes for the supported codec-free formats: 24-bit
    uncompressed BMP (row padding stripped) or P6/P5 raster."""
    if data is None:
        return None
    import struct

    if data[:2] == b"BM":
        off = struct.unpack_from("<I", data, 10)[0]
        w, h = struct.unpack_from("<ii", data, 18)
        bpp = struct.unpack_from("<H", data, 28)[0]
        comp = struct.unpack_from("<I", data, 30)[0]
        if comp != 0:
            raise NotImplementedError("compressed BMP not supported")
        row_bytes = (w * (bpp // 8) + 3) // 4 * 4
        raster = np.frombuffer(data, dtype=np.uint8, count=row_bytes * abs(h), offset=off)
        rows = raster.reshape(abs(h), row_bytes)[:, : w * (bpp // 8)]
        return rows.reshape(-1)
    if data[:2] in (b"P6", b"P5"):
        w, h, pos = _parse_ppm_header(data)
        n = w * h * (3 if data[:2] == b"P6" else 1)
        return np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    raise NotImplementedError("only BMP/PPM/PGM pixel decode supported")


def image_metadata(df: DataFrame, binary_col: str = "html", fake: bool = True) -> DataFrame:
    """binary → typed metadata struct via mapInPandas (Arrow batches)."""
    fields = [f for f in df.schema.fields]
    out_schema = T.StructType(fields + [T.StructField("image_meta", IMAGE_META_SCHEMA)])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_image_bytes(b, fake) for b in pdf[binary_col]]
            pdf = pdf.copy()
            pdf["image_meta"] = metas
            yield pdf

    return df.mapInPandas(gen, out_schema)


def image_features(
    df: DataFrame,
    binary_col: str = "html",
    n_features: int = 8,
    fake: bool = True,
    normalize: bool = True,
) -> DataFrame:
    """binary → fixed-size feature vector (stubbed embedding).

    The fake featureizer is a deterministic byte-histogram projection, so
    tests can assert exact values and parallelism-invariance.
    ``normalize=True`` → L1-normalized float vector; ``normalize=False`` →
    raw integer counts (exactly reproducible in plain SQL, used by the
    correctness gate)."""
    fields = [f for f in df.schema.fields]
    elem = T.FloatType() if normalize else T.LongType()
    out_schema = T.StructType(fields + [T.StructField("image_vec", T.ArrayType(elem))])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for b in pdf[binary_col]:
                if b is None:
                    vecs.append(None)
                    continue
                # fake: histogram over the raw bytes; real: over the DECODED
                # pixel bytes (BMP/PPM/PGM — codec-free formats)
                arr = (
                    np.frombuffer(bytes(b), dtype=np.uint8)
                    if fake
                    else _decode_pixels(bytes(b))
                )
                hist = np.bincount(arr % n_features, minlength=n_features)
                if normalize:
                    hist = hist.astype(np.float32)
                    s = hist.sum()
                    vecs.append((hist / s if s else hist).tolist())
                else:
                    vecs.append([int(x) for x in hist])
            pdf = pdf.copy()
            pdf["image_vec"] = vecs
            yield pdf

    return df.mapInPandas(gen, out_schema)


def image_resize(
    df: DataFrame,
    binary_col: str = "html",
    width: int = 32,
    height: int = 32,
    out_col: str = "resized",
) -> DataFrame:
    """Nearest-neighbor resize for the codec-free formats (P6/P5 PPM/PGM
    and 24-bit BMP), re-encoded as binary PPM/PGM bytes — REAL pixel math
    in pure numpy (no image library needed), Arrow-batched via
    ``mapInPandas``. Undecodable formats (JPEG/PNG — codecs absent in
    this container) and malformed bytes yield NULL. BMP input rows come
    bottom-up; the output raster is emitted top-down like PPM expects.

    100-TB shape: map-side only — no shuffle, no driver collection; one
    pass over the binary column, output bounded at width×height×channels
    per row regardless of input size."""
    fields = [f for f in df.schema.fields]
    out_schema = T.StructType(fields + [T.StructField(out_col, T.BinaryType())])

    def _resize_one(b: bytes) -> bytes | None:
        try:
            meta = _decode_image_bytes(b, fake=False)
            px = _decode_pixels(b)
        except (NotImplementedError, ValueError, IndexError):
            return None
        if px is None or meta is None:
            return None
        w, h, ch = meta["width"], meta["height"], meta["channels"]
        if w <= 0 or h <= 0 or len(px) < w * h * ch:
            return None
        img = px[: w * h * ch].reshape(h, w, ch)
        if meta["format"] == "bmp":
            img = img[::-1]  # bottom-up rows → top-down
        ys = (np.arange(height) * h // height).clip(0, h - 1)
        xs = (np.arange(width) * w // width).clip(0, w - 1)
        out = img[ys][:, xs]
        if ch >= 3:
            if meta["format"] == "bmp":  # BGR → RGB for the PPM raster
                out = out[:, :, [2, 1, 0]]
            magic, ch_out = b"P6", 3
            out = out[:, :, :3]
        else:
            magic, ch_out = b"P5", 1
        header = b"%s\n%d %d\n255\n" % (magic, width, height)
        return header + out.astype(np.uint8).tobytes()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                _resize_one(bytes(b)) if b is not None else None for b in pdf[binary_col]
            ]
            yield pdf

    return df.mapInPandas(gen, out_schema)


def frame_sample(
    df: DataFrame,
    binary_col: str = "html",
    every_n_bytes: int = 4096,
    max_frames: int = 8,
) -> DataFrame:
    """Video-style frame sampling stub: emit one row per sampled "frame"
    (fixed-stride byte offsets). Demonstrates the explode-shaped pipeline
    (1 input row → N frame rows) with bounded fan-out."""
    out = df.withColumn(
        "frame_idx",
        F.explode(
            F.sequence(
                F.lit(0),
                F.least(
                    F.floor(F.length(binary_col) / F.lit(every_n_bytes)), F.lit(max_frames - 1)
                ),
            )
        ),
    )
    return out.withColumn(
        "frame_bytes",
        F.expr(f"substring({binary_col}, frame_idx * {every_n_bytes} + 1, {every_n_bytes})"),
    )
