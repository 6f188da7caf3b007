"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched ``mapInPandas`` stages.

The decode step is STUBBED (this container has no image/audio codecs):
``decode=...`` selects either a clearly-marked NotImplementedError or the
deterministic fake decoder, while the Spark-side contract — schema,
batching, partition sizing, UDF signatures — is real and tested. Swapping
in PIL/ffmpeg later changes only ``_decode_image_bytes``.

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


def _decode_image_bytes(data: bytes, fake: bool):
    """Stub decode. fake=True → deterministic pseudo-image derived from the
    byte content; fake=False → explicit NotImplementedError."""
    if not fake:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "use fake=True or install PIL and replace _decode_image_bytes"
        )
    if data is None:
        return None
    h = int(np.frombuffer(data[:8].ljust(8, b"\0"), dtype=np.uint64)[0])
    w = int(16 + h % 48)
    ht = int(16 + (h >> 8) % 48)
    return {"width": w, "height": ht, "channels": 3, "format": "fake"}


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
            if not fake:
                raise NotImplementedError("real image featurizer not available here")
            vecs = []
            for b in pdf[binary_col]:
                if b is None:
                    vecs.append(None)
                    continue
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
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
