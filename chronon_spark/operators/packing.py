"""Sequence packing — concat-and-chunk document → training-sequence layout.

Pretraining pipelines concatenate documents (EOS-joined) in a
deterministic order and slice the token stream into fixed-length
sequences; a document occupies packs ``[cum_before // L,
(cum_before + n_tokens - 1) // L]``. This operator plans that layout
WITHOUT materializing token arrays: one window shuffle per group
computes the running token count, everything else is map-side
arithmetic on counts. The reference engine has no packing operator —
beyond-reference training-data surface.

100 TB shape: packing is inherently sequential WITHIN a stream, so the
scale axis is the group column (day, shard, source) — each group packs
independently and in parallel under one hash-partitioned window sort.
Choose groups so a single group's doc count fits one task comfortably;
a corpus sharded by day × source gives thousands of independent
streams. Token counting here is a JVM split/size over whitespace;
pass ``tokens_col`` to use a real tokenizer's precomputed counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc sliding-window chunking (the embedding/RAG counterpart of
    concat-and-chunk packing): whitespace-token windows of
    ``chunk_tokens`` advancing by ``stride`` (default = chunk_tokens,
    i.e. no overlap). Emits (doc, chunk_id, start_tok, n_tokens,
    chunk_text); the final short window is kept only when the doc has no
    full window (short docs still yield one chunk) or it adds unseen
    tokens past the last full window.

    100 TB shape: one map-side split + explode over window starts —
    slice/array_join inside the generator, no shuffle; chunk ids are
    deterministic (doc-local ordinals), so downstream embedding joins
    key on (doc_id, chunk_id) stably across reruns.
    """
    stride = stride or chunk_tokens
    toks = f"split({text_col}, ' ')"
    # window starts: 0, stride, ... while start + chunk <= n; plus a tail
    # start when tokens remain past the last full window (or the doc is
    # shorter than one window)
    starts = (
        f"CASE WHEN size({toks}) <= {chunk_tokens} THEN array(0) "
        f"ELSE array_union("
        f"  transform(sequence(0, int(floor((size({toks}) - {chunk_tokens}) / {stride}))), i -> i * {stride}), "
        f"  array(size({toks}) - {chunk_tokens})) END"
    )
    d = docs.select(
        F.col(id_col),
        F.expr(toks).alias("__tk"),
        F.posexplode(F.expr(starts)).alias("chunk_id", "start_tok"),
    )
    return d.select(
        id_col,
        "chunk_id",
        "start_tok",
        F.least(F.lit(chunk_tokens), F.size("__tk") - F.col("start_tok")).alias("n_tokens"),
        F.expr(f"array_join(slice(__tk, start_tok + 1, {chunk_tokens}), ' ')").alias("chunk_text"),
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    eos: int = 1,
) -> DataFrame:
    """Per doc: token count (+``eos`` stream separator), its offset in
    the group's concatenated token stream, and the first/last pack index
    it lands in at ``seq_len``-token packs."""
    n: Column = (
        F.col(tokens_col)
        if tokens_col
        else F.size(F.split(F.col(text_col), " "))
    ) + F.lit(eos)
    t = docs.select(F.col(group_col), F.col(id_col), n.alias("n_tokens"))
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = t.withColumn(
        "stream_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    # integer DIV, not double division: stream offsets at corpus scale
    # exceed 2^53 and float floor would mis-bin
    return t.select(
        group_col,
        id_col,
        "n_tokens",
        "stream_offset",
        F.expr(f"stream_offset DIV {seq_len}").alias("pack_first"),
        F.expr(f"(stream_offset + n_tokens - 1) DIV {seq_len}").alias("pack_last"),
        F.expr(f"stream_offset % {seq_len}").alias("pack_offset"),
    )
