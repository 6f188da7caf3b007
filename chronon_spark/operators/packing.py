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
