"""Boilerplate-line removal — corpus-frequency line dedup (the C4 /
RefinedWeb step that strips cookie banners, nav text, and license
headers appearing verbatim across many documents).

A line is boilerplate when it occurs in at least ``min_doc_freq``
DISTINCT documents; those lines are deleted from every document (the
document itself survives). The reference engine has no such operator —
beyond-reference training-data surface.

100 TB shape: document text never rides a shuffle. The frequency pass
explodes per-doc DISTINCT lines (map-side partial agg collapses
within-partition repeats before the hash shuffle) and counts docs per
line; the boilerplate set — small by construction, that is the point
of the filter — is collected under a hard cap and applied MAP-SIDE:
as a literal-array JVM filter when tiny (stays in codegen), else via
mapInArrow (JVM regex split, then one pyarrow is_in over the flattened
line buffers + offsets rebuild — zero pandas/Python-object
materialization). Either way the removal pass adds ZERO shuffle. A
corpus whose frequent-line set exceeds ``max_boilerplate`` fails
loudly rather than silently truncating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# above this, a literal array would bloat the plan (the r5 lesson: deep
# literal trees can overflow the JVM parser/codegen) — switch to Arrow
_LITERAL_LIMIT = 1000


def boilerplate_lines(
    docs: DataFrame,
    min_doc_freq: int = 3,
    sep: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(line, n_docs) for every non-empty line appearing in >=
    ``min_doc_freq`` distinct documents. Lines are compared verbatim
    (no normalization — boilerplate repeats byte-identically).
    ``sep`` is a Java regex, as in ``split``."""
    lines = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), sep))).alias("line"),
    ).filter("line != ''")
    return (
        lines.groupBy("line")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_doc_freq)
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    min_doc_freq: int = 3,
    sep: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str | None = None,
    max_boilerplate: int = 1_000_000,
    literal_limit: int | None = None,
) -> DataFrame:
    """Delete corpus-frequent lines from every document. Adds
    ``{out_col}`` (cleaned text, default ``{text_col}_clean``) and
    ``n_lines_removed`` so the deletion stays auditable. Join char for
    reassembly is ``sep``'s literal form when it is a plain character
    (regex seps rejoin with their escaped text).

    ``literal_limit``: boilerplate sets up to this size apply as a
    literal-array codegen filter; larger sets via the Arrow kernel
    (exposed so tests/benches can force either path)."""
    out_col = out_col or f"{text_col}_clean"
    if literal_limit is None:
        literal_limit = _LITERAL_LIMIT
    bp = boilerplate_lines(docs, min_doc_freq, sep, id_col, text_col)
    removed = [
        r["line"] for r in bp.select("line").limit(max_boilerplate + 1).collect()
    ]
    if len(removed) > max_boilerplate:
        raise RuntimeError(
            f"boilerplate set exceeds max_boilerplate={max_boilerplate}; "
            "raise the cap or pre-filter the corpus"
        )
    parts = F.split(F.col(text_col), sep)
    n_before = F.size(parts)
    if not removed or len(removed) <= literal_limit:
        if not removed:
            kept = parts
        else:
            lit_set = F.array(*[F.lit(s) for s in sorted(removed)])
            kept = F.filter(parts, lambda l: ~F.array_contains(lit_set, l))
        res = docs.withColumn("__kept", kept)
        return (
            res.withColumn(out_col, F.array_join(F.col("__kept"), sep))
            .withColumn("n_lines_removed", n_before - F.size("__kept"))
            .drop("__kept")
        )

    # Large-set path: mapInArrow with ZERO pandas materialization. A
    # scalar pandas_udf would convert every line to a Python string on
    # the way in AND back to Arrow on the way out — measured 2.4-5x
    # slower than this form at 1M x 70-line docs (and the old per-row
    # frozenset comprehension sat between the two: the set lookups were
    # never the cost, the object materialization was). Here the JVM does
    # the regex split (keeping Java split semantics for regex seps), the
    # list<string> column crosses as Arrow buffers, and the filter is one
    # pyarrow is_in over the flattened child + an offsets rebuild. All
    # other columns ride the Arrow boundary unchanged — bounded cost,
    # and the wide column (text) is needed by this op anyway.
    import pyarrow as pa
    from pyspark.sql import types as T

    bset = docs.sparkSession.sparkContext.broadcast(sorted(removed))
    PARTS = "__bp_parts"
    src = docs.withColumn(PARTS, parts)
    out_fields = [f for f in docs.schema.fields if f.name != out_col]
    out_names = [f.name for f in out_fields]
    out_schema = T.StructType(
        out_fields
        + [T.StructField(out_col, T.StringType(), True),
           T.StructField("n_lines_removed", T.IntegerType(), True)]
    )

    def _clean(batches):
        import numpy as np
        import pyarrow.compute as pc

        vs = pa.array(bset.value, type=pa.string())
        for b in batches:
            lists = b.column(b.schema.get_field_index(PARTS))
            if isinstance(lists, pa.ChunkedArray):  # defensive; batches are flat
                lists = lists.combine_chunks()
            null_mask = pc.is_null(lists).to_numpy(zero_copy_only=False)
            offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            flat = lists.values
            keep = pc.fill_null(pc.invert(pc.is_in(flat, value_set=vs)), True)
            kb = keep.to_numpy(zero_copy_only=False).astype(np.int64)
            cum = np.concatenate([[0], np.cumsum(kb)])
            new_off = cum[offsets - offsets[0]]
            kept_arr = pa.ListArray.from_arrays(
                pa.array(new_off, type=pa.int32()), flat.filter(keep)
            )
            joined = pc.binary_join(kept_arr, sep)
            nrem = (np.diff(offsets) - np.diff(new_off)).astype(np.int32)
            nrem_arr = pa.array(nrem, type=pa.int32())
            if null_mask.any():
                # null text: null cleaned text, 0 removed — same as the
                # literal path's array_join(null)/size(null) algebra
                valid = pa.array(~null_mask)
                joined = pc.if_else(valid, joined, pa.nulls(len(null_mask), pa.string()))
                nrem_arr = pc.if_else(valid, nrem_arr, pa.scalar(0, pa.int32()))
            cols = [b.column(b.schema.get_field_index(n)) for n in out_names]
            yield pa.RecordBatch.from_arrays(
                cols + [joined, nrem_arr], out_names + [out_col, "n_lines_removed"]
            )

    out = src.mapInArrow(_clean, out_schema)
    # withColumn semantics: an out_col that replaces an existing column
    # keeps its original position, a new one lands at the end
    final_cols = docs.columns if out_col in docs.columns else docs.columns + [out_col]
    return out.select(*final_cols, "n_lines_removed")
