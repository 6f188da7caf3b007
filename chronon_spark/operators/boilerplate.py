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
as a literal-array JVM filter when tiny (stays in codegen), else as an
Arrow-batched pandas filter over a broadcast frozenset. Either way the
removal pass adds ZERO shuffle. A corpus whose frequent-line set
exceeds ``max_boilerplate`` fails loudly rather than silently
truncating.
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
    import pandas as pd

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
    if not removed:
        kept = parts
    elif len(removed) <= literal_limit:
        lit_set = F.array(*[F.lit(s) for s in sorted(removed)])
        kept = F.filter(parts, lambda l: ~F.array_contains(lit_set, l))
    else:
        # fully vectorized Arrow set-filter: per batch, ONE pyarrow is_in
        # over the flattened line child array + an offsets rebuild — no
        # per-row Python loops (the old list-comprehension path walked
        # every line of every document in interpreted Python, exactly at
        # the >literal_limit scale where it runs)
        bset = docs.sparkSession.sparkContext.broadcast(sorted(removed))

        def _drop(series):
            import numpy as np
            import pyarrow as pa
            import pyarrow.compute as pc

            vs = getattr(_drop, "_vs", None)
            if vs is None:
                vs = pa.array(bset.value, type=pa.string())
                _drop._vs = vs
            arr = pa.array(series, type=pa.list_(pa.string()))
            null_mask = pc.is_null(arr).to_numpy(zero_copy_only=False)
            offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            flat = arr.values
            # split() never yields null elements; fill_null guards anyway
            keep = pc.fill_null(pc.invert(pc.is_in(flat, value_set=vs)), True)
            kb = keep.to_numpy(zero_copy_only=False).astype(np.int64)
            cum = np.concatenate([[0], np.cumsum(kb)])
            new_off = cum[offsets - offsets[0]]
            out = pa.ListArray.from_arrays(
                pa.array(new_off, type=pa.int32()), flat.filter(keep)
            )
            ser = pd.Series(out.to_pandas())
            if null_mask.any():
                ser[null_mask] = None
            return ser

        _drop.__annotations__ = {"series": pd.Series, "return": pd.Series}
        from pyspark.sql.types import ArrayType, StringType

        drop_udf = F.pandas_udf(ArrayType(StringType()))(_drop)
        kept = drop_udf(parts)
    res = docs.withColumn("__kept", kept)
    return (
        res.withColumn(out_col, F.array_join(F.col("__kept"), sep))
        .withColumn("n_lines_removed", n_before - F.size("__kept"))
        .drop("__kept")
    )
