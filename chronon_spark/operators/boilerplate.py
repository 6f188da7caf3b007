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
) -> DataFrame:
    """Delete corpus-frequent lines from every document. Adds
    ``{out_col}`` (cleaned text, default ``{text_col}_clean``) and
    ``n_lines_removed`` so the deletion stays auditable. Join char for
    reassembly is ``sep``'s literal form when it is a plain character
    (regex seps rejoin with their escaped text)."""
    import pandas as pd

    out_col = out_col or f"{text_col}_clean"
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
    elif len(removed) <= _LITERAL_LIMIT:
        lit_set = F.array(*[F.lit(s) for s in sorted(removed)])
        kept = F.filter(parts, lambda l: ~F.array_contains(lit_set, l))
    else:
        bset = docs.sparkSession.sparkContext.broadcast(frozenset(removed))

        def _drop(series):
            s = bset.value
            return series.map(lambda arr: [l for l in arr if l not in s])

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
