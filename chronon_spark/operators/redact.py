"""PII redaction — regex masking of emails / IPv4 / phone numbers.

Web-crawl training corpora mask personal identifiers before anything
downstream sees the text (the C4 / FineWeb anonymization step). The
reference engine has no such operator — beyond-reference training-data
surface, beside textstats/curation.

100 TB shape: a pure map-side projection — counts via ``regexp_count``
and masking via chained ``regexp_replace``, all JVM regex inside
whole-stage codegen, zero shuffle, column-pruned to the text column.
Patterns deliberately stay in the Java-regex ∩ RE2 dialect subset
(no backrefs, no lookarounds) so the same strings drive Spark and the
DuckDB/RE2 oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ordered: replacement tokens of earlier kinds must not be matchable by
# later patterns (the mask tokens contain no digits or '@')
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+\d[\d ()-]{6,}\d",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Mask each PII kind with ``<kind>`` and count matches per kind.

    Counts are taken on the ORIGINAL text (so ``n_{kind}`` is what was
    removed, not what survived earlier replacements); masking is applied
    in dict order. Adds ``n_{kind}`` per kind, ``pii_total``, and the
    redacted text column (default ``{text_col}_redacted``) — keeping the
    counts observable is what makes redaction auditable downstream.
    """
    pats = patterns or PII_PATTERNS
    out_col = out_col or f"{text_col}_redacted"
    total = F.lit(0)
    for kind, pat in pats.items():
        df = df.withColumn(
            f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pat))
        )
        total = total + F.col(f"n_{kind}")
    df = df.withColumn("pii_total", total)
    red = F.col(text_col)
    for kind, pat in pats.items():
        red = F.regexp_replace(red, pat, f"<{kind}>")
    return df.withColumn(out_col, red)
