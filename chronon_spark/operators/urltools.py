"""URL canonicalization & decomposition for web-crawl corpora.

Common-Crawl-style pipelines key everything on the url (the engine's
own as-of joins do too — BASELINE.json input_hint), so "the same page"
must mean one canonical string: case-folded scheme/host, default ports
stripped, fragments dropped, tracking parameters (utm_*, fbclid,
gclid) removed, surviving query params sorted, trailing slash trimmed.
The reference engine has no URL operator — beyond-reference
training-data surface, beside textstats/curation.

100 TB shape: a pure map-side projection — regexp_extract / split /
higher-order filter+sort, all JVM expressions inside whole-stage
codegen, zero shuffle. Downstream dedup/groupBys then key on
``url_norm`` or ``url_domain`` directly; canonicalizing BEFORE the
first shuffle is what collapses crawl-dup keys early enough to matter.

Deliberately regex-based (not java.net.URI) so the DuckDB/RE2 oracle
can mirror the exact semantics; inputs are assumed to be
scheme-qualified absolute URLs as found in WARC headers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRACKING_RE = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref_src)="


def url_normalize(df: DataFrame, url_col: str = "url", prefix: str = "url") -> DataFrame:
    """Adds ``{prefix}_scheme/_host/_domain/_path/_query/_norm`` columns.

    - scheme + host lowercased; ``:80``/``:443`` dropped when they are
      the scheme default (other ports kept)
    - fragment removed
    - query: tracking params removed, the rest sorted bytewise and
      re-joined; an emptied query drops its ``?``
    - path: trailing ``/`` trimmed (a bare ``/`` collapses to empty)
    - domain: the last two dot-labels of the host
    """
    u = url_col
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    # userinfo (user:pass@) is dropped from the canonical form — it is
    # never part of a crawl identity and frequently carries credentials
    auth = (
        f"regexp_replace(lower(regexp_extract({u}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), '^[^@]*@', '')"
    )
    # strip the scheme-default port only
    host_port = (
        f"CASE WHEN __scheme = 'https' THEN regexp_replace(__auth, ':443$', '') "
        f"WHEN __scheme = 'http' THEN regexp_replace(__auth, ':80$', '') "
        f"ELSE __auth END"
    )
    path_raw = f"regexp_extract({u}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)"
    path = f"regexp_replace({path_raw}, '/$', '')"
    query_raw = f"regexp_extract({u}, '\\\\?([^#]*)', 1)"
    kept = (
        f"array_join(array_sort(filter(split({query_raw}, '&'), "
        f"p -> p != '' AND NOT (p || '=') RLIKE '{TRACKING_RE}')), '&')"
    )
    df = (
        df.withColumn("__scheme", F.expr(scheme))
        .withColumn("__auth", F.expr(auth))
        .withColumn(f"{prefix}_host", F.expr(f"regexp_replace({host_port}, ':[0-9]+$', '')"))
        .withColumn(f"{prefix}_hostport", F.expr(host_port))
        .withColumn(f"{prefix}_path", F.expr(path))
        .withColumn(f"{prefix}_query", F.expr(kept))
    )
    df = df.withColumn(
        f"{prefix}_domain",
        F.expr(f"regexp_extract({prefix}_host, '([^.]+\\\\.[^.]+)$', 1)"),
    )
    df = df.withColumn(
        f"{prefix}_norm",
        F.expr(
            f"concat(__scheme, '://', {prefix}_hostport, {prefix}_path, "
            f"CASE WHEN {prefix}_query != '' THEN concat('?', {prefix}_query) ELSE '' END)"
        ),
    )
    return (
        df.withColumn(f"{prefix}_scheme", F.col("__scheme"))
        .drop("__scheme", "__auth", f"{prefix}_hostport")
    )
