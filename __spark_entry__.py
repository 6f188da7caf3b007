"""Driver contract: entry() smoke, queries() vs oracle_sql() correctness gate.

Each queries() entry exercises one engine operator family from SURVEY.md §2
(chronon_spark.*); each oracle_sql() entry is the equivalent ANSI/DuckDB SQL
over the same parquet views. Column names and rounding match exactly on both
sides (driver hashes values after sorting columns by name).

Engine time contract: epoch-millis long derived tz-independently from the
timestamp_ntz columns — every callable pins the session timezone to UTC so
date/millis derivations agree with DuckDB's naive-timestamp arithmetic.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# make the engine importable regardless of the caller's cwd
_ROOT = os.path.dirname(os.path.abspath(__file__))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

# Pre-import the engine modules the query callables use. The per-query
# `from chronon_spark.operators.X import Y` statements stay (locality),
# but with the modules already in sys.modules they cost microseconds —
# without this, module import time (numpy-adjacent operator modules,
# ~2.2s across the headline suite, measured) lands INSIDE whichever
# timed query happens to touch each module first. Imports are
# once-per-process setup and belong at import time.
import chronon_spark.operators.boilerplate  # noqa: E402,F401
import chronon_spark.operators.collections  # noqa: E402,F401
import chronon_spark.operators.components  # noqa: E402,F401
import chronon_spark.operators.curation  # noqa: E402,F401
import chronon_spark.operators.decontam  # noqa: E402,F401
import chronon_spark.operators.dedup  # noqa: E402,F401
import chronon_spark.operators.features  # noqa: E402,F401
import chronon_spark.operators.groupby  # noqa: E402,F401
import chronon_spark.operators.join  # noqa: E402,F401
import chronon_spark.operators.labels  # noqa: E402,F401
import chronon_spark.operators.lmscore  # noqa: E402,F401
import chronon_spark.operators.logflatten  # noqa: E402,F401
import chronon_spark.operators.model  # noqa: E402,F401
import chronon_spark.operators.multimodal  # noqa: E402,F401
import chronon_spark.operators.mutations  # noqa: E402,F401
import chronon_spark.operators.packing  # noqa: E402,F401
import chronon_spark.operators.redact  # noqa: E402,F401
import chronon_spark.operators.sampling  # noqa: E402,F401
import chronon_spark.operators.similarity  # noqa: E402,F401
import chronon_spark.operators.staging  # noqa: E402,F401
import chronon_spark.operators.stats  # noqa: E402,F401
import chronon_spark.operators.temporal  # noqa: E402,F401
import chronon_spark.operators.textstats  # noqa: E402,F401
import chronon_spark.operators.tiled  # noqa: E402,F401
import chronon_spark.operators.tilestore  # noqa: E402,F401
import chronon_spark.operators.upload  # noqa: E402,F401
import chronon_spark.operators.urltools  # noqa: E402,F401
import chronon_spark.operators.vocab  # noqa: E402,F401
import chronon_spark.pipelines.webtext  # noqa: E402,F401
import chronon_spark.streaming.dedupe  # noqa: E402,F401

MS_7D = 604_800_000
MS_3D = 259_200_000
MS_6H = 21_600_000
MS_DAY = 86_400_000
HOP_1H = 3_600_000
HOP_5M = 300_000


def _utc(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# Per-(application, path) memo of LAZY scan frames over the immutable
# test inputs: a DataFrame is just a plan — every action still computes
# from the parquet files (no results or intermediates are cached) — but
# re-building the same scan per query costs a file-listing + schema read
# + ~100 py4j round trips each time (~0.1-0.5s/query, measured).
_READ_MEMO: dict[tuple[str, str], DataFrame] = {}


def _memo_frame(spark: SparkSession, key: str, build) -> DataFrame:
    k = (spark.sparkContext.applicationId, key)
    df = _READ_MEMO.get(k)
    if df is None:
        df = build()
        _READ_MEMO[k] = df
    return df


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _memo_frame(
        spark,
        f"events:{sf_dir}",
        lambda: spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
            "event_id",
            "user_id",
            "unix_millis(cast(ts as timestamp)) AS ts",
            "value",
            "event_type",
            "date_format(cast(ts as date), 'yyyy-MM-dd') AS ds",
        ),
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _memo_frame(
        spark, f"docs:{sf_dir}", lambda: spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _memo_frame(
        spark, f"emb:{sf_dir}", lambda: spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    )


def _ds_bounds(ev: DataFrame, parquet_path: "str | None" = None) -> tuple[str, str]:
    """(min ds, max ds) of an events frame.

    Fast path: when the frame comes straight from a parquet file whose
    path is given, the bounds are read from the parquet FOOTER statistics
    of the ``ts`` column (ds is date_format(ts) and date() is monotone in
    ts, so min/max ds = date of min/max ts) — zero Spark jobs instead of
    a full-column scan-aggregate per query. At 100 TB this is the
    difference between O(row-group footers) and O(data). Falls back to
    the Spark aggregate when any row group lacks exact ts stats or holds
    nulls (timestamp min/max stats are exact, unlike truncated strings)."""
    if parquet_path is not None:
        try:
            import glob as _glob

            import pyarrow.parquet as _pq

            files = (
                sorted(_glob.glob(os.path.join(parquet_path, "*.parquet")))
                if os.path.isdir(parquet_path)
                else [parquet_path]
            )
            lo = hi = None
            for fp in files:
                md = _pq.ParquetFile(fp).metadata
                names = {md.schema.column(i).name: i for i in range(md.num_columns)}
                ci = names["ts"]
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(ci).statistics
                    if st is None or not st.has_min_max or (st.null_count or 0) > 0:
                        raise ValueError("no exact ts stats")
                    lo = st.min if lo is None or st.min < lo else lo
                    hi = st.max if hi is None or st.max > hi else hi
            if lo is not None:
                return lo.strftime("%Y-%m-%d"), hi.strftime("%Y-%m-%d")
        except Exception:
            pass  # fall through to the scan-aggregate
    r = ev.agg(F.min("ds").alias("a"), F.max("ds").alias("b")).first()
    return r["a"], r["b"]


# --------------------------------------------------------------------- queries


def q_groupby_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot GroupBy: daily 7d-window features per user (operators/groupby)."""
    _utc(spark)
    from chronon_spark.api.types import Aggregation, EventSource, GroupBy, Operation, Window
    from chronon_spark.operators.groupby import snapshot_events

    ev = _events(spark, sf_dir)
    start, end = _ds_bounds(ev, f"{sf_dir}/events.parquet")
    gb = GroupBy(
        name="snap",
        sources=(EventSource(table="events"),),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("value", Operation.COUNT, windows=(Window(7),)),
            Aggregation("value", Operation.SUM, windows=(Window(7),)),
            Aggregation("value", Operation.AVERAGE, windows=(Window(7),)),
            Aggregation("value", Operation.MIN, windows=(Window(7),)),
            Aggregation("value", Operation.MAX, windows=(Window(7),)),
        ),
    )
    out = snapshot_events(spark, gb, ev, start, end)
    # avg pinned as integer micro-units via exact integer division: values
    # have 2 decimals, so sum*100 is an exact integer on both engines and
    # (cents * 10000) DIV count is tie-free — round(avg, 6) lands on exact
    # .5 boundaries (e.g. 1333.61/32) where Spark HALF_UP and the oracle's
    # double path disagree by 1 ulp at sf0.1
    return out.select(
        "user_id",
        "ds",
        F.col("value_count_7d").alias("value_count_7d"),
        F.round("value_sum_7d", 6).alias("value_sum_7d"),
        F.expr(
            "(CAST(round(value_sum_7d * 100) AS BIGINT) * 10000) DIV value_count_7d"
        ).alias("value_avg_7d_micro"),
        F.round("value_min_7d", 6).alias("value_min_7d"),
        F.round("value_max_7d", 6).alias("value_max_7d"),
    )


def q_groupby_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (as-of) GroupBy: exact sawtooth windows per event
    (operators/temporal — the point-in-time core)."""
    _utc(spark)
    from chronon_spark.api.types import Accuracy, Aggregation, EventSource, GroupBy, Operation, TimeUnit, Window
    from chronon_spark.operators.temporal import temporal_events

    ev = _events(spark, sf_dir)
    gb = GroupBy(
        name="tmp",
        sources=(EventSource(table="events"),),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("value", Operation.COUNT, windows=(None,)),
            Aggregation("value", Operation.SUM, windows=(Window(7),)),
            Aggregation("value", Operation.AVERAGE, windows=(Window(6, TimeUnit.HOURS),)),
            Aggregation("value", Operation.MIN, windows=(Window(7),)),
            Aggregation("value", Operation.MAX, windows=(Window(7),)),
        ),
        accuracy=Accuracy.TEMPORAL,
    )
    q = ev.select("event_id", "user_id", "ts")
    # mode="raw" + passthrough: queries sit at EVERY event (dense pattern),
    # so hop tiling degenerates — every 5-min tile contains a query head
    # and the head semi-join keeps ~all raw events ANYWAY, making the
    # tiled path ~ raw + tile-build overhead (same reasoning as the
    # webtext pipeline, pipelines/webtext.py). The slim 3-column query
    # frame rides the kernel directly (passthrough), skipping the
    # uniqSort-distinct + join-back shuffles. Measured 5.2s -> 1.15s at
    # sf0.1, bit-identical output (both kernels share the (ts, value)
    # tie contract).
    out = temporal_events(
        spark, gb, q, ev.select("user_id", "ts", "value"), mode="raw", passthrough=True
    )
    return out.select(
        "event_id",
        F.col("value_count").alias("value_count"),
        F.round("value_sum_7d", 6).alias("value_sum_7d"),
        F.round("value_average_6h", 6).alias("value_avg_6h"),
        F.round("value_min_7d", 6).alias("value_min_7d"),
        F.round("value_max_7d", 6).alias("value_max_7d"),
    )


def q_join_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time Join: temporal part + snapshot part folded onto an
    event left (operators/join)."""
    _utc(spark)
    from chronon_spark.api.types import (
        Accuracy,
        Aggregation,
        EventSource,
        GroupBy,
        Join,
        JoinPart,
        Operation,
        Query,
        Window,
    )
    from chronon_spark.operators.join import join_backfill

    path = f"{sf_dir}/events.parquet"
    tcol = "unix_millis(cast(ts as timestamp))"
    src = EventSource(
        table=path,
        query=Query(selects={"user_id": None, "value": None}, time_column=tcol),
    )
    gb_t = GroupBy(
        name="t",
        sources=(src,),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("value", Operation.SUM, windows=(Window(7),)),
            Aggregation("value", Operation.COUNT, windows=(Window(7),)),
        ),
        accuracy=Accuracy.TEMPORAL,
    )
    gb_s = GroupBy(
        name="s",
        sources=(src,),
        key_columns=("user_id",),
        aggregations=(Aggregation("value", Operation.COUNT, windows=(Window(3),)),),
        accuracy=Accuracy.SNAPSHOT,
    )
    left = EventSource(
        table=path,
        query=Query(selects={"event_id": None, "user_id": None}, time_column=tcol),
    )
    join = Join(name="jb", left=left, right_parts=(JoinPart(gb_t), JoinPart(gb_s)))
    ev = _events(spark, sf_dir)
    start, end = _ds_bounds(ev, f"{sf_dir}/events.parquet")
    # temporal_mode="raw": the left spine IS the right-source event set
    # (self-join backfill), so the temporal part's queries are dense —
    # the raw kernel avoids the degenerate tile build (see
    # operators/join.compute_join_part and pipelines/webtext.py)
    out = join_backfill(spark, join, start, end, temporal_mode="raw")
    return out.select(
        "event_id",
        F.round("t_value_sum_7d", 6).alias("t_value_sum_7d"),
        F.col("t_value_count_7d").alias("t_value_count_7d"),
        F.col("s_value_count_3d").alias("s_value_count_3d"),
    )


def q_temporal_collections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-algebraic ops on the hop-TILED temporal path (mode='tiled'
    forced): sliding-counter UNIQUE/HISTOGRAM, k-heap TOP_K/LAST_K with
    1h/1d rollup levels, weighted-sample percentiles — each adjudicated
    against DuckDB's naive as-of SQL."""
    _utc(spark)
    from chronon_spark.api.types import Accuracy, Aggregation, EventSource, GroupBy, Operation, Window
    from chronon_spark.operators.temporal import temporal_events

    ev = _events(spark, sf_dir)
    gb = GroupBy(
        name="tc",
        sources=(EventSource(table="events"),),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("event_type", Operation.UNIQUE_COUNT, windows=(Window(7),)),
            Aggregation("event_type", Operation.HISTOGRAM, windows=(Window(7),)),
            Aggregation("value", Operation.TOP_K, arg_map={"k": 3}, windows=(Window(7),)),
            Aggregation("value", Operation.LAST_K, arg_map={"k": 3}, windows=(Window(7),)),
            Aggregation(
                "value", Operation.APPROX_PERCENTILE,
                arg_map={"percentiles": [0.5]}, windows=(Window(7),),
            ),
        ),
        accuracy=Accuracy.TEMPORAL,
    )
    q = ev.select("event_id", "user_id", "ts")
    out = temporal_events(spark, gb, q, ev.select("user_id", "ts", "value", "event_type"), mode="tiled")
    return out.select(
        "event_id",
        F.col("event_type_unique_count_7d").alias("uniq_7d"),
        F.expr(
            "CASE WHEN event_type_histogram_7d IS NULL THEN NULL ELSE "
            "concat_ws(',', transform(array_sort(map_keys(event_type_histogram_7d)), "
            "k -> concat(k, ':', cast(element_at(event_type_histogram_7d, k) AS string)))) END"
        ).alias("type_hist_7d"),
        F.expr(
            "CASE WHEN value_top_k_3_7d IS NULL THEN NULL ELSE "
            "concat_ws(',', transform(value_top_k_3_7d, x -> format_string('%.6f', x))) END"
        ).alias("top3_7d"),
        F.expr(
            "CASE WHEN value_last_k_3_7d IS NULL THEN NULL ELSE "
            "concat_ws(',', transform(value_last_k_3_7d, x -> format_string('%.6f', x))) END"
        ).alias("last3_7d"),
        F.round(F.expr("element_at(value_approx_percentile_7d, 1)"), 6).alias("p50_7d"),
    )


def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    from chronon_spark.operators.features import lag_lead

    ev = _events(spark, sf_dir)
    out = lag_lead(ev, ["user_id"], "ts", {"value": [1, -1]})
    return out.select(
        "event_id",
        F.round("value_lag_1", 6).alias("value_lag_1"),
        F.round("value_lead_1", 6).alias("value_lead_1"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    from chronon_spark.operators.features import sessionize

    ev = _events(spark, sf_dir)
    out = sessionize(ev, ["user_id"], "ts", gap_ms=30 * 60 * 1000)
    return out.select("event_id", "session_id", "session_ts")


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    _utc(spark)
    from chronon_spark.operators.features import session_stats

    ev = _events(spark, sf_dir)
    s = session_stats(ev, ["user_id"], "ts", gap_ms=30 * 60 * 1000)
    return s.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.round(F.avg("session_events"), 6).alias("avg_session_events"),
        F.round(F.avg("session_duration_ms"), 6).alias("avg_session_duration_ms"),
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chronon_spark.operators.dedup import exact_dedup

    return exact_dedup(_docs(spark, sf_dir)).select("doc_id", "dup_count")


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-trigram jaccard over bounded doc pairs."""
    d = _docs(spark, sf_dir).filter("doc_id < 30").selectExpr("doc_id", "text")
    toks = "filter(split(regexp_replace(lower(trim(text)), '\\\\s+', ' '), ' '), t -> t != '')"
    tris = (
        f"CASE WHEN size({toks}) >= 3 THEN array_distinct(transform(sequence(0, size({toks}) - 3), "
        f"i -> concat_ws(' ', slice({toks}, i + 1, 3)))) "
        f"ELSE array(concat_ws(' ', {toks})) END"
    )
    d = d.withColumn("tri", F.expr(tris))
    a = d.selectExpr("doc_id AS id_a", "tri AS ta")
    b = d.selectExpr("doc_id AS id_b", "tri AS tb")
    pairs = a.crossJoin(b).filter("id_a < id_b")
    return pairs.select(
        "id_a",
        "id_b",
        F.round(
            F.expr(
                "CASE WHEN size(array_union(ta, tb)) > 0 "
                "THEN size(array_intersect(ta, tb)) / size(array_union(ta, tb)) ELSE 1.0D END"
            ),
            6,
        ).alias("jaccard"),
    )


def q_textstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chronon_spark.operators.textstats import quality_features

    out = quality_features(_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        "n_tokens",
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("digit_ratio", 6).alias("digit_ratio"),
        F.round("unique_token_ratio", 6).alias("unique_token_ratio"),
    )


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (operators/textstats.py): duplicate
    2/3-gram position fraction and the max character mass of any single
    repeated gram — Spark computes them shuffle-free via a run-length
    aggregate over sorted gram arrays; the oracle rebuilds the per-doc
    frequency table with UNNEST + GROUP BY."""
    from chronon_spark.operators.textstats import repetition_features

    out = repetition_features(_docs(spark, sf_dir), ns=(2, 3))
    return out.select(
        "doc_id",
        "frac_dup_2gram",
        "top_2gram_char_frac",
        "frac_dup_3gram",
        "top_3gram_char_frac",
    )


def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (streaming/dedupe.py): documents replayed as
    a file stream through dropDuplicatesWithinWatermark; WHICH copy
    survives is task-order, but the surviving FINGERPRINT set is exact,
    so the gate compares that against DuckDB's distinct md5 of the same
    normalization."""
    from chronon_spark.streaming.dedupe import stream_exact_dedup

    schema = _docs(spark, sf_dir).schema
    # file streams need a directory source; the testdata table is a single
    # file, so stream the parent dir with a glob pinned to it
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    # documents carries no event time; synthesize one (1s per doc)
    stream = stream.withColumn(
        "ts", F.lit(1_700_000_000_000) + F.col("doc_id") * 1_000
    )
    out = stream_exact_dedup(stream, watermark="10 days")
    q = (
        out.writeStream.format("memory")
        .queryName("gate_stream_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table("gate_stream_dedup").select("fingerprint").distinct()


def q_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components (operators/components.py) over a
    deterministic chain graph on doc ids (predecessor links with %7 and
    %16 breaks — chains up to 15 deep, so the path-halving rounds
    actually matter); the oracle walks the same graph with a recursive
    CTE and takes min reachable id per node."""
    from chronon_spark.operators.components import connected_components

    e = (
        _docs(spark, sf_dir)
        .select("doc_id")
        .filter("doc_id % 16 != 0 AND doc_id % 7 != 0")
        .select(
            F.col("doc_id").alias("id_a"),
            (F.col("doc_id") - 1).alias("id_b"),
        )
    )
    return connected_components(e).select(
        F.col("node").cast("long").alias("node"),
        F.col("component").cast("long").alias("component"),
    )


def q_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary rollup (operators/vocab.py): top 200 tokens by
    (doc_freq desc, token) with doc/term frequency and smoothed idf —
    the (doc, token) partial-agg stage and the corpus re-key both ride
    the gate."""
    from chronon_spark.operators.vocab import token_doc_freq

    out = token_doc_freq(_docs(spark, sf_dir))
    return (
        out.orderBy(F.desc("doc_freq"), F.asc("token"))
        .limit(200)
        .select(
            "token",
            F.col("doc_freq").cast("long").alias("doc_freq"),
            F.col("term_freq").cast("long").alias("term_freq"),
            F.round("idf", 6).alias("idf"),
        )
    )


def q_doc_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 tf-idf terms (operators/vocab.py): vocabulary
    broadcast back onto per-doc term counts; ranking on the 6dp-rounded
    score with bytewise token tie-break so both engines order
    identically."""
    from chronon_spark.operators.vocab import doc_tfidf_top_terms

    return doc_tfidf_top_terms(_docs(spark, sf_dir), k=3, min_df=2).select(
        "doc_id",
        F.col("rank").cast("long").alias("rank"),
        "token",
        F.col("tf").cast("long").alias("tf"),
        "tfidf",
    )


def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (operators/urltools.py): deterministic messy
    URLs (case-soup hosts, default/explicit ports, tracking params,
    fragments, trailing slashes) built from doc_id on both sides; the
    gate compares every decomposed column and the canonical string
    byte-for-byte."""
    from chronon_spark.operators.urltools import url_normalize

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.expr(
            "CASE CAST(doc_id % 4 AS INT) "
            "WHEN 0 THEN concat('HTTPS://WWW.Site', CAST(doc_id % 50 AS STRING), "
            "  '.Example.COM:443/a/', CAST(doc_id AS STRING), '/?utm_source=feed&b=2&a=1#x') "
            "WHEN 1 THEN concat('http://site', CAST(doc_id % 50 AS STRING), "
            "  '.example.org:80/p/', CAST(doc_id AS STRING)) "
            "WHEN 2 THEN concat('https://site', CAST(doc_id % 50 AS STRING), "
            "  '.example.net:8443/q?z=9&fbclid=abc', CAST(doc_id AS STRING)) "
            "ELSE concat('https://cdn', CAST(doc_id % 7 AS STRING), '.assets.io') END"
        ).alias("url"),
    )
    return url_normalize(d).select(
        "doc_id",
        "url_norm",
        "url_scheme",
        "url_host",
        "url_domain",
        "url_path",
        "url_query",
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling + train/valid/test split
    (operators/sampling.py): membership is md5(key:seed)-uniform, so the
    oracle reproduces the exact survivor set row-for-row. Split weights
    are binary-exact (0.75/0.125/0.125) so cumulative edges carry no
    float drift between engines."""
    from chronon_spark.operators.sampling import sample_stratified, split_assign

    rates = {"src0": 0.1, "src1": 0.9, "src2": 0.5, "src3": 0.75}
    s = sample_stratified(
        _docs(spark, sf_dir), rates, seed=7, default_rate=0.25
    )
    out = split_assign(
        s, {"train": 0.75, "valid": 0.125, "test": 0.125}, seed=11
    )
    return out.select(
        "doc_id",
        "source",
        F.round("sample_weight", 6).alias("sample_weight"),
        "split",
    )


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality scoring (operators/lmscore.py): per-doc mean
    token log-probability + perplexity under the corpus's own add-one-
    smoothed unigram distribution (the CCNet/KenLM filter analogue
    without an external model)."""
    from chronon_spark.operators.lmscore import lm_score

    return lm_score(_docs(spark, sf_dir)).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "mean_logp",
        "ppl",
    )


def q_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate-line removal (operators/
    boilerplate.py): deterministic cookie/footer lines injected on both
    sides; lines in >= 3 distinct docs are stripped map-side and the
    cleaned text is compared byte-for-byte."""
    from chronon_spark.operators.boilerplate import remove_boilerplate_lines

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.expr(
            "concat(text, "
            "CASE WHEN doc_id % 2 = 0 THEN '\\nCOOKIE NOTICE accept our terms' ELSE '' END, "
            "CASE WHEN doc_id % 3 = 0 THEN '\\nALL RIGHTS RESERVED' ELSE '' END, "
            "'\\nref-', CAST(doc_id AS STRING))"
        ).alias("text"),
    )
    out = remove_boilerplate_lines(d, min_doc_freq=3)
    return out.select(
        "doc_id",
        F.col("text_clean"),
        F.col("n_lines_removed").cast("long").alias("n_lines_removed"),
    )


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (operators/packing.py): 32-token windows,
    stride 24, tail window kept — chunk text compared byte-for-byte;
    the oracle rebuilds the start set and ranks it per doc."""
    from chronon_spark.operators.packing import chunk_documents

    return chunk_documents(_docs(spark, sf_dir), chunk_tokens=32, stride=24).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "chunk_text",
    )


def q_mixture_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (operators/sampling.py): per-source
    count^0.5 mixture weights and the capped sampling rates realizing a
    2000-doc target."""
    from chronon_spark.operators.sampling import mixture_rates

    out = mixture_rates(_docs(spark, sf_dir), alpha=0.5, target_total=2000)
    return out.select(
        "stratum",
        F.col("n_docs").cast("long").alias("n_docs"),
        "weight",
        "rate",
    )


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (operators/redact.py): documents get deterministic
    synthetic PII appended (an email per doc, an IPv4 on even ids, a
    phone on ids % 3 == 0) — the SAME construction in the oracle — then
    Spark masks/counts with Java regex and DuckDB with RE2; the gate
    compares the redacted strings byte-for-byte."""
    from chronon_spark.operators.redact import redact_pii

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat_ws(
            " ",
            F.col("text"),
            F.concat(F.lit("user"), F.col("doc_id").cast("string"), F.lit("@example.com")),
            F.when(
                F.expr("doc_id % 2 = 0"),
                F.concat(F.lit("10.0."), F.expr("CAST(doc_id % 256 AS STRING)"), F.lit(".7")),
            ),
            F.when(
                F.expr("doc_id % 3 = 0"),
                F.concat(F.lit("+1 415 "), F.expr("lpad(CAST(doc_id % 10000 AS STRING), 4, '0')")),
            ),
        ).alias("text"),
    )
    out = redact_pii(d)
    return out.select(
        "doc_id",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_ipv4").cast("long").alias("n_ipv4"),
        F.col("n_phone").cast("long").alias("n_phone"),
        F.col("pii_total").cast("long").alias("pii_total"),
        F.col("text_redacted").alias("redacted"),
    )


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/decontam.py): every 29th doc
    plays the held-out eval set; training docs are flagged when they
    share >= 3 distinct word 4-grams with it. Gram identity is by
    xxhash64 on the Spark side and by the gram string in the oracle —
    equality of distinct counts adjudicates the whole explode/broadcast
    join/count pipeline (collision-free at these cardinalities)."""
    from chronon_spark.operators.decontam import decontaminate

    d = _docs(spark, sf_dir)
    return decontaminate(
        d.filter("doc_id % 29 != 0"),
        d.filter("doc_id % 29 = 0"),
        n=4,
        min_hits=3,
    ).select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_hits").cast("long").alias("n_hits"),
        F.col("contaminated").cast("long").alias("contaminated"),
    )


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (operators/packing.py): per
    source stream in doc_id order, each doc's offset in the EOS-joined
    token stream and the 512-token packs it spans — the oracle replays
    the same running sum with a window."""
    from chronon_spark.operators.packing import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), seq_len=512).select(
        "source",
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("stream_offset").cast("long").alias("stream_offset"),
        "pack_first",
        "pack_last",
        F.col("pack_offset").cast("long").alias("pack_offset"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chronon_spark.operators.textstats import lang_id

    return lang_id(_docs(spark, sf_dir)).select("doc_id", "lang_pred")


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")).alias("fingerprint"),
    )


def q_similarity_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chronon_spark.operators.similarity import brute_force_top_k

    emb = _emb(spark, sf_dir)
    qs = emb.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = brute_force_top_k(emb, qs, k=10)
    # 4 dp: DuckDB computes list_dot_product in float32, Spark in float64
    return out.select("query_id", "rank", "vec_id", F.round("cosine", 4).alias("cosine"))


def _model_weights() -> "np.ndarray":
    import numpy as np

    return np.round(np.random.default_rng(123).normal(size=64), 6)


def q_model_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch model transform (ModelTransformBatchJob analogue): linear
    scorer score = sigmoid(w·embedding + b) over the embeddings table —
    deterministic seeded weights, oracle via DuckDB list_dot_product."""
    from chronon_spark.operators.model import LinearModelBackend

    be = LinearModelBackend(weights=_model_weights(), bias=0.25, link="sigmoid")
    out = be.transform(spark, _emb(spark, sf_dir))
    return out.select("vec_id", F.round("score", 6).alias("score"))


def q_log_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LogFlattenerJob analogue: events rendered as a raw serving log
    (JSON key/value payloads + schema hash, one corrupt payload per 97
    rows, one unregistered hash per 89) flattened through the schema
    registry — union schema, JVM-side decode, drop semantics."""
    from chronon_spark.operators.logflatten import flatten_log_table

    ev = _events(spark, sf_dir)
    raw = ev.select(
        F.to_json(F.struct("user_id")).alias("key_json"),
        F.when(
            F.expr("event_id % 97 = 0"), F.lit("NOT JSON")
        ).otherwise(F.to_json(F.struct("value", "event_type"))).alias("value_json"),
        F.col("ts").alias("ts_millis"),
        F.col("ds"),
        F.when(F.expr("event_id % 89 = 0"), F.lit("v9"))
        .otherwise(F.lit("v1"))
        .alias("schema_hash"),
    )
    flat, _ = flatten_log_table(
        spark, raw,
        {"v1": ("user_id bigint", "value double, event_type string")},
        with_stats=False,
    )
    return flat.select(
        "schema_hash", "ts_millis", "user_id",
        F.round("value", 6).alias("value"), "event_type",
    )


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation funnel (quality -> language -> exact dedup) over
    the documents table — the chained training-data pipeline, one scan +
    one 16-byte-key dedup shuffle."""
    from chronon_spark.operators.curation import curate_corpus

    curated, _ = curate_corpus(
        _docs(spark, sf_dir), min_tokens=20, max_punct_ratio=0.2, langs=("en", "de")
    )
    return curated.select("doc_id", "lang_pred", "n_tokens")


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine HISTOGRAM op (map IR) rendered as a sorted string for
    dialect-portable comparison."""
    from chronon_spark.api.types import AggregationPart, Operation
    from chronon_spark.functions.aggregations import OP_SPECS, DIRECT_NEEDS_FINALIZE

    ev = _events(spark, sf_dir)
    part = AggregationPart("event_type", Operation.HISTOGRAM, {}, None, None)
    spec = OP_SPECS[Operation.HISTOGRAM]
    agg = ev.groupBy("user_id").agg(spec.direct("event_type", part).alias("__h"))
    agg = agg.withColumn("__m", DIRECT_NEEDS_FINALIZE[Operation.HISTOGRAM]("__h", part))
    return agg.select(
        "user_id",
        F.expr(
            "concat_ws(',', transform(array_sort(map_keys(__m)), "
            "k -> concat(k, ':', cast(element_at(__m, k) AS string))))"
        ).alias("type_hist"),
    )


def q_approx_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPROX_HISTOGRAM_K: frequent-items map truncated to top-k by
    (count desc, key asc), rendered as a sorted string."""
    from chronon_spark.api.types import AggregationPart, Operation
    from chronon_spark.functions.aggregations import DIRECT_NEEDS_FINALIZE, OP_SPECS

    ev = _events(spark, sf_dir)
    part = AggregationPart("event_type", Operation.APPROX_HISTOGRAM_K, {"k": 2}, None, None)
    spec = OP_SPECS[Operation.APPROX_HISTOGRAM_K]
    agg = ev.groupBy("user_id").agg(spec.direct("event_type", part).alias("__h"))
    agg = agg.withColumn("__m", DIRECT_NEEDS_FINALIZE[Operation.APPROX_HISTOGRAM_K]("__h", part))
    return agg.select(
        "user_id",
        F.expr(
            "concat_ws(',', transform(array_sort(map_keys(__m)), "
            "k -> concat(k, ':', cast(element_at(__m, k) AS string))))"
        ).alias("hist_k"),
    )


def q_topk_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("element_at(reverse(array_sort(collect_list(value))), 1)"), 6).alias("top1"),
        F.round(F.expr("element_at(reverse(array_sort(collect_list(value))), 2)"), 6).alias("top2"),
        F.round(F.expr("element_at(reverse(array_sort(collect_list(value))), 3)"), 6).alias("top3"),
    )


def q_unique_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("type_unique"),
        F.least(F.countDistinct("event_type"), F.lit(3)).alias("type_unique_bounded_3"),
    )


def q_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANCE/SKEW/KURTOSIS via the engine's moment finalizers."""
    from chronon_spark.api.types import AggregationPart, Operation
    from chronon_spark.functions.aggregations import OP_SPECS

    ev = _events(spark, sf_dir)
    aggs = []
    for op, name in [
        (Operation.VARIANCE, "value_var"),
        (Operation.SKEW, "value_skew"),
        (Operation.KURTOSIS, "value_kurt"),
    ]:
        part = AggregationPart("value", op, {}, None, None)
        aggs.append(F.round(OP_SPECS[op].direct("value", part), 6).alias(name))
    return ev.groupBy("user_id").agg(*aggs)


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic scan→filter→agg over lineitem (pushdown/codegen showcase)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # All money/quantity columns are exact multiples of 1e-2 (1e-4 for the
    # discounted product), so summing scaled integers makes every aggregate
    # independent of float summation order — the gate hash can't flip with
    # DuckDB/Spark thread counts (same lesson as `derivations`/`join_chain`).
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.expr("CAST(round(l_quantity) AS BIGINT)")).alias("sum_qty"),
            F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).alias("base_price_cents"),
            F.sum(F.expr("CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)")).alias("disc_price_e4"),
            F.sum(F.expr("CAST(round(l_discount * 100) AS BIGINT)")).alias("disc_cents"),
            F.count("*").alias("count_order"),
        )
    )


# ------------------------------------------------- rows-only (no SQL oracle)


def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-duplicate recall gate: docs 0..19 are replanted verbatim at
    id+1M; MinHash LSH must recover every planted pair with estimated
    jaccard exactly 1.0 (identical text → identical signature → all bands
    collide). Output filtered to the planted pairs so the oracle is exact;
    full-corpus behavior is covered by pytest."""
    from chronon_spark.operators.dedup import minhash_near_dups

    d = _docs(spark, sf_dir)
    dup = d.filter("doc_id < 20").withColumn("doc_id", F.col("doc_id") + 1_000_000)
    out = minhash_near_dups(d.unionByName(dup), jaccard_threshold=0.8)
    return out.filter("id_b = id_a + 1000000 AND id_a < 20").select(
        "id_a", "id_b", F.round("jaccard_est", 6).alias("jacc")
    )


def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-duplicate recall gate (see q_minhash_near_dups): identical
    docs must be found at hamming distance exactly 0."""
    from chronon_spark.operators.dedup import simhash_near_dups

    d = _docs(spark, sf_dir)
    dup = d.filter("doc_id < 20").withColumn("doc_id", F.col("doc_id") + 1_000_000)
    out = simhash_near_dups(d.unionByName(dup), max_hamming=3)
    return out.filter("id_b = id_a + 1000000 AND id_a < 20").select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-duplicate recall gate: identical vectors share every LSH
    bucket and verify at cosine 1.0."""
    from chronon_spark.operators.dedup import embedding_near_dups

    e = _emb(spark, sf_dir)
    dup = e.filter("vec_id < 20").withColumn("vec_id", F.col("vec_id") + 1_000_000)
    out = embedding_near_dups(e.unionByName(dup), cosine_threshold=0.99)
    return out.filter("id_b = id_a + 1000000 AND id_a < 20").select(
        "id_a", "id_b", F.round("cosine", 6).alias("cos")
    )


def _ann_recall_gate(spark: SparkSession, sf_dir: str, approx_fn, threshold: float) -> DataFrame:
    """Recall@10-vs-bruteforce gate for an ANN variant: per query, the
    approximate top-10 must (a) contain the query itself at rank 1
    (self-hit) and (b) recover ≥ threshold of the exact top-10. Thresholds
    are set with ≥0.1 margin under the measured deterministic recall; on
    these isotropic gaussian embeddings neighbors are barely separated, so
    absolute recall is structurally modest — the gate proves the bucketed
    candidate generation finds true neighbors, not just itself."""
    from chronon_spark.operators.similarity import brute_force_top_k

    emb = _emb(spark, sf_dir)
    qs = emb.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    bf = brute_force_top_k(emb, qs, k=10).select("query_id", "vec_id")
    ap = approx_fn(emb, qs).select("query_id", "vec_id")
    hits = (
        bf.join(ap, ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("hits"))
    )
    self_hit = ap.filter(F.col("vec_id") == F.col("query_id")).select("query_id").distinct()
    return (
        qs.select("query_id")
        .join(hits, "query_id", "left")
        .join(self_hit.withColumn("self_ok", F.lit(True)), "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("hits"), F.lit(0)) >= F.lit(int(threshold * 10))).alias("recall_ok"),
            F.coalesce("self_ok", F.lit(False)).alias("self_ok"),
        )
    )


def q_similarity_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chronon_spark.operators.similarity import lsh_top_k

    return _ann_recall_gate(
        spark, sf_dir, lambda e, q: lsh_top_k(e, q, k=10, n_planes=5, n_tables=16), 0.4
    )


def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chronon_spark.operators.similarity import ivf_top_k

    # n_probe=8/16: measured deterministic hits min 6/10 at sf0.01 and
    # 5/10 at sf0.1 — n_probe=6 dips to 2/10 at sf0.1 (cell geometry
    # shifts with the corpus), below the 0.4 gate
    return _ann_recall_gate(spark, sf_dir, lambda e, q: ivf_top_k(e, q, k=10, n_probe=8), 0.4)


def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary plumbing, fully oracle-adjudicated: the fake
    decoder is pure byte math (uint64-LE of first 8 bytes → width/height;
    byte-histogram mod 8 → feature counts), so DuckDB reproduces it in SQL
    over the same all-ASCII text bytes."""
    from chronon_spark.operators.multimodal import image_features, image_metadata

    d = _docs(spark, sf_dir).withColumn("blob", F.encode("text", "utf-8")).select("doc_id", "blob")
    out = image_metadata(d, "blob", fake=True)
    out = image_features(out, "blob", n_features=8, fake=True, normalize=False)
    return out.select(
        "doc_id",
        "image_meta.width",
        "image_meta.height",
        F.expr("concat_ws(',', transform(image_vec, x -> cast(x AS string)))").alias("byte_hist"),
    )


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame sampling (operators/multimodal.frame_sample):
    1 binary row → ≤max_frames stride-offset frame rows. Byte math only,
    so DuckDB reproduces it exactly over the same ASCII text bytes
    (generate_series + substring + md5)."""
    from chronon_spark.operators.multimodal import frame_sample

    d = (
        _docs(spark, sf_dir)
        .filter(F.col("text").isNotNull())
        .withColumn("blob", F.encode("text", "utf-8"))
        .select("doc_id", "blob")
    )
    out = frame_sample(d, "blob", every_n_bytes=64, max_frames=4)
    return out.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.md5("frame_bytes").alias("frame_md5"),
        F.length("frame_bytes").cast("long").alias("frame_len"),
    )


FLAGSHIP_PAGES_PATH = os.path.join(_ROOT, ".oracle_data", "webtext_pages_20k")


def _fixture_fingerprint(df: DataFrame) -> tuple[int, int]:
    """(row_count, order-independent content hash) over the oracle columns."""
    r = df.select(
        F.xxhash64(F.concat_ws("\x1f", "url", F.col("ts").cast("string"),
                               F.col("text_len").cast("string"), "lang", "text")).alias("h")
    ).select(F.count("*").alias("n"), F.expr("bit_xor(h)").alias("h")).collect()[0]
    return int(r["n"]), int(r["h"] or 0)


_FIXTURE_VALIDATED = False


def _flagship_pages(spark: SparkSession) -> DataFrame:
    """Deterministic 20k-row webtext fixture, also materialized as parquet
    so the DuckDB oracle reads the exact same rows. Freshness-validated:
    a committed parquet that diverges from generate_webtext (e.g. after a
    generator change) fails LOUDLY here instead of surfacing as a
    confusing downstream hash mismatch. The fingerprint of the parquet is
    recorded in a sidecar at write time, so validation costs one pass over
    the GENERATED frame (compared against the sidecar) — not an extra
    parquet scan — and runs once per process."""
    global _FIXTURE_VALIDATED
    import hashlib as _hashlib
    import inspect as _inspect
    import json as _json

    from chronon_spark.fixtures import webtext as _wt

    gen_params = dict(n_rows=20_000, n_urls=500, days=60)
    # identity of the generator THAT WOULD produce the parquet: source of
    # the fixtures module + the exact call params. When it matches the
    # sidecar, the on-disk parquet is provably the current generator's
    # output (it was fingerprint-validated against a generated frame the
    # last time the code changed) — no per-process regeneration job.
    gen_hash = _hashlib.sha256(
        (_inspect.getsource(_wt) + repr(sorted(gen_params.items()))).encode()
    ).hexdigest()
    sidecar = os.path.join(FLAGSHIP_PAGES_PATH, "_fingerprint.json")
    if not os.path.exists(os.path.join(FLAGSHIP_PAGES_PATH, "_SUCCESS")):
        pages = _wt.generate_webtext(spark, **gen_params)
        oracle_cols = pages.select("url", "ts", "text_len", "lang", "text")
        # 16 files, not coalesce(1): every scan of the fixture (dup probe,
        # slim feature pass, payload side) otherwise runs as ONE task —
        # ~0.4s of single-threaded zstd decompress + hash per pass. The
        # DuckDB oracle reads the same directory via a glob, so the
        # multi-file layout is invisible to it (content hash is order-free).
        oracle_cols.repartition(16).write.mode("overwrite").parquet(FLAGSHIP_PAGES_PATH)
        n, h = _fixture_fingerprint(spark.read.parquet(FLAGSHIP_PAGES_PATH))
        with open(sidecar, "w") as f:
            _json.dump({"rows": n, "hash": h, "gen_hash": gen_hash}, f)
        _FIXTURE_VALIDATED = True
    elif not _FIXTURE_VALIDATED:
        rec = None
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                rec = _json.load(f)
        if rec is None or rec.get("gen_hash") != gen_hash:
            # generator code/params changed (or pre-gen_hash checkout):
            # full generated-vs-disk fingerprint compare, loud on mismatch
            pages = _wt.generate_webtext(spark, **gen_params)
            oracle_cols = pages.select("url", "ts", "text_len", "lang", "text")
            got = (
                (rec["rows"], rec["hash"])
                if rec is not None
                else _fixture_fingerprint(spark.read.parquet(FLAGSHIP_PAGES_PATH))
            )
            want = _fixture_fingerprint(oracle_cols)
            if want != got:
                raise RuntimeError(
                    f"stale webtext oracle fixture at {FLAGSHIP_PAGES_PATH}: "
                    f"generated (rows, hash)={want} vs on-disk {got}; "
                    f"delete the directory to regenerate"
                )
            with open(sidecar, "w") as f:
                _json.dump({"rows": want[0], "hash": want[1], "gen_hash": gen_hash}, f)
        _FIXTURE_VALIDATED = True
    # serve the MATERIALIZED parquet — the exact same rows the DuckDB
    # oracle reads (oracle_sql reads this path). The generated frame
    # re-synthesizes ~200MB of text (repeat+substring) on EVERY action
    # that consumes it (the flagship pipeline evaluates pages 3×: dup
    # probe, slim feature pass, payload join); the parquet scan replaces
    # that with a zstd-compressed columnar read whose ReadSchema prunes
    # to the columns each stage actually needs.
    return _memo_frame(
        spark,
        f"flagship:{FLAGSHIP_PAGES_PATH}",
        lambda: spark.read.parquet(FLAGSHIP_PAGES_PATH).withColumn(
            "ds", F.date_format(F.timestamp_millis(F.col("ts")), "yyyy-MM-dd")
        ),
    )


def q_webtext_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-star feature vector on deterministic synthetic webtext:
    sawtooth as-of counts/avg/last (7d tail-hop 1h, 30d tail-hop 1d,
    unbounded), bucketed lang-frequency map, lag/lead, sessionization, and
    the byte-identical-text contract (md5). Map output rendered as a
    sorted string for dialect-portable hashing."""
    _utc(spark)
    from chronon_spark.pipelines.webtext import backfill_features

    pages = _flagship_pages(spark)
    out = backfill_features(spark, pages)
    return out.select(
        "url",
        "ts",
        "text_len_lag_1",
        "text_len_lead_1",
        "session_id",
        "session_ts",
        "session_event_idx",
        F.col("text_len_count_7d").alias("crawl_count_7d"),
        F.col("text_len_count_30d").alias("crawl_count_30d"),
        F.col("text_len_count").alias("crawl_count"),
        F.round("text_len_average_30d", 6).alias("avg_len_30d"),
        F.col("text_len_last").alias("last_len"),
        F.col("lang_last").alias("last_lang"),
        F.expr(
            "CASE WHEN text_len_count_30d_by_lang IS NULL THEN NULL ELSE "
            "concat_ws(',', transform(array_sort(map_keys(text_len_count_30d_by_lang)), "
            "k -> concat(k, ':', cast(element_at(text_len_count_30d_by_lang, k) AS string)))) END"
        ).alias("lang_hist_30d"),
        F.md5(F.encode("text", "utf-8")).alias("text_md5"),
    )


def q_approx_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-band oracle for APPROX_UNIQUE_COUNT: HLL++ estimate must
    land within 10% of the exact distinct count (measured max deviation at
    sf0.01: 7.5%); the boolean + exact count are what DuckDB adjudicates."""
    ev = _events(spark, sf_dir)
    # rsd=0.02 (~4096 registers): the default 0.05 leaves no tail margin —
    # at sf0.1 (~1100 users) 5 estimates crossed the 10% band
    agg = ev.groupBy("user_id").agg(
        F.approx_count_distinct("value", 0.02).alias("est"),
        F.countDistinct("value").alias("ex"),
    )
    return agg.select(
        "user_id",
        F.col("ex").alias("value_exact_unique"),
        (F.abs(F.col("est") / F.col("ex") - 1) <= 0.1).alias("est_ok"),
    )


def q_map_column_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-column aggregation: Map[type → value] summed per key
    (operators/collections.aggregate_map_column), rendered sorted."""
    from chronon_spark.api.types import Operation
    from chronon_spark.operators.collections import aggregate_map_column

    ev = _events(spark, sf_dir).select(
        "user_id", F.create_map(F.col("event_type"), F.col("value")).alias("m")
    )
    out = aggregate_map_column(ev, ["user_id"], "m", Operation.SUM)
    return out.select(
        "user_id",
        F.expr(
            "concat_ws(',', transform(array_sort(map_keys(m_sum)), "
            "k -> concat(k, ':', cast(round(element_at(m_sum, k), 6) AS string))))"
        ).alias("type_sums"),
    )


def q_elementwise_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise AVERAGE over embedding vectors per label (the mean
    embedding — operators/collections.aggregate_elementwise)."""
    from chronon_spark.api.types import Operation
    from chronon_spark.operators.collections import aggregate_elementwise

    emb = _emb(spark, sf_dir).select("label", F.col("embedding").alias("v"))
    out = aggregate_elementwise(emb, ["label"], "v", Operation.AVERAGE)
    # list output rendered as a fixed-format string (%.6f never switches to
    # scientific notation) so the driver's pandas canonicalizer can sort it
    return out.select(
        "label",
        F.expr(
            "concat_ws(',', transform(v_average_elementwise, x -> format_string('%.6f', x)))"
        ).alias("emb_mean"),
    )


def q_elementwise_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Config-level element_wise (api.thrift:229-234): a windowed
    position-wise AVERAGE over an array column through the TEMPORAL
    sawtooth path — Aggregation(element_wise=True), not the standalone
    operator. The array is built positionally from `value` so the oracle
    is three plain as-of averages."""
    _utc(spark)
    from chronon_spark.api.types import (
        Accuracy, Aggregation, EventSource, GroupBy, Operation, Window,
    )
    from chronon_spark.operators.temporal import temporal_events

    # integer-cents elements + micro-unit integer division: %.6f of the
    # float averages hits exact .5 rounding boundaries at sf0.1 (same
    # 41.6753125 tie as groupby_snapshot); with integral elements the
    # window sum is recoverable exactly from avg*count, and
    # (sum*10000) DIV count is tie-free on both engines
    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "ts",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("vc"),
        F.expr(
            "array(CAST(round(value * 100) AS BIGINT), "
            "CAST(round(value * 100) AS BIGINT) * 2, "
            "CAST(round(value * 100) AS BIGINT) + 100)"
        ).alias("vec"),
    )
    gb = GroupBy(
        name="ew",
        sources=(EventSource(table="events"),),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("vec", Operation.AVERAGE, windows=(Window(7),), element_wise=True),
            Aggregation("vc", Operation.COUNT, windows=(Window(7),)),
        ),
        accuracy=Accuracy.TEMPORAL,
    )
    q = ev.select("event_id", "user_id", "ts")
    out = temporal_events(spark, gb, q, ev.select("user_id", "ts", "vec", "vc"))
    return out.select(
        "event_id",
        F.expr(
            "CASE WHEN vec_average_7d IS NOT NULL THEN "
            "concat_ws(',', transform(vec_average_7d, x -> "
            "CAST((CAST(round(x * vc_count_7d) AS BIGINT) * 10000) DIV vc_count_7d AS STRING))) END"
        ).alias("vec_avg_7d_micro"),
    )


def q_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector auto-explode: scalar aggregate over all list elements."""
    from chronon_spark.api.types import Operation
    from chronon_spark.operators.collections import aggregate_vector_column

    emb = _emb(spark, sf_dir).select("label", F.col("embedding").alias("v"))
    out = aggregate_vector_column(emb, ["label"], "v", Operation.AVERAGE, output_col="elem_avg")
    return out.select("label", F.round("elem_avg", 6).alias("elem_avg"))


def q_stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ds column summaries (operators/stats.column_summary — the
    StatsCompute/SummaryJob family): total count, null counts/rates,
    numeric percentiles, one row per day."""
    _utc(spark)
    from chronon_spark.operators.stats import column_summary

    ev = _events(spark, sf_dir).select("ds", "value", "event_type")
    # exact mode: the engine default is bounded-memory percentile_approx
    # (the reference's KLL contract); exact is the documented test/oracle
    # mode matching DuckDB quantile_cont bit-for-bit
    s = column_summary(ev, keys=(), percentile_mode="exact")
    return s.select(
        "ds",
        "total_count",
        F.col("value__null_count").alias("value_nulls"),
        F.round("value__null_rate", 6).alias("value_null_rate"),
        F.col("event_type__null_count").alias("type_nulls"),
        F.expr(
            "concat_ws(',', transform(value__percentiles, x -> format_string('%.6f', x)))"
        ).alias("value_pcts"),
    )


def q_stats_summary_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DEFAULT (bounded-memory) stats path under the gate: percentiles
    via percentile_approx (GK summary — the engine's production mode).
    With per-ds groups ≤ the GK accuracy the summary holds every value and
    the answer is the exact DISCRETE order statistic, which DuckDB's
    quantile_disc reproduces bit-for-bit (empirically 150/150 points at
    sf0.01); above that scale the same query degrades gracefully to
    ε-rank-error — the reference's own KLL contract."""
    _utc(spark)
    from chronon_spark.operators.stats import column_summary

    ev = _events(spark, sf_dir).select("ds", "value")
    s = column_summary(ev, keys=())  # default percentile_mode="approx"
    return s.select(
        "ds",
        "total_count",
        F.col("value__null_count").alias("value_nulls"),
        F.expr(
            "concat_ws(',', transform(value__percentiles, x -> format_string('%.6f', x)))"
        ).alias("value_pcts"),
    )


def q_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JoinSource chaining (operators/join.render_any_source — the
    JoinSourceRunner analogue): an outer GroupBy aggregates the INNER
    join's output — the as-of average of each user's rolling 7d sum at
    every event. The oracle nests the two levels: sawtooth 7d sums per
    event, then a strict-past average of those sums per query event."""
    _utc(spark)
    from chronon_spark.api.types import (
        Accuracy,
        Aggregation,
        EventSource,
        GroupBy,
        Join,
        JoinPart,
        JoinSource,
        Operation,
        Query,
        Window,
    )
    from chronon_spark.operators.join import join_backfill

    ev = _events(spark, sf_dir)
    ev.createOrReplaceTempView("events")
    gb_inner = GroupBy(
        name="c1",
        sources=(EventSource(table="events", query=Query(time_column="ts")),),
        key_columns=("user_id",),
        aggregations=(Aggregation("value", Operation.SUM, windows=(Window(7),)),),
        accuracy=Accuracy.TEMPORAL,
    )
    inner_join = Join(
        name="chain_inner",
        left=EventSource(
            table="events",
            query=Query(selects={"user_id": None, "value": None}, time_column="ts"),
        ),
        right_parts=(JoinPart(gb_inner),),
    )
    # the chained query DERIVES integral cents from the inner feature:
    # int64 sums are order-independent, so the two engines agree bit-for-
    # bit (a float AVERAGE of the chained values flips its 6th decimal
    # with summation order — measured 44/10000 rows)
    gb_outer = GroupBy(
        name="c2",
        sources=(
            JoinSource(
                join=inner_join,
                query=Query(
                    selects={
                        "user_id": None,
                        "ts": None,
                        "c1_cents": "CAST(round(c1_value_sum_7d * 100) AS LONG)",
                    },
                ),
            ),
        ),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("c1_cents", Operation.SUM, windows=(None,)),
            Aggregation("c1_cents", Operation.COUNT, windows=(None,)),
        ),
        accuracy=Accuracy.TEMPORAL,
    )
    outer_join = Join(
        name="chain_outer",
        left=EventSource(
            table="events",
            query=Query(selects={"event_id": None, "user_id": None}, time_column="ts"),
        ),
        right_parts=(JoinPart(gb_outer),),
    )
    lo, hi = ev.agg(F.min("ds"), F.max("ds")).first()
    out = join_backfill(spark, outer_join, lo, hi)
    return out.select(
        "event_id",
        F.col("c2_c1_cents_sum").alias("chain_cents"),
        F.col("c2_c1_cents_count").alias("chain_n"),
    )


def q_entity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entities snapshot join (operators/join entity path +
    operators/groupby.snapshot_entities): a daily-snapshot dimension
    (per-user×ds max value, derived from events) joined onto each event at
    the SAME ds (spark/JoinBase.scala:320-328 semantics)."""
    _utc(spark)
    from chronon_spark.api.types import (
        Aggregation,
        EntitySource,
        EventSource,
        GroupBy,
        Join,
        JoinPart,
        Operation,
        Query,
    )
    from chronon_spark.operators.join import join_backfill

    ev = _events(spark, sf_dir)
    ev.createOrReplaceTempView("events")
    dim = ev.groupBy("user_id", "ds").agg(F.max("value").alias("score"))
    dim.createOrReplaceTempView("dim_entities")
    gb = GroupBy(
        name="ent",
        sources=(
            EntitySource(
                snapshot_table="dim_entities",
                query=Query(selects={"user_id": None, "score": None}),
            ),
        ),
        key_columns=("user_id",),
        aggregations=(Aggregation("score", Operation.MAX, windows=(None,)),),
    )
    join = Join(
        name="entj",
        left=EventSource(
            table="events",
            query=Query(
                selects={"event_id": None, "user_id": None, "ds": None},
                time_column="ts",
            ),
        ),
        right_parts=(JoinPart(gb),),
    )
    lo, hi = ev.agg(F.min("ds"), F.max("ds")).first()
    out = join_backfill(spark, join, lo, hi)
    return out.select("event_id", F.round("ent_score_max", 6).alias("ent_score_max"))


def q_cumulative_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-source scan (sources/scan.render_source,
    spark/GroupBy.scala:578-583): a cumulative table's LATEST partition
    holds full history, so the scan reads only ds = max(ds)."""
    _utc(spark)
    from chronon_spark.api.types import EventSource, Query
    from chronon_spark.sources.scan import render_source

    ev = _events(spark, sf_dir)
    ev.createOrReplaceTempView("events")
    src = EventSource(
        table="events",
        query=Query(selects={"event_type": None, "value": None}, time_column="ts"),
        is_cumulative=True,
    )
    df = render_source(spark, src)
    return (
        df.filter(F.col("event_type").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("sv_cents"),
        )
    )


def q_bootstrap_label_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap seeding + forward-looking label join in one backfill
    (operators/join.bootstrap_fold + operators/labels.attach_labels):
    precomputed values for every user_id % 5 == 0 row win the coalesce
    against the computed 7d sum, and each row carries its future label —
    the count of the user's events in days (ds, ds+3]. The oracle
    recomputes the sawtooth feature, applies the same CASE, and counts
    the forward window per event."""
    _utc(spark)
    from chronon_spark.api.types import (
        Accuracy,
        Aggregation,
        BootstrapPart,
        EventSource,
        GroupBy,
        Join,
        JoinPart,
        LabelPart,
        Operation,
        Query,
        Window,
    )
    from chronon_spark.operators.join import join_backfill

    ev = _events(spark, sf_dir)
    ev.createOrReplaceTempView("events")
    boot = (
        ev.filter("user_id % 5 = 0")
        .select("user_id", "ds")
        .distinct()
        .withColumn("bs_value_sum_7d", F.expr("CAST(-user_id AS DOUBLE)"))
    )
    boot.createOrReplaceTempView("bs_boot")
    gb = GroupBy(
        name="bs",
        sources=(EventSource(table="events", query=Query(time_column="ts")),),
        key_columns=("user_id",),
        aggregations=(Aggregation("value", Operation.SUM, windows=(Window(7),)),),
        accuracy=Accuracy.TEMPORAL,
    )
    label_gb = GroupBy(
        name="lbl",
        sources=(EventSource(table="events", query=Query(time_column="ts")),),
        key_columns=("user_id",),
        aggregations=(Aggregation("value", Operation.COUNT, windows=(Window(3),)),),
    )
    join = Join(
        name="bslj",
        left=EventSource(
            table="events",
            query=Query(
                selects={"event_id": None, "user_id": None, "ds": None},
                time_column="ts",
            ),
        ),
        right_parts=(JoinPart(gb),),
        bootstrap_parts=(BootstrapPart(table="bs_boot", key_columns=("user_id", "ds")),),
        label_part=LabelPart(group_by=label_gb, label_offsets=(3,)),
    )
    lo, hi = ev.agg(F.min("ds"), F.max("ds")).first()
    out = join_backfill(spark, join, lo, hi)
    # values are exact cents, so the 7d float sum scaled by 100 sits within
    # ~1e-6 of an integer no matter the summation order — CAST(round(.*100))
    # is order-independent where round(sum, 6) was a half-boundary coin flip
    # (the r4 driver flake; same integer-cents pin as derivations/join_chain).
    return out.select(
        "event_id",
        F.expr("CAST(round(bs_value_sum_7d * 100) AS BIGINT)").alias("bs_cents_7d"),
        F.col("label_value_count_3d_3d").alias("label_cnt"),
    )


def q_external_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """onlineExternalParts offline contract (api.thrift:320;
    BootstrapInfo.scala:41-64,123-130; Extensions.scala:708-748,1042-1051)
    under the driver's oracle: an online-only external source lands in the
    backfill null-padded under ext_{source}_{col} naming and a bootstrap
    table carrying logged values fills it (every third user, score =
    user_id/4 — an exact binary fraction — and tier = user_id % 7); a
    source declaring offline_group_by computes as a synthetic join part
    whose values must equal the regular part's; the contextual
    pseudo-source null-pads silently. The oracle recomputes the sawtooth
    7d sum and replays the logging rule row-for-row."""
    _utc(spark)
    from chronon_spark.api.types import (
        Accuracy,
        Aggregation,
        BootstrapPart,
        EventSource,
        ExternalPart,
        ExternalSource,
        GroupBy,
        Join,
        JoinPart,
        Operation,
        Query,
        Window,
    )
    from chronon_spark.operators.join import join_backfill

    ev = _events(spark, sf_dir)
    ev.createOrReplaceTempView("events")
    boot = (
        ev.filter("user_id % 3 = 0")
        .select("user_id", "ds")
        .distinct()
        .withColumn("ext_risk_score", F.expr("CAST(user_id AS DOUBLE) / 4"))
        .withColumn("ext_risk_tier", F.expr("CAST(user_id % 7 AS BIGINT)"))
    )
    boot.createOrReplaceTempView("ext_boot")
    gb = GroupBy(
        name="xp",
        sources=(EventSource(table="events", query=Query(time_column="ts")),),
        key_columns=("user_id",),
        aggregations=(Aggregation("value", Operation.SUM, windows=(Window(7),)),),
        accuracy=Accuracy.TEMPORAL,
    )
    risk = ExternalSource(
        name="risk",
        key_schema={"uid": "bigint"},
        value_schema={"score": "double", "tier": "bigint"},
    )
    off = ExternalSource(
        name="off",
        key_schema={"user_id": "bigint"},
        value_schema={"value_sum_7d": "double"},
        offline_group_by=gb,
    )
    ctx = ExternalSource(
        name="contextual", key_schema={"ip": "string"}, value_schema={"ip": "string"}
    )
    join = Join(
        name="xpj",
        left=EventSource(
            table="events",
            query=Query(
                selects={"event_id": None, "user_id": None, "ds": None},
                time_column="ts",
            ),
        ),
        right_parts=(JoinPart(gb),),
        bootstrap_parts=(BootstrapPart(table="ext_boot", key_columns=("user_id", "ds")),),
        online_external_parts=(
            ExternalPart(risk, key_mapping={"user_id": "uid"}),
            ExternalPart(off),
            ExternalPart(ctx, prefix="req"),
        ),
    )
    lo, hi = ev.agg(F.min("ds"), F.max("ds")).first()
    out = join_backfill(spark, join, lo, hi)
    return out.select(
        "event_id",
        F.expr("CAST(round(ext_risk_score * 100) AS BIGINT)").alias("risk_cents"),
        F.col("ext_risk_tier").alias("risk_tier"),
        F.expr("CAST(round(ext_off_value_sum_7d * 100) AS BIGINT)").alias("off_cents"),
        F.expr("CAST(round(xp_value_sum_7d * 100) AS BIGINT)").alias("reg_cents"),
        F.col("ext_req_contextual_ip").alias("ctx_ip"),
    )


def q_sliced_hotkey_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key time slicing under the driver's oracle (round 5): every
    key is forced hot (hot_key_threshold=1) so the raw kernel slices ALL
    queries at 4-day granularity — unbounded COUNT / integral SUM / LAST
    / BOUNDED_UNIQUE_COUNT ride per-(key, slice) baseline IRs
    (operators/temporal._build_baselines) while the windowed COUNT
    replicates events into reachable slices. The DuckDB oracle recomputes
    every feature from scratch, so bit-equality adjudicates the slicing
    algebra end-to-end (all outputs integral — no float-order exposure)."""
    _utc(spark)
    from chronon_spark.api.types import (
        Accuracy,
        Aggregation,
        EventSource,
        GroupBy,
        Operation,
        Window,
    )
    from chronon_spark.operators.temporal import temporal_events

    ev = _events(spark, sf_dir).withColumn(
        "vc", F.expr("CAST(round(value * 100) AS BIGINT)")
    )
    gb = GroupBy(
        name="slhk",
        sources=(EventSource(table="events"),),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("vc", Operation.COUNT, windows=(None, Window(7))),
            Aggregation("vc", Operation.SUM, windows=(None,)),
            Aggregation("vc", Operation.LAST, windows=(None,)),
            Aggregation(
                "event_type", Operation.BOUNDED_UNIQUE_COUNT, windows=(None,),
                arg_map={"k": 3},
            ),
        ),
        accuracy=Accuracy.TEMPORAL,
    )
    q = ev.select("event_id", "user_id", "ts")
    out = temporal_events(
        spark, gb, q, ev.select("user_id", "ts", "vc", "event_type"),
        mode="raw", hot_key_threshold=1, hot_slice_ms=4 * 86_400_000,
    )
    return out.select(
        "event_id",
        F.col("vc_count").alias("cnt_all"),
        F.col("vc_count_7d").alias("cnt_7d"),
        F.col("vc_sum").alias("sum_cents"),
        F.col("vc_last").alias("last_cents"),
        F.col("event_type_bounded_unique_count").alias("types_k3"),
    )


def q_staging_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StagingQuery date-macro rendering (operators/staging.
    render_staging_sql): {{ start_date }}/{{ end_date }}/{{ latest_date }}
    substituted into arbitrary Spark SQL — the oracle recomputes the same
    dates in SQL."""
    _utc(spark)
    import datetime as _dt

    from chronon_spark.operators.staging import render_staging_sql

    ev = _events(spark, sf_dir)
    ev.createOrReplaceTempView("events_sq")
    lo, hi = ev.agg(F.min("ds"), F.max("ds")).first()
    start = (_dt.date.fromisoformat(lo) + _dt.timedelta(days=5)).isoformat()
    sql = (
        "SELECT ds, event_type, CAST(count(*) AS LONG) AS n, "
        "sum(CAST(round(value * 100) AS BIGINT)) AS sv_cents, '{{ latest_date }}' AS latest "
        "FROM events_sq WHERE ds BETWEEN '{{ start_date }}' AND '{{ end_date }}' "
        "AND event_type IS NOT NULL GROUP BY ds, event_type"
    )
    rendered = render_staging_sql(spark, sql, start, hi, hi)
    return spark.sql(rendered)


def q_union_skew_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source UNION + skew-key exclusion (sources/scan.union_sources
    + skew_filter): two selects-projected sources unioned column-aligned,
    hot keys dropped before aggregation."""
    _utc(spark)
    from chronon_spark.sources.scan import skew_filter, union_sources

    ev = _events(spark, sf_dir)
    a = ev.filter("value > 50").select("user_id", "value", F.lit("hi").alias("src"))
    b = ev.filter("value <= 50 OR value IS NULL").select(
        "user_id", "value", F.lit("lo").alias("src")
    )
    u = union_sources([a, b])
    u = skew_filter(u, {"user_id": (1, 2, 3)})
    return u.groupBy("user_id", "src").agg(
        F.count("*").alias("n"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("sv_cents"),
    )


def q_derivations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GroupBy derivations (selectExpr over feature columns, spark/
    GroupBy.scala:763-774) on the temporal path: base features plus a
    derived ratio column."""
    _utc(spark)
    from chronon_spark.api.types import (
        Accuracy,
        Aggregation,
        EventSource,
        GroupBy,
        Operation,
        Window,
    )
    from chronon_spark.operators.temporal import temporal_events

    ev = _events(spark, sf_dir)
    gb = GroupBy(
        name="deriv",
        sources=(EventSource(table="events"),),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("value", Operation.SUM, windows=(Window(7),)),
            Aggregation("value", Operation.COUNT, windows=(None,)),
        ),
        accuracy=Accuracy.TEMPORAL,
        # exact-arithmetic derivations: the sum is integral cents, so
        # round() sits far from any half-boundary and the integer floor
        # division is exact float64 — deterministic across engines AND
        # across float summation orders (a plain round(ratio, 6) sits ON
        # the boundary for cent values / small counts)
        derivations={
            "*": None,
            "sum_cents": "CAST(round(value_sum_7d * 100) AS LONG)",
            "cents_per_event": "CAST(floor(CAST(round(value_sum_7d * 100) AS LONG) / value_count) AS LONG)",
        },
    )
    q = ev.select("event_id", "user_id", "ts")
    # dense query pattern (features at every event): raw kernel +
    # passthrough, same reasoning/measurement as q_groupby_temporal
    out = temporal_events(
        spark, gb, q, ev.select("user_id", "ts", "value"), mode="raw", passthrough=True
    )
    return out.select(
        "event_id",
        F.round("value_sum_7d", 6).alias("value_sum_7d"),
        F.col("value_count").alias("value_count"),
        "sum_cents",
        "cents_per_event",
    )


def q_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day PSI drift (operators/stats.drift_series — the
    SummaryJob temporal-drift read), fully oracle-adjudicated: the whole
    PSI pipeline (per-ds quantile grid → union split points → inverse-
    quantile ranks → pmf → zero-bin regularization → Σ(p−q)·ln(p/q)) is
    replicated in DuckDB SQL. Float-bit discipline: bins=15 gives a
    dyadic grid ((i+1)/16) and the integer-floored input makes the exact
    quantile interpolation arithmetic EXACT in float64, so both engines
    produce bit-identical grids; every downstream formula is written with
    the same operation order on both sides (stats.pmf_from_quantiles
    docstring)."""
    _utc(spark)
    from chronon_spark.operators.stats import drift_series

    ev = (
        _events(spark, sf_dir)
        .select("ds", F.expr("CAST(floor(value) AS BIGINT)").alias("vi"))
    )
    out = drift_series(spark, ev, "vi", bins=15, percentile_mode="exact")
    return out.select("ds", F.round("psi", 6).alias("psi"))


def q_compare_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-table diff metrics (operators/stats.compare_tables — the
    CompareJob/CompareMetrics family) of events vs a deterministically
    perturbed copy: +1 on value for event_id%10==0, event_type nulled for
    %17==0, rows dropped for %31==0."""
    _utc(spark)
    from chronon_spark.operators.stats import compare_tables

    left = _events(spark, sf_dir).select("event_id", "value", "event_type")
    right = (
        left.filter(F.expr("event_id % 31 != 0"))
        .select(
            "event_id",
            F.expr("CASE WHEN event_id % 10 = 0 THEN value + 1 ELSE value END").alias("value"),
            F.expr("CASE WHEN event_id % 17 = 0 THEN NULL ELSE event_type END").alias(
                "event_type"
            ),
        )
    )
    _, metrics = compare_tables(left, right, ["event_id"], percentile_mode="exact")
    return metrics.select(
        "total",
        "value_both_null",
        "value_left_null",
        "value_right_null",
        "value_mismatch",
        F.round("value_smape", 6).alias("value_smape"),
        F.expr(
            "concat_ws(',', transform(value_left_minus_right_pct, x -> format_string('%.6f', x)))"
        ).alias("value_diff_pcts"),
        "event_type_mismatch",
        "event_type_right_null",
        F.round("event_type_edit_distance", 6).alias("event_type_edit_distance"),
        F.round("event_type_edit_distance_norm", 6).alias("event_type_edit_distance_norm"),
    )


def q_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online-offline consistency (operators/stats.consistency_job — the
    ConsistencyJob analogue): the 'served' log is the offline truth for
    every 13th event's (user, ts) with a deterministic +1 perturbation on
    every 10th event_id; the job recomputes offline point-in-time features
    from the logged keys alone and diffs via the CompareMetrics machinery."""
    _utc(spark)
    from chronon_spark.api.types import (
        Accuracy,
        Aggregation,
        EventSource,
        GroupBy,
        Join,
        JoinPart,
        Operation,
        Query,
        Window,
    )
    from chronon_spark.operators.stats import consistency_job
    from chronon_spark.streaming.enrich import enrich_batch

    ev = _events(spark, sf_dir)
    ev.createOrReplaceTempView("events")
    gb = GroupBy(
        name="cons_gb",
        sources=(EventSource(table="events", query=Query(time_column="ts")),),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("value", Operation.SUM, windows=(Window(7),)),
            Aggregation("value", Operation.COUNT, windows=(None,)),
        ),
        accuracy=Accuracy.TEMPORAL,
    )
    join = Join(
        name="cons_join", left=EventSource(table="unused"), right_parts=(JoinPart(gb),)
    )
    q = ev.filter("event_id % 13 = 0").select("event_id", "user_id", "ts")
    truth = enrich_batch(spark, join, q)
    sum_col = next(c for c in truth.columns if c.endswith("value_sum_7d"))
    cnt_col = next(c for c in truth.columns if c.endswith("value_count"))
    logged = truth.select(
        "user_id",
        "ts",
        F.expr(
            f"CASE WHEN event_id % 10 = 0 THEN {sum_col} + 1 ELSE {sum_col} END"
        ).alias(sum_col),
        F.col(cnt_col),
    )
    _, metrics = consistency_job(spark, join, logged, percentile_mode="exact")
    # metrics is a driver-local frame (collected inside consistency_job) —
    # safe to drop the enrichment caches this query registered
    from chronon_spark.operators.join import release_backfill_caches

    release_backfill_caches()
    return metrics.select(
        "total",
        F.col(f"{sum_col}_mismatch").alias("sum7_mismatch"),
        F.col(f"{sum_col}_both_null").alias("sum7_both_null"),
        F.col(f"{sum_col}_left_null").alias("sum7_left_null"),
        F.col(f"{sum_col}_right_null").alias("sum7_right_null"),
        F.round(f"{sum_col}_smape", 6).alias("sum7_smape"),
        F.expr(
            f"concat_ws(',', transform({sum_col}_left_minus_right_pct, x -> format_string('%.6f', x)))"
        ).alias("sum7_diff_pcts"),
        F.col(f"{cnt_col}_mismatch").alias("cnt_mismatch"),
        F.col(f"{cnt_col}_both_null").alias("cnt_both_null"),
    )


def q_temporal_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal entities with mutations: each event inserts its value and
    deletes the user's previous value (same day). Mutations at exactly
    query time are EXCLUDED (mutationTs < queryTs), so the point-in-time
    state at each event == the PREVIOUS event's value of that day (NULL
    for the day's first event) — only if is_before deletes cancel exactly
    and the boundary is strict (operators/mutations)."""
    _utc(spark)
    from pyspark.sql import Window as W

    from chronon_spark.api.types import Aggregation, EntitySource, GroupBy, Operation
    from chronon_spark.operators.mutations import temporal_entities

    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id", "ds").orderBy("ts")
    ins = ev.select(
        "user_id", F.col("value"), F.col("ts").alias("mutation_ts"), F.lit(False).alias("is_before"), "ds"
    )
    dels = (
        ev.withColumn("prev", F.lag("value").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            "user_id",
            F.col("prev").alias("value"),
            F.col("ts").alias("mutation_ts"),
            F.lit(True).alias("is_before"),
            "ds",
        )
    )
    mutations = ins.unionByName(dels)
    snapshots = spark.createDataFrame([], "user_id long, value double, ds string")
    gb = GroupBy(
        name="te",
        sources=(EntitySource(snapshot_table="snap"),),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("value", Operation.SUM),
            Aggregation("value", Operation.COUNT),
        ),
    )
    queries = ev.select("event_id", "user_id", "ts", "ds")
    out = temporal_entities(spark, gb, queries, snapshots, mutations)
    return out.select(
        "event_id",
        F.round("value_sum", 6).alias("state_sum"),
        F.col("value_count").alias("state_count"),
    )


def q_streaming_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lambda-architecture parity under the oracle: the last two days of
    events arrive via Structured Streaming (file source, availableNow) as
    per-(key, 5-min) tiles (streaming/lambda_tiles), union with the batch
    tile frame built from prior history, and feed the tiled as-of kernel
    via tiles_override. The oracle recomputes every point-in-time feature
    from scratch in SQL — adjudicating that streamed tiles + batch tiles
    produce the exact batch answer (the reference's lambda contract,
    SawtoothOnlineAggregator.scala:83-126 / Tiled_Architecture.md).

    All aggregated columns are integer (value scaled to cents before
    aggregation) so the hash is summation-order-independent."""
    import tempfile

    _utc(spark)
    from chronon_spark.api.types import (
        Accuracy,
        Aggregation,
        EventSource,
        GroupBy,
        Operation,
        Window,
    )
    from chronon_spark.operators.tiled import build_tile_frame, temporal_events_tiled
    from chronon_spark.streaming.lambda_tiles import (
        complete_tile_frame,
        streaming_tile_frame,
    )

    ev = _events(spark, sf_dir).withColumn(
        "value_c", F.expr("CAST(round(value * 100) AS BIGINT)")
    )
    cols = ["user_id", "ts", "value_c", "event_type"]
    hi = ev.agg(F.max("ts")).first()[0]
    cut = (hi // MS_DAY - 1) * MS_DAY  # stream the last two UTC days
    hist = ev.filter(F.col("ts") < cut).select(*cols)
    live = ev.filter(F.col("ts") >= cut)

    gb = GroupBy(
        name="slp",
        sources=(EventSource(table="events"),),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("value_c", Operation.COUNT, windows=(None,)),
            Aggregation("value_c", Operation.SUM, windows=(Window(7),)),
            Aggregation("value_c", Operation.MIN, windows=(Window(7),)),
            Aggregation("value_c", Operation.MAX, windows=(Window(7),)),
            Aggregation("event_type", Operation.UNIQUE_COUNT, windows=(Window(7),)),
        ),
        accuracy=Accuracy.TEMPORAL,
    )

    src = tempfile.mkdtemp(prefix="slp_stream_")
    live.select(*cols).coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(live.select(*cols).schema).parquet(src)
    tiles_s = streaming_tile_frame(gb, stream, watermark="0 seconds")
    sq = (
        tiles_s.writeStream.format("memory")
        .queryName("slp_tiles")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(180)
    streamed = complete_tile_frame(gb, spark.table("slp_tiles"))
    union_tiles = build_tile_frame(gb, hist).unionByName(
        streamed, allowMissingColumns=True
    )

    # the query spine derives from the same scan as the events side —
    # pin the (small) spine to break the ambiguous-self-join lineage
    qdf = live.select("event_id", "user_id", "ts").localCheckpoint(eager=True)
    out = temporal_events_tiled(
        spark, gb, qdf, ev.select(*cols), tiles_override=union_tiles
    )
    return out.select(
        "event_id",
        F.col("value_c_count").alias("cnt_total"),
        F.col("value_c_sum_7d").alias("sum_c_7d"),
        F.col("value_c_min_7d").alias("min_c_7d"),
        F.col("value_c_max_7d").alias("max_c_7d"),
        F.col("event_type_unique_count_7d").alias("uniq_types_7d"),
    )


def q_incremental_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental warehouse materialization under the oracle: a daily
    snapshot GroupBy backfilled through the partitioned Warehouse in TWO
    runs — first covering ~40% of the ds range, then the full range (the
    second run plans unfilled ranges from lineage and computes only the
    remaining days) — then read back from parquet partitions. The oracle
    recomputes every (user, ds) feature from scratch, adjudicating that
    resume-from-partial produces the one-shot answer (reference driver
    unfilledRanges semantics, spark/.../GroupBy.scala computeBackfill).

    Integer-cents aggregation keeps the hash summation-order-free."""
    import tempfile

    _utc(spark)
    from chronon_spark.api.types import Aggregation, EventSource, GroupBy, Operation, Query, Window
    from chronon_spark.runner import run_group_by_backfill
    from chronon_spark.sources.warehouse import Warehouse

    ev = _events(spark, sf_dir).withColumn(
        "value_c", F.expr("CAST(round(value * 100) AS BIGINT)")
    )
    ev.select("user_id", "ts", "value_c", "ds").createOrReplaceTempView(
        "ev_inc_gate"
    )
    start, end = _ds_bounds(ev, f"{sf_dir}/events.parquet")
    days = sorted(
        r["ds"] for r in ev.select("ds").distinct().collect()
    )
    mid = days[max(0, int(len(days) * 0.4) - 1)]

    gb = GroupBy(
        name="inc_gate_gb",
        sources=(EventSource(table="ev_inc_gate", query=Query(time_column="ts")),),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("value_c", Operation.SUM, windows=(Window(7),)),
            Aggregation("value_c", Operation.COUNT, windows=(Window(7),)),
            Aggregation("value_c", Operation.MAX, windows=(Window(7),)),
        ),
    )
    wh = Warehouse(spark, tempfile.mkdtemp(prefix="inc_gate_wh_"))
    run_group_by_backfill(spark, wh, gb, start, mid)
    run_group_by_backfill(spark, wh, gb, start, end)  # resume: fills the rest
    out = wh.read("inc_gate_gb")
    return out.select(
        "user_id",
        "ds",
        F.col("value_c_sum_7d").alias("sum_c_7d"),
        F.col("value_c_count_7d").alias("cnt_7d"),
        F.col("value_c_max_7d").alias("max_c_7d"),
    )


def q_tilestore_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of features served through the persisted TileStore
    (operators/tilestore — the offline analogue of the reference's
    uploaded batch IRs, spark/GroupByUpload.scala:76-114): 5-minute tile
    frames are materialized day-partitioned into a Warehouse in TWO runs
    — first ~40% of the ds range, then the full range (the second run
    reads lineage and builds ONLY the missing days) — and the tiled
    kernel then answers every per-event query from the CACHED tiles plus
    raw query-head events. The oracle recomputes every point-in-time
    feature from raw history from scratch, adjudicating at once that
    (a) per-day tile builds concatenate to the one-pass tile frame,
    (b) resume-from-partial is exact, and (c) cached-tile serving equals
    the raw as-of kernel. Integer-cents values keep every aggregate
    order-independent."""
    import tempfile

    _utc(spark)
    from chronon_spark.api.types import (
        Accuracy,
        Aggregation,
        EventSource,
        GroupBy,
        Operation,
        TimeUnit,
        Window,
    )
    from chronon_spark.operators.tilestore import TileStore, temporal_events_tiled_cached
    from chronon_spark.sources.warehouse import Warehouse

    ev = _events(spark, sf_dir).withColumn(
        "value_c", F.expr("CAST(round(value * 100) AS BIGINT)")
    )
    gb = GroupBy(
        name="tilestore_gate_gb",
        sources=(EventSource(table="events"),),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("value_c", Operation.SUM, windows=(Window(7),)),
            Aggregation("value_c", Operation.COUNT, windows=(Window(7),)),
            Aggregation("value_c", Operation.MAX, windows=(Window(7),)),
            Aggregation("value_c", Operation.MIN, windows=(Window(6, TimeUnit.HOURS),)),
        ),
        accuracy=Accuracy.TEMPORAL,
    )
    start, end = _ds_bounds(ev, f"{sf_dir}/events.parquet")
    days = sorted(r["ds"] for r in ev.select("ds").distinct().collect())
    mid = days[max(0, int(len(days) * 0.4) - 1)]
    feed = ev.select("user_id", "ts", "value_c", "ds")
    clean = feed.filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    wh = Warehouse(spark, tempfile.mkdtemp(prefix="tilestore_gate_wh_"))
    store = TileStore(wh, gb)
    store.materialize(spark, clean, start, mid)  # partial build
    out, _built = temporal_events_tiled_cached(
        spark,
        gb,
        ev.select("event_id", "user_id", "ts"),
        feed,
        store,
        start,
        end,  # resume: builds only (mid, end]
    )
    return out.select(
        "event_id",
        F.col("value_c_sum_7d").alias("sum_c_7d"),
        F.col("value_c_count_7d").alias("cnt_7d"),
        F.col("value_c_max_7d").alias("max_c_7d"),
        F.col("value_c_min_6h").alias("min_c_6h"),
    )


def q_kv_upload_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GroupByUpload/fetcher analogue under the oracle (operators/upload
    — reference spark/GroupByUpload.scala + SawtoothOnlineAggregator):
    batch history collapses into ONE bounded KV-shaped row per key
    (tail hop IRs + collapsed unbounded IRs) at the second-to-last day's
    boundary, and the last day's events are then served as point fetches
    — each (key, ts) answered by merging the uploaded state with the
    streamed head, never rescanning history. The oracle recomputes every
    point-in-time feature from raw history from scratch, adjudicating
    the whole upload→fetch round trip. Integer-cents inputs keep all
    sums order-free; AVERAGE/variance-free so every aggregate is exact."""
    _utc(spark)
    from chronon_spark.api.types import (
        Accuracy,
        Aggregation,
        EventSource,
        GroupBy,
        Operation,
        TimeUnit,
        Window,
    )
    from chronon_spark.operators.upload import fetch_features, group_by_upload

    ev = _events(spark, sf_dir).withColumn(
        "value_c", F.expr("CAST(round(value * 100) AS BIGINT)")
    )
    days = sorted(r["ds"] for r in ev.select("ds").distinct().collect())
    end_ds, serve_ds = days[-2], days[-1]
    gb = GroupBy(
        name="kv_gate_gb",
        sources=(EventSource(table="events"),),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("value_c", Operation.COUNT, windows=(None,)),
            Aggregation("value_c", Operation.SUM, windows=(Window(7),)),
            Aggregation("value_c", Operation.MAX, windows=(Window(7),)),
            Aggregation("value_c", Operation.MIN, windows=(Window(6, TimeUnit.HOURS),)),
            Aggregation("value_c", Operation.LAST, windows=(Window(7),)),
            Aggregation("value_c", Operation.AVERAGE, windows=(Window(3),)),
        ),
        accuracy=Accuracy.TEMPORAL,
    )
    feed = ev.select("user_id", "ts", "value_c")
    up = group_by_upload(spark, gb, feed, end_ds)
    q = ev.filter(F.col("ds") == serve_ds).select("event_id", "user_id", "ts")
    out = fetch_features(spark, gb, up, feed, q, end_ds)
    return out.select(
        "event_id",
        F.col("value_c_count").alias("cnt_all"),
        F.col("value_c_sum_7d").alias("sum_c_7d"),
        F.col("value_c_max_7d").alias("max_c_7d"),
        F.col("value_c_min_6h").alias("min_c_6h"),
        F.col("value_c_last_7d").alias("last_c_7d"),
        F.round("value_c_average_3d", 6).alias("avg_c_3d"),
    )


def q_kv_upload_gather(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KV upload/fetch round trip for the bounded-IR gather/sketch
    family (operators/upload.py — reference GroupByUpload's k-list, set
    and sketch IRs): TOP_K/BOTTOM_K/FIRST_K/LAST_K hop lists,
    BOUNDED_UNIQUE_COUNT capped sets, APPROX_PERCENTILE equi-rank
    samples and APPROX_HISTOGRAM_K capped count-maps, all uploaded at
    the second-to-last day's boundary and served as last-day point
    fetches. At sf0.01 every (user, hour) hop holds ≤3 events and 5
    distinct event types, so all sketch IRs are in their EXACT regime —
    the DuckDB oracle recomputes every value from raw history and the
    hash must match bit-for-bit. List/map outputs are canonicalized to
    strings (the driver hash cannot take list columns)."""
    _utc(spark)
    from chronon_spark.api.types import (
        Accuracy,
        Aggregation,
        EventSource,
        GroupBy,
        Operation,
        Window,
    )
    from chronon_spark.operators.upload import fetch_features, group_by_upload

    ev = _events(spark, sf_dir).withColumn(
        "value_c", F.expr("CAST(round(value * 100) AS BIGINT)")
    )
    days = sorted(r["ds"] for r in ev.select("ds").distinct().collect())
    end_ds, serve_ds = days[-2], days[-1]
    gb = GroupBy(
        name="kv_gather_gb",
        sources=(EventSource(table="events"),),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("value_c", Operation.TOP_K, arg_map={"k": 3}, windows=(Window(7),)),
            Aggregation("value_c", Operation.BOTTOM_K, arg_map={"k": 3}, windows=(Window(7),)),
            Aggregation("value_c", Operation.FIRST_K, arg_map={"k": 3}, windows=(Window(7),)),
            Aggregation("value_c", Operation.LAST_K, arg_map={"k": 3}, windows=(Window(7),)),
            Aggregation(
                "value_c",
                Operation.BOUNDED_UNIQUE_COUNT,
                arg_map={"k": 10},
                windows=(Window(7),),
            ),
            Aggregation(
                "value_c",
                Operation.APPROX_PERCENTILE,
                arg_map={"percentiles": [0.5]},
                windows=(Window(7),),
            ),
            Aggregation(
                "event_type",
                Operation.APPROX_HISTOGRAM_K,
                arg_map={"k": 3},
                windows=(Window(7),),
            ),
            # unbounded variants ride the collapsed-prefix frame — a
            # different upload/fetch code path than the hop frames
            Aggregation("value_c", Operation.TOP_K, arg_map={"k": 3}, windows=(None,)),
            Aggregation(
                "value_c",
                Operation.BOUNDED_UNIQUE_COUNT,
                arg_map={"k": 10},
                windows=(None,),
            ),
            # bucketed scalar: Map[event_type → SUM] through the
            # per-(hop, bucket) IR frames
            Aggregation(
                "value_c", Operation.SUM, windows=(Window(7),), buckets=("event_type",)
            ),
            # bucketed equi-rank percentile — exact regime at sf0.01
            # (≤3 events per (user, hour) hop), so the per-bucket median
            # is hash-exact vs DuckDB's quantile_cont
            Aggregation(
                "value_c",
                Operation.APPROX_PERCENTILE,
                arg_map={"percentiles": [0.5]},
                windows=(Window(7),),
                buckets=("event_type",),
            ),
            # bucketed capped count-map (round-6: the last bucketed KV
            # refusal closed) — Map[event_type → Map[cents → count]] via
            # the flat-column densify; exact regime (distinct cents per
            # (user, hour, type) hop << the 8k cap)
            Aggregation(
                "value_c",
                Operation.APPROX_HISTOGRAM_K,
                arg_map={"k": 2},
                windows=(Window(7),),
                buckets=("event_type",),
            ),
        ),
        accuracy=Accuracy.TEMPORAL,
    )
    feed = ev.select("user_id", "ts", "value_c", "event_type")
    up = group_by_upload(spark, gb, feed, end_ds)
    q = ev.filter(F.col("ds") == serve_ds).select("event_id", "user_id", "ts")
    out = fetch_features(spark, gb, up, feed, q, end_ds)

    def _lst(col):
        return F.array_join(
            F.transform(F.col(col), lambda x: x.cast("string")), ","
        )

    mg_str = F.array_join(
        F.transform(
            F.array_sort(
                F.map_entries("event_type_approx_histogram_k_7d"),
                lambda a, b: F.when(a["value"] > b["value"], F.lit(-1))
                .when(a["value"] < b["value"], F.lit(1))
                .when(a["key"] < b["key"], F.lit(-1))
                .otherwise(F.lit(1)),
            ),
            lambda e: F.concat_ws(":", e["key"], e["value"].cast("string")),
        ),
        ",",
    )
    return out.select(
        "event_id",
        _lst("value_c_top_k_3_7d").alias("top3_7d"),
        _lst("value_c_bottom_k_3_7d").alias("bot3_7d"),
        _lst("value_c_first_k_3_7d").alias("first3_7d"),
        _lst("value_c_last_k_3_7d").alias("last3_7d"),
        F.col("value_c_bounded_unique_count_7d").alias("buc10_7d"),
        F.round(
            F.element_at("value_c_approx_percentile_7d", 1), 6
        ).alias("med_7d"),
        mg_str.alias("mg3_7d"),
        _lst("value_c_top_k_3").alias("top3_all"),
        F.col("value_c_bounded_unique_count").alias("buc10_all"),
        F.array_join(
            F.transform(
                F.array_sort(F.map_entries("value_c_sum_7d_by_event_type")),
                lambda e: F.concat_ws(":", e["key"], e["value"].cast("string")),
            ),
            ",",
        ).alias("bsum_7d"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.map_entries("value_c_approx_percentile_7d_by_event_type")
                ),
                lambda e: F.concat_ws(
                    ":",
                    e["key"],
                    F.round(F.element_at(e["value"], 1), 6).cast("string"),
                ),
            ),
            ",",
        ).alias("bmed_7d"),
        # nested Map[bucket → Map[key → count]] canonicalized: buckets
        # sorted asc (key-only comparator — a struct holding a map field
        # is not orderable), entries by (count desc, key asc string order)
        F.array_join(
            F.transform(
                F.array_sort(
                    F.map_entries("value_c_approx_histogram_k_7d_by_event_type"),
                    lambda a, b: F.when(a["key"] < b["key"], F.lit(-1))
                    .when(a["key"] > b["key"], F.lit(1))
                    .otherwise(F.lit(0)),
                ),
                lambda e: F.concat_ws(
                    "=",
                    e["key"],
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.map_entries(e["value"]),
                                lambda a, b: F.when(a["value"] > b["value"], F.lit(-1))
                                .when(a["value"] < b["value"], F.lit(1))
                                .when(a["key"] < b["key"], F.lit(-1))
                                .otherwise(F.lit(1)),
                            ),
                            lambda x: F.concat_ws(":", x["key"], x["value"].cast("string")),
                        ),
                        "|",
                    ),
                ),
            ),
            ",",
        ).alias("bmg_7d"),
    )


# ----------------------------------------------------------------------- API


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: temporal as-of GroupBy over sf0.001 events."""
    return q_groupby_temporal(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "groupby_snapshot": q_groupby_snapshot,
        "groupby_temporal": q_groupby_temporal,
        "join_backfill": q_join_backfill,
        "temporal_collections": q_temporal_collections,
        "lag_lead": q_lag_lead,
        "sessionize": q_sessionize,
        "session_stats": q_session_stats,
        "dedup_exact": q_dedup_exact,
        "ngram_jaccard": q_ngram_jaccard,
        "textstats": q_textstats,
        "repetition_stats": q_repetition_stats,
        "streaming_dedup": q_streaming_dedup,
        "dup_components": q_dup_components,
        "vocab_stats": q_vocab_stats,
        "doc_tfidf": q_doc_tfidf,
        "url_normalize": q_url_normalize,
        "stratified_sample": q_stratified_sample,
        "chunk_documents": q_chunk_documents,
        "boilerplate_removal": q_boilerplate_removal,
        "lm_score": q_lm_score,
        "mixture_rates": q_mixture_rates,
        "pii_redaction": q_pii_redaction,
        "decontamination": q_decontamination,
        "sequence_packing": q_sequence_packing,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "similarity_bruteforce": q_similarity_bruteforce,
        "model_transform": q_model_transform,
        "log_flatten": q_log_flatten,
        "corpus_curation": q_corpus_curation,
        "histogram": q_histogram,
        "approx_histogram": q_approx_histogram,
        "topk_percentiles": q_topk_percentiles,
        "unique_counts": q_unique_counts,
        "moments": q_moments,
        "pricing_summary": q_pricing_summary,
        "minhash_near_dups": q_minhash_near_dups,
        "simhash_near_dups": q_simhash_near_dups,
        "embedding_near_dups": q_embedding_near_dups,
        "similarity_lsh": q_similarity_lsh,
        "similarity_ivf": q_similarity_ivf,
        "multimodal": q_multimodal,
        "frame_sample": q_frame_sample,
        "webtext_flagship": q_webtext_flagship,
        "approx_unique": q_approx_unique,
        "map_column_agg": q_map_column_agg,
        "elementwise_mean": q_elementwise_mean,
        "elementwise_windowed": q_elementwise_windowed,
        "vector_stats": q_vector_stats,
        "stats_summary_approx": q_stats_summary_approx,
        "stats_summary": q_stats_summary,
        "compare_tables": q_compare_tables,
        "join_chain": q_join_chain,
        "entity_join": q_entity_join,
        "cumulative_source": q_cumulative_source,
        "bootstrap_label_join": q_bootstrap_label_join,
        "external_parts": q_external_parts,
        "staging_query": q_staging_query,
        "sliced_hotkey_backfill": q_sliced_hotkey_backfill,
        "union_skew_scan": q_union_skew_scan,
        "derivations": q_derivations,
        "drift": q_drift,
        "consistency": q_consistency,
        "temporal_entities": q_temporal_entities,
        "streaming_lambda_parity": q_streaming_lambda,
        "incremental_backfill": q_incremental_backfill,
        "tilestore_cached": q_tilestore_cached,
        "kv_upload_fetch": q_kv_upload_fetch,
        "kv_upload_gather": q_kv_upload_gather,
    }



def _drift_oracle_sql() -> str:
    """DuckDB replica of drift_series(bins=15, exact) over the integer-
    floored value column — see q_drift for the float-bit discipline."""
    grid = ", ".join(repr((i + 1) / 16) for i in range(15))

    def rank(arr: str) -> str:
        j = f"len(list_filter({arr}, v -> v <= s1))"
        return (
            f"CASE WHEN s1 <= {arr}[1] THEN 0.0 "
            f"WHEN s1 >= {arr}[15] THEN 1.0 "
            f"WHEN {arr}[{j}] = s1 THEN ({j} - 1) / 14.0 "
            f"ELSE (({j} - 1) + (s1 - {arr}[{j}]) / ({arr}[{j} + 1] - {arr}[{j}])) / 14.0 END"
        )

    def pmf(r: str) -> str:
        return (
            f"list_transform(range(1, len({r}) + 2), i -> "
            f"CASE WHEN i = 1 THEN {r}[1] "
            f"WHEN i = len({r}) + 1 THEN 1.0 - {r}[len({r})] "
            f"ELSE {r}[i] - {r}[i - 1] END)"
        )

    def reg(x: str) -> str:
        z = f"len(list_filter({x}, v -> v = 0))"
        return (
            f"CASE WHEN {z} = 0 THEN {x} ELSE list_transform({x}, v -> "
            f"CASE WHEN v = 0 THEN (1e-06 * (len({x}) - {z})) / greatest({z}, 1) "
            f"ELSE v - 1e-06 END) END"
        )

    return f"""
WITH g AS (
  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS ds,
         quantile_cont(CAST(CAST(floor(value) AS BIGINT) AS DOUBLE), [{grid}]) AS q
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
w AS (SELECT ds, q, lag(q) OVER (ORDER BY ds) AS qp FROM g),
s AS (
  SELECT ds, q, qp, list_sort(list_distinct(qp || q)) AS sp
  FROM w WHERE qp IS NOT NULL
),
r AS (
  SELECT ds,
         list_transform(sp, s1 -> {rank('qp')}) AS rp,
         list_transform(sp, s1 -> {rank('q')}) AS rc
  FROM s
),
m AS (SELECT ds, {pmf('rp')} AS pp, {pmf('rc')} AS qq FROM r),
z AS (SELECT ds, {reg('pp')} AS p2, {reg('qq')} AS q2 FROM m)
SELECT ds, round(list_sum(list_transform(range(1, len(p2) + 1),
              i -> (p2[i] - q2[i]) * ln(p2[i] / q2[i]))), 6) AS psi
FROM z
"""


def oracle_sql() -> dict[str, str]:
    from chronon_spark.operators.redact import PII_PATTERNS as _pii

    toks = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t != '')"
    tris = (
        f"CASE WHEN len({toks}) >= 3 THEN list_distinct(list_transform(range(len({toks}) - 2), "
        f"i -> array_to_string({toks}[i + 1:i + 3], ' '))) "
        f"ELSE [array_to_string({toks}, ' ')] END"
    )
    sw = {
        "en": "'the','and','of','to','in','is','that','for','with','was'",
        "de": "'der','die','und','das','ist','nicht','ein','mit','auf','sich'",
        "fr": "'le','la','les','des','est','une','dans','que','pour','pas'",
        "es": "'el','la','los','que','una','por','con','para','del','las'",
    }
    lang_scores = ", ".join(
        f"len(list_filter({toks}, x -> list_contains([{ws}], x))) AS s_{lang}"
        for lang, ws in sw.items()
    )
    model_w = "[" + ", ".join(repr(float(x)) for x in _model_weights()) + "]"
    return {
        "corpus_curation": f"""
WITH feat AS (
  SELECT doc_id, text, len({toks}) AS n_tokens,
         CASE WHEN length(text) > 0
              THEN CAST(length(regexp_replace(text, '[^\.,;:!\?]', '', 'g')) AS DOUBLE) / length(text)
              ELSE 0.0 END AS punct_ratio,
         {lang_scores}
  FROM documents
), langd AS (
  SELECT *, CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                 WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                 WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
                 WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                 ELSE 'de' END AS lang_pred
  FROM feat
), surv AS (
  SELECT doc_id, lang_pred, n_tokens,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
  FROM langd
  WHERE n_tokens >= 20 AND punct_ratio <= 0.2 AND lang_pred IN ('en', 'de')
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM surv
)
SELECT doc_id, lang_pred, CAST(n_tokens AS BIGINT) AS n_tokens FROM ranked WHERE rn = 1
""",
        "log_flatten": """
WITH ev AS (
  SELECT event_id, user_id, epoch_ms(ts) AS tms, value, event_type,
         strftime(CAST(ts AS DATE), '%Y-%m-%d') AS ds
  FROM events
)
SELECT 'v1' AS schema_hash, tms AS ts_millis, user_id,
       round(value, 6) AS value, event_type
FROM ev
WHERE event_id % 97 != 0 AND event_id % 89 != 0
""",
        "model_transform": f"""
SELECT vec_id,
       round(1.0 / (1.0 + exp(-(list_dot_product(CAST(embedding AS DOUBLE[]), {model_w}::DOUBLE[]) + 0.25))), 6) AS score
FROM embeddings
""",
        "groupby_snapshot": f"""
WITH ev AS (
  SELECT user_id, datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dd, value FROM events
), bounds AS (SELECT min(dd) AS lo, max(dd) AS hi FROM ev),
spine AS (
  SELECT DISTINCT e.user_id, e.dd + g.x AS od
  FROM ev e, generate_series(0, 6) g(x), bounds b
  WHERE e.dd + g.x BETWEEN b.lo AND b.hi
)
SELECT s.user_id,
       strftime(DATE '1970-01-01' + to_days(CAST(s.od AS INT)), '%Y-%m-%d') AS ds,
       NULLIF(count(e.value), 0) AS value_count_7d,
       round(sum(e.value), 6) AS value_sum_7d,
       (CAST(round(sum(e.value) * 100) AS BIGINT) * 10000)
         // NULLIF(count(e.value), 0) AS value_avg_7d_micro,
       round(min(e.value), 6) AS value_min_7d,
       round(max(e.value), 6) AS value_max_7d
FROM spine s JOIN ev e ON e.user_id = s.user_id AND e.dd BETWEEN s.od - 6 AND s.od
GROUP BY s.user_id, s.od
""",
        "groupby_temporal": f"""
WITH ev AS (SELECT event_id, user_id, epoch_ms(ts) AS tms, value FROM events)
SELECT q.event_id,
       NULLIF(count(e.value), 0) AS value_count,
       round(sum(CASE WHEN e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.value END), 6) AS value_sum_7d,
       round(avg(CASE WHEN e.tms >= ((q.tms - {MS_6H}) // {HOP_5M}) * {HOP_5M} THEN e.value END), 6) AS value_avg_6h,
       round(min(CASE WHEN e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.value END), 6) AS value_min_7d,
       round(max(CASE WHEN e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.value END), 6) AS value_max_7d
FROM ev q LEFT JOIN ev e ON e.user_id = q.user_id AND e.tms < q.tms
GROUP BY q.event_id
""",
        "join_backfill": f"""
WITH ev AS (SELECT event_id, user_id, epoch_ms(ts) AS tms,
                   datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dd, value FROM events)
SELECT q.event_id,
       round(sum(CASE WHEN e.tms < q.tms AND e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.value END), 6) AS t_value_sum_7d,
       NULLIF(count(CASE WHEN e.tms < q.tms AND e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.value END), 0) AS t_value_count_7d,
       NULLIF(count(CASE WHEN e.tms < q.dd * CAST({MS_DAY} AS BIGINT) AND e.tms >= q.dd * CAST({MS_DAY} AS BIGINT) - {MS_3D} THEN e.value END), 0) AS s_value_count_3d
FROM ev q LEFT JOIN ev e ON e.user_id = q.user_id
GROUP BY q.event_id
""",
        "temporal_collections": f"""
WITH ev AS (SELECT event_id, user_id, epoch_ms(ts) AS tms, value, event_type FROM events),
pairs AS (
  SELECT q.event_id, e.value, e.event_type, e.tms
  FROM ev q JOIN ev e ON e.user_id = q.user_id AND e.tms < q.tms
       AND e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H}
),
base AS (
  SELECT q.event_id,
         NULLIF(count(DISTINCT p.event_type), 0) AS uniq_7d,
         (list(p.value ORDER BY p.value DESC, p.tms) FILTER (WHERE p.value IS NOT NULL))[1:3] AS topv,
         (list(p.value ORDER BY p.tms DESC, p.value DESC) FILTER (WHERE p.value IS NOT NULL))[1:3] AS lastv,
         quantile_cont(p.value, 0.5) AS p50
  FROM ev q LEFT JOIN pairs p ON p.event_id = q.event_id
  GROUP BY q.event_id
),
hist AS (
  SELECT event_id, event_type, count(*) AS n FROM pairs GROUP BY event_id, event_type
),
hs AS (
  SELECT event_id,
         string_agg(event_type || ':' || CAST(n AS VARCHAR), ',' ORDER BY event_type) AS type_hist_7d
  FROM hist GROUP BY event_id
)
SELECT b.event_id, b.uniq_7d, hs.type_hist_7d,
       CASE WHEN len(b.topv) > 0 THEN array_to_string(list_transform(b.topv, x -> printf('%.6f', x)), ',') END AS top3_7d,
       CASE WHEN len(b.lastv) > 0 THEN array_to_string(list_transform(b.lastv, x -> printf('%.6f', x)), ',') END AS last3_7d,
       round(CAST(b.p50 AS DOUBLE), 6) AS p50_7d
FROM base b LEFT JOIN hs ON hs.event_id = b.event_id
""",
        "lag_lead": """
SELECT event_id,
       round(lag(value) OVER w, 6) AS value_lag_1,
       round(lead(value) OVER w, 6) AS value_lead_1
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts)
""",
        "sessionize": """
WITH s AS (
  SELECT event_id, user_id, epoch_ms(ts) AS tms,
         CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                   OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), t AS (
  SELECT event_id, user_id, tms,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY tms ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
  FROM s
)
SELECT event_id, session_id, min(tms) OVER (PARTITION BY user_id, session_id) AS session_ts FROM t
""",
        "session_stats": """
WITH s AS (
  SELECT event_id, user_id, epoch_ms(ts) AS tms,
         CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                   OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), t AS (
  SELECT user_id, tms,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY tms ROWS UNBOUNDED PRECEDING) - 1 AS session_id
  FROM s
), g AS (
  SELECT user_id, session_id, count(*) AS n_ev, max(tms) - min(tms) AS dur
  FROM t GROUP BY user_id, session_id
)
SELECT user_id, count(*) AS n_sessions,
       round(avg(n_ev), 6) AS avg_session_events,
       round(avg(dur), 6) AS avg_session_duration_ms
FROM g GROUP BY user_id
""",
        "dedup_exact": """
SELECT min(doc_id) AS doc_id, count(*) AS dup_count
FROM documents
GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
""",
        "ngram_jaccard": f"""
WITH d AS (SELECT doc_id, {tris} AS tri FROM documents WHERE doc_id < 30)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(CASE WHEN len(list_distinct(list_concat(a.tri, b.tri))) > 0
                  THEN CAST(len(list_intersect(a.tri, b.tri)) AS DOUBLE) / len(list_distinct(list_concat(a.tri, b.tri)))
                  ELSE 1.0 END, 6) AS jaccard
FROM d a, d b WHERE a.doc_id < b.doc_id
""",
        "textstats": f"""
SELECT doc_id,
       len({toks}) AS n_tokens,
       round(CASE WHEN length(text) > 0
                  THEN CAST(length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g')) AS DOUBLE) / length(text)
                  ELSE 0.0 END, 6) AS punct_ratio,
       round(CASE WHEN length(text) > 0
                  THEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text)
                  ELSE 0.0 END, 6) AS digit_ratio,
       round(CASE WHEN len({toks}) > 0
                  THEN CAST(len(list_distinct({toks})) AS DOUBLE) / len({toks})
                  ELSE 0.0 END, 6) AS unique_token_ratio
FROM documents
""",
        "streaming_dedup": """
SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
FROM documents
""",
        "dup_components": """
WITH RECURSIVE
e AS (SELECT doc_id AS a, doc_id - 1 AS b FROM documents
      WHERE doc_id % 16 <> 0 AND doc_id % 7 <> 0),
sym AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
nodes AS (SELECT DISTINCT a AS node FROM sym),
walk AS (
  SELECT node, node AS comp FROM nodes
  UNION
  SELECT s.b AS node, w.comp FROM walk w JOIN sym s ON s.a = w.node
)
SELECT node, CAST(min(comp) AS BIGINT) AS component
FROM walk GROUP BY node
""",
        "vocab_stats": f"""
WITH t AS (SELECT doc_id, unnest({toks}) AS token FROM documents),
dt AS (SELECT doc_id, token, count(*) AS tf FROM t GROUP BY 1, 2),
v AS (SELECT token, count(*) AS doc_freq, sum(tf) AS term_freq FROM dt GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents)
SELECT token,
       CAST(doc_freq AS BIGINT) AS doc_freq,
       CAST(term_freq AS BIGINT) AS term_freq,
       round(ln((CAST(n.n AS DOUBLE) + 1.0) / (CAST(doc_freq AS DOUBLE) + 1.0)) + 1.0, 6) AS idf
FROM v, n
ORDER BY doc_freq DESC, token
LIMIT 200
""",
        "doc_tfidf": f"""
WITH t AS (SELECT doc_id, unnest({toks}) AS token FROM documents),
dt AS (SELECT doc_id, token, count(*) AS tf FROM t GROUP BY 1, 2),
v AS (SELECT token, count(*) AS doc_freq FROM dt GROUP BY 1 HAVING count(*) >= 2),
n AS (SELECT count(*) AS n FROM documents),
s AS (SELECT dt.doc_id, dt.token, dt.tf,
             round(CAST(dt.tf AS DOUBLE) * (ln((CAST(n.n AS DOUBLE) + 1.0) / (CAST(v.doc_freq AS DOUBLE) + 1.0)) + 1.0), 6) AS tfidf
      FROM dt JOIN v USING (token), n),
r AS (SELECT doc_id, token, tf, tfidf,
             row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rank
      FROM s)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, token, CAST(tf AS BIGINT) AS tf, tfidf
FROM r WHERE rank <= 3
""",
        "url_normalize": """
WITH a AS (
  SELECT doc_id,
         CASE CAST(doc_id % 4 AS INT)
           WHEN 0 THEN 'HTTPS://WWW.Site' || CAST(doc_id % 50 AS VARCHAR)
                || '.Example.COM:443/a/' || CAST(doc_id AS VARCHAR) || '/?utm_source=feed&b=2&a=1#x'
           WHEN 1 THEN 'http://site' || CAST(doc_id % 50 AS VARCHAR)
                || '.example.org:80/p/' || CAST(doc_id AS VARCHAR)
           WHEN 2 THEN 'https://site' || CAST(doc_id % 50 AS VARCHAR)
                || '.example.net:8443/q?z=9&fbclid=abc' || CAST(doc_id AS VARCHAR)
           ELSE 'https://cdn' || CAST(doc_id % 7 AS VARCHAR) || '.assets.io'
         END AS u
  FROM documents),
b AS (
  SELECT doc_id, u,
         lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         regexp_replace(lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
                        '^[^@]*@', '') AS auth,
         regexp_replace(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
                        '/$', '') AS path,
         COALESCE(regexp_extract(u, '\\?([^#]*)', 1), '') AS qraw
  FROM a),
c AS (
  SELECT doc_id, scheme, path,
         CASE WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
              WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
              ELSE auth END AS hostport,
         COALESCE(array_to_string(list_sort(list_filter(string_split(qraw, '&'),
           p -> p != '' AND NOT regexp_matches(p || '=',
                  '^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref_src)='))), '&'), '') AS kept
  FROM b)
SELECT doc_id,
       scheme || '://' || hostport || path
         || CASE WHEN kept != '' THEN '?' || kept ELSE '' END AS url_norm,
       scheme AS url_scheme,
       regexp_replace(hostport, ':[0-9]+$', '') AS url_host,
       regexp_extract(regexp_replace(hostport, ':[0-9]+$', ''), '([^.]+\\.[^.]+)$', 1) AS url_domain,
       path AS url_path,
       kept AS url_query
FROM c
""",
        "stratified_sample": """
WITH r AS (
  SELECT doc_id, source,
         CAST(CASE source WHEN 'src0' THEN 0.1 WHEN 'src1' THEN 0.9
                          WHEN 'src2' THEN 0.5 WHEN 'src3' THEN 0.75
                          ELSE 0.25 END AS DOUBLE) AS rate,
         CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 8)) AS BIGINT)
              AS DOUBLE) / 4294967296.0 AS u7,
         CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':11'), 1, 8)) AS BIGINT)
              AS DOUBLE) / 4294967296.0 AS u11
  FROM documents)
SELECT doc_id, source,
       round(CAST(1.0 AS DOUBLE) / rate, 6) AS sample_weight,
       CASE WHEN u11 < 0.75 THEN 'train'
            WHEN u11 < 0.875 THEN 'valid'
            ELSE 'test' END AS split
FROM r WHERE u7 < rate
""",
        "lm_score": f"""
WITH t AS (SELECT doc_id, unnest({toks}) AS token FROM documents),
dt AS (SELECT doc_id, token, count(*) AS tf FROM t GROUP BY 1, 2),
v AS (SELECT token, sum(tf) AS term_freq FROM dt GROUP BY 1),
d AS (SELECT CAST(sum(term_freq) + count(*) AS DOUBLE) AS denom FROM v),
s AS (SELECT t.doc_id, ln((CAST(v.term_freq AS DOUBLE) + 1.0) / d.denom) AS logp
      FROM t JOIN v USING (token), d),
a AS (SELECT doc_id, count(*) AS n_tokens, avg(logp) AS mean_logp FROM s GROUP BY 1)
SELECT documents.doc_id,
       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       round(a.mean_logp, 6) AS mean_logp,
       round(exp(-a.mean_logp), 6) AS ppl
FROM documents LEFT JOIN a USING (doc_id)
""",
        "boilerplate_removal": """
WITH a AS (
  SELECT doc_id,
         text
           || CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'COOKIE NOTICE accept our terms' ELSE '' END
           || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'ALL RIGHTS RESERVED' ELSE '' END
           || chr(10) || 'ref-' || CAST(doc_id AS VARCHAR) AS t
  FROM documents),
w AS (SELECT doc_id, t, string_split(t, chr(10)) AS w FROM a),
dl AS (SELECT doc_id, unnest(list_distinct(w)) AS line FROM w),
bp AS (SELECT line FROM dl WHERE line != '' GROUP BY line HAVING count(*) >= 3),
u AS (SELECT doc_id, i AS pos, w[i] AS line
      FROM w, UNNEST(range(1, len(w) + 1)) r(i)),
k AS (SELECT u.doc_id, u.pos, u.line FROM u LEFT JOIN bp USING (line)
      WHERE bp.line IS NULL)
SELECT w.doc_id,
       COALESCE(string_agg(k.line, chr(10) ORDER BY k.pos), '') AS text_clean,
       CAST(len(w.w) - count(k.line) AS BIGINT) AS n_lines_removed
FROM w LEFT JOIN k USING (doc_id)
GROUP BY w.doc_id, w.w
""",
        "chunk_documents": """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
s AS (SELECT doc_id, w,
             CASE WHEN len(w) <= 32 THEN [CAST(0 AS BIGINT)]
                  ELSE list_distinct(list_append(
                         list_transform(range(0, ((len(w) - 32) // 24) + 1), i -> i * 24),
                         len(w) - 32)) END AS starts
      FROM t),
u AS (SELECT doc_id, w, unnest(starts) AS st FROM s)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY st) - 1 AS BIGINT) AS chunk_id,
       CAST(st AS BIGINT) AS start_tok,
       CAST(least(32, len(w) - st) AS BIGINT) AS n_tokens,
       array_to_string(w[st + 1:st + 32], ' ') AS chunk_text
FROM u
""",
        "mixture_rates": """
WITH a AS (SELECT source AS stratum, count(*) AS n_docs FROM documents GROUP BY 1),
z AS (SELECT sum(pow(CAST(n_docs AS DOUBLE), 0.5)) AS z FROM a)
SELECT stratum,
       CAST(n_docs AS BIGINT) AS n_docs,
       round(pow(CAST(n_docs AS DOUBLE), 0.5) / z.z, 6) AS weight,
       round(least(CAST(1.0 AS DOUBLE),
                   pow(CAST(n_docs AS DOUBLE), 0.5) / z.z * 2000.0 / n_docs), 6) AS rate
FROM a, z
""",
        "pii_redaction": f"""
WITH a AS (
  SELECT doc_id,
         concat_ws(' ', text,
           'user' || CAST(doc_id AS VARCHAR) || '@example.com',
           CASE WHEN doc_id % 2 = 0
                THEN '10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' END,
           CASE WHEN doc_id % 3 = 0
                THEN '+1 415 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') END
         ) AS t
  FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_pii["email"]}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(t, '{_pii["ipv4"]}')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(t, '{_pii["phone"]}')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(t, '{_pii["email"]}'))
            + len(regexp_extract_all(t, '{_pii["ipv4"]}'))
            + len(regexp_extract_all(t, '{_pii["phone"]}')) AS BIGINT) AS pii_total,
       regexp_replace(
         regexp_replace(
           regexp_replace(t, '{_pii["email"]}', '<email>', 'g'),
           '{_pii["ipv4"]}', '<ipv4>', 'g'),
         '{_pii["phone"]}', '<phone>', 'g') AS redacted
FROM a
""",
        "repetition_stats": """
WITH t AS (SELECT doc_id,
                  list_filter(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                              x -> x != '') AS w
           FROM documents),
tc AS (SELECT doc_id, strlen(array_to_string(w, ' ')) AS total_chars FROM t),
g2 AS (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
       FROM t, UNNEST(range(1, len(w) - 2 + 2)) AS r(i) WHERE len(w) >= 2),
c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
a2 AS (SELECT doc_id,
              1.0 - CAST(count(*) AS DOUBLE) / sum(c) AS frac_dup,
              max(c * strlen(g)) AS best
       FROM c2 GROUP BY 1),
g3 AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g
       FROM t, UNNEST(range(1, len(w) - 3 + 2)) AS r(i) WHERE len(w) >= 3),
c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
a3 AS (SELECT doc_id,
              1.0 - CAST(count(*) AS DOUBLE) / sum(c) AS frac_dup,
              max(c * strlen(g)) AS best
       FROM c3 GROUP BY 1)
SELECT t.doc_id,
       round(COALESCE(a2.frac_dup, 0.0), 6) AS frac_dup_2gram,
       round(CASE WHEN tc.total_chars > 0
                  THEN CAST(COALESCE(a2.best, 0) AS DOUBLE) / tc.total_chars
                  ELSE 0.0 END, 6) AS top_2gram_char_frac,
       round(COALESCE(a3.frac_dup, 0.0), 6) AS frac_dup_3gram,
       round(CASE WHEN tc.total_chars > 0
                  THEN CAST(COALESCE(a3.best, 0) AS DOUBLE) / tc.total_chars
                  ELSE 0.0 END, 6) AS top_3gram_char_frac
FROM t
JOIN tc USING (doc_id)
LEFT JOIN a2 USING (doc_id)
LEFT JOIN a3 USING (doc_id)
""",
        "decontamination": """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (SELECT doc_id, array_to_string(w[i:i+3], ' ') AS g
      FROM w, UNNEST(range(1, len(w) - 4 + 2)) AS t(i)
      WHERE len(w) >= 4),
b AS (SELECT DISTINCT g FROM g WHERE doc_id % 29 = 0),
h AS (SELECT g.doc_id, count(DISTINCT g.g) AS n_hits
      FROM g JOIN b USING (g) WHERE g.doc_id % 29 != 0 GROUP BY 1)
SELECT w.doc_id,
       CAST(CASE WHEN len(w.w) >= 4 THEN len(w.w) - 3 ELSE 0 END AS BIGINT) AS n_grams,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) >= 3 AS BIGINT) AS contaminated
FROM w LEFT JOIN h USING (doc_id)
WHERE w.doc_id % 29 != 0
""",
        "sequence_packing": """
WITH t AS (SELECT source, doc_id,
                  CAST(len(string_split(text, ' ')) + 1 AS BIGINT) AS n_tokens
           FROM documents),
c AS (SELECT source, doc_id, n_tokens,
             CAST(COALESCE(sum(n_tokens) OVER (
                    PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS stream_offset
      FROM t)
SELECT source, doc_id, n_tokens, stream_offset,
       stream_offset // 512 AS pack_first,
       (stream_offset + n_tokens - 1) // 512 AS pack_last,
       stream_offset % 512 AS pack_offset
FROM c
""",
        "lang_id": f"""
WITH s AS (SELECT doc_id, {lang_scores} FROM documents)
SELECT doc_id,
       CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
            WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
            WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
            WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
            ELSE 'de' END AS lang_pred
FROM s
""",
        "fingerprint": """
SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
FROM documents
""",
        "similarity_bruteforce": """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id,
         CASE WHEN list_dot_product(e.embedding, e.embedding) * list_dot_product(q.qv, q.qv) > 0
              THEN list_dot_product(e.embedding, q.qv) /
                   (sqrt(list_dot_product(e.embedding, e.embedding)) * sqrt(list_dot_product(q.qv, q.qv)))
              ELSE 0.0 END AS cos
  FROM embeddings e, q
), ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, rank, vec_id, round(cos, 4) AS cosine FROM ranked WHERE rank <= 10
""",
        "histogram": """
WITH c AS (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY user_id, event_type)
SELECT user_id,
       string_agg(event_type || ':' || CAST(n AS VARCHAR), ',' ORDER BY event_type) AS type_hist
FROM c GROUP BY user_id
""",
        "approx_histogram": """
WITH c AS (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY user_id, event_type),
r AS (SELECT user_id, event_type, n,
             row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rk
      FROM c)
SELECT user_id,
       string_agg(event_type || ':' || CAST(n AS VARCHAR), ',' ORDER BY event_type) AS hist_k
FROM r WHERE rk <= 2 GROUP BY user_id
""",
        "topk_percentiles": """
WITH l AS (SELECT user_id, list(value ORDER BY value DESC) AS vs,
                  quantile_cont(value, 0.5) AS q50, quantile_cont(value, 0.95) AS q95
           FROM events GROUP BY user_id)
SELECT user_id,
       round(CAST(q50 AS DOUBLE), 6) AS p50,
       round(CAST(q95 AS DOUBLE), 6) AS p95,
       round(vs[1], 6) AS top1, round(vs[2], 6) AS top2, round(vs[3], 6) AS top3
FROM l
""",
        "unique_counts": """
SELECT user_id, count(DISTINCT event_type) AS type_unique,
       least(count(DISTINCT event_type), 3) AS type_unique_bounded_3
FROM events GROUP BY user_id
""",
        "moments": """
WITH m AS (
  SELECT user_id, count(value) AS n, avg(value) AS m1,
         avg(value * value) AS e2, avg(value * value * value) AS e3,
         avg(value * value * value * value) AS e4
  FROM events GROUP BY user_id
)
SELECT user_id,
       round(greatest(e2 - m1 * m1, 0.0), 6) AS value_var,
       round((e3 - 3 * m1 * e2 + 2 * m1 * m1 * m1) / pow(e2 - m1 * m1, 1.5), 6) AS value_skew,
       round((e4 - 4 * m1 * e3 + 6 * m1 * m1 * e2 - 3 * m1 * m1 * m1 * m1) / pow(e2 - m1 * m1, 2) - 3.0, 6) AS value_kurt
FROM m
""",
        "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS base_price_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS disc_price_e4,
       CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS disc_cents,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
        "map_column_agg": """
WITH c AS (SELECT user_id, event_type, sum(value) AS s FROM events GROUP BY user_id, event_type)
SELECT user_id,
       string_agg(event_type || ':' || CAST(round(s, 6) AS VARCHAR), ',' ORDER BY event_type) AS type_sums
FROM c GROUP BY user_id
""",
        "elementwise_mean": """
WITH e AS (
  SELECT label, unnest(embedding) AS v, unnest(range(len(embedding))) AS pos FROM embeddings
), p AS (
  SELECT label, pos, avg(CAST(v AS DOUBLE)) AS a FROM e GROUP BY label, pos
)
SELECT label, array_to_string(list(printf('%.6f', a) ORDER BY pos), ',') AS emb_mean FROM p GROUP BY label
""",
        "elementwise_windowed": f"""
WITH ev AS (SELECT event_id, user_id, epoch_ms(ts) AS tms,
                   CAST(round(value * 100) AS BIGINT) AS vc FROM events)
SELECT q.event_id,
       CASE WHEN count(CASE WHEN e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.vc END) > 0 THEN
         CAST((sum(CASE WHEN e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.vc END) * 10000)
              // count(CASE WHEN e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.vc END) AS VARCHAR)
         || ',' || CAST((sum(CASE WHEN e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.vc * 2 END) * 10000)
              // count(CASE WHEN e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.vc END) AS VARCHAR)
         || ',' || CAST((sum(CASE WHEN e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.vc + 100 END) * 10000)
              // count(CASE WHEN e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.vc END) AS VARCHAR)
       END AS vec_avg_7d_micro
FROM ev q LEFT JOIN ev e ON e.user_id = q.user_id AND e.tms < q.tms
GROUP BY q.event_id
""",
        "vector_stats": """
SELECT label, round(avg(CAST(v AS DOUBLE)), 6) AS elem_avg
FROM (SELECT label, unnest(embedding) AS v FROM embeddings)
GROUP BY label
""",
        "frame_sample": """
WITH f AS (
  SELECT doc_id, text,
         unnest(range(0, LEAST(CAST(floor(length(text) / 64) AS BIGINT), 3) + 1)) AS i
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST(i AS BIGINT) AS frame_idx,
       md5(substring(text, CAST(i * 64 + 1 AS BIGINT), 64)) AS frame_md5,
       CAST(length(substring(text, CAST(i * 64 + 1 AS BIGINT), 64)) AS BIGINT) AS frame_len
FROM f
""",
        "stats_summary_approx": """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS ds,
       CAST(count(*) AS BIGINT) AS total_count,
       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_nulls,
       array_to_string(list_transform(quantile_disc(CAST(value AS DOUBLE), [0.05, 0.25, 0.5, 0.75, 0.95]),
                                      x -> printf('%.6f', x)), ',') AS value_pcts
FROM events GROUP BY 1
""",
        "stats_summary": """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS ds,
       CAST(count(*) AS BIGINT) AS total_count,
       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_nulls,
       round(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS value_null_rate,
       CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS type_nulls,
       array_to_string(list_transform(quantile_cont(CAST(value AS DOUBLE), [0.05, 0.25, 0.5, 0.75, 0.95]),
                                      x -> printf('%.6f', x)), ',') AS value_pcts
FROM events GROUP BY 1
""",
        "compare_tables": """
WITH l AS (SELECT event_id, value, event_type FROM events),
r AS (
  SELECT event_id,
         CASE WHEN event_id % 10 = 0 THEN value + 1 ELSE value END AS value,
         CASE WHEN event_id % 17 = 0 THEN NULL ELSE event_type END AS event_type
  FROM events WHERE event_id % 31 != 0
),
j AS (SELECT l.value AS vl, r.value AS vr, l.event_type AS tl, r.event_type AS tr,
             (l.event_id IS NOT NULL OR r.event_id IS NOT NULL) AS present
      FROM l FULL OUTER JOIN r ON l.event_id = r.event_id)
SELECT CAST(count(*) AS BIGINT) AS total,
       CAST(sum(CASE WHEN vl IS NULL AND vr IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_both_null,
       CAST(sum(CASE WHEN vl IS NULL AND vr IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_left_null,
       CAST(sum(CASE WHEN vl IS NOT NULL AND vr IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_right_null,
       CAST(sum(CASE WHEN vl IS NOT NULL AND vr IS NOT NULL AND vl != vr THEN 1 ELSE 0 END) AS BIGINT) AS value_mismatch,
       round(avg(CASE WHEN abs(vl) + abs(vr) != 0 THEN abs(vl - vr) * 2.0 / (abs(vl) + abs(vr)) ELSE 0.0 END), 6) AS value_smape,
       array_to_string(list_transform(quantile_cont(CAST(vl - vr AS DOUBLE), [0.05, 0.25, 0.5, 0.75, 0.95]),
                                      x -> printf('%.6f', x)), ',') AS value_diff_pcts,
       CAST(sum(CASE WHEN tl IS NOT NULL AND tr IS NOT NULL AND tl != tr THEN 1 ELSE 0 END) AS BIGINT) AS event_type_mismatch,
       CAST(sum(CASE WHEN tl IS NOT NULL AND tr IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_type_right_null,
       round(avg(CASE WHEN tl IS NOT NULL AND tr IS NOT NULL THEN CAST(levenshtein(tl, tr) AS DOUBLE) END), 6) AS event_type_edit_distance,
       round(avg(CASE WHEN tl IS NOT NULL AND tr IS NOT NULL THEN levenshtein(tl, tr) * 1.0 / greatest(len(tl), len(tr), 1) END), 6) AS event_type_edit_distance_norm
FROM j
""",
        "join_chain": f"""
WITH ev AS (SELECT event_id, user_id, epoch_ms(ts) AS tms, value FROM events),
f1 AS (
  SELECT q.event_id, q.user_id, q.tms,
         sum(CASE WHEN e.tms < q.tms AND e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.value END) AS s7
  FROM ev q LEFT JOIN ev e ON e.user_id = q.user_id
  GROUP BY q.event_id, q.user_id, q.tms
)
SELECT q.event_id,
       CAST(sum(CASE WHEN p.tms < q.tms THEN CAST(round(p.s7 * 100) AS BIGINT) END) AS BIGINT) AS chain_cents,
       NULLIF(count(CASE WHEN p.tms < q.tms THEN p.s7 END), 0) AS chain_n
FROM f1 q LEFT JOIN f1 p ON p.user_id = q.user_id
GROUP BY q.event_id
""",
        "entity_join": """
WITH dim AS (SELECT user_id, CAST(ts AS DATE) AS d, max(value) AS mx FROM events GROUP BY 1, 2)
SELECT e.event_id, round(m.mx, 6) AS ent_score_max
FROM events e LEFT JOIN dim m ON m.user_id = e.user_id AND m.d = CAST(e.ts AS DATE)
""",
        "cumulative_source": """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv_cents
FROM events
WHERE CAST(ts AS DATE) = (SELECT max(CAST(ts AS DATE)) FROM events)
  AND event_type IS NOT NULL
GROUP BY 1
""",
        "bootstrap_label_join": f"""
WITH ev AS (SELECT event_id, user_id, epoch_ms(ts) AS tms, CAST(ts AS DATE) AS d, value FROM events),
feat AS (
  SELECT q.event_id, q.user_id, q.d,
         sum(CASE WHEN e.tms < q.tms AND e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.value END) AS comp
  FROM ev q LEFT JOIN ev e ON e.user_id = q.user_id
  GROUP BY q.event_id, q.user_id, q.d
),
lab AS (
  SELECT f.event_id, NULLIF(count(e2.value), 0) AS lbl
  FROM feat f LEFT JOIN ev e2 ON e2.user_id = f.user_id AND e2.d > f.d AND e2.d <= f.d + 3
  GROUP BY f.event_id
)
SELECT f.event_id,
       CASE WHEN f.user_id % 5 = 0 THEN CAST(-f.user_id AS BIGINT) * 100
            ELSE CAST(round(f.comp * 100) AS BIGINT) END AS bs_cents_7d,
       l.lbl AS label_cnt
FROM feat f JOIN lab l ON l.event_id = f.event_id
""",
        "external_parts": f"""
WITH ev AS (SELECT event_id, user_id, epoch_ms(ts) AS tms, value FROM events),
feat AS (
  SELECT q.event_id, q.user_id,
         sum(CASE WHEN e.tms < q.tms AND e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.value END) AS comp
  FROM ev q LEFT JOIN ev e ON e.user_id = q.user_id
  GROUP BY q.event_id, q.user_id
)
SELECT event_id,
       CASE WHEN user_id % 3 = 0 THEN CAST(user_id * 25 AS BIGINT) END AS risk_cents,
       CASE WHEN user_id % 3 = 0 THEN CAST(user_id % 7 AS BIGINT) END AS risk_tier,
       CAST(round(comp * 100) AS BIGINT) AS off_cents,
       CAST(round(comp * 100) AS BIGINT) AS reg_cents,
       CAST(NULL AS VARCHAR) AS ctx_ip
FROM feat
""",
        "sliced_hotkey_backfill": f"""
WITH ev AS (SELECT event_id, user_id, epoch_ms(ts) AS tms, event_type,
                   CAST(round(value * 100) AS BIGINT) AS vc
            FROM events)
SELECT q.event_id,
       NULLIF(count(e.vc), 0) AS cnt_all,
       NULLIF(count(CASE WHEN e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.vc END), 0) AS cnt_7d,
       CAST(sum(e.vc) AS BIGINT) AS sum_cents,
       arg_max(e.vc, CASE WHEN e.vc IS NOT NULL THEN e.tms END) AS last_cents,
       NULLIF(least(count(DISTINCT e.event_type), 3), 0) AS types_k3
FROM ev q LEFT JOIN ev e ON e.user_id = q.user_id AND e.tms < q.tms
GROUP BY q.event_id
""",
        "staging_query": """
WITH b AS (SELECT strftime(min(CAST(ts AS DATE)) + INTERVAL 5 DAY, '%Y-%m-%d') AS lo,
                  strftime(max(CAST(ts AS DATE)), '%Y-%m-%d') AS hi
           FROM events)
SELECT strftime(CAST(e.ts AS DATE), '%Y-%m-%d') AS ds, e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS sv_cents, b.hi AS latest
FROM events e, b
WHERE strftime(CAST(e.ts AS DATE), '%Y-%m-%d') BETWEEN b.lo AND b.hi
  AND e.event_type IS NOT NULL
GROUP BY 1, 2, b.hi
""",
        "union_skew_scan": """
WITH u AS (
  SELECT user_id, value, 'hi' AS src FROM events WHERE value > 50
  UNION ALL
  SELECT user_id, value, 'lo' AS src FROM events WHERE value <= 50 OR value IS NULL
)
SELECT user_id, src, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv_cents
FROM u WHERE user_id NOT IN (1, 2, 3)
GROUP BY 1, 2
""",
        "derivations": f"""
WITH ev AS (SELECT event_id, user_id, epoch_ms(ts) AS tms, value FROM events),
f AS (
  SELECT q.event_id,
         sum(CASE WHEN e.tms < q.tms AND e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.value END) AS raw_sum,
         NULLIF(count(CASE WHEN e.tms < q.tms THEN e.value END), 0) AS value_count
  FROM ev q LEFT JOIN ev e ON e.user_id = q.user_id
  GROUP BY q.event_id
)
SELECT event_id, round(raw_sum, 6) AS value_sum_7d, value_count,
       CAST(round(raw_sum * 100) AS BIGINT) AS sum_cents,
       CAST(floor(CAST(round(raw_sum * 100) AS BIGINT) / value_count) AS BIGINT) AS cents_per_event
FROM f
""",
        "drift": _drift_oracle_sql(),
        "consistency": f"""
WITH ev AS (SELECT event_id, user_id, epoch_ms(ts) AS tms, value FROM events),
q AS (SELECT event_id, user_id, tms FROM ev WHERE event_id % 13 = 0),
off AS (
  SELECT q.event_id,
         sum(CASE WHEN e.tms < q.tms AND e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.value END) AS sum7,
         NULLIF(count(CASE WHEN e.tms < q.tms THEN e.value END), 0) AS cnt
  FROM q LEFT JOIN ev e ON e.user_id = q.user_id
  GROUP BY q.event_id
),
j AS (
  SELECT CASE WHEN event_id % 10 = 0 THEN sum7 + 1 ELSE sum7 END AS sl, sum7 AS sr,
         cnt AS cl, cnt AS cr
  FROM off
)
SELECT CAST(count(*) AS BIGINT) AS total,
       CAST(sum(CASE WHEN sl IS NOT NULL AND sr IS NOT NULL AND sl != sr THEN 1 ELSE 0 END) AS BIGINT) AS sum7_mismatch,
       CAST(sum(CASE WHEN sl IS NULL AND sr IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS sum7_both_null,
       CAST(sum(CASE WHEN sl IS NULL AND sr IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS sum7_left_null,
       CAST(sum(CASE WHEN sl IS NOT NULL AND sr IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS sum7_right_null,
       round(avg(CASE WHEN abs(sl) + abs(sr) != 0 THEN abs(sl - sr) * 2.0 / (abs(sl) + abs(sr)) ELSE 0.0 END), 6) AS sum7_smape,
       array_to_string(list_transform(quantile_cont(CAST(sl - sr AS DOUBLE), [0.05, 0.25, 0.5, 0.75, 0.95]),
                                      x -> printf('%.6f', x)), ',') AS sum7_diff_pcts,
       CAST(sum(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL AND cl != cr THEN 1 ELSE 0 END) AS BIGINT) AS cnt_mismatch,
       CAST(sum(CASE WHEN cl IS NULL AND cr IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS cnt_both_null
FROM j
""",
        "temporal_entities": """
SELECT event_id,
       round(lag(value) OVER w, 6) AS state_sum,
       CASE WHEN lag(value) OVER w IS NOT NULL THEN CAST(1 AS BIGINT) END AS state_count
FROM events
WINDOW w AS (PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts)
""",
        "streaming_lambda_parity": f"""
WITH ev AS (
  SELECT event_id, user_id, epoch_ms(ts) AS tms,
         CAST(round(value * 100) AS BIGINT) AS vc, event_type
  FROM events
), mx AS (
  SELECT ((max(tms) // {MS_DAY}) - 1) * {MS_DAY} AS cut FROM ev
), q AS (
  SELECT event_id, user_id, tms FROM ev, mx WHERE tms >= cut
)
SELECT q.event_id,
       NULLIF(count(e.vc), 0) AS cnt_total,
       CAST(sum(CASE WHEN e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.vc END) AS BIGINT) AS sum_c_7d,
       min(CASE WHEN e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.vc END) AS min_c_7d,
       max(CASE WHEN e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.vc END) AS max_c_7d,
       NULLIF(count(DISTINCT CASE WHEN e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.event_type END), 0) AS uniq_types_7d
FROM q LEFT JOIN ev e ON e.user_id = q.user_id AND e.tms < q.tms
GROUP BY q.event_id
""",
        "incremental_backfill": """
WITH ev AS (
  SELECT user_id, datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dd,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
), bounds AS (SELECT min(dd) AS lo, max(dd) AS hi FROM ev),
spine AS (
  SELECT DISTINCT e.user_id, e.dd + g.x AS od
  FROM ev e, generate_series(0, 6) g(x), bounds b
  WHERE e.dd + g.x BETWEEN b.lo AND b.hi
)
SELECT s.user_id,
       strftime(DATE '1970-01-01' + to_days(CAST(s.od AS INT)), '%Y-%m-%d') AS ds,
       CAST(sum(e.vc) AS BIGINT) AS sum_c_7d,
       NULLIF(count(e.vc), 0) AS cnt_7d,
       max(e.vc) AS max_c_7d
FROM spine s JOIN ev e ON e.user_id = s.user_id AND e.dd BETWEEN s.od - 6 AND s.od
GROUP BY s.user_id, s.od
""",
        "tilestore_cached": f"""
WITH ev AS (SELECT event_id, user_id, epoch_ms(ts) AS tms,
                   CAST(round(value * 100) AS BIGINT) AS vc FROM events)
SELECT q.event_id,
       CAST(sum(CASE WHEN e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.vc END) AS BIGINT) AS sum_c_7d,
       NULLIF(count(CASE WHEN e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.vc END), 0) AS cnt_7d,
       max(CASE WHEN e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.vc END) AS max_c_7d,
       min(CASE WHEN e.tms >= ((q.tms - {MS_6H}) // {HOP_5M}) * {HOP_5M} THEN e.vc END) AS min_c_6h
FROM ev q LEFT JOIN ev e ON e.user_id = q.user_id AND e.tms < q.tms
GROUP BY q.event_id
""",
        "kv_upload_fetch": f"""
WITH ev AS (SELECT event_id, user_id, epoch_ms(ts) AS tms,
                   CAST(round(value * 100) AS BIGINT) AS vc,
                   CAST(ts AS DATE) AS d FROM events),
bounds AS (SELECT max(d) AS last_d FROM ev)
SELECT q.event_id,
       NULLIF(count(e.vc), 0) AS cnt_all,
       CAST(sum(CASE WHEN e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.vc END) AS BIGINT) AS sum_c_7d,
       max(CASE WHEN e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H} THEN e.vc END) AS max_c_7d,
       min(CASE WHEN e.tms >= ((q.tms - {MS_6H}) // {HOP_5M}) * {HOP_5M} THEN e.vc END) AS min_c_6h,
       (list(e.vc ORDER BY e.tms, e.vc)
          FILTER (WHERE e.vc IS NOT NULL
                  AND e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H}))[-1] AS last_c_7d,
       round(CASE WHEN count(CASE WHEN e.tms >= ((q.tms - {MS_3D}) // {HOP_1H}) * {HOP_1H} THEN e.vc END) > 0
             THEN CAST(sum(CASE WHEN e.tms >= ((q.tms - {MS_3D}) // {HOP_1H}) * {HOP_1H} THEN e.vc END) AS DOUBLE)
                  / count(CASE WHEN e.tms >= ((q.tms - {MS_3D}) // {HOP_1H}) * {HOP_1H} THEN e.vc END) END, 6) AS avg_c_3d
FROM ev q
JOIN bounds b ON q.d = b.last_d
LEFT JOIN ev e ON e.user_id = q.user_id AND e.tms < q.tms
GROUP BY q.event_id
""",
        "kv_upload_gather": f"""
WITH ev AS (SELECT event_id, user_id, epoch_ms(ts) AS tms,
                   CAST(round(value * 100) AS BIGINT) AS vc,
                   event_type, CAST(ts AS DATE) AS d FROM events),
bounds AS (SELECT max(d) AS last_d FROM ev),
q AS (SELECT ev.* FROM ev JOIN bounds b ON ev.d = b.last_d),
pairs AS (
  SELECT q.event_id, e.vc, e.tms, e.event_type
  FROM q LEFT JOIN ev e
    ON e.user_id = q.user_id AND e.tms < q.tms
   AND e.tms >= ((q.tms - {MS_7D}) // {HOP_1H}) * {HOP_1H}
),
pairs_all AS (
  SELECT q.event_id, e.vc
  FROM q LEFT JOIN ev e
    ON e.user_id = q.user_id AND e.tms < q.tms
),
agg_all AS (
  SELECT event_id,
    array_to_string((list(vc ORDER BY vc DESC) FILTER (vc IS NOT NULL))[1:3], ',') AS top3_all,
    CASE WHEN count(vc) > 0 THEN least(count(DISTINCT vc), 10) END AS buc10_all
  FROM pairs_all GROUP BY event_id
),
agg AS (
  SELECT event_id,
    array_to_string((list(vc ORDER BY vc DESC) FILTER (vc IS NOT NULL))[1:3], ',') AS top3_7d,
    array_to_string((list(vc ORDER BY vc) FILTER (vc IS NOT NULL))[1:3], ',') AS bot3_7d,
    array_to_string((list(vc ORDER BY tms, vc) FILTER (vc IS NOT NULL))[1:3], ',') AS first3_7d,
    array_to_string((list(vc ORDER BY tms DESC, vc DESC) FILTER (vc IS NOT NULL))[1:3], ',') AS last3_7d,
    CASE WHEN count(vc) > 0 THEN least(count(DISTINCT vc), 10) END AS buc10_7d,
    round(quantile_cont(vc, 0.5), 6) AS med_7d
  FROM pairs GROUP BY event_id
),
mg AS (
  SELECT event_id, event_type, count(*) AS n
  FROM pairs WHERE event_type IS NOT NULL
  GROUP BY event_id, event_type
),
mgr AS (
  SELECT event_id, event_type, n,
         row_number() OVER (PARTITION BY event_id ORDER BY n DESC, event_type) AS rn
  FROM mg
),
mgs AS (
  SELECT event_id,
         string_agg(event_type || ':' || n, ',' ORDER BY n DESC, event_type) AS mg3_7d
  FROM mgr WHERE rn <= 3 GROUP BY event_id
),
bsum AS (
  SELECT event_id, event_type, CAST(sum(vc) AS BIGINT) AS s
  FROM pairs WHERE event_type IS NOT NULL AND vc IS NOT NULL
  GROUP BY event_id, event_type
),
bsums AS (
  SELECT event_id,
         string_agg(event_type || ':' || s, ',' ORDER BY event_type) AS bsum_7d
  FROM bsum GROUP BY event_id
),
bmed AS (
  SELECT event_id, event_type, round(quantile_cont(vc, 0.5), 6) AS md
  FROM pairs WHERE event_type IS NOT NULL AND vc IS NOT NULL
  GROUP BY event_id, event_type
),
bmeds AS (
  SELECT event_id,
         string_agg(event_type || ':' || md, ',' ORDER BY event_type) AS bmed_7d
  FROM bmed GROUP BY event_id
),
bmgc AS (
  SELECT event_id, event_type, CAST(vc AS VARCHAR) AS vk, count(*) AS n
  FROM pairs WHERE event_type IS NOT NULL AND vc IS NOT NULL
  GROUP BY event_id, event_type, vc
),
bmgr AS (
  SELECT event_id, event_type, vk, n,
         row_number() OVER (PARTITION BY event_id, event_type
                            ORDER BY n DESC, vk) AS rn
  FROM bmgc
),
bmge AS (
  SELECT event_id, event_type,
         string_agg(vk || ':' || n, '|' ORDER BY n DESC, vk) AS es
  FROM bmgr WHERE rn <= 2 GROUP BY event_id, event_type
),
bmgs AS (
  SELECT event_id,
         string_agg(event_type || '=' || es, ',' ORDER BY event_type) AS bmg_7d
  FROM bmge GROUP BY event_id
)
SELECT a.event_id, a.top3_7d, a.bot3_7d, a.first3_7d, a.last3_7d,
       a.buc10_7d, a.med_7d, m.mg3_7d, u.top3_all, u.buc10_all, b.bsum_7d,
       p.bmed_7d, g.bmg_7d
FROM agg a
LEFT JOIN mgs m ON m.event_id = a.event_id
LEFT JOIN agg_all u ON u.event_id = a.event_id
LEFT JOIN bsums b ON b.event_id = a.event_id
LEFT JOIN bmeds p ON p.event_id = a.event_id
LEFT JOIN bmgs g ON g.event_id = a.event_id
""",
        "minhash_near_dups": """
SELECT doc_id AS id_a, doc_id + 1000000 AS id_b, 1.0 AS jacc
FROM documents WHERE doc_id < 20
""",
        "simhash_near_dups": """
SELECT doc_id AS id_a, doc_id + 1000000 AS id_b, CAST(0 AS BIGINT) AS hamming
FROM documents WHERE doc_id < 20
""",
        "embedding_near_dups": """
SELECT vec_id AS id_a, vec_id + 1000000 AS id_b, 1.0 AS cos
FROM embeddings WHERE vec_id < 20
""",
        "similarity_lsh": """
SELECT vec_id AS query_id, TRUE AS recall_ok, TRUE AS self_ok
FROM embeddings WHERE vec_id < 5
""",
        "similarity_ivf": """
SELECT vec_id AS query_id, TRUE AS recall_ok, TRUE AS self_ok
FROM embeddings WHERE vec_id < 5
""",
        "approx_unique": """
SELECT user_id, count(DISTINCT value) AS value_exact_unique, TRUE AS est_ok
FROM events GROUP BY user_id
""",
        "multimodal": """
WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
h AS (
  SELECT doc_id,
         sum(CAST(CASE WHEN i < length(t) THEN ascii(substring(t, CAST(i AS INT) + 1, 1)) ELSE 0 END AS HUGEINT) * p) AS h64
  FROM (SELECT doc_id, t, unnest(range(8)) AS i,
               unnest([CAST(1 AS HUGEINT), CAST(256 AS HUGEINT), CAST(65536 AS HUGEINT),
                       CAST(16777216 AS HUGEINT), CAST(4294967296 AS HUGEINT),
                       CAST(1099511627776 AS HUGEINT), CAST(281474976710656 AS HUGEINT),
                       CAST(72057594037927936 AS HUGEINT)]) AS p
        FROM d)
  GROUP BY doc_id
),
bytes AS (
  SELECT doc_id, ascii(substring(t, CAST(i AS INT) + 1, 1)) % 8 AS bucket
  FROM (SELECT doc_id, t, unnest(range(length(t))) AS i FROM d)
),
counts AS (
  SELECT d.doc_id, b.bucket, coalesce(n.n, 0) AS n
  FROM d CROSS JOIN (SELECT unnest(range(8)) AS bucket) b
  LEFT JOIN (SELECT doc_id, bucket, count(*) AS n FROM bytes GROUP BY doc_id, bucket) n
    ON n.doc_id = d.doc_id AND n.bucket = b.bucket
),
hist AS (
  SELECT doc_id, array_to_string(list(CAST(n AS VARCHAR) ORDER BY bucket), ',') AS byte_hist
  FROM counts GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(16 + h.h64 % 48 AS INT) AS width,
       CAST(16 + (h.h64 // 256) % 48 AS INT) AS height,
       hist.byte_hist
FROM d JOIN h USING (doc_id) JOIN hist USING (doc_id)
""",
        "webtext_flagship": f"""
WITH p AS (
  SELECT url, ts, text_len, lang, text
  FROM read_parquet('{FLAGSHIP_PAGES_PATH}/*.parquet')
),
base AS (
  SELECT url, ts, text_len, lang, text,
         lag(text_len) OVER w AS text_len_lag_1,
         lead(text_len) OVER w AS text_len_lead_1,
         CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > 1800000 THEN 1 ELSE 0 END AS new_s
  FROM p WINDOW w AS (PARTITION BY url ORDER BY ts)
),
sess AS (
  SELECT *, CAST(sum(new_s) OVER (PARTITION BY url ORDER BY ts ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
  FROM base
),
sess2 AS (
  SELECT *, min(ts) OVER (PARTITION BY url, session_id) AS session_ts,
         CAST(row_number() OVER (PARTITION BY url, session_id ORDER BY ts) - 1 AS INT) AS session_event_idx
  FROM sess
),
tj AS (
  SELECT q.url, q.ts,
    NULLIF(count(CASE WHEN e.ts >= ((q.ts - {7 * MS_DAY}) // {HOP_1H}) * {HOP_1H} THEN e.text_len END), 0) AS crawl_count_7d,
    NULLIF(count(CASE WHEN e.ts >= ((q.ts - {30 * MS_DAY}) // {MS_DAY}) * {MS_DAY} THEN e.text_len END), 0) AS crawl_count_30d,
    NULLIF(count(e.text_len), 0) AS crawl_count,
    round(avg(CASE WHEN e.ts >= ((q.ts - {30 * MS_DAY}) // {MS_DAY}) * {MS_DAY} THEN CAST(e.text_len AS DOUBLE) END), 6) AS avg_len_30d,
    arg_max(e.text_len, e.ts) AS last_len
  FROM p q LEFT JOIN p e ON e.url = q.url AND e.ts < q.ts
  GROUP BY q.url, q.ts
),
ll AS (
  SELECT q.url, q.ts, arg_max(e.lang, e.ts) AS last_lang
  FROM p q JOIN p e ON e.url = q.url AND e.ts < q.ts AND e.lang IS NOT NULL
  GROUP BY q.url, q.ts
),
lh AS (
  SELECT q.url, q.ts, e.lang, count(*) AS n
  FROM p q JOIN p e ON e.url = q.url AND e.ts < q.ts
       AND e.ts >= ((q.ts - {30 * MS_DAY}) // {MS_DAY}) * {MS_DAY}
  WHERE e.lang IS NOT NULL
  GROUP BY q.url, q.ts, e.lang
),
lhs AS (
  SELECT url, ts, string_agg(lang || ':' || CAST(n AS VARCHAR), ',' ORDER BY lang) AS lang_hist_30d
  FROM lh GROUP BY url, ts
)
SELECT s.url, s.ts, s.text_len_lag_1, s.text_len_lead_1, s.session_id, s.session_ts, s.session_event_idx,
       t.crawl_count_7d, t.crawl_count_30d, t.crawl_count, t.avg_len_30d, t.last_len, ll.last_lang,
       lhs.lang_hist_30d, md5(s.text) AS text_md5
FROM sess2 s
JOIN tj t ON t.url = s.url AND t.ts = s.ts
LEFT JOIN ll ON ll.url = s.url AND ll.ts = s.ts
LEFT JOIN lhs ON lhs.url = s.url AND lhs.ts = s.ts
""",
    }
