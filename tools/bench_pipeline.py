"""Throughput record for the round-6 training-data operators at sf0.1.

Prints one JSON line: per-op wall seconds + rows/s over the documents
table (5,000 docs at sf0.1), so BENCH/BASELINE.md can carry measured
numbers for the pipeline surface beside the headline suite.

Usage: python tools/bench_pipeline.py [sf_dir]
       python tools/bench_pipeline.py --scale 1000000   # synthetic corpus

The sf_dir mode measures against the (small) testdata documents table —
latency-dominated, useful for regressions. ``--scale N`` generates an
N-row deterministic synthetic corpus (40-100 tokens/doc) fully
distributed via spark.range, which is the throughput-meaningful mode.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    scale = 0
    if len(sys.argv) > 2 and sys.argv[1] == "--scale":
        scale = int(sys.argv[2])
        sf_dir = None
    else:
        sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from pyspark.sql import functions as F

    from chronon_spark.operators.boilerplate import remove_boilerplate_lines
    from chronon_spark.operators.components import connected_components
    from chronon_spark.operators.decontam import decontaminate
    from chronon_spark.operators.lmscore import lm_score
    from chronon_spark.operators.packing import chunk_documents, pack_sequences
    from chronon_spark.operators.redact import redact_pii
    from chronon_spark.operators.sampling import sample_stratified
    from chronon_spark.operators.textstats import repetition_features
    from chronon_spark.operators.urltools import url_normalize
    from chronon_spark.operators.vocab import doc_tfidf_top_terms, token_doc_freq
    from chronon_spark.session import build_session

    spark = build_session(app_name="bench-pipeline", master=f"local[{cpus}]",
                          shuffle_partitions=max(int(cpus), (scale or 0) // 250_000))
    spark.sparkContext.setLogLevel("ERROR")
    if scale:
        words = F.expr(
            "transform(sequence(1, 40 + int(abs(xxhash64(id + 7)) % 60)), "
            "i -> concat('w', abs(xxhash64(id * 1000 + i)) % 5000))"
        )
        docs = (
            spark.range(0, scale, 1, 2 * int(cpus))
            .select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit("src"), (F.abs(F.xxhash64("id")) % 20).cast("string")).alias("source"),
                F.array_join(words, " ").alias("text"),
            )
            .persist()
        )
    else:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    n = docs.count()
    urls = docs.withColumn(
        "url", F.concat(F.lit("https://"), "source", F.lit(".example/d/"), "doc_id")
    )
    edges = (
        docs.select("doc_id")
        .filter("doc_id % 16 != 0 AND doc_id % 7 != 0")
        .select(F.col("doc_id").alias("id_a"), (F.col("doc_id") - 1).alias("id_b"))
    )

    # every lambda must AGGREGATE a computed column — a bare .count() lets
    # Catalyst prune the very projection being measured
    ops = {
        "repetition_features": lambda: repetition_features(docs, ns=(2, 3))
        .select(F.sum("frac_dup_2gram"), F.sum("top_3gram_char_frac")).collect(),
        "redact_pii": lambda: redact_pii(docs).select(F.sum("pii_total")).collect(),
        "url_normalize": lambda: url_normalize(urls).select(F.count("url_norm")).collect(),
        "sample_stratified": lambda: sample_stratified(
            docs, {"src0": 0.5}, default_rate=0.25
        ).count(),
        "decontaminate": lambda: decontaminate(
            docs.filter("doc_id % 29 != 0"), docs.filter("doc_id % 29 = 0"), n=4
        ).select(F.sum("n_hits"), F.sum("n_grams")).collect(),
        "pack_sequences": lambda: pack_sequences(docs, seq_len=2048)
        .select(F.sum("pack_last"), F.sum("stream_offset")).collect(),
        "token_doc_freq": lambda: token_doc_freq(docs).count(),
        "doc_tfidf_top_terms": lambda: doc_tfidf_top_terms(docs, k=3).count(),
        "connected_components": lambda: connected_components(edges).count(),
        "chunk_documents": lambda: chunk_documents(docs, chunk_tokens=32, stride=24)
        .select(F.sum("n_tokens"), F.count("chunk_text")).collect(),
        "lm_score": lambda: lm_score(docs)
        .select(F.sum("mean_logp"), F.sum("ppl")).collect(),
        "boilerplate_removal": lambda: remove_boilerplate_lines(
            docs.withColumn("text", F.concat_ws("\n", "text", F.lit("COOKIE NOTICE"))),
            min_doc_freq=3,
        ).select(F.sum("n_lines_removed"), F.count("text_clean")).collect(),
        # >literal_limit boilerplate set (2000 distinct frequent lines)
        # exercises the Arrow is_in set-filter path — the one that runs at
        # corpus scale (r6 verdict weak #2)
        "boilerplate_removal_arrow": lambda: remove_boilerplate_lines(
            docs.withColumn(
                "text",
                F.concat_ws(
                    "\n", "text",
                    F.concat(F.lit("BOILER "), (F.col("doc_id") % 2000).cast("string")),
                ),
            ),
            min_doc_freq=3,
        ).select(F.sum("n_lines_removed"), F.count("text_clean")).collect(),
    }
    # warm codegen + python workers
    docs.agg(F.sum(F.length("text"))).collect()

    out: dict[str, dict] = {}
    for name, fn in ops.items():
        t0 = time.time()
        fn()
        dt = time.time() - t0
        out[name] = {"sec": round(dt, 3), "docs_per_sec": round(n / dt, 1)}
    spark.stop()
    print(json.dumps({
        "source": f"synthetic scale={scale}" if scale else sf_dir,
        "n_docs": n, "cpus": int(cpus), "ops": out,
    }))


if __name__ == "__main__":
    main()
