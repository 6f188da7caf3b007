"""Training-data curation pipeline example — the round-6 operators
composed into the funnel a pretraining corpus actually runs:

1. URL canonicalization (``urltools``) — canonical crawl key + domain,
   BEFORE any shuffle so crawl-dup keys collapse early,
2. quality + repetition filtering (``textstats``) — C4/Gopher-style
   map-side signals, including the shuffle-free per-doc top-gram mass,
3. benchmark decontamination (``decontam``) — held-out eval grams ride
   a broadcast; contaminated docs are dropped but COUNTED,
4. PII redaction (``redact``) — masked text with auditable counts,
5. exact dedup (``dedup``) — first doc per normalized-text fingerprint
   — then near-dup clustering (``components``): minhash pairs →
   connected components → one representative per cluster,
6. deterministic sampling + splits (``sampling``) — per-source rates,
   then train/valid/test labels; both bit-stable under repartitioning,
7. sequence packing (``packing``) — concat-and-chunk layout per
   (source, split) stream at a fixed context length.

Every stage's drop count lands in the funnel dict — silent truncation
is how corpora rot.

Run standalone:

    python tools/make_dist.py
    spark-submit --py-files dist/engine.zip examples/training_data_pipeline.py
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_example(
    spark: SparkSession,
    docs: DataFrame | None = None,
    seq_len: int = 256,
) -> dict:
    from chronon_spark.operators.components import drop_near_duplicates
    from chronon_spark.operators.decontam import decontaminate
    from chronon_spark.operators.dedup import exact_dedup, minhash_near_dups
    from chronon_spark.operators.packing import pack_sequences
    from chronon_spark.operators.redact import redact_pii
    from chronon_spark.operators.sampling import sample_stratified, split_assign
    from chronon_spark.operators.textstats import quality_features, repetition_features
    from chronon_spark.operators.urltools import url_normalize

    if docs is None:
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    funnel: dict[str, int] = {"n_input": docs.count()}

    # 1. canonical crawl key (documents table carries no url; derive a
    #    deterministic one as a crawl would)
    pages = docs.withColumn(
        "url",
        F.concat(
            F.lit("HTTPS://"), F.col("source"), F.lit(".Example.COM/d/"),
            F.col("doc_id").cast("string"), F.lit("?utm_source=crawl"),
        ),
    )
    pages = url_normalize(pages).drop("url")

    # 2. map-side quality + repetition gates (one scan, zero shuffle)
    feats = repetition_features(quality_features(pages), ns=(3,))
    kept = feats.filter(
        (F.col("n_tokens") >= 10)
        & (F.col("quality_score") >= 0.3)
        & (F.col("frac_dup_3gram") <= 0.6)
    )
    funnel["n_quality"] = kept.count()

    # 3. decontamination: every 31st doc stands in for the eval set
    bench = docs.filter("doc_id % 31 = 0")
    flags = decontaminate(kept, bench, n=6, min_hits=2)
    kept = kept.join(flags.filter("contaminated = 0").select("doc_id"), "doc_id")
    funnel["n_decontaminated"] = kept.count()

    # 4. PII masking (map-side; counts stay on the row for audits)
    kept = redact_pii(kept).drop("text").withColumnRenamed("text_redacted", "text")

    # 5. exact dedup on the masked, normalized text, then near-dup
    #    clustering: minhash candidate pairs -> connected components ->
    #    one min-id representative per cluster (cluster id/size kept for
    #    audit)
    kept = exact_dedup(kept)
    funnel["n_deduped"] = kept.count()
    pairs = minhash_near_dups(kept, jaccard_threshold=0.8)
    kept = drop_near_duplicates(kept, pairs)
    funnel["n_near_deduped"] = kept.count()

    # 6. deterministic per-source sampling, then split labels
    rates = {"src0": 1.0, "src1": 1.0}
    sampled = sample_stratified(kept, rates, seed=13, default_rate=0.8)
    sampled = split_assign(sampled, {"train": 0.875, "valid": 0.0625, "test": 0.0625}, seed=17)
    funnel["n_sampled"] = sampled.count()

    # 7. pack each (source, split) stream into seq_len-token sequences
    sampled = sampled.withColumn("stream", F.concat_ws("/", "source", "split"))
    packed = pack_sequences(sampled, seq_len=seq_len, group_col="stream")
    funnel["n_packed_docs"] = packed.count()
    funnel["n_packs"] = packed.agg(
        F.sum(F.col("pack_last") - F.col("pack_first") + 1).cast("long")
    ).first()[0]
    return {"funnel": funnel, "curated": sampled, "packed": packed}


if __name__ == "__main__":
    from chronon_spark.session import build_session

    spark = build_session(app_name="training-data-pipeline")
    out = run_example(spark)
    print(out["funnel"])
    spark.stop()
