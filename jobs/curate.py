"""spark-submit entry point for the training-data curation funnel.

Usage:

    python tools/make_dist.py
    spark-submit --py-files dist/engine.zip \\
        jobs/curate.py --input /data/documents --output /data/curated \\
        [--benchmark /data/eval_docs] [--seq-len 2048] \\
        [--min-tokens 20] [--min-quality 0.3] [--max-dup3 0.6] \\
        [--langs en,de] [--rate 1.0] [--seed 13] \\
        [--split 0.875,0.0625,0.0625] \\
        [--near-dedup --jaccard 0.8] [--chunk-tokens 512 --chunk-stride 384]

Composes the operator funnel (quality/repetition gates → optional
benchmark decontamination → PII redaction → exact dedup → deterministic
sampling + train/valid/test splits → sequence packing) and writes three
outputs under --output: ``curated/`` (the surviving docs + audit
columns), ``packed/`` (the pack layout), and ``funnel.json`` (per-stage
counts). Every drop is counted — auditable curation is the point.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_repo_root, "chronon_spark")):
    sys.path.insert(0, _repo_root)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet dir with doc_id/text/source columns")
    ap.add_argument("--output", required=True)
    ap.add_argument("--benchmark", help="parquet dir of held-out eval docs (enables decontamination)")
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--max-dup3", type=float, default=0.6)
    ap.add_argument("--langs", default="", help="comma list; empty = keep all languages")
    ap.add_argument("--rate", type=float, default=1.0, help="default per-source sample rate")
    ap.add_argument("--seed", type=int, default=13)
    ap.add_argument("--split", default="0.875,0.0625,0.0625", help="train,valid,test weights")
    ap.add_argument("--near-dedup", action="store_true",
                    help="minhash candidate pairs -> connected components -> one keeper per cluster")
    ap.add_argument("--jaccard", type=float, default=0.8, help="near-dedup threshold")
    ap.add_argument("--chunk-tokens", type=int, default=0,
                    help="also emit chunked/ (sliding windows of this size) for embedding pipelines")
    ap.add_argument("--chunk-stride", type=int, default=0, help="default = chunk-tokens")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from chronon_spark.operators.decontam import decontaminate
    from chronon_spark.operators.dedup import exact_dedup
    from chronon_spark.operators.packing import pack_sequences
    from chronon_spark.operators.redact import redact_pii
    from chronon_spark.operators.sampling import sample_stratified, split_assign
    from chronon_spark.operators.textstats import lang_id, quality_features, repetition_features
    from chronon_spark.session import build_session

    spark = build_session(app_name="curate", master=args.master)
    docs = spark.read.parquet(args.input)
    funnel = {"n_input": docs.count()}

    feats = repetition_features(quality_features(docs), ns=(3,))
    kept = feats.filter(
        (F.col("n_tokens") >= args.min_tokens)
        & (F.col("quality_score") >= args.min_quality)
        & (F.col("frac_dup_3gram") <= args.max_dup3)
    )
    if args.langs:
        kept = lang_id(kept).filter(F.col("lang_pred").isin(args.langs.split(",")))
    funnel["n_quality"] = kept.count()

    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        clean = decontaminate(kept, bench, n=8, min_hits=2).filter("contaminated = 0")
        kept = kept.join(clean.select("doc_id"), "doc_id")
        funnel["n_decontaminated"] = kept.count()

    kept = redact_pii(kept).drop("text").withColumnRenamed("text_redacted", "text")
    kept = exact_dedup(kept)
    funnel["n_deduped"] = kept.count()

    if args.near_dedup:
        from chronon_spark.operators.components import drop_near_duplicates
        from chronon_spark.operators.dedup import minhash_near_dups

        pairs = minhash_near_dups(kept, jaccard_threshold=args.jaccard)
        kept = drop_near_duplicates(kept, pairs)
        funnel["n_near_deduped"] = kept.count()

    kept = sample_stratified(kept, {}, seed=args.seed, default_rate=args.rate)
    w = [float(x) for x in args.split.split(",")]
    kept = split_assign(
        kept, dict(zip(["train", "valid", "test"], w)), seed=args.seed + 1
    )
    funnel["n_sampled"] = kept.count()

    kept = kept.withColumn("stream", F.concat_ws("/", "source", "split"))
    packed = pack_sequences(kept, seq_len=args.seq_len, group_col="stream")
    funnel["n_packs"] = int(
        packed.agg(F.sum(F.col("pack_last") - F.col("pack_first") + 1)).first()[0] or 0
    )

    if args.chunk_tokens:
        from chronon_spark.operators.packing import chunk_documents

        chunks = chunk_documents(
            kept, args.chunk_tokens, args.chunk_stride or args.chunk_tokens
        )
        funnel["n_chunks"] = chunks.count()
        chunks.write.mode("overwrite").parquet(os.path.join(args.output, "chunked"))

    kept.write.mode("overwrite").parquet(os.path.join(args.output, "curated"))
    packed.write.mode("overwrite").parquet(os.path.join(args.output, "packed"))
    with open(os.path.join(args.output, "funnel.json"), "w") as f:
        json.dump(funnel, f)
    print(json.dumps(funnel))
    spark.stop()


if __name__ == "__main__":
    main()
