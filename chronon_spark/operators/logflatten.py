"""Log flattening — the LogFlattenerJob analogue.

The reference (spark/LogFlattenerJob.scala:52-265) turns the online
fetcher's raw response log — per-row key/value byte payloads tagged with
a ``schema_hash`` — into one flat offline table whose schema is the
UNION of every logged schema version (schema evolution safe), the table
ConsistencyJob consumes. Reference specifics kept:

- per-``schema_hash`` decode through a schema registry; rows with a null
  or unregistered hash are dropped (old logs), undecodable payloads are
  dropped and counted (metrics.Exception semantics);
- union-schema output with first-wins field dedup across versions
  (dedupeFields), metadata columns (schema_hash, ts_millis, ds) first;
- unfilled-range job wrapper with partitioned insert (resume-safe).

Spark-first deviation, documented: the reference's payloads are Avro
bytes decoded by serving codecs in an RDD flatMap; no Avro serving stack
exists in this container, so the payload codec is JSON and the decode is
100% JVM-side ``from_json`` (one filter + parse per schema version, no
per-row Python, whole-stage codegen) — the job shape, registry contract,
and union-schema semantics are the ported behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chronon_spark.plans.ranges import PartitionRange

METADATA_COLS = ("schema_hash", "ts_millis", "ds")


def _parse_ddl(ddl: str) -> T.StructType:
    return T.StructType.fromDDL(ddl)


def flatten_log_table(
    spark: SparkSession,
    raw: DataFrame,
    schemas: dict[str, tuple[str, str]],
    with_stats: bool = True,
) -> tuple[DataFrame, DataFrame | None]:
    """Flatten ``raw`` (key_json, value_json, ts_millis, ds, schema_hash)
    through the ``schemas`` registry {schema_hash: (key_ddl, value_ddl)}.

    Returns (flat frame, one-row decode-stats frame with rows_in /
    rows_decoded / rows_dropped — or None with ``with_stats=False``).
    Stats cost ONE extra aggregation job over a single scan of ``raw``
    (the analogue of the reference's accumulator metrics inside its one
    pass); the range-walked job skips them so a backfill pays exactly one
    pass per range."""
    known = raw.filter(
        F.col("schema_hash").isNotNull() & F.col("schema_hash").isin(list(schemas))
    )

    # union field list across versions, first occurrence wins (dedupeFields)
    fields: list[T.StructField] = []
    seen: set[str] = set()
    for key_ddl, value_ddl in schemas.values():
        for f in list(_parse_ddl(key_ddl).fields) + list(_parse_ddl(value_ddl).fields):
            if f.name not in seen:
                seen.add(f.name)
                fields.append(f)

    per_version = []
    corrupt_opt = {"columnNameOfCorruptRecord": "__corrupt"}
    for h, (key_ddl, value_ddl) in schemas.items():
        kt, vt = _parse_ddl(key_ddl), _parse_ddl(value_ddl)
        # PERMISSIVE from_json yields a null-field struct on malformed
        # input; a corrupt-record column makes the failure detectable so
        # the row can be dropped + counted (the reference increments
        # metrics.Exception and skips the row)
        kt_c = kt.add("__corrupt", T.StringType())
        vt_c = vt.add("__corrupt", T.StringType())
        part = (
            known.filter(F.col("schema_hash") == h)
            .withColumn("__k", F.from_json("key_json", kt_c, corrupt_opt))
            .withColumn("__v", F.from_json("value_json", vt_c, corrupt_opt))
            .filter(
                F.col("__k").isNotNull()
                & F.col("__v").isNotNull()
                & F.col("__k.__corrupt").isNull()
                & F.col("__v.__corrupt").isNull()
            )
        )
        knames, vnames = {f.name for f in kt.fields}, {f.name for f in vt.fields}
        cols = [F.col(c) for c in METADATA_COLS]
        for f in fields:
            if f.name in knames:
                cols.append(F.col(f"__k.{f.name}").alias(f.name))
            elif f.name in vnames:
                cols.append(F.col(f"__v.{f.name}").alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        per_version.append(part.select(*cols))

    if not per_version:
        flat = spark.createDataFrame(
            [], T.StructType(
                [
                    T.StructField("schema_hash", T.StringType()),
                    T.StructField("ts_millis", T.LongType()),
                    T.StructField("ds", T.StringType()),
                ]
                + fields
            )
        )
    else:
        flat = per_version[0]
        for p in per_version[1:]:
            flat = flat.unionByName(p)
    if not with_stats:
        return flat, None
    # single-pass decode stats (r3 verdict #8): one aggregation over one
    # scan of ``raw`` replaces the former raw.count() + flat.count() pair.
    # The per-row success predicate mirrors the flat branches exactly
    # (schema_hash match → PERMISSIVE from_json → corrupt-record check),
    # so rows_decoded equals flat.count() by construction; the
    # schema_hash equality leads each AND so codegen short-circuits the
    # json parse on non-matching versions.
    dec = F.lit(False)
    for h, (key_ddl, value_ddl) in schemas.items():
        kt_c = _parse_ddl(key_ddl).add("__corrupt", T.StringType())
        vt_c = _parse_ddl(value_ddl).add("__corrupt", T.StringType())
        k = F.from_json("key_json", kt_c, corrupt_opt)
        v = F.from_json("value_json", vt_c, corrupt_opt)
        dec = dec | (
            (F.col("schema_hash") == h)
            & k.isNotNull()
            & v.isNotNull()
            & k["__corrupt"].isNull()
            & v["__corrupt"].isNull()
        )
    row = raw.agg(
        F.count(F.lit(1)).alias("rows_in"),
        F.coalesce(F.sum(F.when(dec, 1).otherwise(0)), F.lit(0)).alias("rows_decoded"),
    ).first()
    rows_in, rows_decoded = int(row["rows_in"]), int(row["rows_decoded"])
    stats = spark.createDataFrame(
        [(rows_in, rows_decoded, rows_in - rows_decoded)],
        "rows_in long, rows_decoded long, rows_dropped long",
    )
    return flat, stats


def log_flattener_job(
    spark: SparkSession,
    warehouse,
    input_table: str,
    output_table: str,
    schemas: dict[str, tuple[str, str]],
    start_ds: str,
    end_ds: str,
    step_days: int = 30,
) -> list[str]:
    """Range-walked flattening into the warehouse (buildLogTable):
    unfilled output partitions only, step ranges, dynamic-overwrite
    insert. Returns ds values written."""
    written: list[str] = []
    for hole in warehouse.unfilled(output_table, PartitionRange(start_ds, end_ds)):
        for rng in hole.steps(step_days):
            raw = warehouse.read(input_table).filter(
                (F.col("ds") >= rng.start) & (F.col("ds") <= rng.end)
            )
            flat, _ = flatten_log_table(spark, raw, schemas, with_stats=False)
            warehouse.insert_partitions(flat, output_table)
            # mark every day of the processed range complete — a day with
            # zero flattenable rows writes no physical partition, and
            # without a sidecar it would re-scan on every resume
            warehouse.record_days(output_table, rng.days(), {"kind": "log_flatten"})
            written.extend(rng.days())
    return written
