"""Pluggable streaming sources — the stream-side analogue of the batch
catalog's format protocol (sources/catalog.py).

The reference ingests a GroupBy's ``topic`` via Kafka with a pluggable
decoder (spark/streaming/GroupBy.scala:38-120, TopicChecker/StreamDecoder)
and runs chained-join enrichment in micro-batches
(spark/streaming/JoinSourceRunner.scala). Here a ``topic`` URI picks the
Structured Streaming source:

    kafka://broker:9092/events?format=json   (live cluster; JSON or Avro)
    files:///path/to/dir                     (file stream — used by tests;
                                              exactly-once, replayable)
    rate://?rowsPerSecond=100                (synthetic load generator)

Kafka cannot run in this container (no broker, no kafka-sql jar) — the
kafka branch is availability-guarded exactly like the Iceberg/Delta batch
formats, and the ``files`` source provides the replayable stand-in that
the batch-equivalence tests drive (same micro-batch machinery, different
source node).
"""

from __future__ import annotations

from urllib.parse import parse_qs, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_stream(spark: SparkSession, topic: str, schema: T.StructType | None = None) -> DataFrame:
    """Open a streaming DataFrame for a topic URI. ``schema`` is required
    for kafka (payload decode) and files (parquet/json schema pin —
    Structured Streaming does not infer file schemas)."""
    u = urlparse(topic)
    q = {k: v[-1] for k, v in parse_qs(u.query).items()}
    if u.scheme == "kafka":
        if schema is None:
            raise ValueError("kafka sources need an explicit payload schema")
        fmt = q.pop("format", "json")
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", u.netloc)
            .option("subscribe", u.path.lstrip("/"))
            .option("startingOffsets", q.pop("startingOffsets", "latest"))
        )
        for k, v in q.items():
            raw = raw.option(k, v)
        df = raw.load()
        if fmt == "json":
            return df.select(
                F.from_json(F.col("value").cast("string"), schema).alias("e")
            ).select("e.*")
        if fmt == "avro":
            try:
                from pyspark.sql.avro.functions import from_avro
            except ImportError as e:  # pragma: no cover - jar-dependent
                raise RuntimeError("spark-avro jar not on classpath") from e
            import json as _json

            avro_schema = q.get("avroSchema") or _json.dumps({"type": "record"})
            return df.select(from_avro(F.col("value"), avro_schema).alias("e")).select("e.*")
        raise ValueError(f"unknown kafka payload format {fmt!r}")
    if u.scheme == "files":
        if schema is None:
            raise ValueError("file streams need an explicit schema")
        fmt = q.pop("format", "parquet")
        reader = spark.readStream.schema(schema)
        for k, v in q.items():
            reader = reader.option(k, v)
        return reader.format(fmt).load(u.netloc + u.path)
    if u.scheme == "rate":
        rows = int(q.get("rowsPerSecond", "100"))
        return spark.readStream.format("rate").option("rowsPerSecond", rows).load()
    raise ValueError(f"unknown stream scheme {u.scheme!r} (kafka | files | rate)")
