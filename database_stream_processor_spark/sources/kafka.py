"""Kafka transport binding (reference: crates/adapters/src/transport/kafka/
{input,output}.rs — librdkafka endpoints feeding the circuit's input handles
and draining its output handles).

Spark ships a Kafka source/sink (``format("kafka")``) for both batch and
Structured Streaming; this module only maps the reference's endpoint config
onto Spark reader/writer options and applies the Z-set conventions.  The
Kafka connector jar is not bundled in this environment, so these builders
construct fully-configured (lazy) readers/writers; ``.load()``/``.start()``
will raise until ``spark-sql-kafka`` is on the classpath — the plumbing and
option mapping is what is tested.

Environment re-probed each round (last: round 9): no broker listens on
localhost:9092 (connection refused), no ``spark-sql-kafka`` /
``kafka-clients`` jar on disk, no Python kafka client installed — the
execution-path waiver stands; everything up to the JVM data-source
boundary is real and unit-tested (tests/test_sources_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.readwriter import DataStreamReader


def kafka_stream_reader(spark: SparkSession, bootstrap_servers: str,
                        topics: str, starting_offsets: str = "latest",
                        **options) -> DataStreamReader:
    """Configured streaming reader for Kafka input endpoints
    (adapters/src/transport/kafka/input.rs).  Call ``.load()`` to get the
    raw frame (key/value binary + topic/partition/offset/timestamp), then
    :func:`decode_json_values` / your codec to rows."""
    reader = (spark.readStream.format("kafka")
              .option("kafka.bootstrap.servers", bootstrap_servers)
              .option("subscribe", topics)
              .option("startingOffsets", starting_offsets))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader


def kafka_batch_reader(spark: SparkSession, bootstrap_servers: str,
                       topics: str, **options):
    """Batch (bounded) Kafka read — one Z-set snapshot of a topic range."""
    reader = (spark.read.format("kafka")
              .option("kafka.bootstrap.servers", bootstrap_servers)
              .option("subscribe", topics))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader


def decode_json_values(raw, schema):
    """Kafka value bytes → typed rows (the adapters' format-parser stage,
    crates/adapters/src/lib.rs:12-40: transport endpoint → format parser →
    input handle)."""
    return (raw.select(F.from_json(F.col("value").cast("string"), schema)
                       .alias("v"))
            .select("v.*"))


def kafka_stream_writer(df, bootstrap_servers: str, topic: str,
                        checkpoint_dir: str, **options):
    """Configured streaming writer for Kafka output endpoints
    (adapters/src/transport/kafka/output.rs).  ``df`` must have a ``value``
    column (string/binary); call ``.start()`` to launch."""
    out = df if "value" in df.columns else df.select(
        F.to_json(F.struct(*df.columns)).alias("value"))
    writer = (out.writeStream.format("kafka")
              .option("kafka.bootstrap.servers", bootstrap_servers)
              .option("topic", topic)
              .option("checkpointLocation", checkpoint_dir))
    for k, v in options.items():
        writer = writer.option(k, v)
    return writer
