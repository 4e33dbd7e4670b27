"""Kafka source/sink for topic entities (S1/S3) with serde config (S5).

The reference's only connector is Kafka (SURVEY §2.1); here a topic
entity may carry a ``kafka`` config and a ``serde`` pair:

    {"type": "topic",
     "kafka": {"bootstrap_servers": "...", "topic": "events",
               "starting_offsets": "earliest"},
     "serde": {"key": "string", "value": json_serde(schema)}}

Serde forms (the reference's EDN serde analogue, streams.clj:12-14 —
our default is JSON, the idiomatic Spark choice):
- "string" / "long" / "double" / "binary": cast of the Kafka bytes
- json_serde(schema): from_json/to_json with an explicit schema

NOTE: the Spark↔Kafka connector jar (spark-sql-kafka) is not bundled
in every deployment (it is absent in this dev container); ``available``
reports whether the format resolves, and builders raise a clear error
otherwise. The wiring itself — option construction, serde projection,
record-contract mapping — is real and unit-tested.

Scale notes: Kafka partitions map 1:1 to Spark input partitions; use
``minPartitions`` to fan out hotter topics. Offsets live in the
checkpoint — exactly-once into idempotent/transactional sinks.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import KEY, TIMESTAMP, VALUE


class JsonSerde:
    def __init__(self, schema):
        self.schema = schema

    def decode(self, c: Column) -> Column:
        return F.from_json(c.cast("string"), self.schema)

    def encode(self, c: Column) -> Column:
        return F.to_json(c)


def json_serde(schema) -> JsonSerde:
    return JsonSerde(schema)


def _decode(c: Column, serde) -> Column:
    if serde is None or serde == "binary":
        return c
    if isinstance(serde, str):
        return c.cast("string").cast(serde) if serde != "string" else c.cast("string")
    return serde.decode(c)


def _encode(c: Column, serde) -> Column:
    if serde is None or serde == "binary":
        return c.cast("binary")
    if isinstance(serde, str):
        return c.cast("string").cast("binary")
    return serde.encode(c).cast("binary")


def available(spark: SparkSession) -> bool:
    """True when the kafka data source resolves (connector jar on the
    classpath)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def kafka_options(cfg: dict[str, Any]) -> dict[str, str]:
    """Translate entity kafka config to READER options (subscription
    strategy + client passthrough)."""
    opts = {
        "kafka.bootstrap.servers": cfg["bootstrap_servers"],
        "subscribe": cfg["topic"],
        "startingOffsets": cfg.get("starting_offsets", "earliest"),
    }
    if "min_partitions" in cfg:
        opts["minPartitions"] = str(cfg["min_partitions"])
    for k, v in cfg.get("options", {}).items():
        opts[k] = str(v)
    return opts


def kafka_sink_options(cfg: dict[str, Any]) -> dict[str, str]:
    """Translate entity kafka config to WRITER options: only the
    'kafka.'-prefixed client passthrough (brokers/auth/TLS — identical
    client behavior to the source path) plus the user's explicit
    ``options``. Source subscription strategy (subscribe,
    startingOffsets, minPartitions) must never reach the producer —
    Spark's producer happens to drop non-'kafka.' keys silently today,
    but forwarding them is wrong config propagation and fragile against
    future connector validation."""
    opts = {"kafka.bootstrap.servers": cfg["bootstrap_servers"]}
    for k, v in cfg.get("options", {}).items():
        opts[k] = str(v)
    return opts


def kafka_source(
    spark: SparkSession,
    cfg: dict[str, Any],
    serde: dict[str, Any] | None = None,
    streaming: bool = True,
) -> DataFrame:
    """Topic → record stream (S1, reference core.clj:14-15): project
    Kafka's (key, value, timestamp) to the engine's record contract
    through the entity's serdes."""
    if not available(spark):
        raise RuntimeError(
            "kafka connector (spark-sql-kafka) is not on the classpath; "
            "add the package at spark-submit time to use kafka topics"
        )
    serde = serde or {}
    reader = spark.readStream if streaming else spark.read
    opts = kafka_options(cfg)
    df = reader.format("kafka").options(**opts).load()
    return df.select(
        _decode(F.col("key"), serde.get("key", "string")).alias(KEY),
        _decode(F.col("value"), serde.get("value", "string")).alias(VALUE),
        F.col("timestamp").alias(TIMESTAMP),
    )


def kafka_sink_columns(df: DataFrame, serde: dict[str, Any] | None = None) -> DataFrame:
    """Record stream → Kafka writer projection (S3): encode key/value
    back to binary through the serdes. Attach with
    ``.writeStream.format('kafka').option(...)`` (streaming) or
    ``.write.format('kafka')`` (batch)."""
    serde = serde or {}
    return df.select(
        _encode(F.col(KEY), serde.get("key", "string")).alias("key"),
        _encode(F.col(VALUE), serde.get("value", "string")).alias("value"),
    )
