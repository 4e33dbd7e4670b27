"""Parquet source for the driver's testdata tables.

The reference engine is Kafka-only (SURVEY §2.1); this engine adds file
sources via the same entity abstraction. One wrinkle handled here: the
driver's parquet files carry TIMESTAMP(NANOS) columns, which Spark's
vectorized reader rejects unless ``spark.sql.legacy.parquet.nanosAsLong``
is set — we set it at runtime and convert the nanos-longs back to proper
TimestampType (micros) columns so downstream code sees real timestamps.

Scale notes: this is a plain ``spark.read.parquet`` — predicate pushdown,
column pruning and partition pruning all apply; the nanos conversion is
a per-column projection, fused into the scan by codegen.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_names() -> tuple[str, ...]:
    return TABLE_NAMES


def _nanos_ts_columns(path: str) -> list[str]:
    """Columns stored as TIMESTAMP(NANOS) in the parquet footer."""
    try:
        import pyarrow.parquet as pq
        import pyarrow as pa

        schema = pq.read_schema(path)
        return [
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        return []


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table; nanos-timestamp columns come back as true
    TimestampType (truncated to micros, Spark's native precision)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in _nanos_ts_columns(path):
        # integer DIV, not float division: ns values (~1.7e18) exceed
        # double precision, and a 1-ulp error here shifts epoch-ms
        # values — the DuckDB oracle would hash-mismatch
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    # micros-precision columns come back TIMESTAMP_NTZ; normalize to
    # TimestampType (session tz is UTC, matching DuckDB's naive-as-UTC)
    from pyspark.sql import types as T

    for f in df.schema.fields:
        if isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    for n in names:
        read_table(spark, sf_dir, n).createOrReplaceTempView(n)
