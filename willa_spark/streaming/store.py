"""Partitioned micro-batch store discipline shared by every streaming
recipe in this package (near-dedup signature stores, ANN indexes, the
curation pipeline's shard output):

- each micro-batch writes its rows under an ``ingest_batch=<id>``
  partition directory, and a REPLAYED batch (foreachBatch may re-run
  after a failure) overwrites exactly its own partition — idempotent,
  never duplicating rows;
- dedup probes read STRICTLY-PRIOR partitions (``before_batch``) so a
  replay cannot match against its failed attempt's own rows; index
  probes read the whole current store.

Only a genuinely-missing store reads as None (the first batch). Every
other read failure — permissions, corrupt footers, transient storage
faults — propagates and fails the micro-batch, because swallowing it
would serve silently wrong (empty) results, hand them to the sink as a
successful batch, and advance the checkpoint past them permanently.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def store_read(spark, path: str, before_batch: int | None = None) -> DataFrame | None:
    """The store's rows (``ingest_batch`` dropped); None iff the store
    does not exist yet. ``before_batch`` restricts to strictly-prior
    partitions — partition-pruned, the replay-safety read."""
    try:
        df = spark.read.parquet(path)
    except AnalysisException as e:
        cond = e.getCondition() if hasattr(e, "getCondition") else None
        if cond == "PATH_NOT_FOUND":
            return None
        raise
    if before_batch is not None:
        df = df.filter(F.col("ingest_batch") < before_batch)
    return df.drop("ingest_batch")


def store_append(df: DataFrame, path: str, batch_id: int) -> None:
    """Write this batch's partition idempotently: a retry overwrites
    exactly its own ``ingest_batch=<id>`` directory."""
    df.write.mode("overwrite").parquet(os.path.join(path, f"ingest_batch={batch_id}"))
