"""KTable state operators: latest-per-key materialization + coercions.

Reference: ``coerce-to-ktable`` keeps the latest value per key via
group-by-key + reduce-to-last (streams.clj:26-39); ``coerce-to-kstream``
turns a table back into its changelog stream (streams.clj:17-23).

In this engine a "table" IS its changelog (the record DataFrame); the
materialized latest state is derived on demand — so stream coercion is
the identity and table coercion is ``latest_per_key``.

Scale notes: latest-per-key is a single shuffle +
``row_number over (partition by key order by ts desc)`` — Spark pushes
a partial top-1 per key map-side under AQE; for heavy skew prefer
``max_by(struct(ts, seq, value))`` which is a true partial aggregate.
We use the max_by form for exactly that reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import KEY, TIMESTAMP, VALUE
from .aggregates import SEQ


def latest_per_key(df: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Latest record per key by (timestamp, seq) — a partial-aggregatable
    ``max_by``, not a window row_number, so map-side combine applies
    (matters at 100 TB: the shuffle carries one row per key per map task,
    not every record)."""
    key_cols = key_cols or [KEY]
    picked = (
        df.groupBy(*key_cols)
        .agg(
            F.max_by(
                F.struct(F.col(VALUE).alias(VALUE), F.col(TIMESTAMP).alias(TIMESTAMP), F.col(SEQ).alias(SEQ)),
                F.struct(F.col(TIMESTAMP), F.col(SEQ)),
            ).alias("__latest")
        )
    )
    return picked.select(
        *key_cols,
        F.col(f"__latest.{VALUE}").alias(VALUE),
        F.col(f"__latest.{TIMESTAMP}").alias(TIMESTAMP),
        F.col(f"__latest.{SEQ}").alias(SEQ),
    )
