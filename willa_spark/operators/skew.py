"""Skew mitigation and co-located joins — the 100 TB operators.

The reference delegates all physical distribution to Kafka Streams
(SURVEY §4): partition counts are topic config and hot keys are the
operator's problem. At 100 TB on a 1000-executor cluster, a handful of
hot keys (one viral document, one default user_id, one 'en' language
bucket) turns any groupBy/join shuffle into a single-straggler stage.
This module provides the standard mitigations as reusable operators:

- ``salted_aggregate``: two-stage aggregation. Stage 1 groups by
  ``(keys..., salt)`` — hot keys split across ``buckets`` reducers and
  partially aggregate (map-side combine still applies); stage 2 merges
  the per-salt partials by the real keys. Only algebraic aggregates can
  be split this way (sum/count/min/max/avg — avg via (sum,count) pair);
  the combine logic per aggregate lives in ``_SPLITS``.
- ``salted_join``: replicate-small/salt-big equi-join for when the
  small side is too large to broadcast but small enough to replicate
  ``buckets``× (the gap between autoBroadcastJoinThreshold and
  AQE-skew-join territory). Hot left keys spread across ``buckets``
  partitions; each sees a full copy of its matching right rows.
- ``write_bucketed`` / ``bucketed_view``: persist a table bucketed by
  its join key so repeated joins/aggregations on that key are
  shuffle-free (SortMergeJoin with zero Exchange — asserted in
  tests/test_skew_bucketing.py). This is Spark's analogue of Kafka's
  co-partitioned topics, which the reference relies on implicitly for
  every join (streams.clj:58-123 assumes co-partitioning).

Salts are DETERMINISTIC (``xxhash64`` of caller-chosen columns), never
``rand()``: nondeterministic expressions poison Catalyst (they block
predicate pushdown through the expression and break retry semantics —
a re-executed task must salt identically or rows are lost/duplicated
on speculative execution).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"

# name -> (partial_fn, final_fn) over (input col, partial col)
_SPLITS = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _salt_expr(df: DataFrame, cols: list[str] | None, buckets: int) -> Column:
    """Deterministic salt in [0, buckets). ``cols=None`` salts on all
    columns (duplicate rows share a bucket — harmless for aggregation,
    the salt only steers distribution, never correctness)."""
    src = [F.col(c) for c in (cols if cols else df.columns)]
    return F.pmod(F.xxhash64(*src), F.lit(buckets)).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    buckets: int = 32,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    ``aggs`` maps output column name -> (kind, input column) with kind
    in {sum, count, min, max, avg}. ``salt_on`` names columns whose
    hash spreads a hot key's rows (default: all columns). Result is
    identical to ``df.groupBy(keys).agg(...)`` — verified against the
    DuckDB oracle by the ``skew_salted_agg`` query — but no single
    reducer ever sees more than ~1/buckets of a hot key's rows.
    """
    partials = []
    finals = []
    for name, (kind, col) in aggs.items():
        if kind == "avg":
            partials.append(F.sum(col).alias(f"__{name}_s"))
            partials.append(F.count(col).alias(f"__{name}_c"))
            finals.append(
                (F.sum(f"__{name}_s") / F.sum(f"__{name}_c")).alias(name)
            )
            continue
        if kind not in _SPLITS:
            raise ValueError(
                f"aggregate kind {kind!r} is not algebraic-splittable; "
                f"supported: {sorted(_SPLITS)} + avg"
            )
        partial_fn, final_fn = _SPLITS[kind]
        partials.append(partial_fn(col).alias(f"__{name}_p"))
        finals.append(final_fn(f"__{name}_p").alias(name))
    salted = df.withColumn(SALT, _salt_expr(df, salt_on, buckets))
    stage1 = salted.groupBy(*keys, SALT).agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    buckets: int = 16,
    how: str = "inner",
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Equi-join with a skewed left side: salt left rows into
    ``buckets`` deterministic buckets, replicate every right row into
    all buckets (``explode`` of a literal range — right grows
    ``buckets``×), join on ``(on, salt)``, drop the salt. Same rows as
    ``left.join(right, on, how)`` for inner/left joins.

    Use when the right side exceeds the broadcast threshold but a
    ``buckets``× replication still fits the shuffle budget; prefer
    plain broadcast below the threshold and AQE skew-join when the
    skew is only discovered at runtime.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (right rows are replicated)")
    salt_src = salt_on if salt_on is not None else [c for c in left.columns if c != on]
    lft = left.withColumn(SALT, _salt_expr(left, salt_src or None, buckets))
    # sequence of int literals is already array<int>, matching the
    # pmod(...).cast("int") salt on the left side of the join key
    rgt = right.withColumn(SALT, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    return lft.join(rgt, [on, SALT], how).drop(SALT)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and per-bucket sorted) by ``key``.
    Joins and aggregations between tables bucketed the same way on the
    same key skip the shuffle entirely — Spark's equivalent of the
    co-partitioned topics every reference join assumes."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)
