"""Per-record transforms — the engine's analogue of the reference's
transducer ``::w/xform`` surface (core.clj:86-88, streams.clj:126-160).

Three tiers, in order of preference (SURVEY §2.2 P1):

  (a) Column-expression transforms — Catalyst sees through them, so
      predicate pushdown / column pruning / codegen all apply. This is
      the default tier; everything in this module except PandasTransform
      compiles to pure Column expressions.
  (b) Row UDFs — wrap a Python fn with F.udf inside a MapValues.
  (c) PandasTransform — ``mapInPandas`` for arbitrary 1→N Python logic
      (full transducer parity, Arrow-batched).

Transforms compose like transducers: pass a list, or ``Compose([...])``
(reference tests compose map+filter the same way, core_test.clj:35-51).

Key-preservation is tracked statically (``preserves_key``): the engine
can then *verify* the reference's ``prevent-repartition`` flag
(core.clj:87, README.md:222) instead of trusting it — a value-only
transform provably never forces a shuffle. ``ValueOnly`` reproduces the
reference semantics exactly: output key := input key no matter what the
inner transform returns (streams.clj:148-160, tested core_test.clj:84-97).
"""

from __future__ import annotations

import threading
from collections.abc import Callable, Iterable, Sequence
from contextlib import contextmanager
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .model import KEY, TIMESTAMP, VALUE

_FILTER_GUARD = threading.local()


@contextmanager
def pin_filters_to_event_time():
    """Compile-time context used by the STREAMING compiler only.

    Catalyst's PushPredicateThroughNonJoin moves any filter that does
    not reference the event-time column below EventTimeWatermark — so a
    selective value filter would drop records BEFORE they advance the
    watermark, and a suppressed window downstream could stall forever
    (records are consumed but stream time never moves). Kafka Streams
    semantics advance stream time on CONSUMPTION, not on post-transform
    survival; inside this context, FilterRecords ORs its predicate with
    an always-false comparison on the event-time column, making the
    condition un-splittable so it stays above the watermark node.

    The batch compiler never enters this context — batch filters keep
    full scan pushdown."""
    prev = getattr(_FILTER_GUARD, "on", False)
    _FILTER_GUARD.on = True
    try:
        yield
    finally:
        _FILTER_GUARD.on = prev


def _event_time_anchor(df: DataFrame) -> Column | None:
    """Always-false predicate referencing the event-time column (guard
    term for pin_filters_to_event_time); None when df has no ts col."""
    if TIMESTAMP not in df.columns:
        return None
    ts_t = df.schema[TIMESTAMP].dataType
    return F.col(TIMESTAMP) > F.lit("9999-12-31 00:00:00").cast(ts_t)


def _extras(df: DataFrame) -> list[Column]:
    """Internal passthrough columns (e.g. the batch engine's __seq
    arrival ordinal) ride along through every Column-tier transform."""
    return [F.col(c) for c in df.columns if c not in (KEY, VALUE, TIMESTAMP)]


class Transform:
    """Base: a per-record transform over (key, value, timestamp) rows."""

    #: True when the transform provably never alters the key column.
    preserves_key: bool = True
    #: True when the transform can drop or fan out records (1→0/N).
    changes_cardinality: bool = False

    def apply(self, df: DataFrame) -> DataFrame:  # pragma: no cover - interface
        raise NotImplementedError

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.apply(df)


def _as_transform(x) -> "Transform":
    if isinstance(x, Transform):
        return x
    if isinstance(x, (list, tuple)):
        return Compose(list(x))
    if callable(x):  # raw fn(df)->df escape hatch
        return _FnTransform(x)
    raise TypeError(f"not a transform: {x!r}")


class _FnTransform(Transform):
    preserves_key = False  # unknown — assume the worst

    def __init__(self, fn: Callable[[DataFrame], DataFrame]):
        self.fn = fn

    def apply(self, df: DataFrame) -> DataFrame:
        return self.fn(df)


class Compose(Transform):
    """Transducer ``comp`` analogue — left-to-right application."""

    def __init__(self, transforms: Sequence):
        self.transforms = [_as_transform(t) for t in transforms]
        self.preserves_key = all(t.preserves_key for t in self.transforms)
        self.changes_cardinality = any(t.changes_cardinality for t in self.transforms)

    def apply(self, df: DataFrame) -> DataFrame:
        for t in self.transforms:
            df = t.apply(df)
        return df


class MapValues(Transform):
    """``transform-value``: [k v] -> [k (f v)] (utils.clj:5-6).

    ``fn`` maps the value Column to a new Column (tier a) or is a plain
    Python callable pre-wrapped with F.udf by the caller (tier b).
    """

    def __init__(self, fn: Callable[[Column], Column]):
        self.fn = fn

    def apply(self, df: DataFrame) -> DataFrame:
        return df.withColumn(VALUE, self.fn(F.col(VALUE)))


class MapKey(Transform):
    """``transform-key``: [k v] -> [(f k) v] (utils.clj:9-10). Key-changing
    — downstream stateful ops will reshuffle (the Kafka 'repartition')."""

    preserves_key = False

    def __init__(self, fn: Callable[[Column], Column]):
        self.fn = fn

    def apply(self, df: DataFrame) -> DataFrame:
        return df.withColumn(KEY, self.fn(F.col(KEY)))


class MapRecord(Transform):
    """Full [k v] -> [k' v'] map. ``fn(key_col, value_col)`` returns a
    (new_key_col, new_value_col) pair."""

    preserves_key = False

    def __init__(self, fn: Callable[[Column, Column], tuple[Column, Column]]):
        self.fn = fn

    def apply(self, df: DataFrame) -> DataFrame:
        k, v = self.fn(F.col(KEY), F.col(VALUE))
        return df.withColumn("__k", k).withColumn("__v", v).select(
            F.col("__k").alias(KEY), F.col("__v").alias(VALUE), F.col(TIMESTAMP), *_extras(df)
        )


class FilterRecords(Transform):
    """``filter`` / ``value-pred`` / ``key-pred`` (utils.clj:17-22).
    ``pred(key_col, value_col)`` -> boolean Column."""

    changes_cardinality = True

    def __init__(self, pred: Callable[[Column, Column], Column]):
        self.pred = pred

    def apply(self, df: DataFrame) -> DataFrame:
        cond = self.pred(F.col(KEY), F.col(VALUE))
        if getattr(_FILTER_GUARD, "on", False):
            anchor = _event_time_anchor(df)
            if anchor is not None:
                cond = cond | anchor
        return df.filter(cond)


def filter_values(pred: Callable[[Column], Column]) -> FilterRecords:
    """value-pred (utils.clj:17-18)."""
    return FilterRecords(lambda k, v: pred(v))


def filter_keys(pred: Callable[[Column], Column]) -> FilterRecords:
    """key-pred (utils.clj:21-22)."""
    return FilterRecords(lambda k, v: pred(k))


class FlatMapValues(Transform):
    """``transform-values`` fan-out: one value -> N records, same key
    (utils.clj:13-14; streams_test.clj:63-113). ``fn`` maps the value
    Column to an ArrayType Column; each element becomes a record."""

    changes_cardinality = True

    def __init__(self, fn: Callable[[Column], Column]):
        self.fn = fn

    def apply(self, df: DataFrame) -> DataFrame:
        return df.select(
            F.col(KEY), F.explode(self.fn(F.col(VALUE))).alias(VALUE), F.col(TIMESTAMP), *_extras(df)
        )


class FlatMapRecords(Transform):
    """Full transducer parity, tier (a): ``fn(key_col, value_col)``
    returns an ArrayType(Struct<key,value>) Column; 1→0/1/N with key
    changes (streams.clj:126-132 TransducerTransformer analogue)."""

    preserves_key = False
    changes_cardinality = True

    def __init__(self, fn: Callable[[Column, Column], Column]):
        self.fn = fn

    def apply(self, df: DataFrame) -> DataFrame:
        exploded = df.select(
            F.explode(self.fn(F.col(KEY), F.col(VALUE))).alias("__kv"), F.col(TIMESTAMP), *_extras(df)
        )
        return exploded.select(
            F.col("__kv.key").alias(KEY),
            F.col("__kv.value").alias(VALUE),
            F.col(TIMESTAMP),
            *[F.col(c) for c in exploded.columns if c not in ("__kv", KEY, VALUE, TIMESTAMP)],
        )


class ValueOnly(Transform):
    """``transduce-stream-values`` / prevent-repartition semantics
    (streams.clj:135-160): run the inner transform but keep the ORIGINAL
    key on every output record, even if the transform rekeyed them
    (reference test core_test.clj:84-97). Because the key provably
    survives, no shuffle is ever needed downstream — the engine gets the
    reference's manual optimization for free, statically checked."""

    preserves_key = True

    def __init__(self, inner):
        self.inner = _as_transform(inner)
        self.changes_cardinality = self.inner.changes_cardinality

    def apply(self, df: DataFrame) -> DataFrame:
        tagged = df.withColumn("__orig_key", F.col(KEY))
        out = self.inner.apply(tagged)
        return out.select(
            F.col("__orig_key").alias(KEY),
            F.col(VALUE),
            F.col(TIMESTAMP),
            *[F.col(c) for c in out.columns if c not in ("__orig_key", KEY, VALUE, TIMESTAMP)],
        )


class PandasTransform(Transform):
    """Tier (c): arbitrary Python 1→N logic via ``mapInPandas`` —
    Arrow-batched, never row-at-a-time. ``fn`` takes an iterator of
    pandas DataFrames with columns (key, value, timestamp) and yields
    transformed pandas DataFrames with the same columns.

    This is the full-parity analogue of the reference's opaque
    transducers (streams.clj:126-141) and, like them, is invisible to
    the optimizer — use Column-tier transforms in hot paths.
    """

    preserves_key = False
    changes_cardinality = True

    def __init__(self, fn: Callable[[Iterable], Iterable], schema: Any = None):
        self.fn = fn
        self.schema = schema

    def apply(self, df: DataFrame) -> DataFrame:
        return df.mapInPandas(self.fn, schema=self.schema or df.schema)


def apply_xform(df: DataFrame, xform) -> DataFrame:
    """Apply an entity's ``xform`` config value (single transform, list,
    or raw callable) to a record DataFrame."""
    if xform is None:
        return df
    return _as_transform(xform).apply(df)


def map_values_udf(fn: Callable, return_type) -> MapValues:
    """Tier (b) helper: wrap a plain Python value function."""
    u = F.udf(fn, return_type)
    return MapValues(lambda v: u(v))
