"""Aggregation specs + the running-fold changelog operator.

Reference semantics: a willa aggregate is (initial-value, adder-fn
[, subtractor-fn]) folded over each group's records in timestamp order,
emitting ONE OUTPUT RECORD PER INPUT RECORD — the changelog, not just
the final value (streams.clj:41-55; the congruity tests insist on
``[1, 3]`` rather than ``[3]``, streams_test.clj:54-60; oracle:
experiment.clj:231-238 running fold).

Spark mapping (SURVEY §2.4 A4): this is NOT a groupBy().agg() — it is a
window-function running fold:

    agg(value) OVER (PARTITION BY group ORDER BY ts, seq
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)

which keeps the whole thing JVM-side / whole-stage-codegen for the
built-in aggregates ("column" kind). Arbitrary Python folds ("fold"
kind) go through Arrow-batched ``applyInPandas`` per group — the slow
path, mirroring the reference's opaque adder fns.

Subtractor (A5, streams.clj:44-50): Kafka retracts a re-grouped
record's old contribution when its key's value changes. Spark has no
retraction; we support it for invertible column aggregates (sum/count
— subtract = add the negated contribution) and for explicit Python
subtractor fns in fold mode.

Scale notes: one shuffle by group key; per-group state is O(1) for
column aggregates (Tungsten running agg). Skewed group keys are the
usual hazard — mitigate upstream with salting or pre-aggregation; the
changelog semantics (one output per input) means output size == input
size by design, so prefer ``suppress`` (final-only) at 100 TB unless
the changelog is actually consumed.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..model import KEY, TIMESTAMP, VALUE

SEQ = "__seq"
FOLD_ORD = "__fold_ord"


class Aggregate:
    """Aggregation spec. Use the classmethod constructors."""

    is_aggregate_spec = True

    def __init__(
        self,
        kind: str,
        column_fn: Callable[[Column], Column] | None = None,
        contribution_fn: Callable[[Column], Column] | None = None,
        initial: Any = None,
        adder: Callable | None = None,
        subtractor: Callable | None = None,
        acc_type: Any = None,
        merger: Callable | None = None,
    ):
        self.kind = kind
        self.column_fn = column_fn
        self.contribution_fn = contribution_fn
        self.initial = initial
        self.adder = adder
        self.subtractor = subtractor
        self.acc_type = acc_type
        self.merger = merger

    # --- invertible built-ins (support subtractor/retraction) ---
    @classmethod
    def sum(cls) -> "Aggregate":
        return cls("column", column_fn=F.sum, contribution_fn=lambda v: v)

    @classmethod
    def count(cls) -> "Aggregate":
        return cls("column", column_fn=F.count, contribution_fn=lambda v: F.lit(1))

    # --- non-invertible built-ins ---
    @classmethod
    def min(cls) -> "Aggregate":
        return cls("column", column_fn=F.min)

    @classmethod
    def max(cls) -> "Aggregate":
        return cls("column", column_fn=F.max)

    @classmethod
    def avg(cls) -> "Aggregate":
        return cls("column", column_fn=F.avg)

    @classmethod
    def collect_set(cls) -> "Aggregate":
        return cls("column", column_fn=F.collect_set)

    @classmethod
    def count_distinct(cls) -> "Aggregate":
        # Distinct aggs aren't valid as running window fns; set-size is.
        return cls("column", column_fn=lambda v: F.size(F.collect_set(v)))

    @classmethod
    def of(cls, column_fn: Callable[[Column], Column]) -> "Aggregate":
        """Any window-capable aggregate Column fn, e.g. lambda v: F.sum(v*v)."""
        return cls("column", column_fn=column_fn)

    @classmethod
    def fold(
        cls,
        initial: Any,
        adder: Callable[[Any, Any, Any], Any],
        acc_type: Any,
        subtractor: Callable | None = None,
        merger: Callable | None = None,
    ) -> "Aggregate":
        """Arbitrary Python fold: ``adder(acc, group_key, value) -> acc``
        (the reference adder receives ``[group-key value]``,
        streams.clj:43). ``acc_type`` is the Spark type of the
        accumulator (DDL string ok). ``merger(group_key, acc_a, acc_b)``
        combines two session accumulators when a late record bridges
        their inactivity gaps — required for session-window folds in
        streaming, exactly Kafka Streams' session Merger (the
        window-by-session path, streams.clj:164)."""
        return cls(
            "fold",
            initial=initial,
            adder=adder,
            subtractor=subtractor,
            acc_type=acc_type,
            merger=merger,
        )


def running_fold(
    df: DataFrame,
    agg: Aggregate,
    group_cols: list[str],
    emit_key: Column,
    with_retraction: bool = False,
) -> DataFrame:
    """Emit the changelog of ``agg`` folded over each group in
    (timestamp, seq) order. Input df must carry VALUE, TIMESTAMP, SEQ and
    the ``group_cols``; ``emit_key`` is the key Column for output records
    (bare group key — windowed keys already unwrapped, core.clj:20-24).

    When ``with_retraction`` the df must carry a ``__sign`` column
    (+1 add / -1 retract) and the aggregate must be invertible.
    """
    # Tertiary tie-break on a value hash: fan-out (1→N transforms) can
    # emit records sharing (ts, seq); without a deterministic total
    # order the changelog multiset would vary run-to-run. Rows equal in
    # (ts, seq, value) are interchangeable for any fold.
    tie = F.xxhash64(F.col(VALUE).cast("string"))
    order = [F.col(TIMESTAMP).asc(), F.col(SEQ).asc()]
    if with_retraction:
        # retraction event for the same input sorts before the addition
        order.append(F.col("__sign").asc())
    order.append(tie.asc())
    w_order = W.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order)
    w = w_order.rowsBetween(W.unboundedPreceding, W.currentRow)
    if agg.kind == "column":
        if with_retraction:
            if agg.contribution_fn is None:
                raise ValueError(
                    "retraction (subtractor) needs an invertible aggregate (sum/count)"
                )
            acc = F.sum(F.col("__sign") * agg.contribution_fn(F.col(VALUE))).over(w)
        else:
            acc = agg.column_fn(F.col(VALUE)).over(w)
        # group cols ride along so suppression can partition by them;
        # FOLD_ORD marks fold position — suppression must pick the row
        # that accumulated everything, not re-derive order from (ts,seq)
        return df.select(
            emit_key.alias(KEY),
            acc.alias(VALUE),
            F.col(TIMESTAMP),
            F.col(SEQ),
            F.row_number().over(w_order).alias(FOLD_ORD),
            *[F.col(c) for c in group_cols],
        )
    # fold kind: Arrow-batched per-group Python fold
    return _python_fold(df, agg, group_cols, with_retraction)


def _python_fold(
    df: DataFrame, agg: Aggregate, group_cols: list[str], with_retraction: bool
) -> DataFrame:
    import pandas as pd

    gk_col = group_cols[0]
    gk_type = df.schema[gk_col].dataType.simpleString()
    acc_type = agg.acc_type if isinstance(agg.acc_type, str) else agg.acc_type.simpleString()
    extra = "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in group_cols
    )
    out_schema = (
        f"{KEY} {gk_type}, {VALUE} {acc_type}, {TIMESTAMP} long, {SEQ} long, "
        f"{FOLD_ORD} int{extra}"
    )
    adder, subtractor, initial = agg.adder, agg.subtractor, agg.initial
    has_sign = with_retraction

    def fold_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # same total order as the column tier: (ts, seq[, sign], value-repr)
        pdf = pdf.assign(__tie=pdf[VALUE].astype(str))
        sort_cols = [TIMESTAMP, SEQ] + (["__sign"] if has_sign else []) + ["__tie"]
        pdf = pdf.sort_values(sort_cols, kind="stable").drop(columns="__tie")
        acc = initial
        out_vals = []
        # positional lists, not itertuples: pandas mangles
        # underscore-prefixed names like __gkey/__sign
        gks = pdf[gk_col].tolist()
        vs = pdf[VALUE].tolist()
        signs = pdf["__sign"].tolist() if has_sign else [1] * len(pdf)
        for gk, v, sign in zip(gks, vs, signs):
            if has_sign and sign < 0:
                acc = subtractor(acc, gk, v)
            else:
                acc = adder(acc, gk, v)
            out_vals.append(acc)
        out = pd.DataFrame(
            {
                KEY: pdf[gk_col].values,
                VALUE: out_vals,
                TIMESTAMP: pdf[TIMESTAMP].values,
                SEQ: pdf[SEQ].values,
                FOLD_ORD: range(1, len(pdf) + 1),
            }
        )
        for c in group_cols:
            out[c] = pdf[c].values
        return out

    return df.groupBy(*group_cols).applyInPandas(fold_group, schema=out_schema)


def final_only(df: DataFrame, group_cols: list[str]) -> DataFrame:
    """Suppression (A6, streams.clj:169-172): keep only the last
    changelog record per group — 'emit final' semantics. Batch analogue
    of watermark+append mode. Uses the fold ordinal when present so the
    picked row is exactly the one that accumulated the whole group."""
    if FOLD_ORD in df.columns:
        order = [F.col(FOLD_ORD).desc()]
    else:
        order = [F.col(TIMESTAMP).desc(), F.col(SEQ).desc()]
    w = W.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
