"""Window specs + batch window-assignment as pure Column expressions.

Reference semantics (behavioral spec, not code):
- Tumbling/hopping: Kafka ``TimeWindows`` — epoch-aligned windows of
  ``size`` advancing by ``advance`` (streams.clj:162-165,
  experiment.clj:155-165). A record at t belongs to every aligned window
  [s, s+size-1] with s ≡ 0 (mod advance) and s ≤ t ≤ s+size-1.
  NOTE: the reference's in-memory oracle only generates windows starting
  at the group's earliest aligned timestamp (experiment.clj:160), which
  for hopping windows can drop the first record's earlier windows —
  Kafka itself enumerates all containing windows. We implement the
  Kafka-correct per-record enumeration; for tumbling windows (the only
  windowed congruity fixtures, congruity_test.clj:55-79) the two agree.
- Session: ``SessionWindows`` with inactivity gap — consecutive records
  (per group) merge while the gap between neighbors ≤ gap
  (experiment.clj:168-185).

All timestamps are epoch-millis longs (the reference's time model,
README.md:186-188).

Scale notes: window assignment is a narrow, shuffle-free Column
expression (sequence+explode); session windows need one shuffle by group
key — the same shuffle the downstream aggregation needs anyway, so
Catalyst reuses the partitioning (no extra exchange).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

WINDOW_START = "__win_start"
WINDOW_END = "__win_end"  # inclusive, Kafka-style end = start + size - 1


class WindowSpec:
    is_window_spec = True


class TumblingWindow(WindowSpec):
    def __init__(self, size_ms: int):
        self.size_ms = int(size_ms)
        self.advance_ms = int(size_ms)


class HoppingWindow(WindowSpec):
    def __init__(self, size_ms: int, advance_ms: int):
        self.size_ms = int(size_ms)
        self.advance_ms = int(advance_ms)


class SessionWindow(WindowSpec):
    def __init__(self, gap_ms: int):
        self.gap_ms = int(gap_ms)


def assign_time_windows(df: DataFrame, ts_col: str, size_ms: int, advance_ms: int) -> DataFrame:
    """Explode each record into every epoch-aligned window containing it.

    s_min = ceil((t - size + 1) / advance) * advance  (clamped at >= 0)
    s_max = floor(t / advance) * advance
    Tumbling (advance == size) yields exactly one window: t - t % size.
    """
    t = F.col(ts_col)
    s_max = F.floor(t / advance_ms) * advance_ms
    s_min = F.ceil((t - F.lit(size_ms) + 1) / advance_ms) * advance_ms
    s_min = F.greatest(s_min, F.lit(0))
    starts = F.sequence(s_min.cast("long"), s_max.cast("long"), F.lit(int(advance_ms)).cast("long"))
    return (
        df.withColumn(WINDOW_START, F.explode(starts))
        .withColumn(WINDOW_END, F.col(WINDOW_START) + F.lit(int(size_ms) - 1))
    )


def assign_session_windows(
    df: DataFrame, ts_col: str, gap_ms: int, group_cols: list[str], order_cols: list[Column]
) -> DataFrame:
    """Gap-split per group: a new session starts when the gap to the
    previous record exceeds ``gap_ms``. Session id = running count of
    boundaries; window start = min ts in session (computed after split).
    Pure window functions — no Python in the loop.
    """
    w = W.partitionBy(*group_cols).orderBy(*order_cols)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    boundary = F.when(prev_ts.isNull() | ((F.col(ts_col) - prev_ts) > gap_ms), 1).otherwise(0)
    with_id = df.withColumn("__session_id", F.sum(boundary).over(w))
    sess_w = W.partitionBy(*group_cols, "__session_id")
    return (
        with_id.withColumn(WINDOW_START, F.min(F.col(ts_col)).over(sess_w))
        .withColumn(WINDOW_END, F.max(F.col(ts_col)).over(sess_w) + F.lit(int(gap_ms) - 1))
        .drop("__session_id")
    )
