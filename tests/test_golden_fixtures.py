"""Golden corpus — the reference test suite's exact inputs/expected
outputs (FIXTURES.md F1-F19; citations into /root/reference/test/).
Multiset comparison on (key, value) after dropping timestamps, exactly
like the reference's results-congruous? (test_utils.clj:86-92).
"""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from willa_spark import (
    Aggregate,
    Compose,
    FilterRecords,
    FlatMapRecords,
    FlatMapValues,
    MapRecord,
    MapValues,
    TumblingWindow,
    ValueOnly,
    collect_records,
    filter_values,
    run_topology,
)


def recs(df):
    return Counter(collect_records(df))


def topic(**kw):
    return {"type": "topic", **kw}


def test_f1_passthrough(spark):
    """core_test.clj:10-19"""
    out = run_topology(
        spark,
        {
            "entities": {"input": topic(), "output": topic()},
            "workflow": [("input", "output")],
        },
        inputs={"input": [("k", 1, 100)]},
    )
    assert recs(out["output"]) == Counter([("k", 1)])


def test_f2_map_increment(spark):
    """core_test.clj:21-33 (README.md:61-108 canonical topology)"""
    out = run_topology(
        spark,
        {
            "entities": {
                "input": topic(),
                "stream": {"type": "kstream", "xform": MapValues(lambda v: v + 1)},
                "output": topic(),
            },
            "workflow": [("input", "stream"), ("stream", "output")],
        },
        inputs={"input": [("k", 1, 100)]},
    )
    assert recs(out["output"]) == Counter([("k", 2)])


def test_f3_chained_map_filter(spark):
    """core_test.clj:35-51"""
    out = run_topology(
        spark,
        {
            "entities": {
                "input": topic(),
                "s1": {"type": "kstream", "xform": MapValues(lambda v: v + 1)},
                "s2": {"type": "kstream", "xform": filter_values(lambda v: v % 2 == 0)},
                "output": topic(),
            },
            "workflow": [("input", "s1"), ("s1", "s2"), ("s2", "output")],
        },
        inputs={"input": [("k", 2, 100), ("k", 3, 150)]},
    )
    assert recs(out["output"]) == Counter([("k", 4)])


def test_f4_fanout_two_sinks(spark):
    """core_test.clj:53-69"""
    out = run_topology(
        spark,
        {
            "entities": {
                "input": topic(),
                "stream": {"type": "kstream", "xform": MapValues(lambda v: v + 1)},
                "output": topic(),
                "secondary-output": topic(),
            },
            "workflow": [("input", "stream"), ("stream", "output"), ("stream", "secondary-output")],
        },
        inputs={"input": [("k", 1, 100)]},
    )
    assert recs(out["output"]) == Counter([("k", 2)])
    assert recs(out["secondary-output"]) == Counter([("k", 2)])


def test_f5_ktable_passthrough(spark):
    """core_test.clj:71-82"""
    out = run_topology(
        spark,
        {
            "entities": {"input": topic(), "table": {"type": "ktable"}, "output": topic()},
            "workflow": [("input", "table"), ("table", "output")],
        },
        inputs={"input": [("k", 1, 100)]},
    )
    assert recs(out["output"]) == Counter([("k", 1)])


def test_f6_prevent_repartition_key_change(spark):
    """core_test.clj:84-97 — value-only transform keeps ORIGINAL key
    even though the transform rekeys (streams.clj:148-160)."""
    rekey = MapRecord(lambda k, v: (F.lit("new key"), v + 1))
    out = run_topology(
        spark,
        {
            "entities": {
                "input": topic(),
                "stream": {"type": "kstream", "xform": ValueOnly(rekey)},
                "output": topic(),
            },
            "workflow": [("input", "stream"), ("stream", "output")],
        },
        inputs={"input": [("k", 1, 100)]},
    )
    assert recs(out["output"]) == Counter([("k", 2)])


def _global_join_topology(join_type, kv_mapper=None):
    return {
        "entities": {
            "input": topic(),
            "table-input": topic(),
            "stream": {"type": "kstream"},
            "global-table": {"type": "global_ktable"},
            "output": topic(),
        },
        "workflow": [
            ("input", "stream"),
            ("table-input", "global-table"),
            ("stream", "output"),
            ("global-table", "output"),
        ],
        "joins": {
            ("stream", "global-table"): {
                "type": join_type,
                **({"kv_mapper": kv_mapper} if kv_mapper else {}),
            }
        },
    }


def test_f7_global_ktable_inner_join(spark):
    """core_test.clj:100-116"""
    out = run_topology(
        spark,
        _global_join_topology("inner"),
        inputs={"input": [("k", 1, 100)], "table-input": [("k", 2, 0)]},
    )
    assert recs(out["output"]) == Counter([("k", (1, 2))])


def test_f8_global_ktable_left_join(spark):
    """core_test.clj:118-134"""
    out = run_topology(
        spark,
        _global_join_topology("left"),
        inputs={"input": [("k", 1, 100), ("k2", 1, 101)], "table-input": [("k2", 2, 0)]},
    )
    assert recs(out["output"]) == Counter([("k", (1, None)), ("k2", (1, 2))])


def test_f9_global_ktable_kv_mapper_join(spark):
    """core_test.clj:135-152 — join key computed as concat(key, value)"""
    out = run_topology(
        spark,
        _global_join_topology(
            "left", kv_mapper=lambda k, v: F.concat(k, v.cast("string"))
        ),
        inputs={"input": [("k", 1, 100), ("k2", 1, 101)], "table-input": [("k1", 2, 0)]},
    )
    assert recs(out["output"]) == Counter([("k", (1, 2)), ("k2", (1, None))])


def test_f10_running_aggregate_changelog(spark):
    """streams_test.clj:35-60 — BOTH updates emitted ([1, 3], not [3])."""
    out = run_topology(
        spark,
        {
            "entities": {
                "input": topic(),
                "table": {"type": "ktable", "aggregate": Aggregate.sum()},
                "output": topic(),
            },
            "workflow": [("input", "table"), ("table", "output")],
        },
        inputs={"input": [("k", 1, 100), ("k", 2, 100)]},
    )
    assert collect_records(out["output"]) == [("k", 1), ("k", 3)]


def test_f11_transducer_fanout(spark):
    """streams_test.clj:63-113 — mapcat to [(k,v+1),(k,v-1)]."""
    fan = FlatMapRecords(
        lambda k, v: F.array(
            F.struct(k.alias("key"), (v + 1).alias("value")),
            F.struct(k.alias("key"), (v - 1).alias("value")),
        )
    )
    out = run_topology(
        spark,
        {
            "entities": {
                "input": topic(),
                "stream": {"type": "kstream", "xform": fan},
                "output": topic(),
            },
            "workflow": [("input", "stream"), ("stream", "output")],
        },
        inputs={"input": [("k", 1, 100)]},
    )
    assert recs(out["output"]) == Counter([("k", 2), ("k", 0)])
    # value-only variant keeps key too (streams_test.clj:89-113)
    out2 = run_topology(
        spark,
        {
            "entities": {
                "input": topic(),
                "stream": {"type": "kstream", "xform": ValueOnly(fan)},
                "output": topic(),
            },
            "workflow": [("input", "stream"), ("stream", "output")],
        },
        inputs={"input": [("k", 1, 100)]},
    )
    assert recs(out2["output"]) == Counter([("k", 2), ("k", 0)])


def _windowed_sum_topology(window):
    return {
        "entities": {
            "input": topic(),
            "table": {
                "type": "ktable",
                "group_by": lambda k, v: k,
                "window": window,
                "aggregate": Aggregate.sum(),
            },
            "output": topic(),
        },
        "workflow": [("input", "table"), ("table", "output")],
    }


def test_f12_windowed_sum_same_window(spark):
    """congruity_test.clj:55-66"""
    out = run_topology(
        spark,
        _windowed_sum_topology(TumblingWindow(100)),
        inputs={"input": [("k", 1, 0), ("k", 2, 50)]},
    )
    assert collect_records(out["output"]) == [("k", 1), ("k", 3)]


def test_f13_windowed_sum_separate_windows(spark):
    """congruity_test.clj:68-79"""
    out = run_topology(
        spark,
        _windowed_sum_topology(TumblingWindow(100)),
        inputs={"input": [("k", 1, 0), ("k", 2, 500)]},
    )
    assert collect_records(out["output"]) == [("k", 1), ("k", 2)]


def test_f14_group_by_value(spark):
    """congruity_test.clj:81-91 — group key = value."""
    out = run_topology(
        spark,
        {
            "entities": {
                "input": topic(),
                "table": {
                    "type": "ktable",
                    "group_by": lambda k, v: v,
                    "aggregate": Aggregate.sum(),
                },
                "output": topic(),
            },
            "workflow": [("input", "table"), ("table", "output")],
        },
        inputs={"input": [("k", 1, 0), ("k", 2, 500)]},
    )
    assert recs(out["output"]) == Counter([(1, 1), (2, 2)])


def _stream_join_topology(join_type, before, after, xform=None):
    return {
        "entities": {
            "input": topic(),
            "secondary-input": topic(),
            "joined": {"type": "kstream", **({"xform": xform} if xform else {})},
            "output": topic(),
        },
        "workflow": [
            ("input", "joined"),
            ("secondary-input", "joined"),
            ("joined", "output"),
        ],
        "joins": {("input", "secondary-input"): {"type": join_type, "window": (before, after)}},
    }


SUM_TUPLE = MapValues(
    lambda v: F.aggregate(
        F.filter(v, lambda x: x.isNotNull()), F.lit(0).cast("bigint"), lambda a, x: a + x
    )
)


def test_f15_stream_left_join_in_window(spark):
    """congruity_test.clj:96-123 — ±100ms window, xform sums non-null
    elements. Joined record at ts 150 suppresses the unjoined-left
    placeholder only at the SAME (ts,key) — the left record at ts 100
    still emits [1,nil] → sum 1 (experiment.clj:23-34 semantics)."""
    out = run_topology(
        spark,
        _stream_join_topology("left", 100, 100, xform=SUM_TUPLE),
        inputs={"input": [("k", 1, 100)], "secondary-input": [("k", 2, 150)]},
    )
    assert recs(out["output"]) == Counter([("k", 1), ("k", 3)])
    # mirrored timestamps (congruity_test.clj:111-123): left at 150,
    # right at 100 → joined ts = 150 = left ts → placeholder suppressed
    out2 = run_topology(
        spark,
        _stream_join_topology("left", 100, 100, xform=SUM_TUPLE),
        inputs={"input": [("k", 1, 150)], "secondary-input": [("k", 2, 100)]},
    )
    assert recs(out2["output"]) == Counter([("k", 3)])


def test_f16_stream_inner_join(spark):
    """congruity_test.clj:125-137"""
    out = run_topology(
        spark,
        _stream_join_topology("inner", 100, 100, xform=SUM_TUPLE),
        inputs={"input": [("k", 1, 100)], "secondary-input": [("k", 2, 150)]},
    )
    assert recs(out["output"]) == Counter([("k", 3)])


def test_f17_stream_left_join_out_of_window(spark):
    """congruity_test.clj:139-151 — ±10ms, ts 150 vs 100 → no match."""
    out = run_topology(
        spark,
        _stream_join_topology("left", 10, 10, xform=SUM_TUPLE),
        inputs={"input": [("k", 1, 150)], "secondary-input": [("k", 2, 100)]},
    )
    assert recs(out["output"]) == Counter([("k", 1)])


def test_f19_implicit_merge(spark):
    """experiment.clj:196-202 — multi-parent node, no join config → union."""
    out = run_topology(
        spark,
        {
            "entities": {"a": topic(), "b": topic(), "output": topic()},
            "workflow": [("a", "output"), ("b", "output")],
        },
        inputs={"a": [("k", 1, 100)], "b": [("k2", 2, 50)]},
    )
    assert recs(out["output"]) == Counter([("k", 1), ("k2", 2)])
