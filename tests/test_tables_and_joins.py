"""Operator tests beyond the golden corpus: as-of table joins, session/
hopping windows, suppression, retraction, n-ary folds, dedup (F18).
Expected values hand-computed from the reference oracle's semantics
(experiment.clj:37-81 as-of lookups, 168-185 session gap-split).
"""

from collections import Counter

from pyspark.sql import functions as F

from willa_spark import (
    Aggregate,
    FilterRecords,
    HoppingWindow,
    MapValues,
    SessionWindow,
    TumblingWindow,
    collect_records,
    run_topology,
)


def recs(df):
    return Counter(collect_records(df))


def topic(**kw):
    return {"type": "topic", **kw}


def _table_join_topology(join_type):
    return {
        "entities": {
            "in-a": topic(),
            "in-b": topic(),
            "ta": {"type": "ktable"},
            "tb": {"type": "ktable"},
            "joined": {"type": "kstream"},
            "output": topic(),
        },
        "workflow": [
            ("in-a", "ta"),
            ("in-b", "tb"),
            ("ta", "joined"),
            ("tb", "joined"),
            ("joined", "output"),
        ],
        "joins": {("ta", "tb"): {"type": join_type}},
    }


def test_ktable_inner_join_asof(spark):
    """Oracle semantics (experiment.clj:37-62): each update on either
    side joins the other side's latest value with ts <= its own; both
    directions emit; inner requires both present.

    a: (k,1,100), (k,3,300); b: (k,2,200)
    left-driven:  (k,1,100)->no b yet (drop), (k,3,300)->b=2 -> [3,2]
    right-driven: (k,2,200)->a=1 -> [1,2]
    """
    out = run_topology(
        spark,
        _table_join_topology("inner"),
        inputs={"in-a": [("k", 1, 100), ("k", 3, 300)], "in-b": [("k", 2, 200)]},
    )
    assert recs(out["output"]) == Counter([((("k")), (1, 2)), ("k", (3, 2))])


def test_ktable_left_join_asof(spark):
    """left requires the left side present (inverted flag naming,
    experiment.clj:113-116): left-driven rows always pass; right-driven
    rows only when a left value existed."""
    out = run_topology(
        spark,
        _table_join_topology("left"),
        inputs={"in-a": [("k", 1, 100)], "in-b": [("k", 2, 50), ("k", 4, 200)]},
    )
    # left-driven: (k,1,100) -> latest b@<=100 = 2 -> [1,2]
    # right-driven: (k,2,50) -> no a yet -> dropped; (k,4,200) -> a=1 -> [1,4]
    assert recs(out["output"]) == Counter([("k", (1, 2)), ("k", (1, 4))])


def test_ktable_outer_join_asof(spark):
    out = run_topology(
        spark,
        _table_join_topology("outer"),
        inputs={"in-a": [("k", 1, 100)], "in-b": [("k", 2, 50)]},
    )
    # right-driven: (k,2,50) -> no a -> [None,2] kept (outer)
    # left-driven: (k,1,100) -> b=2 -> [1,2]
    assert recs(out["output"]) == Counter([("k", (None, 2)), ("k", (1, 2))])


def test_kstream_ktable_left_join(spark):
    """J6: stream records enriched as-of; table updates emit nothing."""
    topo = {
        "entities": {
            "in-s": topic(),
            "in-t": topic(),
            "s": {"type": "kstream"},
            "t": {"type": "ktable"},
            "joined": {"type": "kstream"},
            "output": topic(),
        },
        "workflow": [
            ("in-s", "s"),
            ("in-t", "t"),
            ("s", "joined"),
            ("t", "joined"),
            ("joined", "output"),
        ],
        "joins": {("s", "t"): {"type": "left"}},
    }
    out = run_topology(
        spark,
        topo,
        inputs={
            "in-s": [("k", 1, 50), ("k", 10, 250)],
            "in-t": [("k", 100, 100), ("k", 200, 200)],
        },
    )
    # (k,1,50): no table yet -> [1,None]; (k,10,250): latest t=200 -> [10,200]
    assert recs(out["output"]) == Counter([("k", (1, None)), ("k", (10, 200))])


def test_kstream_ktable_inner_join(spark):
    topo = {
        "entities": {
            "in-s": topic(),
            "in-t": topic(),
            "s": {"type": "kstream"},
            "t": {"type": "ktable"},
            "joined": {"type": "kstream"},
            "output": topic(),
        },
        "workflow": [
            ("in-s", "s"),
            ("in-t", "t"),
            ("s", "joined"),
            ("t", "joined"),
            ("joined", "output"),
        ],
        "joins": {("s", "t"): {"type": "inner"}},
    }
    out = run_topology(
        spark,
        topo,
        inputs={"in-s": [("k", 1, 50), ("k", 10, 250)], "in-t": [("k", 100, 100)]},
    )
    assert recs(out["output"]) == Counter([("k", (10, 100))])


def test_three_way_stream_join_fold(spark):
    """J8: n-ary fold — later legs conj into the tuple -> [v1 v2 v3]
    (streams.clj:115-123, experiment.clj:141-149)."""
    topo = {
        "entities": {
            "a": topic(),
            "b": topic(),
            "c": topic(),
            "joined": {"type": "kstream"},
            "output": topic(),
        },
        "workflow": [("a", "joined"), ("b", "joined"), ("c", "joined"), ("joined", "output")],
        "joins": {("a", "b", "c"): {"type": "inner", "window": (100, 100)}},
    }
    out = run_topology(
        spark,
        topo,
        inputs={
            "a": [("k", 1, 100)],
            "b": [("k", 2, 150)],
            "c": [("k", 3, 120)],
        },
    )
    assert recs(out["output"]) == Counter([("k", (1, 2, 3))])


def test_session_window_sum(spark):
    """A3 (experiment.clj:168-185): gap 100 — records at 0,50,300 split
    into sessions {0,50} and {300}."""
    topo = {
        "entities": {
            "input": topic(),
            "table": {
                "type": "ktable",
                "group_by": lambda k, v: k,
                "window": SessionWindow(100),
                "aggregate": Aggregate.sum(),
            },
            "output": topic(),
        },
        "workflow": [("input", "table"), ("table", "output")],
    }
    out = run_topology(
        spark, topo, inputs={"input": [("k", 1, 0), ("k", 2, 50), ("k", 4, 300)]}
    )
    assert collect_records(out["output"]) == [("k", 1), ("k", 3), ("k", 4)]


def test_hopping_window_sum(spark):
    """A2: size 100 advance 50 — record at ts 60 belongs to aligned
    windows [0,99] and [50,149] (Kafka TimeWindows semantics)."""
    topo = {
        "entities": {
            "input": topic(),
            "table": {
                "type": "ktable",
                "group_by": lambda k, v: k,
                "window": HoppingWindow(100, 50),
                "aggregate": Aggregate.sum(),
            },
            "output": topic(),
        },
        "workflow": [("input", "table"), ("table", "output")],
    }
    out = run_topology(spark, topo, inputs={"input": [("k", 1, 60)]})
    # one emission per containing window
    assert collect_records(out["output"]) == [("k", 1), ("k", 1)]


def test_suppression_emits_final_only(spark):
    """A6: suppress=True keeps only each window's last changelog row."""
    topo = {
        "entities": {
            "input": topic(),
            "table": {
                "type": "ktable",
                "group_by": lambda k, v: k,
                "window": None,
                "aggregate": Aggregate.sum(),
                "suppress": True,
            },
            "output": topic(),
        },
        "workflow": [("input", "table"), ("table", "output")],
    }
    del topo["entities"]["table"]["window"]
    out = run_topology(
        spark, topo, inputs={"input": [("k", 1, 100), ("k", 2, 200), ("k2", 5, 100)]}
    )
    assert recs(out["output"]) == Counter([("k", 3), ("k2", 5)])


def test_retraction_regrouped_table(spark):
    """A5 subtractor: re-grouped table upsert retracts the old value.
    Upstream key k: v=1@100 (group g1), then v=2@200 (still g1 — the
    sum should become 2, not 3, because 1 is retracted)."""
    topo = {
        "entities": {
            "input": topic(),
            "t1": {"type": "ktable"},
            "t2": {
                "type": "ktable",
                "group_by": lambda k, v: F.lit("g1"),
                "aggregate": Aggregate.sum(),
                "retract": True,
            },
            "output": topic(),
        },
        "workflow": [("input", "t1"), ("t1", "t2"), ("t2", "output")],
    }
    out = run_topology(spark, topo, inputs={"input": [("k", 1, 100), ("k", 2, 200)]})
    # changelog: +1 -> 1; then (-1, +2) -> 2
    assert collect_records(out["output"])[-1] == ("g1", 2)


def test_retraction_windowed_table(spark):
    """A5 × A2: windowed ktable with retract=True. The retraction must
    land in the OLD record's window (its original timestamp decides the
    window set), emitted at the NEW record's time.

    k: v=1@100 (win [0,999]) then v=2@1200 (win [1000,1999]) — win0's
    sum is corrected to 0 when the upsert moves the key to win1.
    k2: v=3@100 then v=5@300, both in win0 — classic same-window update,
    final 5 (not 8)."""
    topo = {
        "entities": {
            "input": topic(),
            "t1": {"type": "ktable"},
            "t2": {
                "type": "ktable",
                "group_by": lambda k, v: F.lit("g1"),
                "window": TumblingWindow(1000),
                "aggregate": Aggregate.sum(),
                "retract": True,
                "suppress": True,
                "emit_window": True,
            },
            "output": topic(),
        },
        "workflow": [("input", "t1"), ("t1", "t2"), ("t2", "output")],
    }
    out = run_topology(
        spark,
        topo,
        inputs={
            "input": [("k", 1, 100), ("k", 2, 1200), ("k2", 3, 100), ("k2", 5, 300)]
        },
    )
    got = recs(out["output"])
    # win0 final: +1 -1 +3 -3 +5 = 5; win1 final: +2 = 2
    assert got == Counter([("g1", (0, 5)), ("g1", (1000, 2))])


def test_retraction_session_window_raises(spark):
    """Session windows + retraction is structurally unsupported (the gap
    split itself changes when a record is retracted) — precise error,
    not a wrong answer."""
    import pytest

    topo = {
        "entities": {
            "input": topic(),
            "t2": {
                "type": "ktable",
                "group_by": lambda k, v: F.lit("g1"),
                "window": SessionWindow(500),
                "aggregate": Aggregate.sum(),
                "retract": True,
            },
            "output": topic(),
        },
        "workflow": [("input", "t2"), ("t2", "output")],
    }
    with pytest.raises(NotImplementedError, match="session"):
        out = run_topology(spark, topo, inputs={"input": [("k", 1, 100)]})
        collect_records(out["output"])


def test_join_lookup_set_key_preserves_workflow_order():
    """J9 (core.clj:59-62): a frozenset join key matches by participant
    SET, but which side is 'left' follows the workflow-parent order —
    never an alphabetical sort of entity names."""
    from willa_spark import model

    topo = {
        "entities": {},
        "workflow": [("zz", "j"), ("aa", "j")],
        "joins": {frozenset(("aa", "zz")): {"type": "left"}},
    }
    order, cfg = model.get_join(topo, model.parents_of(topo, "j"))
    assert order == ["zz", "aa"]
    assert cfg == {"type": "left"}


def test_f18_dedupe_workflow(spark):
    """F18 (workflow.clj:6-24): ktable accumulates seen-id set; stream
    passes each distinct id exactly once. Modeled Spark-first: the seen
    set is a collect_set running fold; the pass-once filter compares
    set size growth."""
    seen = Aggregate.of(lambda v: F.collect_set(v))
    topo = {
        "entities": {
            "input": topic(),
            "seen-table": {"type": "ktable", "aggregate": seen},
            "growth": {
                "type": "kstream",
                "xform": [
                    # value = seen-set changelog; emit set size
                    MapValues(lambda v: F.size(v)),
                ],
            },
            "new-ids": {
                "type": "kstream",
                # size grew => this record introduced a new id
            },
            "output": topic(),
        },
        "workflow": [
            ("input", "seen-table"),
            ("seen-table", "growth"),
            ("growth", "output"),
        ],
    }
    out = run_topology(
        spark,
        topo,
        inputs={"input": [("k", 1, 100), ("k", 1, 200), ("k", 2, 300), ("k", 1, 400)]},
    )
    # set sizes over time: 1, 1, 2, 2 → distinct passes = 2 (ids 1 and 2)
    assert collect_records(out["output"]) == [("k", 1), ("k", 1), ("k", 2), ("k", 2)]
