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


# -- r15 review regressions: join-type surface, nil legs, dedup rule --


def _stream_join_topology(join_type, window=(0, 100)):
    return {
        "entities": {
            "in-a": topic(),
            "in-b": topic(),
            "sa": {"type": "kstream"},
            "sb": {"type": "kstream"},
            "joined": {"type": "kstream"},
            "output": topic(),
        },
        "workflow": [
            ("in-a", "sa"),
            ("in-b", "sb"),
            ("sa", "joined"),
            ("sb", "joined"),
            ("joined", "output"),
        ],
        "joins": {("sa", "sb"): {"type": join_type, "window": window}},
    }


def test_stream_semi_and_anti_join(spark):
    """The Spark-extra left_semi/left_anti (model.JOIN_TYPES) on the
    windowed stream shape: previously they passed validate then died
    in a bare KeyError in the batch compiler (r15 review). Semantics:
    left record passes through UN-TUPLED iff a banded match exists
    (semi) / does not (anti)."""
    inputs = {
        "in-a": [("k", 1, 100), ("k", 2, 500), ("j", 9, 100)],
        "in-b": [("k", 7, 150)],
    }
    out = run_topology(spark, _stream_join_topology("left_semi"), inputs)
    assert recs(out["output"]) == Counter([("k", 1)])
    out = run_topology(spark, _stream_join_topology("left_anti"), inputs)
    assert recs(out["output"]) == Counter([("k", 2), ("j", 9)])


def test_stream_table_semi_and_anti_join(spark):
    """left_semi/left_anti on the as-of stream⋈table shape: stream
    record passes iff the table holds (semi) / lacks (anti) a state as
    of the record's timestamp."""
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
        "joins": {("s", "t"): {"type": "left_semi"}},
    }
    inputs = {
        "in-s": [("k", 1, 50), ("k", 2, 300), ("j", 3, 300)],
        "in-t": [("k", 9, 100)],
    }
    out = run_topology(spark, topo, inputs)
    # (k,1,50): table state arrives at 100 > 50 -> no state yet
    assert recs(out["output"]) == Counter([("k", 2)])
    topo["joins"][("s", "t")] = {"type": "left_anti"}
    out = run_topology(spark, topo, inputs)
    assert recs(out["output"]) == Counter([("k", 1), ("j", 3)])


def test_inner_stream_join_applies_nil_dedup_rule(spark):
    """The oracle's (timestamp, key) dedup pass is UNCONDITIONAL in
    the reference (`true (group-by ...)`, experiment.clj:30-34) — it
    applies to inner joins too, dropping NULL-containing tuples from
    >1-record groups when source values are legitimately NULL. The
    batch engine previously returned early for inner joins and
    skipped it (r15 review)."""
    inputs = {
        "in-a": [("k", None, 100), ("k", 3, 100)],
        "in-b": [("k", 5, 100)],
    }
    out = run_topology(spark, _stream_join_topology("inner", (0, 0)), inputs)
    # both [None,5] and [3,5] land at (100, k); the nil tuple is culled
    assert recs(out["output"]) == Counter([("k", (3, 5))])


def test_left_join_with_outputless_leg_emits_nil_tuples(spark):
    """A join leg with NO output (no seed/source) is the reference's
    nil ::output — its joins still run, emitting [v, nil] tuples
    (experiment.clj join-kstream-results with nil right-results). The
    batch engine previously DROPPED the leg, passing left values
    through un-tupled (r15 review)."""
    out = run_topology(
        spark,
        _stream_join_topology("left"),
        inputs={"in-a": [("k", 1, 100)]},
    )
    assert recs(out["output"]) == Counter([("k", (1, None))])
    # and the reversed role: the LEFT leg missing on a left join
    # yields nothing (reference: no left results -> no unjoined-left,
    # no matches), never the right leg raw
    out = run_topology(
        spark,
        _stream_join_topology("left"),
        inputs={"in-b": [("k", 1, 100)]},
    )
    assert recs(out["output"]) == Counter()


def test_global_table_semi_and_anti_join(spark):
    """left_semi/left_anti against a global table: broadcast lookup
    hit/miss filter, record un-tupled (previously a bare assert
    death; r15 review)."""
    topo = {
        "entities": {
            "input": topic(),
            "table-input": topic(),
            "stream": {"type": "kstream"},
            "g": {"type": "global_ktable"},
            "output": topic(),
        },
        "workflow": [
            ("input", "stream"),
            ("table-input", "g"),
            ("stream", "output"),
            ("g", "output"),
        ],
        "joins": {("stream", "g"): {"type": "left_semi"}},
    }
    inputs = {
        "input": [("k", 1, 100), ("j", 2, 100)],
        "table-input": [("k", 9, 0)],
    }
    out = run_topology(spark, topo, inputs)
    assert recs(out["output"]) == Counter([("k", 1)])
    topo["joins"][("stream", "g")] = {"type": "left_anti"}
    out = run_topology(spark, topo, inputs)
    assert recs(out["output"]) == Counter([("j", 2)])


def test_validate_rejects_incompatible_join_shapes():
    """Compile-time join-type ⋈ shape compatibility (r15 review):
    types that previously passed validate then crashed the engines
    now fail loud at validate()."""
    import pytest

    from willa_spark import TopologyError
    from willa_spark.validate import validate

    def stream_table_topo(jt):
        return {
            "entities": {
                "in-s": topic(),
                "in-t": topic(),
                "s": {"type": "kstream"},
                "t": {"type": "ktable"},
                "joined": {"type": "kstream"},
                "out": topic(),
            },
            "workflow": [
                ("in-s", "s"),
                ("in-t", "t"),
                ("s", "joined"),
                ("t", "joined"),
                ("joined", "out"),
            ],
            "joins": {("s", "t"): {"type": jt}},
        }

    # outer stream⋈table: no reference method, no implementation
    with pytest.raises(TopologyError, match="unsupported for the kstream⋈ktable"):
        validate(stream_table_topo("outer"))
    # supported types still validate
    for jt in ("inner", "left", "left_semi", "left_anti"):
        validate(stream_table_topo(jt))
    # a global table can never DRIVE a join (first leg)
    g_first = stream_table_topo("inner")
    g_first["entities"]["s"] = {"type": "global_ktable"}
    with pytest.raises(TopologyError, match="unsupported for the global_ktable"):
        validate(g_first)


def test_validate_rejects_group_by_without_aggregate():
    """The reference's dependent-keys rule (specs.clj:74-86): ANY
    aggregation key requires the aggregate. group_by/retract alone
    were previously accepted then silently IGNORED by the batch
    engine — records kept their original keys (r15 review)."""
    import pytest

    from willa_spark import TopologyError
    from willa_spark.validate import validate

    topo = {
        "entities": {
            "in": topic(),
            "t": {"type": "ktable", "group_by": lambda k, v: v},
            "out": topic(),
        },
        "workflow": [("in", "t"), ("t", "out")],
    }
    with pytest.raises(TopologyError, match="require an 'aggregate'"):
        validate(topo)
    topo["entities"]["t"] = {"type": "ktable", "retract": True}
    with pytest.raises(TopologyError, match="require an 'aggregate'"):
        validate(topo)


def test_runner_tracks_and_releases_persisted_fanout(spark):
    """run() persists fan-out nodes; the runner must expose a release
    path or a REPL loop leaks cached partitions for the session's
    lifetime (r15 review)."""
    from willa_spark.batch import TopologyRunner

    topo = {
        "entities": {
            "in": topic(),
            "s": {"type": "kstream"},
            "o1": topic(),
            "o2": topic(),
        },
        "workflow": [("in", "s"), ("s", "o1"), ("s", "o2")],
    }
    runner = TopologyRunner(spark, topo)
    out = runner.run({"in": [("k", 1, 100)]})
    assert recs(out["o1"]) == Counter([("k", 1)])
    assert len(runner._persisted) == 1
    assert runner._persisted[0].storageLevel.useMemory
    runner.unpersist()
    assert runner._persisted == []


def test_normalize_records_seq_is_seeded_hash(spark):
    """The entity seq offset is a HASH INPUT, not an addend: an addend
    overflows bigint under ANSI mode for hashes near Long.MAX and
    cannot make uniform full-range hashes disjoint anyway (r15
    review). Distinct offsets must yield distinct deterministic
    ordinal spaces."""
    from willa_spark.batch import normalize_records

    df = spark.createDataFrame(
        [("k", 1, 100)], "key string, value bigint, timestamp bigint"
    )
    s0 = normalize_records(df, 0).collect()[0]["__seq"]
    s0b = normalize_records(df, 0).collect()[0]["__seq"]
    s1 = normalize_records(df, 1 << 33).collect()[0]["__seq"]
    assert s0 == s0b  # deterministic
    assert s0 != s1  # entity-distinct


def test_nil_leg_join_mirrors_live_leg_value_type(spark):
    """The empty frame for an output-less leg mirrors the LIVE leg's
    value type when the entity config declares none: a bigint default
    against a string-valued live leg would make the array tuple
    heterogeneous — an ANSI analysis error (r15 fix-review)."""
    topo = _stream_join_topology("left")
    topo["entities"]["in-a"] = topic(key_type="string", value_type="string")
    out = run_topology(
        spark, topo, inputs={"in-a": [("k", "x", 100)]}
    )
    assert recs(out["output"]) == Counter([("k", ("x", None))])


def test_validate_checks_every_consumers_fold_order():
    """A frozenset-keyed join folds in each consumer's own workflow
    parent order — validate must check ALL consumers, not just the
    first (r15 fix-review): here X folds kstream⋈ktable (fine) but Y
    folds ktable⋈kstream (unsupported)."""
    import pytest

    from willa_spark import TopologyError
    from willa_spark.validate import validate

    topo = {
        "entities": {
            "in-s": topic(),
            "in-t": topic(),
            "s": {"type": "kstream"},
            "t": {"type": "ktable"},
            "x": {"type": "kstream"},
            "y": {"type": "kstream"},
            "out": topic(),
        },
        "workflow": [
            ("in-s", "s"),
            ("in-t", "t"),
            ("s", "x"),
            ("t", "x"),
            ("t", "y"),
            ("s", "y"),
            ("x", "out"),
            ("y", "out"),
        ],
        "joins": {frozenset({"s", "t"}): {"type": "left"}},
    }
    with pytest.raises(TopologyError, match="into 'y'.*ktable⋈kstream"):
        validate(topo)


def test_validate_accepts_explicitly_disabled_agg_flags():
    """retract=False / group_by=None are the engines' 'absent' (their
    reads are truthiness-based) — presence-based validation would
    spuriously reject them (r15 fix-review)."""
    from willa_spark.validate import validate

    topo = {
        "entities": {
            "in": topic(),
            "t": {"type": "ktable", "retract": False, "group_by": None},
            "out": topic(),
        },
        "workflow": [("in", "t"), ("t", "out")],
    }
    validate(topo)


def test_inner_join_nonnullable_values_skip_dedup_exchange(spark):
    """The oracle nil-cull is a provable no-op when neither value can
    be NULL — the inner join must then skip the (timestamp, key)
    window exchange entirely (r15 fix-review: unconditional dedup cost
    at scale)."""
    from pyspark.sql import types as T

    from willa_spark.operators.joins import windowed_stream_join

    schema = T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("value", T.LongType(), False),
            T.StructField("timestamp", T.LongType(), False),
            T.StructField("__seq", T.LongType(), False),
        ]
    )
    l = spark.createDataFrame([("k", 1, 100, 0)], schema)
    r = spark.createDataFrame([("k", 2, 100, 0)], schema)
    inner = windowed_stream_join(l, r, 0, 0, False, False)
    assert "window" not in inner._jdf.queryExecution().executedPlan().toString().lower()
    assert [tuple(x) for x in inner.select("key", "value").collect()] == [("k", [1, 2])]
    # nullable inputs still pay the cull (correctness over speed)
    ln = spark.createDataFrame([("k", 1, 100, 0)], "key string, value bigint, timestamp bigint, __seq bigint")
    rn = spark.createDataFrame([("k", 2, 100, 0)], "key string, value bigint, timestamp bigint, __seq bigint")
    inner_n = windowed_stream_join(ln, rn, 0, 0, False, False)
    assert "window" in inner_n._jdf.queryExecution().executedPlan().toString().lower()
