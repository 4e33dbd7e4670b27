"""Batch-vs-streaming congruity — the engine's analogue of the
reference's experiment-vs-TopologyTestDriver differential suite
(test_utils.clj:68-92, SURVEY §5.1): run the SAME topology + inputs
through both compilers, compare {key, value} multisets per sink
(dropping timestamps, like results-congruous?).

Stateful topologies compare FINAL state (micro-batching coalesces
changelog updates — documented divergence, SURVEY §4 'caching').
"""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from willa_spark import (
    Aggregate,
    FilterRecords,
    FlatMapValues,
    MapValues,
    SessionWindow,
    TumblingWindow,
    collect_records,
    run_topology,
)
from willa_spark.batch import seed_records
from willa_spark.streaming import run_streaming_topology


def topic(**kw):
    return {"type": "topic", **kw}


def batch_results(spark, topology, inputs, leaf="out"):
    res = run_topology(spark, topology, inputs=inputs)
    return Counter(collect_records(res[leaf]))


def streaming_results(spark, topology, inputs, tmp_path, leaf="out", extra_files=None):
    res = run_streaming_topology(spark, topology, inputs, str(tmp_path), extra_files)
    return Counter(res[leaf])


def test_congruity_stateless_chain(spark, tmp_path):
    """map + filter + fanout chain — exact multiset congruity."""
    topo = {
        "entities": {
            "in": topic(),
            "s1": {"type": "kstream", "xform": MapValues(lambda v: v + 1)},
            "s2": {"type": "kstream", "xform": FilterRecords(lambda k, v: v % 2 == 0)},
            "s3": {"type": "kstream", "xform": FlatMapValues(lambda v: F.array(v, v * 10))},
            "out": topic(),
        },
        "workflow": [("in", "s1"), ("s1", "s2"), ("s2", "s3"), ("s3", "out")],
    }
    inputs = {"in": [("k", 1, 100), ("k", 2, 150), ("k2", 3, 200), ("k2", 5, 300)]}
    b = batch_results(spark, topo, inputs)
    s = streaming_results(spark, topo, inputs, tmp_path)
    assert b == s
    assert b == Counter([("k", 2), ("k", 20), ("k2", 4), ("k2", 40), ("k2", 6), ("k2", 60)])


def test_congruity_merge(spark, tmp_path):
    topo = {
        "entities": {"a": topic(), "b": topic(), "out": topic()},
        "workflow": [("a", "out"), ("b", "out")],
    }
    inputs = {"a": [("k", 1, 100)], "b": [("k2", 2, 50), ("k", 7, 80)]}
    assert batch_results(spark, topo, inputs) == streaming_results(
        spark, topo, inputs, tmp_path
    )


def test_congruity_unwindowed_sum_final_state(spark, tmp_path):
    """F10 shape: batch changelog's FINAL row per key == streaming
    update-mode result after one batch."""
    topo_batch = {
        "entities": {
            "in": topic(),
            "t": {"type": "ktable", "aggregate": Aggregate.sum(), "suppress": True},
            "out": topic(),
        },
        "workflow": [("in", "t"), ("t", "out")],
    }
    topo_stream = {
        "entities": {
            "in": topic(),
            "t": {"type": "ktable", "aggregate": Aggregate.sum()},
            "out": topic(),
        },
        "workflow": [("in", "t"), ("t", "out")],
    }
    inputs = {"in": [("k", 1, 100), ("k", 2, 200), ("k2", 5, 150)]}
    b = batch_results(spark, topo_batch, inputs)
    s = streaming_results(spark, topo_stream, inputs, tmp_path)
    assert b == s == Counter([("k", 3), ("k2", 5)])


def test_congruity_tumbling_window_sum(spark, tmp_path):
    """F12/F13 shape with window identity in the value; streaming uses
    append mode (suppression) + a future sentinel to close windows —
    sentinel rows fall in a later window that never closes, so they
    don't appear in the result."""
    ktable = {
        "type": "ktable",
        "group_by": lambda k, v: k,
        "window": TumblingWindow(100),
        "aggregate": Aggregate.sum(),
        "suppress": True,
        "emit_window": True,
        "watermark": "0 milliseconds",
    }
    topo = {
        "entities": {"in": topic(), "t": dict(ktable), "out": topic()},
        "workflow": [("in", "t"), ("t", "out")],
    }
    inputs = {"in": [("k", 1, 0), ("k", 2, 50), ("k", 4, 500), ("k2", 7, 20)]}
    b = batch_results(spark, topo, inputs)
    s = streaming_results(
        spark,
        topo,
        inputs,
        tmp_path,
        extra_files={"in": [("zz", 0, 1_000_000)]},
    )
    # drop the sentinel's own window from streaming (never closes) and
    # from batch (key 'zz')
    b = Counter({kv: n for kv, n in b.items() if kv[0] != "zz"})
    s = Counter({kv: n for kv, n in s.items() if kv[0] != "zz"})
    assert b == s == Counter([("k", (0, 3)), ("k", (500, 4)), ("k2", (0, 7))])


def test_suppressed_window_behind_selective_filter(spark, tmp_path):
    """Regression (round-1 red Hypothesis case): the watermark is
    attached at TOPIC INGEST, so a transform chain that filters out the
    watermark-advancing sentinel cannot stall the suppressed window.
    Here the filter drops every odd value — including the sentinel's —
    yet the append-mode window still flushes."""
    topo = {
        "entities": {
            "in": topic(),
            "s1": {"type": "kstream", "xform": MapValues(lambda v: v + 1)},
            "s2": {"type": "kstream", "xform": FilterRecords(lambda k, v: v % 2 == 0)},
            "t": {
                "type": "ktable",
                "group_by": lambda k, v: k,
                "window": TumblingWindow(100),
                "aggregate": Aggregate.sum(),
                "suppress": True,
                "watermark": "0 milliseconds",
            },
            "out": topic(),
        },
        "workflow": [("in", "s1"), ("s1", "s2"), ("s2", "t"), ("t", "out")],
    }
    # all data at ts=0; post-transform: k:2, k:4 survive, k2:3 dropped
    inputs = {"in": [("k", 1, 0), ("k", 3, 0), ("k2", 2, 0)]}
    b = batch_results(spark, topo, inputs)
    # sentinel value 100 -> inc -> 101 (odd) -> FILTERED OUT, but its
    # ingest-attached watermark still closes the ts=0 window
    s = streaming_results(
        spark, topo, inputs, tmp_path, extra_files={"in": [("zz", 100, 1_000_000)]}
    )
    b = Counter({kv: n for kv, n in b.items() if kv[0] != "zz"})
    s = Counter({kv: n for kv, n in s.items() if kv[0] != "zz"})
    assert b == s == Counter([("k", 6)])


def test_congruity_session_window(spark, tmp_path):
    ktable = {
        "type": "ktable",
        "group_by": lambda k, v: k,
        "window": SessionWindow(100),
        "aggregate": Aggregate.sum(),
        "suppress": True,
        "watermark": "0 milliseconds",
    }
    topo = {
        "entities": {"in": topic(), "t": dict(ktable), "out": topic()},
        "workflow": [("in", "t"), ("t", "out")],
    }
    inputs = {"in": [("k", 1, 0), ("k", 2, 50), ("k", 4, 400)]}
    b = batch_results(spark, topo, inputs)
    s = streaming_results(
        spark, topo, inputs, tmp_path, extra_files={"in": [("zz", 0, 1_000_000)]}
    )
    b = Counter({kv: n for kv, n in b.items() if kv[0] != "zz"})
    s = Counter({kv: n for kv, n in s.items() if kv[0] != "zz"})
    assert b == s == Counter([("k", 3), ("k", 4)])


def test_congruity_stream_stream_inner_join(spark, tmp_path):
    """F16: inner windowed join — exact multiset congruity."""
    topo = {
        "entities": {
            "a": topic(),
            "b": topic(),
            "joined": {"type": "kstream"},
            "out": topic(),
        },
        "workflow": [("a", "joined"), ("b", "joined"), ("joined", "out")],
        "joins": {("a", "b"): {"type": "inner", "window": (100, 100)}},
    }
    inputs = {
        "a": [("k", 1, 100), ("k2", 5, 100)],
        "b": [("k", 2, 150), ("k2", 6, 500)],
    }
    b = batch_results(spark, topo, inputs)
    s = streaming_results(spark, topo, inputs, tmp_path)
    assert b == s == Counter([("k", (1, 2))])


def test_congruity_join_at_epoch(spark, tmp_path):
    """Regression: records with event time EXACTLY 0 (the epoch) used to
    be dropped by Spark's stream-stream join late-row filter, which
    clamps its state watermark at 0 and treats ts <= 0 as late. The
    compiler's +1ms shift (undone on output) keeps them joinable; the
    emitted timestamp must still be the unshifted 0."""
    topo = {
        "entities": {
            "a": topic(),
            "b": topic(),
            "joined": {"type": "kstream"},
            "out": topic(),
        },
        "workflow": [("a", "joined"), ("b", "joined"), ("joined", "out")],
        "joins": {("a", "b"): {"type": "inner", "window": (50, 50)}},
    }
    inputs = {"a": [("k", 1, 0)], "b": [("k", 2, 0), ("k", 3, 50)]}
    b = batch_results(spark, topo, inputs)
    s = streaming_results(spark, topo, inputs, tmp_path)
    assert b == s == Counter([("k", (1, 2)), ("k", (1, 3))])


def test_congruity_watermarked_join_into_suppressed_window(spark, tmp_path):
    """Multi-stateful chain with SOURCE-watermarked inputs: an entity
    watermark makes the compiler attach the watermark at topic ingest;
    the stream-stream join's +1ms shift must then NOT re-attach a
    second EventTimeWatermark node (Spark 4: 'Redefining watermark is
    disallowed') — the same structure that broke the session fold.
    The join feeds a suppressed tumbling window (join ⋈ then window
    agg: two stateful operators in one query)."""
    topo = {
        "entities": {
            "a": topic(watermark="0 milliseconds"),
            "b": topic(),
            "joined": {"type": "kstream"},
            "m": {"type": "kstream", "xform": MapValues(lambda v: v[0] + v[1])},
            "t": {
                "type": "ktable",
                "group_by": lambda k, v: k,
                "window": TumblingWindow(1000),
                "aggregate": Aggregate.sum(),
                "suppress": True,
                "watermark": "0 milliseconds",
            },
            "out": topic(),
        },
        "workflow": [
            ("a", "joined"), ("b", "joined"), ("joined", "m"),
            ("m", "t"), ("t", "out"),
        ],
        "joins": {("a", "b"): {"type": "inner", "window": (100, 100)}},
    }
    # join pairs: (1,2) |150-100|=50 and (3,2) |150-250|=100 → both in
    # band; summed values 3 and 5 land in window [0,1000) → k: 8
    inputs = {"a": [("k", 1, 100), ("k", 3, 250)], "b": [("k", 2, 150)]}
    b = batch_results(spark, topo, inputs)
    # sentinels advance BOTH sources' ingest watermarks past the window
    # close; their key never joins, so they can't reach the sink
    s = streaming_results(
        spark, topo, inputs, tmp_path,
        extra_files={"a": [("zz", 0, 2_000_000)], "b": [("zz", 0, 2_000_000)]},
    )
    b = Counter({kv: n for kv, n in b.items() if kv[0] != "zz"})
    s = Counter({kv: n for kv, n in s.items() if kv[0] != "zz"})
    assert b == s == Counter([("k", 8)])


def test_congruity_global_table_join(spark, tmp_path):
    """F7/F8 shape: broadcast stream-static join."""
    topo = {
        "entities": {
            "in": topic(),
            "table-input": topic(),
            "s": {"type": "kstream"},
            "g": {"type": "global_ktable"},
            "out": topic(),
        },
        "workflow": [("in", "s"), ("table-input", "g"), ("s", "out"), ("g", "out")],
        "joins": {("s", "g"): {"type": "left"}},
    }
    inputs = {"in": [("k", 1, 100), ("k2", 1, 101)]}
    table_records = [("k2", 2, 0)]
    b = batch_results(
        spark, topo, {**inputs, "table-input": table_records}
    )
    # streaming: static side provided as a batch record DF snapshot
    static = seed_records(spark, table_records)
    topo_s = {
        "entities": {**topo["entities"], "g": {"type": "global_ktable", "static_source": static}},
        "workflow": topo["workflow"],
        "joins": topo["joins"],
    }
    s = streaming_results(spark, topo_s, inputs, tmp_path)
    assert b == s == Counter([("k", (1, None)), ("k2", (1, 2))])


def test_global_table_refresh_between_microbatches(spark, tmp_path):
    """A continuously-updated GlobalKTable (core.clj:109-118): a
    callable ``static_source`` is re-evaluated at every micro-batch, so
    a dim update landing between triggers is visible to later joins —
    the frozen-DataFrame snapshot would return 100 for both records.
    A stateless value transform downstream of the refreshed join also
    re-runs per batch (DeferredStream tail)."""
    calls = {"n": 0}

    def dim_snapshot():
        calls["n"] += 1
        # dim value flips 100 -> 200 after the first micro-batch
        return seed_records(spark, [("k", 100 if calls["n"] == 1 else 200, 0)])

    topo = {
        "entities": {
            "in": topic(),
            "dim": topic(),
            "s": {"type": "kstream"},
            "g": {"type": "global_ktable", "static_source": dim_snapshot},
            "j": {"type": "kstream"},
            "enriched": {
                "type": "kstream",
                "xform": MapValues(lambda v: F.array(v[0], v[1] + 1)),
            },
            "out": topic(),
        },
        "workflow": [
            ("in", "s"), ("dim", "g"), ("s", "j"), ("g", "j"),
            ("j", "enriched"), ("enriched", "out"),
        ],
        "joins": {("s", "g"): {"type": "inner"}},
    }
    # two micro-batches (one file each): the first joins against dim=100,
    # the second must see the refreshed dim=200
    rows = run_streaming_topology(
        spark, topo, {"in": [("k", 1, 100)]}, str(tmp_path),
        extra_files={"in": [("k", 2, 200)]},
    )["out"]
    assert calls["n"] >= 2
    assert Counter(rows) == Counter([("k", (1, 101)), ("k", (2, 201))])


def test_congruity_retraction_regrouped_table(spark, tmp_path):
    """A5 (streams.clj:44-50) in STREAMING: a re-grouped upsert retracts
    the old contribution from its old group via the stateful re-key op +
    signed update-mode aggregation. Final state per group must equal the
    batch engine's suppressed retraction fold — including a key whose
    group flips between micro-batches (state carried across triggers)."""
    group_parity = lambda k, v: F.when(v % 2 == 1, F.lit("odd")).otherwise(F.lit("even"))
    ent = {
        "type": "ktable",
        "group_by": group_parity,
        "aggregate": Aggregate.sum(),
        "retract": True,
    }
    wf = [("in", "t"), ("t", "out")]
    first = [("k", 1, 100), ("k2", 3, 150), ("k", 2, 200)]
    late = [("k", 7, 400)]  # k flips even→odd in a LATER micro-batch
    topo_batch = {
        "entities": {"in": topic(), "t": {**ent, "suppress": True}, "out": topic()},
        "workflow": wf,
    }
    b = batch_results(spark, topo_batch, {"in": first + late})
    topo_stream = {
        "entities": {"in": topic(), "t": {**ent, "watermark": "0 seconds"}, "out": topic()},
        "workflow": wf,
    }
    rows = run_streaming_topology(
        spark, topo_stream, {"in": first}, str(tmp_path), extra_files={"in": late}
    )["out"]
    # update-mode sink logs every per-trigger change; final value per
    # group is the last logged row (the harness preserves sink order)
    final = {}
    for k, v in rows:
        final[k] = v
    assert Counter(final.items()) == b == Counter([("odd", 10), ("even", 0)])


def test_congruity_retraction_windowed_table(spark, tmp_path):
    """A5 × A2 in STREAMING: windowed retraction. The stateful re-key op
    emits the sign=-1 event targeted at the OLD record's window
    (__win_ts), a JVM update-mode windowed agg folds the signs. Final
    value per (group, window) must match the batch engine's suppressed
    windowed retraction fold — including a key whose upsert moves it to
    a new window in a LATER micro-batch (state across triggers)."""
    ent = {
        "type": "ktable",
        "group_by": lambda k, v: F.lit("g1"),
        "window": TumblingWindow(1000),
        "aggregate": Aggregate.sum(),
        "retract": True,
        "emit_window": True,
    }
    wf = [("in", "t"), ("t", "out")]
    first = [("k", 1, 100), ("k2", 3, 100)]
    # k flips win0 -> win1 in a later micro-batch; k2 updates within win0
    late = [("k", 2, 1200), ("k2", 5, 300)]
    topo_batch = {
        "entities": {"in": topic(), "t": {**ent, "suppress": True}, "out": topic()},
        "workflow": wf,
    }
    b = batch_results(spark, topo_batch, {"in": first + late})
    topo_stream = {
        "entities": {"in": topic(), "t": {**ent, "watermark": "0 seconds"}, "out": topic()},
        "workflow": wf,
    }
    rows = run_streaming_topology(
        spark, topo_stream, {"in": first}, str(tmp_path), extra_files={"in": late}
    )["out"]
    # update-mode sink logs every per-trigger change; keep the last row
    # per (group, window) — the harness preserves sink order
    final = {}
    for k, v in rows:
        final[(k, v[0])] = (k, v)
    assert Counter(final.values()) == b == Counter([("g1", (0, 5)), ("g1", (1000, 2))])


def test_streaming_retraction_guards(spark):
    """Python-fold subtractors and missing watermarks fail fast."""
    from willa_spark.streaming import StreamingTopologyRunner

    base = {
        "entities": {
            "in": topic(),
            "t": {
                "type": "ktable",
                "aggregate": Aggregate.sum(),
                "retract": True,
            },
            "out": topic(),
        },
        "workflow": [("in", "t"), ("t", "out")],
    }
    src = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(
            F.lit("k").alias("key"),
            F.col("value"),
            F.col("timestamp"),
        )
    )
    with pytest.raises(ValueError, match="watermark"):
        StreamingTopologyRunner(spark, base).build({"in": src})
    fold_topo = {
        "entities": {
            **base["entities"],
            "t": {
                "type": "ktable",
                "aggregate": Aggregate.fold(0, lambda a, k, v: a + v, "bigint"),
                "retract": True,
                "watermark": "0 seconds",
            },
        },
        "workflow": base["workflow"],
    }
    # Python fold + retract needs an explicit subtractor (with one, the
    # deferred foreachBatch fold handles it — see test_stateful_fold_streaming)
    with pytest.raises(ValueError, match="subtractor"):
        StreamingTopologyRunner(spark, fold_topo).build({"in": src})


def test_congruity_three_way_stream_join_fold(spark, tmp_path):
    """J8 in STREAMING: n-ary windowed join folds pairwise into a
    widening tuple (streams.clj:115-123) as chained stream-stream
    joins — Spark >= 3.5 multi-stateful-operator support."""
    topo = {
        "entities": {
            "a": topic(),
            "b": topic(),
            "c": topic(),
            "joined": {"type": "kstream"},
            "out": topic(),
        },
        "workflow": [("a", "joined"), ("b", "joined"), ("c", "joined"), ("joined", "out")],
        "joins": {("a", "b", "c"): {"type": "inner", "window": (100, 100)}},
    }
    inputs = {
        "a": [("k", 1, 100), ("k2", 9, 100)],
        "b": [("k", 2, 150)],
        "c": [("k", 3, 120), ("k2", 8, 900)],  # k2 leg out of window
    }
    b = batch_results(spark, topo, inputs)
    s = streaming_results(spark, topo, inputs, tmp_path)
    assert b == s == Counter([("k", (1, 2, 3))])


def _join_topo(jt, before, after):
    return {
        "entities": {
            "a": topic(),
            "b": topic(),
            "j": {"type": "kstream"},
            "out": topic(),
        },
        "workflow": [("a", "j"), ("b", "j"), ("j", "out")],
        "joins": {("a", "b"): {"type": jt, "window": (before, after)}},
    }


def _drop_sentinels(counter):
    return Counter({kv: n for kv, n in counter.items() if kv[0] != "zz"})


SENTINELS = [[("zz", 0, 9_000_000)], [("zz", 0, 9_500_000)], [("zz", 0, 9_900_000)]]


def test_congruity_left_join_exact_nil_dedup(spark, tmp_path):
    """J2 EXACT parity in streaming (experiment.clj:23-34 + golden F15):
    the oracle emits an unjoined placeholder for every left record, then
    drops null-containing rows in (ts, key) groups with >1 member.
    Streaming = inner join ∪ synthetic placeholders → stateful nil-dedup
    with event-time timeouts. Covers all four shapes at once:
    - j@100 joins b@150 → emits BOTH (j,[5,7])@150 and (j,[5,nil])@100;
    - n@150 joins b@100 → joined ts == left ts → placeholder suppressed;
    - m@100 never joins → single placeholder survives;
    - k@100 twice, never joins → two placeholders share (ts,key) → both drop."""
    topo = _join_topo("left", 100, 100)
    inputs = {
        "a": [("j", 5, 100), ("n", 6, 150), ("m", 4, 100), ("k", 1, 100), ("k", 9, 100)],
        "b": [("j", 7, 150), ("n", 8, 100)],
    }
    b = _drop_sentinels(batch_results(spark, topo, inputs))
    # the global watermark is the MIN across sources — sentinels must
    # advance BOTH sides for the nil-dedup timeouts to fire
    s = _drop_sentinels(
        Counter(
            run_streaming_topology(
                spark, topo, inputs, str(tmp_path),
                extra_files={"a": SENTINELS, "b": SENTINELS},
            )["out"]
        )
    )
    expected = Counter(
        [
            ("j", (5, 7)),
            ("j", (5, None)),
            ("n", (6, 8)),
            ("m", (4, None)),
        ]
    )
    assert b == s == expected


def test_congruity_outer_join_exact_nil_dedup(spark, tmp_path):
    """J3 EXACT parity: placeholders from BOTH sides, same group rule."""
    topo = _join_topo("outer", 50, 50)
    inputs = {
        "a": [("p", 1, 100)],
        "b": [("p", 2, 120), ("q", 3, 200)],
    }
    b = _drop_sentinels(batch_results(spark, topo, inputs))
    s = _drop_sentinels(
        Counter(
            run_streaming_topology(
                spark, topo, inputs, str(tmp_path),
                extra_files={"a": SENTINELS, "b": SENTINELS},
            )["out"]
        )
    )
    # p joins at ts 120 (= right ts → right placeholder suppressed,
    # left placeholder at 100 survives); q never joins → placeholder
    expected = Counter(
        [("p", (1, 2)), ("p", (1, None)), ("q", (None, 3))]
    )
    assert b == s == expected


def test_congruity_fanout_two_sinks(spark, tmp_path):
    """F4 shape (core_test.clj:53-69) in streaming: one stream fans out
    to two sink topics, each running as its own streaming query over
    the shared subtree; per-sink multisets match the batch engine."""
    topo = {
        "entities": {
            "in": topic(),
            "s": {"type": "kstream", "xform": MapValues(lambda v: v + 1)},
            "evens": {"type": "kstream", "xform": FilterRecords(lambda k, v: v % 2 == 0)},
            "odds": {"type": "kstream", "xform": FilterRecords(lambda k, v: v % 2 == 1)},
            "out-evens": topic(),
            "out-odds": topic(),
        },
        "workflow": [
            ("in", "s"),
            ("s", "evens"),
            ("s", "odds"),
            ("evens", "out-evens"),
            ("odds", "out-odds"),
        ],
    }
    inputs = {"in": [("k", 1, 100), ("k", 2, 150), ("k2", 3, 200)]}
    bres = run_topology(spark, topo, inputs=inputs)
    sres = run_streaming_topology(spark, topo, inputs, str(tmp_path))
    for leaf in ("out-evens", "out-odds"):
        assert Counter(collect_records(bres[leaf])) == Counter(sres[leaf])
    assert Counter(sres["out-evens"]) == Counter([("k", 2), ("k2", 4)])
    assert Counter(sres["out-odds"]) == Counter([("k", 3)])


def test_congruity_session_merge_across_batches(spark, tmp_path):
    """Session windows must MERGE across micro-batches: a record in a
    later trigger within the inactivity gap extends the session opened
    in an earlier trigger (Spark's session_window state merge), and the
    final suppressed result matches the batch gap-split."""
    ktable = {
        "type": "ktable",
        "group_by": lambda k, v: k,
        "window": SessionWindow(100),
        "aggregate": Aggregate.sum(),
        "suppress": True,
        "watermark": "0 milliseconds",
    }
    topo = {
        "entities": {"in": topic(), "t": dict(ktable), "out": topic()},
        "workflow": [("in", "t"), ("t", "out")],
    }
    first = [("k", 1, 0), ("k", 2, 60)]
    second = [("k", 4, 120)]  # within gap of ts=60 → same session
    b = batch_results(spark, topo, {"in": first + second})
    rows = run_streaming_topology(
        spark, topo, {"in": first}, str(tmp_path),
        extra_files={"in": [second, [("zz", 0, 1_000_000)]]},
    )["out"]
    b = Counter({kv: n for kv, n in b.items() if kv[0] != "zz"})
    s = Counter(kv for kv in rows if kv[0] != "zz")
    assert b == s == Counter([("k", 7)])


def test_join_watermark_conflicting_with_ingest_raises(spark, tmp_path):
    """A per-join watermark that differs from the ingest-attached one
    cannot be honored (one watermark per branch; re-attaching is
    'Redefining watermark is disallowed') — the compiler must fail
    loudly instead of silently running with the ingest delay."""
    import pytest

    from willa_spark.streaming import run_streaming_topology

    topo = {
        "entities": {
            "a": topic(watermark="0 milliseconds"),
            "b": topic(),
            "j": {"type": "kstream"},
            "out": topic(),
        },
        "workflow": [("a", "j"), ("b", "j"), ("j", "out")],
        "joins": {("a", "b"): {"type": "inner", "window": (50, 50),
                               "watermark": "10 minutes"}},
    }
    inputs = {"a": [("k", 1, 100)], "b": [("k", 2, 120)]}
    with pytest.raises(ValueError, match="conflicts with"):
        run_streaming_topology(spark, topo, inputs, str(tmp_path))


def test_duration_parser_accepts_spark_forms_and_tz_resolver(spark):
    """r14 review batch 5 regressions, pinned: the watermark parser
    accepts the forms Spark itself runs (decimals, 'interval '
    prefix, short units) while still rejecting variable-length
    month/year and garbage loudly; the session-tz resolver handles
    Java fixed-offset ids pandas cannot, and DST-ambiguous wall
    times localize deterministically instead of crashing a worker."""
    import datetime as dt

    import pandas as pd

    from willa_spark.streaming.compiler import (
        _epoch_ms,
        _resolve_session_tz,
        _session_wallclock,
        _try_duration_ms,
    )

    assert _try_duration_ms("1.5 seconds") == 1500
    assert _try_duration_ms("interval 30 seconds") == 30_000
    assert _try_duration_ms("5 ms") == 5
    assert _try_duration_ms("1 week") == 604_800_000
    assert _try_duration_ms("1 month") is None
    assert _try_duration_ms("soon") is None
    # sub-ms magnitudes must not silently truncate to a ZERO delay:
    # a positive total under 1 ms is unparseable (the compile-time
    # loud guard fires); at-or-above 1 ms rounds to nearest instead
    # of truncating; an explicit zero stays zero (r15 ADVICE)
    assert _try_duration_ms("0.5 ms") is None
    assert _try_duration_ms("0.4 milliseconds") is None
    assert _try_duration_ms("1.5 ms") == 2
    assert _try_duration_ms("0.0015 seconds") == 2
    assert _try_duration_ms("0 seconds") == 0
    assert isinstance(
        _epoch_ms(pd.Timestamp("2025-11-02 01:30:00"), "America/Los_Angeles"),
        int,
    )
    tz8 = dt.timezone(dt.timedelta(hours=8))
    assert _epoch_ms(pd.Timestamp("1970-01-01 08:00:00"), tz8) == 0
    assert _session_wallclock(0, tz8) == pd.Timestamp("1970-01-01 08:00:00")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        # 'GMT+8' is legal to Spark but unknown to pandas/pytz — and
        # measured end-to-end, pyarrow's own timestamp-batch
        # deserialization dies under it before user code runs, so the
        # resolver fails at COMPILE naming the IANA remedy
        spark.conf.set("spark.sql.session.timeZone", "GMT+8")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="IANA zone name"):
            _resolve_session_tz(spark)
        spark.conf.set("spark.sql.session.timeZone", "Asia/Shanghai")
        assert _resolve_session_tz(spark) == "Asia/Shanghai"
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        assert _resolve_session_tz(spark) == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_streaming_join_with_sourceless_leg_fails_loud(spark):
    """A join leg that compiled to NO stream must fail at build, not
    be silently dropped (which untuples values and swaps left/right
    roles — r15 review). The batch engine handles this topology with
    reference nil-leg semantics; streaming names that remedy."""
    from willa_spark.streaming import StreamingTopologyRunner

    topo = {
        "entities": {
            "in-a": topic(),
            "in-b": topic(),
            "sa": {"type": "kstream"},
            "sb": {"type": "kstream"},
            "joined": {"type": "kstream"},
            "out": topic(),
        },
        "workflow": [
            ("in-a", "sa"),
            ("in-b", "sb"),
            ("sa", "joined"),
            ("sb", "joined"),
            ("joined", "out"),
        ],
        "joins": {
            ("sa", "sb"): {"type": "left", "window": (0, 100), "watermark": "1 second"}
        },
    }
    src = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(F.lit("k").alias("key"), F.col("value"), F.col("timestamp"))
    )
    with pytest.raises(NotImplementedError, match="produced no stream"):
        StreamingTopologyRunner(spark, topo).build({"in-a": src})
