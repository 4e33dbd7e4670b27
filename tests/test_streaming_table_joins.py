"""Streaming table joins (J5/J6) as custom stateful operators —
congruent with the batch oracle when arrival order == timestamp order
(the Kafka-parity condition documented in the compiler)."""

from collections import Counter

from willa_spark import collect_records, run_topology
from willa_spark.streaming import run_streaming_topology


def topic(**kw):
    return {"type": "topic", **kw}


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


def table_table_topo(jt):
    return {
        "entities": {
            "in-a": topic(),
            "in-b": topic(),
            "ta": {"type": "ktable"},
            "tb": {"type": "ktable"},
            "joined": {"type": "kstream"},
            "out": topic(),
        },
        "workflow": [
            ("in-a", "ta"),
            ("in-b", "tb"),
            ("ta", "joined"),
            ("tb", "joined"),
            ("joined", "out"),
        ],
        "joins": {("ta", "tb"): {"type": jt}},
    }


def test_stream_table_left_join_streaming(spark, tmp_path):
    inputs = {
        "in-s": [("k", 1, 50), ("k", 10, 250)],
        "in-t": [("k", 100, 100), ("k", 200, 200)],
    }
    res = run_streaming_topology(spark, stream_table_topo("left"), inputs, str(tmp_path))
    # (k,1,50): no table state yet -> [1, None]; (k,10,250): table=200
    assert Counter(res["out"]) == Counter([("k", (1, None)), ("k", (10, 200))])
    # congruity with the batch oracle (arrival order == ts order here)
    b = Counter(
        collect_records(run_topology(spark, stream_table_topo("left"), inputs=inputs)["out"])
    )
    assert b == Counter(res["out"])


def test_stream_table_inner_join_streaming(spark, tmp_path):
    inputs = {"in-s": [("k", 1, 50), ("k", 10, 250)], "in-t": [("k", 100, 100)]}
    res = run_streaming_topology(spark, stream_table_topo("inner"), inputs, str(tmp_path))
    assert Counter(res["out"]) == Counter([("k", (10, 100))])


def test_table_table_inner_join_streaming(spark, tmp_path):
    inputs = {"in-a": [("k", 1, 100), ("k", 3, 300)], "in-b": [("k", 2, 200)]}
    res = run_streaming_topology(spark, table_table_topo("inner"), inputs, str(tmp_path))
    # a@100: no b (dropped); b@200: a=1 -> [1,2]; a@300: b=2 -> [3,2]
    assert Counter(res["out"]) == Counter([("k", (1, 2)), ("k", (3, 2))])
    b = Counter(
        collect_records(run_topology(spark, table_table_topo("inner"), inputs=inputs)["out"])
    )
    assert b == Counter(res["out"])


def test_table_table_outer_join_streaming(spark, tmp_path):
    inputs = {"in-a": [("k", 1, 100)], "in-b": [("k", 2, 50)]}
    res = run_streaming_topology(spark, table_table_topo("outer"), inputs, str(tmp_path))
    assert Counter(res["out"]) == Counter([("k", (None, 2)), ("k", (1, 2))])


def nary_topo(jt, first="ktable"):
    return {
        "entities": {
            "in-a": topic(),
            "in-b": topic(),
            "in-c": topic(),
            "ta": {"type": first},
            "tb": {"type": "ktable"},
            "tc": {"type": "ktable"},
            "joined": {"type": "kstream"},
            "out": topic(),
        },
        "workflow": [
            ("in-a", "ta"),
            ("in-b", "tb"),
            ("in-c", "tc"),
            ("ta", "joined"),
            ("tb", "joined"),
            ("tc", "joined"),
            ("joined", "out"),
        ],
        "joins": {("ta", "tb", "tc"): {"type": jt}},
    }


def test_nary_table_table_inner_join_streaming(spark, tmp_path):
    """J8 × J5: three KTables fold into one widened tuple
    (streams.clj:115-123) — fused into a SINGLE stateful operator in
    streaming (Spark rejects chained stateful Pandas ops). Congruent
    with the batch pairwise as-of fold when arrival order == ts order."""
    inputs = {
        "in-a": [("k", 1, 100), ("k", 4, 400)],
        "in-b": [("k", 2, 200)],
        "in-c": [("k", 3, 300)],
    }
    res = run_streaming_topology(spark, nary_topo("inner"), inputs, str(tmp_path))
    # a@100: no b/c; b@200: no c; c@300: [1,2,3]; a@400: [4,2,3]
    assert Counter(res["out"]) == Counter([("k", (1, 2, 3)), ("k", (4, 2, 3))])
    b = Counter(
        collect_records(run_topology(spark, nary_topo("inner"), inputs=inputs)["out"])
    )
    assert b == Counter(res["out"])


def test_nary_stream_tables_join_streaming(spark, tmp_path):
    """J8 × J6: stream ⋈ table ⋈ table — emission only on stream
    records, each looking up BOTH tables' current state; table state
    carries across micro-batches."""
    inputs = {
        "in-b": [("k", 20, 100)],
        "in-c": [("k", 30, 150)],
    }
    res = run_streaming_topology(
        spark,
        nary_topo("left", first="kstream"),
        inputs,
        str(tmp_path),
        extra_files={"in-a": [("k", 1, 200), ("k2", 9, 250)]},
    )
    # k: both tables set → [1,20,30]; k2: no table state → [9,None,None]
    assert Counter(res["out"]) == Counter(
        [("k", (1, 20, 30)), ("k2", (9, None, None))]
    )


def test_state_carries_across_batches(spark, tmp_path):
    """Table state from batch 1 enriches stream records in batch 2."""
    res = run_streaming_topology(
        spark,
        stream_table_topo("left"),
        {"in-t": [("k", 100, 100)]},
        str(tmp_path),
        extra_files={"in-s": [("k", 1, 200)]},
    )
    assert Counter(res["out"]) == Counter([("k", (1, 100))])
