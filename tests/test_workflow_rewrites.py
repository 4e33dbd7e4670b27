"""Topology rewrite helpers (workflow.py) — with_dedupe splice (F18),
build overrides, fan-out persist."""

from collections import Counter

from pyspark.sql import functions as F

from willa_spark import MapValues, collect_records, run_topology
from willa_spark.streaming import run_streaming_topology
from willa_spark.workflow import splice, with_dedupe


def topic(**kw):
    return {"type": "topic", **kw}


BASE = {
    "entities": {"in": topic(), "s": {"type": "kstream"}, "out": topic()},
    "workflow": [("in", "s"), ("s", "out")],
}


def test_f18_with_dedupe_batch(spark):
    """F18 (workflow.clj:6-24): duplicate values pass exactly once,
    first occurrence wins."""
    topo = with_dedupe(dict(BASE), ("s", "out"))
    out = run_topology(
        spark,
        topo,
        inputs={"in": [("k", 1, 100), ("k", 1, 200), ("k", 2, 300), ("k", 1, 400)]},
    )
    assert collect_records(out["out"], with_timestamp=True) == [
        ("k", 1, 100),
        ("k", 2, 300),
    ]


def test_with_dedupe_streaming(spark, tmp_path):
    topo = with_dedupe(dict(BASE), ("s", "out"))
    res = run_streaming_topology(
        spark,
        topo,
        {"in": [("k", 1, 100), ("k", 1, 200), ("k", 2, 300)]},
        str(tmp_path),
    )
    assert Counter(res["out"]) == Counter([("k", 1), ("k", 2)])


def test_with_dedupe_custom_id(spark):
    """Dedup id computed from key+value."""
    topo = with_dedupe(
        dict(BASE), ("s", "out"), id_fn=lambda k, v: F.concat(k, v.cast("string"))
    )
    out = run_topology(
        spark,
        topo,
        inputs={"in": [("k", 1, 100), ("k2", 1, 150), ("k", 1, 200)]},
    )
    assert Counter(collect_records(out["out"])) == Counter([("k", 1), ("k2", 1)])


def test_splice_missing_edge_raises():
    import pytest

    with pytest.raises(ValueError, match="not in workflow"):
        splice(dict(BASE), ("in", "out"), "x", {"type": "kstream"})


def test_build_override(spark):
    """core.clj:122-136 analogue: replace a node's construction."""
    def custom(spark_, parent_dfs, ent):
        (df,) = parent_dfs.values()
        return df.withColumn("value", F.col("value") * 100)

    topo = {
        "entities": {"in": topic(), "s": {"type": "kstream", "build": custom}, "out": topic()},
        "workflow": [("in", "s"), ("s", "out")],
    }
    out = run_topology(spark, topo, inputs={"in": [("k", 2, 100)]})
    assert collect_records(out["out"]) == [("k", 200)]


def test_fanout_persists(spark):
    """A node with >1 consumer is persisted (re-materialization
    avoidance, SURVEY §4)."""
    topo = {
        "entities": {
            "in": topic(),
            "s": {"type": "kstream", "xform": MapValues(lambda v: v + 1)},
            "out1": topic(),
            "out2": topic(),
        },
        "workflow": [("in", "s"), ("s", "out1"), ("s", "out2")],
    }
    res = run_topology(spark, topo, inputs={"in": [("k", 1, 100)]})
    from willa_spark.plans import physical_plan

    assert "InMemoryTableScan" in physical_plan(res["out1"])
    assert collect_records(res["out1"]) == collect_records(res["out2"]) == [("k", 2)]


NEAR_TXTS = {
    "a": "alpha bravo charlie delta echo foxtrot golf hotel",
    "a2": "alpha bravo charlie delta echo foxtrot golf hotel",   # exact dup of a
    "a3": "alpha bravo charlie delta echo foxtrot golf india",   # near-dup of a
    "b": "kilo lima mike november oscar papa quebec romeo",
}


def _near_base():
    return {
        "entities": {
            "in": topic(value_type="string"),
            "s": {"type": "kstream"},
            "out": topic(value_type="string"),
        },
        "workflow": [("in", "s"), ("s", "out")],
    }


def test_with_near_dedupe_batch_minhash(spark):
    """Near-dup splice: the first-arrived representative of each
    near-dup group passes; exact AND near copies are dropped even when
    their values differ (with_dedupe would keep a3)."""
    from willa_spark.workflow import with_near_dedupe

    topo = with_near_dedupe(_near_base(), ("s", "out"), threshold=0.5)
    out = run_topology(
        spark,
        topo,
        inputs={
            "in": [
                ("k1", NEAR_TXTS["a"], 100),
                ("k2", NEAR_TXTS["a2"], 200),
                ("k3", NEAR_TXTS["b"], 300),
                ("k4", NEAR_TXTS["a3"], 400),
            ]
        },
    )
    assert collect_records(out["out"], with_timestamp=True) == [
        ("k1", NEAR_TXTS["a"], 100),
        ("k3", NEAR_TXTS["b"], 300),
    ]


def test_with_near_dedupe_simhash_family(spark):
    from willa_spark.workflow import with_near_dedupe

    topo = with_near_dedupe(_near_base(), ("s", "out"), family="simhash", max_hamming=3)
    out = run_topology(
        spark,
        topo,
        inputs={
            "in": [
                ("k1", NEAR_TXTS["a"], 100),
                ("k2", NEAR_TXTS["a2"], 200),
                ("k3", NEAR_TXTS["b"], 300),
            ]
        },
    )
    got = collect_records(out["out"], with_timestamp=True)
    assert ("k1", NEAR_TXTS["a"], 100) in got
    assert ("k3", NEAR_TXTS["b"], 300) in got
    assert all(k != "k2" for k, _v, _t in got)


def test_with_near_dedupe_streaming_raises(spark, tmp_path):
    """Streaming compilation must fail loudly with a pointer at the
    foreachBatch recipes, not silently skip near-dedup."""
    import pytest

    from willa_spark.workflow import with_near_dedupe

    topo = with_near_dedupe(_near_base(), ("s", "out"))
    with pytest.raises(NotImplementedError, match="minhash_dedup_step"):
        run_streaming_topology(
            spark,
            topo,
            {"in": [("k", NEAR_TXTS["a"], 100)]},
            str(tmp_path),
        )


def test_with_near_dedupe_score_fn_elects_best(spark):
    """score_fn switches the splice to the keep_best election: the
    higher-scoring member of the (a, a2) exact-dup group passes even
    though it arrived later (the default policy keeps first-arrived
    k1), while the unclustered record passes untouched."""
    from pyspark.sql import functions as F

    from willa_spark.workflow import with_near_dedupe

    topo = with_near_dedupe(
        _near_base(),
        ("s", "out"),
        threshold=0.5,
        score_fn=lambda k, v: F.when(k == "k2", 2.0).otherwise(1.0),
    )
    out = run_topology(
        spark,
        topo,
        inputs={
            "in": [
                ("k1", NEAR_TXTS["a"], 100),
                ("k2", NEAR_TXTS["a2"], 200),
                ("k3", NEAR_TXTS["b"], 300),
            ]
        },
    )
    got = collect_records(out["out"], with_timestamp=True)
    assert [(k, v) for k, v, _t in got] == [
        ("k2", NEAR_TXTS["a2"]),
        ("k3", NEAR_TXTS["b"]),
    ]
