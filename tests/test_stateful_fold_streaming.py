"""Custom stateful streaming operator: arbitrary Python folds via
applyInPandasWithState — changelog emission, state across micro-batches,
congruity with the batch engine's Python-fold tier."""

from collections import Counter

from willa_spark import Aggregate, collect_records, run_topology
from willa_spark.streaming import run_streaming_topology


def topic(**kw):
    return {"type": "topic", **kw}


# A fold no built-in aggregate expresses: sum capped at 10. Defined as
# a lambda so cloudpickle ships it by value (a module-level function in
# a test file is pickled by reference — unimportable on workers).
cap_sum = lambda acc, gk, v: min(acc + v, 10)  # noqa: E731


def build(suppress=False):
    t = {"type": "ktable", "aggregate": Aggregate.fold(0, cap_sum, "bigint")}
    if suppress:
        t["suppress"] = True
    return {
        "entities": {"in": topic(), "t": t, "out": topic()},
        "workflow": [("in", "t"), ("t", "out")],
    }


def test_python_fold_changelog_streaming(spark, tmp_path):
    """Single batch: full changelog emitted, capped fold applied."""
    inputs = {"in": [("k", 4, 100), ("k", 5, 200), ("k", 9, 300), ("k2", 1, 100)]}
    res = run_streaming_topology(spark, build(), inputs, str(tmp_path))
    assert Counter(res["out"]) == Counter([("k", 4), ("k", 9), ("k", 10), ("k2", 1)])


def test_python_fold_state_across_batches(spark, tmp_path):
    """Second micro-batch continues from stored state (4+5=9, then cap)."""
    res = run_streaming_topology(
        spark,
        build(),
        {"in": [("k", 4, 100)]},
        str(tmp_path),
        extra_files={"in": [("k", 5, 200), ("k", 9, 300)]},
    )
    assert Counter(res["out"]) == Counter([("k", 4), ("k", 9), ("k", 10)])


def test_python_fold_congruity_with_batch(spark, tmp_path):
    inputs = {"in": [("k", 4, 100), ("k", 5, 200), ("k2", 3, 50)]}
    b = Counter(collect_records(run_topology(spark, build(), inputs=inputs)["out"]))
    s = Counter(run_streaming_topology(spark, build(), inputs, str(tmp_path))["out"])
    assert b == s == Counter([("k", 4), ("k", 9), ("k2", 3)])
