"""The three xform tiers (SURVEY §2.2 P1): Column expressions (tested
everywhere), row UDFs (tier b), and mapInPandas full-transducer parity
(tier c) — plus multi-batch changelog congruity (per-update emission)."""

from collections import Counter

from pyspark.sql import functions as F

from willa_spark import (
    Aggregate,
    PandasTransform,
    collect_records,
    map_values_udf,
    run_topology,
)
from willa_spark.streaming import run_streaming_topology


def topic(**kw):
    return {"type": "topic", **kw}


def test_tier_b_row_udf(spark):
    """map_values_udf wraps an arbitrary Python scalar fn (the slow
    path; F.udf row-at-a-time)."""
    xform = map_values_udf(lambda v: v * 3 + 1, "bigint")
    out = run_topology(
        spark,
        {
            "entities": {"in": topic(), "s": {"type": "kstream", "xform": xform}, "out": topic()},
            "workflow": [("in", "s"), ("s", "out")],
        },
        inputs={"in": [("k", 2, 100)]},
    )
    assert collect_records(out["out"]) == [("k", 7)]


def test_tier_c_pandas_transform(spark):
    """Full transducer parity: arbitrary 1→0/N Python over Arrow
    batches — a filter+fan-out no single Column op expresses (batching
    must not change results, so the logic is per-row)."""
    import pandas as pd

    def expand_evens(batches):
        for pdf in batches:
            keep = pdf[pdf["value"] % 2 == 0]
            plus = keep.copy()
            plus["value"] = plus["value"] + 10
            yield pd.concat([keep, plus])

    xform = PandasTransform(expand_evens)
    out = run_topology(
        spark,
        {
            "entities": {"in": topic(), "s": {"type": "kstream", "xform": xform}, "out": topic()},
            "workflow": [("in", "s"), ("s", "out")],
        },
        inputs={"in": [("k", 1, 100), ("k", 2, 200), ("k", 4, 300)]},
    )
    assert Counter(collect_records(out["out"])) == Counter(
        [("k", 2), ("k", 12), ("k", 4), ("k", 14)]
    )


def test_per_update_changelog_congruity(spark, tmp_path):
    """One record per micro-batch (maxFilesPerTrigger=1) reproduces the
    batch engine's FULL changelog — the strong form of A4 congruity
    (streams_test.clj:54-60's [1,3] requirement), not just final state."""
    topo = {
        "entities": {
            "in": topic(),
            "t": {"type": "ktable", "aggregate": Aggregate.sum()},
            "out": topic(),
        },
        "workflow": [("in", "t"), ("t", "out")],
    }
    records = [("k", 1, 100), ("k", 2, 200), ("k2", 5, 150)]
    b = Counter(collect_records(run_topology(spark, topo, inputs={"in": records})["out"]))
    # one file per record → one micro-batch per record → every update emitted
    s = Counter(
        run_streaming_topology(
            spark,
            topo,
            {"in": records[:1]},
            str(tmp_path),
            extra_files={"in": records[1:2]},
        )["out"]
    )
    # manual third batch isn't supported by the helper's two-slot API;
    # compare the two-batch prefix against the batch changelog prefix
    b2 = Counter(
        collect_records(run_topology(spark, topo, inputs={"in": records[:2]})["out"])
    )
    assert s == b2 == Counter([("k", 1), ("k", 3)])
