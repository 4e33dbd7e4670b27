"""Skew mitigation + bucketed co-located joins (operators/skew.py).

Two kinds of assertion, per the engine's plan-guardrail convention
(plans/inspect.py): (1) salted/bucketed results are IDENTICAL to the
plain operator — the physical rewrite must never change semantics;
(2) the plan has the shape we designed — salting adds exactly one extra
exchange, bucketed joins have none at all.
"""

import pytest
from pyspark.sql import Row, functions as F

from willa_spark.operators.skew import (
    salted_aggregate,
    salted_join,
    write_bucketed,
)
from willa_spark.plans.inspect import count_exchanges, physical_plan


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key ("hot" = 80% of rows) + a long tail
    rows = [Row(k="hot", v=i, tag=f"t{i % 7}") for i in range(800)]
    rows += [Row(k=f"cold{i % 40}", v=i, tag=f"t{i % 7}") for i in range(200)]
    return spark.createDataFrame(rows)


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_aggregate_matches_plain(spark, skewed):
    aggs = {
        "total": ("sum", F.col("v")),
        "n": ("count", F.lit(1)),
        "lo": ("min", F.col("v")),
        "hi": ("max", F.col("v")),
        "mean": ("avg", F.col("v")),
    }
    salted = salted_aggregate(skewed, ["k"], aggs, buckets=8)
    plain = skewed.groupBy("k").agg(
        F.sum("v").alias("total"),
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.avg("v").alias("mean"),
    )
    assert _sorted(salted.select(*plain.columns)) == _sorted(plain)


def test_salted_aggregate_plan_two_stage(spark, skewed):
    salted = salted_aggregate(skewed, ["k"], {"n": ("count", F.lit(1))}, buckets=8)
    # exactly one extra exchange vs a plain agg: (k, salt) then (k) —
    # and both stages still partial-aggregate map-side
    assert count_exchanges(salted) == 2
    assert physical_plan(salted).count("HashAggregate") >= 4


def test_salted_aggregate_rejects_non_algebraic(spark, skewed):
    with pytest.raises(ValueError, match="not algebraic"):
        salted_aggregate(skewed, ["k"], {"x": ("median", F.col("v"))})


def test_salted_join_matches_plain_inner_and_left(spark, skewed):
    dim_rows = [Row(k="hot", label="H")] + [
        Row(k=f"cold{i}", label=f"C{i}") for i in range(0, 40, 2)  # half match
    ]
    dim = spark.createDataFrame(dim_rows)
    for how in ("inner", "left"):
        salted = salted_join(skewed, dim, on="k", buckets=4, how=how)
        plain = skewed.join(dim, "k", how)
        assert _sorted(salted.select(*plain.columns)) == _sorted(plain), how


def test_salted_join_deterministic_salt(spark, skewed):
    dim = spark.createDataFrame([Row(k="hot", label="H")])
    a = salted_join(skewed, dim, on="k", buckets=4)
    b = salted_join(skewed, dim, on="k", buckets=4)
    assert _sorted(a) == _sorted(b)
    # rand()-based salting would also pass the equality above (join
    # results don't expose the salt) — assert determinism structurally:
    # no nondeterministic expression anywhere in the plan
    assert "rand" not in physical_plan(a)


def test_salted_join_rejects_outer(spark, skewed):
    dim = spark.createDataFrame([Row(k="hot", label="H")])
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(skewed, dim, on="k", how="outer")


def test_bucketed_join_no_shuffle(spark):
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 1000, 3).select(
        F.col("id").alias("k"), (F.col("id") + 7).alias("b")
    )
    write_bucketed(left, "bk_left", "k", num_buckets=4)
    write_bucketed(right, "bk_right", "k", num_buckets=4)
    l, r = spark.table("bk_left"), spark.table("bk_right")
    joined = l.join(r, "k")
    # co-bucketed on the join key: SortMergeJoin with ZERO exchanges —
    # the Spark analogue of Kafka Streams' co-partitioned topic joins
    assert count_exchanges(joined) == 0
    plain = left.join(right, "k")
    assert _sorted(joined) == _sorted(plain)


def test_bucketed_aggregate_no_shuffle(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("v")
    )
    write_bucketed(df, "bk_agg", "k", num_buckets=4)
    agg = spark.table("bk_agg").groupBy("k").agg(F.sum("v").alias("s"))
    assert count_exchanges(agg) == 0
    assert _sorted(agg) == _sorted(df.groupBy("k").agg(F.sum("v").alias("s")))
