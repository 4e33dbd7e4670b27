"""Skew mitigation + bucketed co-located joins (operators/skew.py).

Two kinds of assertion, per the engine's plan-guardrail convention
(plans/inspect.py): (1) salted/bucketed results are IDENTICAL to the
plain operator — the physical rewrite must never change semantics;
(2) the plan has the shape we designed — salting adds exactly one extra
exchange, bucketed joins have none at all.
"""

import os

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


# ------------------------------------------------------------------ #
# Z-order clustered writes (operators/zorder.py)


def _morton_ref(vals, bits):
    """Pure-Python bit interleave of already-normalized ints."""
    z = 0
    for c, u in enumerate(vals):
        for i in range(bits):
            z |= ((u >> i) & 1) << (i * len(vals) + c)
    return z


def test_zorder_key_matches_python_interleave(spark):
    """Morton key differential on a grid whose normalized codes are
    exactly the raw values (min 0, max 15 at bits=4)."""
    from willa_spark.operators.zorder import with_zorder_key

    rows = [(a, b) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(rows, "a int, b int")
    got = {
        (r["a"], r["b"]): r["__zkey"]
        for r in with_zorder_key(df, ["a", "b"], bits=4).collect()
    }
    assert got == {(a, b): _morton_ref([a, b], 4) for a, b in rows}


def _file_overlap_fraction(path, col, lo, hi):
    """Fraction of parquet files whose [min, max] footer stats for
    ``col`` overlap [lo, hi] — what Spark's scan must read."""
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        mn = min(
            md.row_group(i).column(
                [md.schema.column(j).name for j in range(md.num_columns)].index(col)
            ).statistics.min
            for i in range(md.num_row_groups)
        )
        mx = max(
            md.row_group(i).column(
                [md.schema.column(j).name for j in range(md.num_columns)].index(col)
            ).statistics.max
            for i in range(md.num_row_groups)
        )
        if not (mx < lo or mn > hi):
            hit += 1
    return hit / len(files), len(files)


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """The layout proof, from the parquet footers themselves: a table
    sorted by `a` alone prunes a narrow `b` filter NOWHERE (every
    file's b-range spans the domain), while the z-ordered layout
    prunes MOST files for narrow filters on EITHER column — and the
    data read back is identical either way (layout never changes
    semantics).

    Layout pinning (r11 verdict #2): repartitionByRange picks its
    boundaries by RESERVOIR SAMPLING seeded from the RDD id, so the
    z-grid depends on how many RDDs shard-mates created before this
    test ran — a 6-shard run_tests.sh composition produced
    frac_a_z = 0.5625 against the ≤ 0.5 band while 4-shard runs and
    isolation passed. Raising sampleSizePerPartition (default 100)
    to 5000 makes the boundaries near-exact quantiles: measured
    frac_a_z is a flat 0.3125 across six RDD-id-churned sessions
    (vs 0.3125–0.5 jitter at the default), restoring real margin
    under ANY shard composition. Restored in finally — the conf is
    session-shared."""
    from willa_spark.operators.zorder import write_zordered

    n = 20_000
    df = (
        spark.range(n)
        .select(
            (F.pmod(F.xxhash64("id"), F.lit(10_000))).cast("long").alias("a"),
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)))
            .cast("long")
            .alias("b"),
            F.col("id").alias("payload"),
        )
    )
    asorted = os.path.join(str(tmp_path), "a-sorted")
    zordered = os.path.join(str(tmp_path), "z-ordered")
    conf = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    prev = spark.conf.get(conf)
    try:
        spark.conf.set(conf, "5000")
        df.repartitionByRange(16, "a").sortWithinPartitions("a").write.mode(
            "overwrite"
        ).parquet(asorted)
        write_zordered(df, zordered, ["a", "b"], num_files=16)
    finally:
        spark.conf.set(conf, prev)

    frac_b_sorted, nf1 = _file_overlap_fraction(asorted, "b", 4000, 4200)
    frac_b_z, nf2 = _file_overlap_fraction(zordered, "b", 4000, 4200)
    frac_a_z, _ = _file_overlap_fraction(zordered, "a", 4000, 4200)
    assert nf1 == 16 and nf2 == 16
    assert frac_b_sorted == 1.0          # one-column sort: b unprunable
    assert frac_b_z <= 0.5, frac_b_z     # 16 files ~ 4x4 z-grid
    assert frac_a_z <= 0.5, frac_a_z     # ...pruning BOTH dimensions
    # semantics unchanged by layout
    got = sorted(tuple(r) for r in spark.read.parquet(zordered).collect())
    want = sorted(tuple(r) for r in df.collect())
    assert got == want


def test_zorder_nulls_constants_and_guards(spark, tmp_path):
    """NULL z-column rows keep their data (NULL key, grouped
    together); a constant column contributes zero bits rather than a
    divide-by-zero; too many columns for the bit budget fails loud."""
    import pytest as _pytest

    from willa_spark.operators.zorder import with_zorder_key, write_zordered

    df = spark.createDataFrame(
        [(1, 7, "x"), (None, 8, "y"), (3, 7, "z"), (4, 7, "w")],
        "a int, c int, payload string",
    )
    # c is near-constant; a has a NULL
    out = os.path.join(str(tmp_path), "z-nulls")
    write_zordered(df.withColumn("c", F.lit(5)), out, ["a", "c"], bits=8)
    back = spark.read.parquet(out)
    assert back.count() == 4 and back.filter(F.col("a").isNull()).count() == 1
    keyed = with_zorder_key(df, ["a"], bits=8)
    assert keyed.filter(F.col("a").isNull()).select("__zkey").collect()[0][0] is None
    with _pytest.raises(ValueError, match="zorder"):
        with_zorder_key(df, ["a"] * 5, bits=16)


def test_zorder_dates_bits_and_numfiles_guards(spark, tmp_path):
    """Self-review regressions: date z-columns normalize via epoch
    days (a direct DATE->DOUBLE cast is rejected under ANSI);
    bits < 1 and num_files < 1 fail loud with the module's ValueError
    rather than IndexError/silent fallthrough."""
    import datetime

    import pytest as _pytest

    from willa_spark.operators.zorder import with_zorder_key, write_zordered

    df = spark.createDataFrame(
        [
            (datetime.date(2024, 1, 1), 1),
            (datetime.date(2024, 6, 1), 9),
            (datetime.date(2024, 12, 31), 5),
        ],
        "d date, a int",
    )
    keys = [
        r["__zkey"] for r in with_zorder_key(df, ["d", "a"], bits=8).collect()
    ]
    assert len(keys) == 3 and len(set(keys)) == 3
    with _pytest.raises(ValueError, match="zorder"):
        with_zorder_key(df, ["a"], bits=0)
    with _pytest.raises(ValueError, match="num_files"):
        write_zordered(df, os.path.join(str(tmp_path), "x"), ["a"], num_files=0)
