"""Streaming-store compaction/retention: partition-per-micro-batch
state must stay bounded on a long-running stream WITHOUT changing any
probe result — dedup and ANN answers are identical before/after
compaction, a replay across the compaction boundary is idempotent,
readers fail loud mid-swap, and an interrupted swap rolls forward."""

import json
import os
import shutil

import pytest

from willa_spark.streaming.ann import LshAnnConfig, lsh_index_step, lsh_probe_step
from willa_spark.streaming.near_dedup import minhash_dedup_step
from willa_spark.streaming.store import (
    store_append,
    store_compact,
    store_partitions,
    store_prune,
    store_read,
)

PREFIX = "the data and corpus have been prepared with care for every"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, f"{PREFIX} {t}") for i, t in rows], "doc_id bigint, text string"
    )


BATCHES = [
    [(1, "alpha beaver cedar dolphin ember"), (2, "falcon gibbon heron ibex jackal")],
    [(3, "alpha beaver cedar dolphin ember"), (4, "kestrel lemur marten nutria ocelot")],
    [(5, "falcon gibbon heron ibex jackal"), (6, "pelican quokka raccoon seagull tapir")],
]
# 3 dups 1 cross-batch; 5 dups 2 cross-batch -> admitted: 1,2,4,6


def _run_dedup(spark, store, compact_before_last):
    step = minhash_dedup_step(store, threshold=0.8, num_hashes=16, num_bands=8)
    admitted = []
    for bid, rows in enumerate(BATCHES):
        if compact_before_last and bid == len(BATCHES) - 1:
            # batches < bid are committed: safe compaction watermark
            store_compact(spark, os.path.join(store, "sigs"), up_to_batch=bid)
            store_compact(spark, os.path.join(store, "bands"), up_to_batch=bid)
        admitted.append(
            sorted(r["doc_id"] for r in step(_docs(spark, rows), bid).collect())
        )
    return step, admitted


def test_compaction_preserves_dedup_results_and_replay(spark, tmp_path):
    """Per-batch admitted sets are identical with and without a
    compaction between batches, and replaying the first post-compaction
    batch (the only one that can still re-run) returns the same set —
    its strictly-prior probe sees the merged partition."""
    plain_store = os.path.join(str(tmp_path), "plain")
    _, plain = _run_dedup(spark, plain_store, compact_before_last=False)

    cstore = os.path.join(str(tmp_path), "compacted")
    step, compacted = _run_dedup(spark, cstore, compact_before_last=True)
    assert compacted == plain == [[1, 2], [4], [6]]

    # directories below the watermark merged into one
    assert store_partitions(os.path.join(cstore, "sigs")) == [1, 2]
    assert store_partitions(os.path.join(plain_store, "sigs")) == [0, 1, 2]
    # merged store content == unmerged store content (ids)
    for sub in ("sigs", "bands"):
        a = {r["id"] for r in store_read(spark, os.path.join(cstore, sub)).collect()}
        b = {r["id"] for r in store_read(spark, os.path.join(plain_store, sub)).collect()}
        assert a == b

    # replay across the compaction boundary: batch 2 re-runs
    replay = sorted(
        r["doc_id"] for r in step(_docs(spark, BATCHES[2]), 2).collect()
    )
    assert replay == [6]
    assert store_partitions(os.path.join(cstore, "sigs")) == [1, 2]


def test_compact_every_wiring_in_dedup_step(spark, tmp_path):
    """compact_every=N runs retention inside the foreachBatch step at
    the safe watermark (start of batch b compacts batches < b, which
    are all committed): admitted sets match the uncompacted twin,
    directories stay bounded, and a replay of the in-flight batch
    re-runs the (idempotent, no-op) compaction then dedups correctly
    against the merged partition."""
    plain_store = os.path.join(str(tmp_path), "plain")
    _, plain = _run_dedup(spark, plain_store, compact_before_last=False)

    cstore = os.path.join(str(tmp_path), "wired")
    step = minhash_dedup_step(
        cstore, threshold=0.8, num_hashes=16, num_bands=8, compact_every=2
    )
    admitted = [
        sorted(r["doc_id"] for r in step(_docs(spark, rows), bid).collect())
        for bid, rows in enumerate(BATCHES)
    ]
    assert admitted == plain
    assert store_partitions(os.path.join(cstore, "sigs")) == [1, 2]
    # replay the in-flight batch: compaction re-runs as a no-op, the
    # merged partition serves the strictly-prior probe
    replay = sorted(r["doc_id"] for r in step(_docs(spark, BATCHES[2]), 2).collect())
    assert replay == plain[2]
    assert store_partitions(os.path.join(cstore, "sigs")) == [1, 2]


def test_compaction_preserves_ann_results(spark, tmp_path):
    """Index probes over the compacted store return byte-identical
    top-k (the index is the union of partitions either way)."""
    import random

    rng = random.Random(9)
    vecs = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(12)]
    mk = lambda rs: spark.createDataFrame(rs, "vec_id bigint, embedding array<double>")
    cfg = LshAnnConfig(n_planes=3, n_tables=2, dim=8, seed=5)
    store = os.path.join(str(tmp_path), "ann")
    step = lsh_index_step(store, cfg)
    for bid in range(3):
        step(mk([(i, vecs[i]) for i in range(4 * bid, 4 * bid + 4)]), bid)

    queries = mk([(100, vecs[2]), (101, vecs[9])]).withColumnsRenamed(
        {"vec_id": "query_id", "embedding": "query_vec"}
    )
    got = []
    sink = lambda topk, _bid: got.append(
        sorted(tuple(r) for r in topk.collect())
    )
    probe = lsh_probe_step(store, sink, k=5, cfg=cfg)
    probe(queries, 0)
    merged = store_compact(spark, store, up_to_batch=3)
    assert merged == 3 and store_partitions(store) == [2]
    probe(queries, 1)
    assert got[0] == got[1] and len(got[0]) > 0


def test_store_append_bounds_output_files(spark, tmp_path):
    """A batch arriving with many partitions must land as at most
    max_files parquet shards — partition-per-batch retention only stays
    viable if each directory holds a bounded file count. The clamp is
    UNCONDITIONAL: probing the producing plan's partition count first
    (df.rdd) executes the plan's shuffle stages under AQE and the write
    then re-runs them — doubling every micro-batch; one small exchange
    of the batch rows is strictly cheaper, and compaction folds any
    tiny shards anyway."""
    store = os.path.join(str(tmp_path), "clamped")
    df = spark.range(100).repartition(4).toDF("id")
    store_append(df, store, 0, max_files=2)
    part = os.path.join(store, "ingest_batch=0")
    shards = [f for f in os.listdir(part) if f.endswith(".parquet")]
    assert 0 < len(shards) <= 2
    assert store_read(spark, store).count() == 100

    store_append(spark.range(50).coalesce(1).toDF("id"), store, 1, max_files=4)
    part1 = os.path.join(store, "ingest_batch=1")
    assert 0 < len([f for f in os.listdir(part1) if f.endswith(".parquet")]) <= 4
    assert store_read(spark, store, before_batch=2).count() == 150


def test_tiered_compaction_spares_dominant_partition(spark, tmp_path):
    """The historical mega-partition (> 2x the rest combined) is left
    out of the merge — without this rule every periodic compaction
    re-reads and re-writes the whole committed store, quadratic I/O
    over a stream's lifetime. Small tail partitions still fold
    together and probe results are unchanged."""
    store = os.path.join(str(tmp_path), "tiered")
    store_append(spark.range(0, 10_000).toDF("id"), store, 0)   # mega
    store_append(spark.range(10_000, 10_010).toDF("id"), store, 1)
    store_append(spark.range(10_010, 10_020).toDF("id"), store, 2)
    store_append(spark.range(10_020, 10_030).toDF("id"), store, 3)
    before = {r["id"] for r in store_read(spark, store).collect()}

    merged = store_compact(spark, store, up_to_batch=4)
    # batches 1-3 fold into partition 3; the mega partition 0 survives
    assert merged == 3
    assert store_partitions(store) == [0, 3]
    assert {r["id"] for r in store_read(spark, store).collect()} == before
    prior = {r["id"] for r in store_read(spark, store, before_batch=4).collect()}
    assert prior == before


def test_compaction_invariants_random_schedules(spark):
    """Property: under ANY batch-size profile (including empty
    batches) and ANY safe compaction schedule (compact at the start of
    batch b with watermark b — the in-pipeline rule), the store's full
    row multiset is exactly everything appended, the strictly-prior
    probe at any batch id at/after the last watermark sees exactly the
    rows of prior batches, and the directory count stays bounded by
    tail-since-last-compaction + merged tiers."""
    import tempfile

    from hypothesis import HealthCheck, given, settings, strategies as st

    @st.composite
    def schedule(draw):
        n = draw(st.integers(2, 5))
        sizes = [draw(st.integers(1, 30))] + [
            draw(st.integers(0, 30)) for _ in range(n - 1)
        ]
        compact_at = sorted(draw(st.sets(st.integers(1, n - 1), max_size=2)))
        return sizes, compact_at

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(schedule())
    def run(sched):
        import shutil

        sizes, compact_at = sched
        store = tempfile.mkdtemp(prefix="compact-prop-")
        try:
            offsets, total, shrunk = [], 0, 0
            for bid, sz in enumerate(sizes):
                if bid in compact_at:
                    m = store_compact(spark, store, up_to_batch=bid)
                    shrunk += max(0, m - 1)
                offsets.append(total)
                store_append(spark.range(total, total + sz).toDF("id"), store, bid)
                total += sz

            got = sorted(r["id"] for r in store_read(spark, store).collect())
            assert got == list(range(total))  # nothing lost, nothing doubled
            last_w = max(compact_at, default=0)
            for b in range(last_w, len(sizes) + 1):
                prior = sorted(
                    r["id"]
                    for r in store_read(spark, store, before_batch=b).collect()
                )
                assert prior == list(range(offsets[b] if b < len(sizes) else total))
            # exact accounting: each merge of m partitions removed m-1 dirs
            assert len(store_partitions(store)) == len(sizes) - shrunk
        finally:
            shutil.rmtree(store, ignore_errors=True)

    run()


def test_sorted_store_clusters_key_within_files(spark, tmp_path):
    """sort_by must actually cluster the key so parquet row-group
    min/max statistics can prune probe scans: every written file's key
    column is non-decreasing, and the clustering survives compaction."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    store = os.path.join(str(tmp_path), "sorted")

    # (id, bucket) frames with scattered bucket values
    def frame(lo, hi):
        return spark.range(lo, hi).toDF("id").withColumn(
            "bucket", (F.col("id") * 37 % 11).cast("long")
        )

    # comparable sizes so the tiering rule does NOT spare either batch
    # and the compaction genuinely rewrites (merged == 2)
    store_append(frame(0, 300), store, 0, max_files=2, sort_by="bucket")
    store_append(frame(300, 600), store, 1, max_files=2, sort_by="bucket")

    def assert_clustered():
        files = glob.glob(os.path.join(store, "ingest_batch=*", "*.parquet"))
        assert files
        for f in files:
            vals = pq.read_table(f, columns=["bucket"])["bucket"].to_pylist()
            assert vals == sorted(vals), f"unsorted file {f}"

    assert_clustered()
    assert store_compact(spark, store, up_to_batch=2, sort_by="bucket") == 2
    assert store_partitions(store) == [1]
    assert_clustered()
    assert store_read(spark, store).count() == 600


def test_store_prune_drops_old_partitions(spark, tmp_path):
    """TTL retention: partitions below the cutoff are deleted whole;
    strictly-prior probes then see only the surviving window (the
    documented bounded-memory dedup trade)."""
    store = os.path.join(str(tmp_path), "pruned")
    for bid in range(4):
        store_append(spark.range(10 * bid, 10 * bid + 10).toDF("id"), store, bid)
    removed = store_prune(store, before_batch=2)
    assert removed == 2
    assert store_partitions(store) == [2, 3]
    assert {r["id"] for r in store_read(spark, store).collect()} == set(range(20, 40))
    # refuses mid-compaction, like readers
    with open(os.path.join(store, "_compact_manifest.json"), "w") as f:
        json.dump({"merged": [2], "dest": 2}, f)
    with pytest.raises(RuntimeError, match="unfinished compaction"):
        store_prune(store, before_batch=3)


def test_reader_fails_loud_mid_compaction(spark, tmp_path):
    """A manifest on disk means the store may be mid-swap: readers must
    refuse rather than risk serving a partially-deleted store."""
    store = os.path.join(str(tmp_path), "midswap")
    store_append(spark.range(5).toDF("id"), store, 0)
    with open(os.path.join(store, "_compact_manifest.json"), "w") as f:
        json.dump({"merged": [0], "dest": 0}, f)
    with pytest.raises(RuntimeError, match="unfinished compaction"):
        store_read(spark, store)


def test_compaction_crash_rolls_forward(spark, tmp_path):
    """Interrupted after the manifest was written (staged merge intact,
    no source directory deleted yet): the next store_compact completes
    the swap — no rows lost, no rows duplicated."""
    store = os.path.join(str(tmp_path), "crashed")
    for bid in range(3):
        store_append(
            spark.range(10 * bid, 10 * bid + 10).toDF("id"), store, bid
        )
    want = set(range(30))

    # simulate the crash window: stage the merge of batches 0-1 and
    # write the manifest, but "crash" before any delete/rename
    tmp = os.path.join(store, "_compact_tmp")
    spark.read.parquet(store).filter("ingest_batch < 2").drop(
        "ingest_batch"
    ).repartition(2).write.parquet(tmp)
    with open(os.path.join(store, "_compact_manifest.json"), "w") as f:
        json.dump({"merged": [0, 1], "dest": 1}, f)

    with pytest.raises(RuntimeError):
        store_read(spark, store)
    store_compact(spark, store, up_to_batch=2)  # roll forward + no-op merge
    assert store_partitions(store) == [1, 2]
    assert {r["id"] for r in store_read(spark, store).collect()} == want
    # strictly-prior probe at the replay boundary sees all merged rows
    prior = {r["id"] for r in store_read(spark, store, before_batch=2).collect()}
    assert prior == set(range(20))


def test_merge_schema_surfaces_later_added_column(spark, tmp_path):
    """Schema evolution across store partitions (ADVICE r6): a store
    whose row schema gained a column (the marks store's max_id guard)
    must not lose it to an arbitrary pre-upgrade footer — and a
    compaction over the mixed partitions must not bake the column-less
    schema in. merge_schema=True unions footers: old rows surface the
    new column as NULL, new rows keep their values."""
    store = os.path.join(str(tmp_path), "evolving")
    # batch 0: pre-guard schema (no max_id); batch 1: post-guard
    store_append(
        spark.createDataFrame([("a", 10)], "stratum string, tokens bigint"),
        store,
        0,
    )
    store_append(
        spark.createDataFrame(
            [("a", 7, 42)], "stratum string, tokens bigint, max_id bigint"
        ),
        store,
        1,
    )
    merged = store_read(spark, store, merge_schema=True)
    assert "max_id" in merged.columns
    rows = {r["tokens"]: r["max_id"] for r in merged.collect()}
    assert rows == {10: None, 7: 42}

    # compaction must preserve the unioned schema permanently
    store_compact(spark, store, up_to_batch=2)
    after = store_read(spark, store, merge_schema=True)
    assert "max_id" in after.columns
    assert {r["tokens"]: r["max_id"] for r in after.collect()} == rows
    # even a PLAIN read is now safe: the rewrite materialized max_id
    # into every surviving file
    assert "max_id" in store_read(spark, store).columns


def test_store_read_metadata_only_root_reads_none(spark, tmp_path):
    """A store root holding only underscore-prefixed metadata (the
    geometry record lands before the first append) is the first-batch
    state: store_read must return None, not raise
    UNABLE_TO_INFER_SCHEMA (r15 review)."""
    import json

    from willa_spark.streaming.store import store_read

    root = os.path.join(str(tmp_path), "st")
    os.makedirs(root)
    with open(os.path.join(root, "_geometry.json"), "w") as f:
        json.dump({"family": "minhash"}, f)
    assert store_read(spark, root) is None
