"""Streaming ANN (foreachBatch + persisted LSH bucket index):
congruity with the batch ``lsh_topk``, empty-store behavior, and
replay idempotency of the partitioned index store."""

import os
import random
import time

from willa_spark.functions import similarity as S
from willa_spark.streaming.ann import (
    LshAnnConfig,
    lsh_index_step,
    lsh_probe_step,
    read_index,
)

DIM = 8
CFG = LshAnnConfig(n_planes=3, n_tables=4, dim=DIM, seed=7)


def _vecs(n, seed):
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(DIM)] for _ in range(n)]


def _corpus_batches(spark):
    vs = _vecs(30, 1)
    rows = [(i, vs[i]) for i in range(30)]
    mk = lambda rs: spark.createDataFrame(rs, "vec_id bigint, embedding array<double>")
    return [mk(rows[:10]), mk(rows[10:20]), mk(rows[20:])], mk(rows)


def _queries(spark):
    # 3 corpus vectors as self-queries + 2 fresh vectors
    vs = _vecs(30, 1)
    qs = [(100, vs[3]), (101, vs[17]), (102, vs[25])] + [
        (200 + i, v) for i, v in enumerate(_vecs(2, 99))
    ]
    return spark.createDataFrame(qs, "query_id bigint, query_vec array<double>")


def _drive_ingest(spark, tmp_path, store):
    """Feed corpus batches through a REAL readStream → foreachBatch
    index-maintenance pipeline (one file per micro-batch)."""
    batches, full = _corpus_batches(spark)
    d = os.path.join(str(tmp_path), "in")
    os.makedirs(d)
    for b in batches:
        b.coalesce(1).write.mode("append").parquet(d)
        time.sleep(0.05)
    schema = spark.read.parquet(d).schema
    src = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    q = (
        src.writeStream.foreachBatch(lsh_index_step(store, CFG))
        .option("checkpointLocation", os.path.join(str(tmp_path), "chk"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "ingest stream did not drain"
    return full


def _probe_rows(spark, store, queries, k=5, n_probes=1):
    got = []

    def sink(topk, _bid):
        got.extend(
            (r["query_id"], r["vec_id"], r["cosine_sim"], r["rank"])
            for r in topk.collect()
        )

    lsh_probe_step(store, sink, k=k, n_probes=n_probes, cfg=CFG)(queries, 0)
    return sorted(got)


def test_streaming_ann_congruity(spark, tmp_path):
    """Top-k served from the streamed-in index must equal the batch
    lsh_topk over the full corpus — same seeded hyperplane family via
    the shared builders, so equality is exact, including scores and
    deterministic tie-broken ranks."""
    store = os.path.join(str(tmp_path), "store")
    full = _drive_ingest(spark, tmp_path, store)
    queries = _queries(spark)
    got = _probe_rows(spark, store, queries)

    want = sorted(
        (r["query_id"], r["vec_id"], r["cosine_sim"], r["rank"])
        for r in S.lsh_topk(
            full,
            queries,
            k=5,
            n_planes=CFG.n_planes,
            dim=CFG.dim,
            seed=CFG.seed,
            n_probes=1,
            n_tables=CFG.n_tables,
        ).collect()
    )
    assert got == want and len(got) > 0
    # self-queries must find themselves at rank 1 (identical vector ⇒
    # same bucket in every table ⇒ cosine 1.0 dominates)
    rank1 = {q: c for q, c, _s, rk in got if rk == 1}
    assert rank1[100] == 3 and rank1[101] == 17 and rank1[102] == 25


def test_streaming_ann_replay_idempotent(spark, tmp_path):
    """A replayed index micro-batch overwrites exactly its own
    partition: index row count and probe results are unchanged."""
    store = os.path.join(str(tmp_path), "store")
    batches, _ = _corpus_batches(spark)
    step = lsh_index_step(store, CFG)
    for i, b in enumerate(batches):
        step(b, i)
    n1 = read_index(spark, store).count()
    before = _probe_rows(spark, store, _queries(spark))
    step(batches[1], 1)  # replay the middle batch
    assert read_index(spark, store).count() == n1
    assert _probe_rows(spark, store, _queries(spark)) == before


def test_streaming_ann_probe_before_ingest(spark, tmp_path):
    """Queries arriving before any corpus: empty result, not an error."""
    store = os.path.join(str(tmp_path), "missing-store")
    assert _probe_rows(spark, store, _queries(spark)) == []


def test_lsh_probe_plan_broadcasts_queries(spark, tmp_path):
    """The probe join must broadcast the (small) query side against the
    (huge) index side — the refactor to lsh_index_frame/lsh_probe_topk
    must not drop the broadcast hint behind the renames."""
    from willa_spark.plans import physical_plan

    store = os.path.join(str(tmp_path), "store")
    batches, _ = _corpus_batches(spark)
    step = lsh_index_step(store, CFG)
    for i, b in enumerate(batches):
        step(b, i)
    idx = read_index(spark, store)
    topk = S.lsh_probe_topk(
        idx, _queries(spark), k=5,
        n_planes=CFG.n_planes, dim=CFG.dim, seed=CFG.seed,
        n_probes=1, n_tables=CFG.n_tables,
    )
    assert "BroadcastHashJoin" in physical_plan(topk)
