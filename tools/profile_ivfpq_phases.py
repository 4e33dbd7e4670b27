"""Phase-level decomposition of q_ivfpq_recall_bands driver cost
(r15 verdict #4: ~6,001 py4j round trips per ivfpq build remain —
find what builds them and fuse per guide §7.3).

Counts py4j round trips (ClientServerConnection.send_command) and wall
per phase: train_centroids, ivfpq_train, ivfpq_encode, ivfpq_topk,
bands tail + execution.

Usage: python tools/profile_ivfpq_phases.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from py4j.clientserver import ClientServerConnection

_orig = ClientServerConnection.send_command
_count = [0]


def _counted(self, *a, **kw):
    _count[0] += 1
    return _orig(self, *a, **kw)


ClientServerConnection.send_command = _counted

from tools.bench_session import make_bench_session

spark, cpus = make_bench_session("willa-ivfpq-phase-profile")

from pyspark.sql import functions as F

from willa_spark.functions import pq as PQ
from willa_spark.functions.similarity import train_centroids
from willa_spark.queries import QUERIES, _ann_band_inputs
from willa_spark.sources import read_table, table_names

for t in table_names():
    try:
        read_table(spark, sf_dir, t).count()
    except Exception:
        pass
warm = F.pandas_udf(lambda s: s, "long")
spark.range(0, 10_000, 1, int(cpus)).select(warm("id").alias("x")).write.format(
    "noop"
).mode("overwrite").save()

# one throwaway full run so JIT/codegen caches are warm, mirroring the
# bench's min-of-2 discipline
QUERIES["ivfpq_recall_bands"](spark, sf_dir).write.format("noop").mode(
    "overwrite"
).save()
spark.catalog.clearCache()


def phase(label, fn):
    c0, t0 = _count[0], time.perf_counter()
    out = fn()
    dt, dc = time.perf_counter() - t0, _count[0] - c0
    print(f"{label:30s} {dt:8.3f}s  {dc:6d} py4j trips", flush=True)
    return out


emb, q = phase("_ann_band_inputs", lambda: _ann_band_inputs(spark, sf_dir))
cents = phase("train_centroids", lambda: train_centroids(emb, n_centroids=8, n_iters=2))
books = phase("ivfpq_train", lambda: PQ.ivfpq_train(emb, cents, m=8, k=16, n_iters=1))
idx = phase("ivfpq_encode", lambda: PQ.ivfpq_encode(emb, cents, books))
topk = phase(
    "ivfpq_topk(build)",
    lambda: PQ.ivfpq_topk(idx, q, cents, books, k=10, n_probe=6, refine=300, corpus=emb),
)
df = phase("bands tail(build)", lambda: QUERIES["ivfpq_recall_bands"](spark, sf_dir))
phase(
    "execute(noop)",
    lambda: df.write.format("noop").mode("overwrite").save(),
)
print(f"TOTAL py4j trips: {_count[0]}")
spark.stop()
