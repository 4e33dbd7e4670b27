"""Streaming approximate-nearest-neighbor — the foreachBatch recipe
for the LSH family, mirroring ``willa_spark.streaming.near_dedup``
against a persisted bucket index.

Two streaming roles, matching how ANN is deployed over a growing
corpus (reference analogue: the dedupe workflow splice,
workflow.clj:6-24, is likewise a streaming construction over state
the stream itself maintains):

- **Index maintenance** (``lsh_index_step``): corpus embeddings arrive
  as a stream; each micro-batch's ``lsh_index_frame`` rows
  (id, vec, bucket — the exact frame the batch ``lsh_topk`` joins
  against, built by the SAME seeded builders) land in an
  ``ingest_batch=<id>`` partition directory. A replayed micro-batch
  overwrites exactly its own partition, so retries are idempotent and
  never duplicate index rows.
- **Query serving** (``lsh_probe_step``): query embeddings arrive as a
  stream; each micro-batch is probed against the CURRENT store with
  ``lsh_probe_topk`` — bucket equi-join (broadcast query side), exact
  cosine rescore, per-query rank. Probe parameters must match the
  index build; both steps take them from one ``LshAnnConfig``.

At 100 TB the store is a bucket-partitioned parquet table: the probe
reads only the joined bucket keys' row groups (the bucket column is a
single long — min/max row-group pruning applies), the index write is
map-only per batch, and neither step touches session conf or driver
memory beyond the broadcast query batch.

Why foreachBatch and not a stateful operator: the index is the
embedding table of EVERY admitted vector — joinable state far beyond a
per-key store, same argument as streaming near-dedup (near_dedup.py
module docstring).

The IVF family streams identically — cell id in place of bucket key
(``ivf_assign`` on frozen centroids is the corpus-side map,
``probe_cells`` the query side); the only extra decision is centroid
lifecycle: freeze centroids trained on a bootstrap sample (cells stay
comparable across batches; retrain = rebuild the store). Embedding
near-dup streaming is this same store probed with each batch's OWN
vectors as queries at a distance threshold instead of top-k.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import lsh_index_frame, lsh_probe_topk


@dataclass(frozen=True)
class LshAnnConfig:
    """One config object shared by the index and probe steps so their
    hyperplane families can never drift apart."""

    n_planes: int = 12
    n_tables: int = 1
    dim: int = 64
    seed: int = 42
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    query_id_col: str = "query_id"
    query_vec_col: str = "query_vec"


def lsh_index_step(
    store_dir: str, cfg: LshAnnConfig = LshAnnConfig()
) -> Callable[[DataFrame, int], None]:
    """foreachBatch step maintaining the persisted LSH index. Wire as

        stream.writeStream.foreachBatch(lsh_index_step(store, cfg))
              .option("checkpointLocation", chk).start()
    """

    def step(batch_df: DataFrame, batch_id: int) -> None:
        idx = lsh_index_frame(
            batch_df,
            n_planes=cfg.n_planes,
            dim=cfg.dim,
            seed=cfg.seed,
            n_tables=cfg.n_tables,
            id_col=cfg.id_col,
            vec_col=cfg.vec_col,
        )
        # idempotent replay: overwrite exactly this batch's partition
        idx.write.mode("overwrite").parquet(
            os.path.join(store_dir, f"ingest_batch={batch_id}")
        )

    return step


def read_index(spark, store_dir: str) -> DataFrame | None:
    """The current index (all ingested batches); None when empty."""
    try:
        return spark.read.parquet(store_dir).drop("ingest_batch")
    except Exception:
        return None


def lsh_probe_step(
    store_dir: str,
    sink: Callable[[DataFrame, int], None],
    k: int = 10,
    n_probes: int = 0,
    cfg: LshAnnConfig = LshAnnConfig(),
) -> Callable[[DataFrame, int], None]:
    """foreachBatch step serving ANN queries from the persisted index:
    each query micro-batch's top-k frame is handed to ``sink``. A
    query batch arriving before any corpus was ingested yields an
    empty result frame (schema intact), not an error."""

    def step(batch_df: DataFrame, batch_id: int) -> None:
        idx = read_index(batch_df.sparkSession, store_dir)
        if idx is None:
            idx = batch_df.sparkSession.createDataFrame(
                [], "id bigint, vec array<double>, bucket long"
            )
        topk = lsh_probe_topk(
            idx,
            batch_df,
            k=k,
            n_planes=cfg.n_planes,
            dim=cfg.dim,
            seed=cfg.seed,
            n_probes=n_probes,
            n_tables=cfg.n_tables,
            id_col=cfg.id_col,
            query_id_col=cfg.query_id_col,
            query_vec_col=cfg.query_vec_col,
        )
        sink(topk, batch_id)

    return step
