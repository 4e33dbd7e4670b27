"""10x scale rows for the r9 families that lacked one (VERDICT r10 #6):

- novelty scoring: batch-N scoring cost as the PRIOR MODEL grows 10x
  (the interesting axis — per-batch work is batch-sized by design, so
  the model join is the only thing that can grow). Measured in BOTH
  feature spaces: exact (model rows = vocab, grows 10x) and the
  production 10k-bucket space (model capped by construction).
- z-order clustered write: one bounds-collect + one range exchange +
  sorted write — prove the wall tracks DATA (exchange/write-bound),
  not something superlinear, by bracketing against the plain
  hash-repartition write of the same frame at both scales.
- epoch_shuffle vs its global-orderBy twin: quantify the avoided
  boundary-sampling exchange the docstring claims (orderBy runs a
  range exchange whose partitioner first SAMPLES the sort key — an
  extra pass over the frame — while epoch_shuffle hash-repartitions
  and sorts within partitions only).

Method (the BASELINE.md r9 addendum's): min-of-2 after a discarded
warmup sample, loadavg bracketed around every sample, derived sf1 from
tools/derive_scale.py. Prints one JSON line per row.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".derived/sf1"
)


from tools.bench_timing import timed  # noqa: E402 — THE shared method


def main() -> int:
    from pyspark.sql import functions as F

    from tools.bench_session import make_bench_session
    from willa_spark.sources import read_table

    spark, _ = make_bench_session("willa_spark-scale-r10")
    rows = []
    tmp = tempfile.mkdtemp(prefix="scale_r10_")

    # ---------------------------------------------------- novelty
    from willa_spark.streaming.novelty import novelty_score_step

    # fixed scoring batch: the sf0.1 corpus's first 500 docs — batch
    # size held CONSTANT so the only growing input is the prior model
    fixed_batch = (
        read_table(spark, SF01, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 500)
        .localCheckpoint(eager=True)
    )
    for label, buckets in (("exact-space", None), ("10k-bucket", 10_000)):
        walls = {}
        for sf_name, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            store = os.path.join(tmp, f"nov_{label}_{sf_name}")
            prior = (
                read_table(spark, sf_dir, "documents")
                .select("doc_id", "text")
                .localCheckpoint(eager=True)
            )
            step = novelty_score_step(store, num_buckets=buckets)
            step(prior, 0).count()  # fold the prior model (untimed)

            def score(step=step):
                # strictly-prior read: batch 1 scores against batch
                # 0's counts; replays overwrite their own partition,
                # so re-running batch 1 is idempotent for the store
                step(fixed_batch, 1).count()

            walls[sf_name] = timed(score)
        rows.append(
            {
                "family": f"novelty scoring, prior model 10x ({label})",
                "sf0.1": walls["sf0.1"]["min"],
                "sf1": walls["sf1"]["min"],
                "ratio": round(walls["sf1"]["min"] / walls["sf0.1"]["min"], 2),
                "detail": walls,
            }
        )

    # ---------------------------------------------------- z-order
    from willa_spark.operators.zorder import write_zordered

    for sf_name, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        li = (
            read_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
            .localCheckpoint(eager=True)
        )
        zdir = os.path.join(tmp, f"z_{sf_name}")
        pdir = os.path.join(tmp, f"p_{sf_name}")
        wz = timed(
            lambda: write_zordered(li, zdir, ["l_partkey", "l_suppkey"], num_files=32)
        )
        wp = timed(
            lambda: li.repartition(32).write.mode("overwrite").parquet(pdir)
        )
        rows.append(
            {
                "family": f"z-order write vs plain write ({sf_name})",
                "zorder": wz["min"],
                "plain": wp["min"],
                "overhead": round(wz["min"] / wp["min"], 2),
                "detail": {"zorder": wz, "plain": wp},
            }
        )

    # ------------------------------------------- epoch shuffle
    from willa_spark.functions.curation import epoch_shuffle

    for sf_name, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        # UNCACHED parquet-scan input — the comparison's whole point:
        # orderBy's range partitioner SAMPLES the sort key before the
        # exchange, which on uncached input is a second pass over the
        # source (at 100 TB, a second full read); epoch_shuffle's hash
        # exchange needs no sample. Both sides materialize the same
        # flat sorted parquet so the write cost is identical.
        def orders():
            return read_table(spark, sf_dir, "orders")

        edir = os.path.join(tmp, f"e_{sf_name}")
        odir = os.path.join(tmp, f"o_{sf_name}")

        def epoch_flat():
            (
                epoch_shuffle(orders(), 1, 32, id_col="o_orderkey")
                .repartition(32, F.col("epoch_shard"))
                .sortWithinPartitions("epoch_shard", "epoch_pos", "o_orderkey")
                .drop("epoch_pos")
                .write.mode("overwrite")
                .parquet(edir)
            )

        we = timed(epoch_flat)

        def orderby_twin():
            # the naive twin: SAME hash, materialized in one GLOBAL
            # sort (shard-major order falls out of sorting the hash)
            (
                epoch_shuffle(orders(), 1, 32, id_col="o_orderkey")
                .orderBy("epoch_shard", "epoch_pos", "o_orderkey")
                .drop("epoch_pos")
                .write.mode("overwrite")
                .parquet(odir)
            )

        wo = timed(orderby_twin)
        rows.append(
            {
                "family": f"epoch_shuffle shards vs global orderBy ({sf_name})",
                "epoch_shuffle": we["min"],
                "orderBy_twin": wo["min"],
                "saved": round(wo["min"] / we["min"], 2),
                "detail": {"epoch_shuffle": we, "orderBy": wo},
            }
        )

    # expensive-lineage variant (sf1 docs): the realistic pre-shuffle
    # pipeline — a quality-scored corpus feeding the shuffle UNCACHED.
    # orderBy's sampling pass re-executes the whole scoring lineage a
    # second time; epoch_shuffle's hash exchange reads it once. THIS
    # is where the avoided pass becomes wall time (on a cheap cached
    # scan both forms tie — measured above).
    from willa_spark.functions.text import quality_score

    def scored_docs():
        d = read_table(spark, SF1, "documents").select("doc_id", "text")
        # score each doc several times under different salts to stand
        # in for a full curation pass (repetition screens, LID, PII)
        # without caching anything
        cols = [
            quality_score(F.concat(F.col("text"), F.lit(" " * i))).alias(f"q{i}")
            for i in range(8)
        ]
        return d.select("doc_id", "text", *cols)

    e2 = os.path.join(tmp, "e_lineage")
    o2 = os.path.join(tmp, "o_lineage")

    def epoch_lineage():
        (
            epoch_shuffle(scored_docs(), 1, 32)
            .repartition(32, F.col("epoch_shard"))
            .sortWithinPartitions("epoch_shard", "epoch_pos", "doc_id")
            .drop("epoch_pos", "text")
            .write.mode("overwrite")
            .parquet(e2)
        )

    def orderby_lineage():
        (
            epoch_shuffle(scored_docs(), 1, 32)
            .orderBy("epoch_shard", "epoch_pos", "doc_id")
            .drop("epoch_pos", "text")
            .write.mode("overwrite")
            .parquet(o2)
        )

    we2 = timed(epoch_lineage)
    wo2 = timed(orderby_lineage)
    rows.append(
        {
            "family": "epoch_shuffle vs orderBy, UNCACHED scored-corpus lineage (sf1)",
            "epoch_shuffle": we2["min"],
            "orderBy_twin": wo2["min"],
            "saved": round(wo2["min"] / we2["min"], 2),
            "detail": {"epoch_shuffle": we2, "orderBy": wo2},
        }
    )

    for r in rows:
        print(json.dumps(r))
    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
