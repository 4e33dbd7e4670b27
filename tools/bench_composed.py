"""10x scaling measurement for the COMPOSED ingestion→shards pipeline.

The per-family scaling table (BASELINE.md, tools/derive_scale.py)
predates the full compose; this measures the batch twin of
``curation_to_shards_step`` — ``corpus_curation_batch`` (screens → PII
redaction → decontamination → minhash near-dedup → min-id canonical)
feeding ``save_packed_shards`` (global sequence packing + packed-shard
landing) — end to end at sf0.1 and the derived sf1, min-of-N with host
loadavg bracketing, so the end-to-end path's linearity is a measured
row, not an inference from its parts.

Usage: python tools/bench_composed.py [-n 2] [sf_dir ...]
Prints one JSON line per sf_dir.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    n = 2
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dirs = args or ["/root/testdata/sf0.1", os.path.join(repo, ".derived/sf1")]
    from tools.bench_session import make_bench_session

    spark, cpus = make_bench_session("willa_spark-bench-composed")
    from willa_spark.functions.curation import save_packed_shards
    from willa_spark.functions.dedup import _spread
    from willa_spark.sources import read_table
    from willa_spark.streaming.corpus_pipeline import corpus_curation_batch

    for sf_dir in dirs:
        docs = _spread(read_table(spark, sf_dir, "documents"), "doc_id")
        docs.count()  # warm the scan
        samples: list[float] = []
        loads: list[float] = []
        for _ in range(n):
            out = tempfile.mkdtemp(prefix="composed-shards-")
            loads.append(round(os.getloadavg()[0], 2))
            t0 = time.perf_counter()
            # strata re-join mirrors curation_to_shards_step: the
            # curation stages are stratum-agnostic, so the batch twin
            # re-attaches source by id before packing
            curated = corpus_curation_batch(docs).join(
                docs.select("doc_id", "source"), "doc_id"
            )
            save_packed_shards(
                curated, out, seq_len=512, seqs_per_shard=64
            )
            samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            shutil.rmtree(out, ignore_errors=True)
        loads.append(round(os.getloadavg()[0], 2))
        print(
            json.dumps(
                {
                    "path": "curation_to_shards_batch",
                    "sf_dir": sf_dir,
                    "n_docs": docs.count(),
                    "min": min(samples),
                    "samples": samples,
                    "loadavg": loads,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
