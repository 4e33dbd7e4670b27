"""Pre-registration 10x scale row for the r16 queue
(classifier_curation — the learned-quality-filter admission, parked
r15): sf0.1 vs .derived/sf1, measured on the FINAL pinned plan (the
labeled localCheckpoint + 256-bucket/4-epoch tuned config). Method:
min-of-2 after a discarded warmup, loadavg-bracketed
(tools/bench_timing.timed — THE shared method)."""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


from tools.bench_timing import timed  # noqa: E402


def main():
    from tools.bench_session import make_bench_session

    spark, _ = make_bench_session("scale-rows-r15-candidate")
    import willa_spark.queries as Q

    row = {}
    for label, sf in (
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", os.path.join(REPO, ".derived/sf1")),
    ):
        row[label] = timed(lambda: Q.q_classifier_curation(spark, sf).count())
    row["ratio_10x"] = round(row["sf1"]["min"] / row["sf0.1"]["min"], 2)
    print(json.dumps({"classifier_curation": row}), flush=True)


if __name__ == "__main__":
    main()
