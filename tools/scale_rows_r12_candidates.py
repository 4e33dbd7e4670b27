"""Pre-registration 10x scale rows for the r12 queue (the PQ price
lesson applied early: measure BEFORE the registering round must
decide): selection_auc and dsir_calibration at sf0.1 vs .derived/sf1.
Both inherit the dsir_weights plan (one pinned corpus gram explode,
broadcast models) plus a distinct-score/decile tail that is bounded
by 6dp score cardinality, so the expectation is the dsir_weights
ratio (~1.1x, BASELINE.md r9 addendum).

Method: min-of-2 after a discarded warmup, loadavg-bracketed. One
JSON line.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


from tools.bench_timing import timed  # noqa: E402 — THE shared method


def main():
    from tools.bench_session import make_bench_session

    spark, _ = make_bench_session("scale-rows-r12-candidates")
    import willa_spark.queries as Q

    out = {}
    for name, fn in (
        ("selection_auc", Q.q_selection_auc),
        ("dsir_calibration", Q.q_dsir_calibration),
    ):
        row = {}
        for label, sf in (
            ("sf0.1", "/root/testdata/sf0.1"),
            ("sf1", os.path.join(REPO, ".derived/sf1")),
        ):
            row[label] = timed(lambda: fn(spark, sf).count())
        row["ratio_10x"] = round(row["sf1"]["min"] / row["sf0.1"]["min"], 2)
        out[name] = row
        print(json.dumps({name: row}), flush=True)


if __name__ == "__main__":
    main()
