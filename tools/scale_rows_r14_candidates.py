"""Pre-registration 10x scale row for the r15 queue
(domain_mixture_trajectory) (the PQ price lesson: measure BEFORE the
registering round must decide): sf0.1 vs .derived/sf1. The corpus
side is exactly the registered domain_mixture_weights plan (one
transition explode + broadcast-gated vocab joins + salted per-lang
agg); the 6-step iteration is domain-cardinality driver arithmetic
over one bounded collect, so the ratio should track the one-step
row's (1.53x at r13).

Method: min-of-2 after a discarded warmup, loadavg-bracketed. One
JSON line per query (tools/bench_timing.timed — THE shared method).
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


from tools.bench_timing import timed  # noqa: E402


def main():
    from tools.bench_session import make_bench_session

    spark, _ = make_bench_session("scale-rows-r14-candidates")
    import willa_spark.queries as Q

    for name, fn in (
        ("domain_mixture_trajectory", Q.q_domain_mixture_trajectory),
        ("ccnet_curation", Q.q_ccnet_curation),
    ):
        row = {}
        for label, sf in (
            ("sf0.1", "/root/testdata/sf0.1"),
            ("sf1", os.path.join(REPO, ".derived/sf1")),
        ):
            row[label] = timed(lambda: fn(spark, sf).count())
        row["ratio_10x"] = round(row["sf1"]["min"] / row["sf0.1"]["min"], 2)
        print(json.dumps({name: row}), flush=True)


if __name__ == "__main__":
    main()
