"""Pre-registration 10x scale rows for the r13 queue (lm_perplexity,
kn_perplexity, boilerplate_strip) (the PQ price
lesson: measure BEFORE the registering round must decide):
lm_perplexity and kn_perplexity at sf0.1 vs .derived/sf1. Both are
the dsir_weights class — one corpus explode + vocabulary-sized model
statistics + broadcast-gated joins + per-doc agg — with the bigram
vocabulary growing ~10x under the derived corpus's per-replica word
bijections, so the model joins stay broadcast-gated and the ratio
should sit near or below linear.

Method: min-of-2 after a discarded warmup, loadavg-bracketed. One
JSON line per query.
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

    spark, _ = make_bench_session("scale-rows-r12-lm")
    import willa_spark.queries as Q

    for name, fn in (
        ("lm_perplexity", Q.q_lm_perplexity),
        ("kn_perplexity", Q.q_kn_perplexity),
        ("boilerplate_strip", Q.q_boilerplate_strip),
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
