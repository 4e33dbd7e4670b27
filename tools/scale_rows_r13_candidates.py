"""Pre-registration 10x scale rows for the r14 queue
(ccnet_perplexity, domain_mixture_weights) (the PQ price lesson:
measure BEFORE the registering round must decide): sf0.1 vs
.derived/sf1. ccnet_perplexity is the kn_perplexity class with
training shrunk to the every-13th TARGET sample and scoring routed
through the frozen-model make_bigram_scorer path;
domain_mixture_weights is the lm_perplexity corpus shape with the
per-doc agg replaced by a salted per-LANG agg (domain-cardinality
output). The bigram vocabulary grows ~10x under the derived
corpus's per-replica word bijections, so the model joins stay
broadcast-gated and both ratios should sit near or below linear.

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

    spark, _ = make_bench_session("scale-rows-r13-candidates")
    import willa_spark.queries as Q

    for name, fn in (
        ("ccnet_perplexity", Q.q_ccnet_perplexity),
        ("domain_mixture_weights", Q.q_domain_mixture_weights),
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
