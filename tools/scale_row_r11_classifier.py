"""10x scale row for the r11 quality-classifier family: the registered
band row end-to-end (feature build + pinned frame + 6 preconditioned
epochs + in-plan scoring) at sf0.1 vs the derived sf1. Expected shape:
corpus-scan-bound per epoch with a fixed epoch budget — the model is
K+1 doubles at both scales, the per-epoch shuffle is <=K+1 keys.

Method: min-of-2 after a discarded warmup, loadavg-bracketed (the
BASELINE.md addendum's). Prints one JSON line.
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

    spark, _ = make_bench_session("scale-row-r11-classifier")
    import willa_spark.queries as Q

    out = {}
    for label, sf in (
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", os.path.join(REPO, ".derived/sf1")),
    ):
        def run():
            Q.q_quality_classifier_bands(spark, sf).count()

        out[label] = timed(run)
    out["ratio_10x"] = round(out["sf1"]["min"] / out["sf0.1"]["min"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
