"""r14 quiet re-measure of dsir_weights (r13 verdict #5): the r13
quiet close read it at 3.17 s vs 2.47 s in the prior close while the
same tree's driver record read 2.48 s — adjudicate weather vs plan
change with one bracketed measurement at sf0.1 through the shared
method (tools/bench_timing.timed)."""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_timing import timed  # noqa: E402


def main():
    from tools.bench_session import make_bench_session

    spark, _ = make_bench_session("remeasure-dsir-r14")
    import willa_spark.queries as Q

    fn = Q.QUERIES["dsir_weights"]
    row = timed(lambda: fn(spark, "/root/testdata/sf0.1").count())
    print(json.dumps({"dsir_weights": row}), flush=True)


if __name__ == "__main__":
    main()
