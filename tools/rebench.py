"""Isolated min-of-N re-measurement for bench suspects.

The shared host's neighbor noise makes single bench samples vary up to
~4x round over round (VERDICT r07: `near_dup_clusters` read 1.25->5.09 s
with its code absent from the diff). When a query's round-over-round
ratio exceeds ~1.5x, re-measure it HERE before calling it a regression:
each query runs N times in one warmed session with host loadavg
bracketing every sample, so the record itself shows whether the window
was noisy (spread >> 1, rising loadavg) or the code really regressed
(tight samples, quiet host, still slow).

Usage: python tools/rebench.py [-n N] [sf_dir] query [query ...]
Prints one JSON line per query:
  {"query", "min", "samples", "spread", "loadavg", "sf_dir"}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    n = 5
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]
    if not args:
        print(__doc__, file=sys.stderr)
        return 2
    from tools.bench_session import make_bench_session

    spark, cpus = make_bench_session("willa_spark-rebench")
    from willa_spark.queries import QUERIES
    from willa_spark.sources import read_table, table_names

    for t in table_names():
        try:
            read_table(spark, sf_dir, t).count()
        except Exception:
            pass
    for name in args:
        fn = QUERIES[name]
        samples: list[float] = []
        loads: list[float] = []
        for _ in range(n):
            loads.append(round(os.getloadavg()[0], 2))
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        loads.append(round(os.getloadavg()[0], 2))
        print(
            json.dumps(
                {
                    "query": name,
                    "min": min(samples),
                    "samples": samples,
                    "spread": round(max(samples) / max(min(samples), 1e-9), 2),
                    "loadavg": loads,
                    "sf_dir": sf_dir,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
