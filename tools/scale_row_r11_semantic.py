"""sf1 -> derived-sf10 scale row for decontaminate_semantic (VERDICT
r10 #6): the r10 row measured 9.2x between sf0.1 and sf1 because the
eval set was still FILLING toward its <=50-item cap (21 -> 50); this
row proves the documented corpus-linear regime once the cap binds —
eval is exactly 50 items at BOTH sf1 and sf10 (vec_id % 97 == 0 AND
vec_id < 4850), so the only growing axis is the corpus scan.

Method (the BASELINE.md addendum's): min-of-2 after a discarded warmup
sample, loadavg bracketed around every sample; .derived/sf1 from
tools/derive_scale.py, .derived/sf10e = derive_embeddings(out, 100)
(embeddings-only — the query reads no other table). Prints one JSON
line.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, ".derived/sf1")
SF10E = os.path.join(REPO, ".derived/sf10e")


from tools.bench_timing import timed  # noqa: E402 — THE shared method


def main():
    from tools.bench_session import make_bench_session

    spark, _ = make_bench_session("scale-row-r11-semantic")
    import willa_spark.queries as Q

    out = {}
    for label, sf in (("sf1", SF1), ("sf10", SF10E)):
        n_eval = {"n": None}

        def run():
            df = Q.q_decontaminate_semantic(spark, sf)
            n_eval["n"] = df.count()

        out[label] = {**timed(run), "rows": n_eval["n"]}
    out["ratio_10x"] = round(out["sf10"]["min"] / out["sf1"]["min"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
