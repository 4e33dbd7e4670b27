"""Micro-bench: packed-shard writer CPU vs document length.

The r5 writer evaluated ``_tokens(text)`` once per manifest slice row,
so a doc straddling k sequences re-tokenized k times — O(doc_tokens
x k) CPU. The r6 ``packed_slice_rows`` tokenizes once per doc and
slices the projected array, so doubling the doc length should roughly
double wall-clock (k doubles too, but each slice only copies its own
span). Run:

    python tools/bench_packed_writer.py

Prints one line per doc length; the ratio column is time[i]/time[0]
against the length ratio. Quadratic behavior shows up as ratio ~=
(len ratio)^2.
"""

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

from willa_spark.functions import curation as CU


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    seq_len = 64
    base = 50_000
    times = []
    for mult in (1, 2, 4):
        n = base * mult
        text = " ".join(f"w{i % 97}" for i in range(n))
        df = spark.createDataFrame(
            [(0, "s", text)], "doc_id bigint, source string, text string"
        )
        out = tempfile.mkdtemp(prefix="bench_packed_")
        # warm the JVM paths once at the smallest size
        if mult == 1:
            CU.save_packed_shards(df, out, seq_len=seq_len, seqs_per_shard=8)
        t0 = time.perf_counter()
        CU.save_packed_shards(df, out, seq_len=seq_len, seqs_per_shard=8)
        dt = time.perf_counter() - t0
        times.append(dt)
        shutil.rmtree(out, ignore_errors=True)
        print(
            f"tokens={n:>7} slices={n // seq_len:>5} time={dt:6.2f}s "
            f"time_ratio={dt / times[0]:5.2f} len_ratio={mult}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
