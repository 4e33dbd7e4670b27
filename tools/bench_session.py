"""The ONE SparkSession builder every benchmark tool shares.

bench.py (the headline record), tools/rebench.py (isolated suspect
re-measurement), and tools/bench_composed.py (the composed-pipeline
scaling row) must measure under IDENTICAL session configuration or
their numbers stop being comparable — which is the exact
noise-attribution problem the latter two exist to solve. Any config a
comparable measurement requires goes HERE, once.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def make_bench_session(app: str):
    """(spark, cpus) under the benchmark configuration: local[$cpus],
    AQE on, Arrow on, UTC, UI off, and NO console stage-progress \r
    spam on stdout (r6's bench line was unparseable because ~76
    queries of progress-bar output pushed the head of the JSON line
    out of the driver's tail window)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark, cpus
