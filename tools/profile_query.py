"""Decompose one registry query's wall time into Spark jobs and driver
gaps, via the event log (guide §1/§7: find where the time actually
goes before touching anything).

Usage: python tools/profile_query.py [sf_dir] query [query ...]

Runs each query once (noop sink) in a bench-identical session with
spark.eventLog.enabled, then parses the event log: per-job wall time
(submission→completion, with stage names), total job time, and the
residual = wall − Σ jobs (driver-side planning/collect gaps between
jobs). Queries that train driver-side configs (Lloyd/BPE/logreg) show
their bounded collects as separate jobs here.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]
    if not args:
        print(__doc__, file=sys.stderr)
        return 2
    evdir = tempfile.mkdtemp(prefix="willa-evlog-")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    cpus = os.environ["SPARK_GRAFT_CPUS"]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("willa_spark-profile")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.dir", evdir)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from willa_spark.queries import QUERIES
    from willa_spark.sources import read_table, table_names

    for t in table_names():
        try:
            read_table(spark, sf_dir, t).count()
        except Exception:
            pass
    from pyspark.sql import functions as F

    warm = F.pandas_udf(lambda s: s, "long")
    spark.range(0, 10_000, 1, int(cpus)).select(warm("id").alias("x")).write.format(
        "noop"
    ).mode("overwrite").save()

    app_id = spark.sparkContext.applicationId
    for name in args:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(None)
        marker_t0 = time.time() * 1000.0
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(f"{name}: noop sink")
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_exec = time.perf_counter() - t1
        marker_t1 = time.time() * 1000.0
        spark.catalog.clearCache()
        # parse the (in-progress) event log for jobs inside the window;
        # Spark 4 writes a rolling dir eventlog_v2_<appId>/events_*_<appId>
        candidates = [
            os.path.join(evdir, app_id + ".inprogress"),
            os.path.join(evdir, app_id),
        ]
        v2 = os.path.join(evdir, f"eventlog_v2_{app_id}")
        if os.path.isdir(v2):
            candidates = sorted(
                os.path.join(v2, p)
                for p in os.listdir(v2)
                if p.startswith("events_")
            )
        jobs = {}
        stages = {}
        lines = []
        for path in candidates:
            if os.path.exists(path):
                with open(path) as f:
                    lines.extend(f.readlines())
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                ts = ev["Submission Time"]
                if ts >= marker_t0 - 50 and ts <= marker_t1:
                    jobs[ev["Job ID"]] = {
                        "t0": ts,
                        "desc": (ev.get("Properties") or {}).get(
                            "spark.job.description", ""
                        ),
                        "stages": [
                            s["Stage ID"] for s in ev.get("Stage Infos", [])
                        ],
                        "names": sorted(
                            {
                                s["Stage Name"].split(" at ")[0]
                                for s in ev.get("Stage Infos", [])
                            }
                        ),
                    }
            elif e == "SparkListenerJobEnd" and ev.get("Job ID") in jobs:
                jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                if si.get("Submission Time", 0) >= marker_t0 - 50:
                    stages[si["Stage ID"]] = {
                        "dur": (
                            si.get("Completion Time", 0)
                            - si.get("Submission Time", 0)
                        )
                        / 1000.0,
                        "tasks": si.get("Number of Tasks"),
                        "name": si["Stage Name"].split(" at ")[0],
                    }
        job_rows = []
        t_jobs = 0.0
        for jid in sorted(jobs):
            j = jobs[jid]
            if "t1" not in j:
                continue
            dur = (j["t1"] - j["t0"]) / 1000.0
            t_jobs += dur
            st = [
                f"{stages[s]['name']}({stages[s]['tasks']}t,{stages[s]['dur']:.2f}s)"
                for s in j["stages"]
                if s in stages
            ]
            job_rows.append((jid, dur, j["desc"][:40], " ".join(st)[:120]))
        wall = t_build + t_exec
        print(f"\n=== {name}: wall={wall:.2f}s (build={t_build:.2f}s exec={t_exec:.2f}s)")
        print(
            f"    jobs={len(job_rows)} sum_job_wall={t_jobs:.2f}s "
            f"driver_gaps={wall - t_jobs:.2f}s"
        )
        for jid, dur, desc, st in job_rows:
            print(f"    job {jid:>4} {dur:7.2f}s  {desc:<40} {st}")
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
