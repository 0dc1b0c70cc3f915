"""Round-6 optimization harness — per-query isolation with stage-level
breakdown (guide §1: measure first; §7.1: find WHERE the time goes).

bench.py is FROZEN for driver measurement; this file is the builder's
iteration loop. Times one or more catalog queries with the same noop-sink
methodology as bench.py, then prints each Spark stage's wall/tasks/input
sizes from the status API so per-stage costs are attributable.

    python bench_extra.py [--sf DIR] [--cpus N] [--passes N] query ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument(
        "--stages",
        action="store_true",
        help="print per-stage breakdown of the whole run (all passes)",
    )
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from bench import BENCH_ONLY, materialize
    from ocr_parallel_spark import queries_catalog
    from pyspark.sql import SparkSession

    os.makedirs("/tmp/spark-events", exist_ok=True)
    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(args.cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", "/tmp/spark-events")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    catalog = queries_catalog.queries()
    # warm the JVM + Python worker pool exactly like bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    import pandas as pd  # noqa: F401

    spark.range(64).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    sc = spark.sparkContext
    for name in args.names:
        fn = catalog.get(name) or BENCH_ONLY.get(name)
        if fn is None:
            print(f"?? {name}: unknown")
            continue
        walls = []
        for p in range(args.passes):
            spark.catalog.clearCache()
            sc.setJobDescription(f"{name} pass {p}")
            t0 = time.perf_counter()
            materialize(fn(spark, args.sf))
            walls.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: {walls}  min={min(walls)}")
    app_id = sc.applicationId
    spark.stop()
    if args.stages:
        import glob
        cands = glob.glob(f"/tmp/spark-events/*{app_id}*") + glob.glob(
            f"/tmp/spark-events/*{app_id}*/events_*"
        )
        logs = [p for p in cands if os.path.isfile(p)]
        if not logs:
            logs = [
                p
                for d in cands
                if os.path.isdir(d)
                for p in glob.glob(d + "/*")
                if os.path.isfile(p) and "appstatus" not in p
            ]
        if not logs:
            print(f"?? no event log found for {app_id}; skipping --stages")
            return
        _print_stages(sorted(logs)[-1])


def _print_stages(log_path: str) -> None:
    import json

    stages = {}
    job_of_stage = {}
    if log_path.endswith(".zstd"):
        import io
        import subprocess

        raw = subprocess.run(
            ["zstd", "-dc", log_path], capture_output=True, check=True
        ).stdout
        fh = io.StringIO(raw.decode("utf-8", "replace"))
    else:
        fh = open(log_path)
    with fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except Exception:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                desc = ev.get("Properties", {}).get("spark.job.description", "")
                for sid in ev.get("Stage IDs", []):
                    job_of_stage[sid] = desc
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                done = si.get("Completion Time")
                if sub is None or done is None:
                    continue
                stages[sid] = (
                    (done - sub) / 1000.0,
                    si.get("Number of Tasks", 0),
                    si.get("Stage Name", "")[:100],
                    job_of_stage.get(sid, ""),
                )
    print("  stage  wall_s  tasks  desc | name")
    for sid in sorted(stages):
        w, nt, nm, desc = stages[sid]
        print(f"  {sid:5d} {w:7.2f} {nt:6d}  {desc[:28]:28s} | {nm}")


if __name__ == "__main__":
    main()
