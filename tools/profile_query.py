#!/usr/bin/env python
"""Per-job wall-clock breakdown for catalog queries (round-11 §1 tool).

Runs each named query end-to-end with the noop sink inside ONE tuned
session (UI enabled so the REST status API is available), labels every
query via setJobDescription, then reports each Spark JOB the query
launched — description, duration, stage/task counts — plus the gap
between summed job time and wall time (driver/planning overhead).

    python tools/profile_query.py q_dedup_image q_dedup_clusters
    python tools/profile_query.py --runs 2 q_ann_recall

The point: a catalog query that *looks* like one action is often 4-6
sequential jobs (eager checkpoints, driver peeks, tier aggs). At bench
scale each extra job costs fixed scheduling overhead; at 100 TB each
extra job is a serialization barrier. This tool attributes wall time to
jobs so optimization targets the right one (guide §1.1).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2, help="per query; last run reported (steady state)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from production_ready_ds_spark.session import configure, register_udf_modules

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = configure(
        SparkSession.builder.appName("profile").master(f"local[{cpus}]")
    ).config("spark.ui.enabled", "true").config("spark.ui.port", "4049")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    register_udf_modules()

    from production_ready_ds_spark.queries import catalog

    cat = catalog()
    unknown = [n for n in args.names if n not in cat]
    if unknown:
        print(f"unknown: {unknown}", file=sys.stderr)
        return 2

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4049/api/v1/applications/{app_id}"

    def jobs_after(job_floor: int):
        with urllib.request.urlopen(f"{base}/jobs") as r:
            data = json.loads(r.read())
        return sorted(
            (j for j in data if j["jobId"] >= job_floor), key=lambda j: j["jobId"]
        )

    def stage_names():
        with urllib.request.urlopen(f"{base}/stages?details=false") as r:
            data = json.loads(r.read())
        out = {}
        for s in data:
            ms = 0
            if s.get("submissionTime") and s.get("completionTime"):
                t0 = time.mktime(time.strptime(s["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")) * 1000 + int(s["submissionTime"][20:23])
                t1 = time.mktime(time.strptime(s["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")) * 1000 + int(s["completionTime"][20:23])
                ms = int(t1 - t0)
            out[s["stageId"]] = (s["name"].split("\n")[0][:80], s.get("numTasks"), ms)
        return out

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    # warmup: JVM + codegen + parquet caches
    noop(cat["q_agg_pricing"].fn(spark, args.sf))

    report = {}
    for name in args.names:
        wall = None
        for run_i in range(args.runs):
            with urllib.request.urlopen(f"{base}/jobs") as r:
                existing = json.loads(r.read())
            floor = max((j["jobId"] for j in existing), default=-1) + 1
            spark.sparkContext.setJobDescription(f"{name}#r{run_i}")
            t0 = time.perf_counter()
            noop(cat[name].fn(spark, args.sf))
            wall = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
        time.sleep(0.3)
        jobs = jobs_after(floor)
        snames = stage_names()
        rows = []
        total_job_ms = 0
        for j in jobs:
            t_sub = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            t_end = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            ms_sub = time.mktime(t_sub) * 1000 + int(j["submissionTime"][20:23])
            ms_end = time.mktime(t_end) * 1000 + int(j["completionTime"][20:23])
            dur = ms_end - ms_sub
            total_job_ms += dur
            rows.append(
                {
                    "jobId": j["jobId"],
                    "desc": (j.get("description") or j["name"])[:100],
                    "ms": int(dur),
                    "stages": len(j.get("stageIds", [])),
                    "tasks": j.get("numTasks"),
                }
            )
        report[name] = {
            "wall_s": round(wall, 3),
            "jobs": len(rows),
            "sum_job_ms": int(total_job_ms),
            "driver_gap_ms": int(wall * 1000 - total_job_ms),
            "detail": rows,
        }
        print(f"\n=== {name}: wall {wall:.3f}s, {len(rows)} jobs, "
              f"sum(job)={total_job_ms/1000:.3f}s, driver gap "
              f"{wall - total_job_ms/1000:.3f}s")
        for r_, j in zip(rows, jobs):
            print(f"  job {r_['jobId']:>4} {r_['ms']:>6} ms  stages={r_['stages']} "
                  f"tasks={r_['tasks']:>4}  {r_['desc']}")
            for sid in sorted(j.get("stageIds", [])):
                nm = snames.get(sid)
                if nm:
                    print(f"        stage {sid:>5} {nm[2]:>6} ms tasks={nm[1]:>4}  {nm[0]}")

    out = "/tmp/profile_report.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\nwritten: {out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
