#!/usr/bin/env python
"""Attribute every Spark job a catalog query launches to its Python
call site (round-12 §1 tool; guide §1.1 empirical loop).

Monkeypatches the DataFrame action surface (localCheckpoint, collect,
take, first, count, head) to stamp the job description with the first
production_ready_ds_spark stack frame before the action fires, then
runs the query with the noop sink and reports every job with its site.

    python tools/job_sites.py q_curation_ingest
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _site() -> str:
    hits = []
    for fr in reversed(traceback.extract_stack()):
        fn = fr.filename
        if "production_ready_ds_spark" in fn and "tools" not in fn:
            hits.append(
                f"{os.path.basename(os.path.dirname(fn))}/{os.path.basename(fn)}:{fr.lineno}"
            )
        if len(hits) == 3:
            break
    return "<".join(hits) if hits else "driver"


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql.classic.dataframe import DataFrame  # Spark 4: the
    # concrete class — patching the abstract pyspark.sql.DataFrame is
    # shadowed by classic's own method definitions

    from production_ready_ds_spark.session import configure, register_udf_modules

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        configure(SparkSession.builder.appName("job-sites").master(f"local[{cpus}]"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4052")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    register_udf_modules()

    for meth in ("localCheckpoint", "collect", "take", "first", "count", "head"):
        orig = getattr(DataFrame, meth)

        def wrapped(self, *a, _orig=orig, _meth=meth, **kw):
            sc = self.sparkSession.sparkContext
            prev = sc.getLocalProperty("spark.job.description")
            sc.setJobDescription(f"{_meth}@{_site()}")
            try:
                return _orig(self, *a, **kw)
            finally:
                sc.setJobDescription(prev)

        setattr(DataFrame, meth, wrapped)

    from production_ready_ds_spark.queries import catalog

    cat = catalog()
    report: dict = {}
    for name in args.names:
        for r in range(args.runs):
            sc = spark.sparkContext
            jsc = sc._jsc.sc()
            before = jsc.statusStore().jobsList(None).size()
            t0 = time.perf_counter()
            sc.setJobDescription(f"{name}#r{r}")
            df = cat[name].fn(spark, args.sf)
            sc.setJobDescription(f"{name}#r{r}:save")
            df.write.mode("overwrite").format("noop").save()
            sc.setJobDescription(None)
            wall = time.perf_counter() - t0
        # last run reported
        data = json.load(
            urllib.request.urlopen("http://localhost:4052/api/v1/applications")
        )
        app_id = data[0]["id"]
        jobs = json.load(
            urllib.request.urlopen(
                f"http://localhost:4052/api/v1/applications/{app_id}/jobs?status=succeeded"
            )
        )
        tag = f"{name}#r{args.runs - 1}"
        mine = [
            j
            for j in jobs
            if (j.get("description") or "").startswith(tag)
            or (j.get("jobGroup") or "") == tag
        ]
        # jobs stamped by the action wrapper carry the action site, not
        # the query tag — take every job newer than the run boundary
        allj = sorted(jobs, key=lambda j: j["jobId"])
        # fall back: report the trailing wall-clock window
        t_cut = None
        rows = []
        total_ms = 0
        for j in allj:
            sub = j["submissionTime"]
            rows.append(
                {
                    "jobId": j["jobId"],
                    "desc": (j.get("description") or "")[:90],
                    "ms": _dur_ms(j),
                    "tasks": j.get("numTasks"),
                }
            )
            total_ms += _dur_ms(j)
        report[name] = {"wall_last_run_s": round(wall, 3), "jobs": rows}
        print(f"== {name}: last-run wall {wall:.3f}s, {len(rows)} session jobs total")
    with open("/tmp/job_sites.json", "w") as f:
        json.dump(report, f, indent=1)
    print("written: /tmp/job_sites.json")
    spark.stop()
    return 0


def _dur_ms(j) -> int:
    from datetime import datetime

    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
    try:
        a = datetime.strptime(j["submissionTime"].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
        b = datetime.strptime(j["completionTime"].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
        return int((b - a).total_seconds() * 1000)
    except Exception:
        return -1


if __name__ == "__main__":
    raise SystemExit(main())
