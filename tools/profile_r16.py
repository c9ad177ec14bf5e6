"""Round-16 profiling harness: per-JOB wall-time attribution for a named
registry query (guide §1.1/§7.1 — the Stages/Jobs view, scripted).

Runs the query once (optionally after a warm rep), then reads the local
Spark UI REST API (http://localhost:<ui-port>/api/v1) to list every job
the run submitted with its duration and description — the "why is this
row 8 s on 2000 rows" question is answered by the job list, not the plan.

Usage:
  python tools/profile_r16.py [--sf SF_DIR] [--warm] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark_etl_twitter_spark.plans.registry import QUERIES  # noqa: E402
from pyspark_etl_twitter_spark.session import get_session  # noqa: E402


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/{path}") as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--warm", action="store_true", help="one untimed warm rep first")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    # UI on: the REST job list is the whole point of this tool (the
    # engine session disables it; bench timings are NOT taken here)
    spark = get_session(
        app_name="profile_r16", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm

    for name in args.names:
        fn = QUERIES[name]
        if args.warm:
            spark.sparkContext.setJobDescription(f"warm: {name}")
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        jobs_before = {j["jobId"] for j in _api(spark, "jobs")}
        spark.sparkContext.setJobDescription(f"profile: {name}")
        t0 = time.perf_counter()
        df = fn(spark, args.sf)
        t_plan = time.perf_counter() - t0
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_exec = time.perf_counter() - t1
        spark.sparkContext.setJobDescription(None)
        total = t_plan + t_exec
        jobs = [j for j in _api(spark, "jobs") if j["jobId"] not in jobs_before]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name}: total {total:.3f}s (df-construction {t_plan:.3f}s, "
              f"final-action {t_exec:.3f}s), {len(jobs)} jobs ===")
        tsum = 0.0
        for j in jobs:
            try:
                st = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                ct = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                frac = (float(j["completionTime"][20:23]) - float(j["submissionTime"][20:23])) / 1000.0
                dur = time.mktime(ct) - time.mktime(st) + frac
            except Exception:  # noqa: BLE001
                dur = float("nan")
            tsum += dur
            desc = (j.get("description") or j.get("name") or "")[:90]
            print(f"  job {j['jobId']:>4}  {dur:7.3f}s  stages={len(j['stageIds'])}  {desc}")
        print(f"  sum(job durations) = {tsum:.3f}s; gap (driver-side, planning/"
              f"codegen/collect-overhead) = {total - tsum:.3f}s")


if __name__ == "__main__":
    main()
