"""Per-query profiling harness for the optimization rounds.

For each requested catalog entry: time plan construction (Python +
Catalyst analysis), time N noop-sink materializations in a warm
session, count Spark jobs/stages the materialization schedules, and
optionally dump ``explain('formatted')`` to a file.

Usage:
    python tools/profile_query.py q1,q2,...  [--plans-dir plans/r10] \
        [--runs 3] [--suffix before]

Prints one JSON line per query:
    {"name":..., "build_s":..., "runs":[...], "min_s":...,
     "jobs":N, "stages":N, "tasks":N}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_etl_spark.plans import QUERIES, QUERIES_EXTRA  # noqa: E402
from nyc_taxi_etl_spark.session import get_spark  # noqa: E402

ALL = {**QUERIES, **QUERIES_EXTRA}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()  # warm-up

    names = [n for n in args.names.split(",") if n]
    if names == ["ALL"]:
        names = sorted(ALL)
    for name in names:
        if name not in ALL:
            print(json.dumps({"name": name, "error": "unknown"}))
            continue
        t0 = time.perf_counter()
        df = ALL[name](spark, sf_dir)
        build_s = time.perf_counter() - t0

        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))

        tracker = sc.statusTracker()
        runs = []
        jobs_before = None
        for i in range(args.runs):
            if i == args.runs - 1:
                jobs_before = set(tracker.getJobIdsForGroup() or [])
                sc.setJobGroup(f"profile_{name}", name)
            t0 = time.perf_counter()
            # rebuild the plan each run like bench.py does NOT — bench
            # rebuilds per pass; keep identical per-run cost by reusing
            # the df (bench timing includes build; we report separately)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 4))
        jobs = tracker.getJobIdsForGroup(f"profile_{name}")
        n_stages = 0
        n_tasks = 0
        for jid in jobs:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        sc.setJobGroup(None, None)
        print(
            json.dumps(
                {
                    "name": name,
                    "build_s": round(build_s, 4),
                    "runs": runs,
                    "min_s": min(runs),
                    "jobs": len(jobs),
                    "stages": n_stages,
                    "tasks": n_tasks,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
