#!/usr/bin/env python
"""Per-stage wall/CPU breakdown for named catalog queries (r18 opt round).

The bench gives one wall number per query; optimizing needs to know
WHERE inside the query the time goes — which stage, and whether it is
executor compute, shuffle fetch, or driver/scheduling gaps. This tool
runs each named query in a fresh UI-enabled session (sf0.001 codegen
warm first, like bench), then reads the status REST API and prints,
per stage since the query's mark: wall (completion-submission),
executorRunTime, shuffle read/write bytes, task count, and the stage's
name line — plus the job count and the gap between summed stage wall
and the query wall (= driver/scheduler/Python-boundary time the stages
don't account for).

    python tools/profile_query.py --queries graph_pagerank,dedup_clusters
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikidata_to_surrealdb_spark.plans.queries import QUERIES  # noqa: E402
from wikidata_to_surrealdb_spark.session import get_spark  # noqa: E402


def stages_api(spark) -> list[dict]:
    url = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{url}/api/v1/applications/{app_id}/stages?details=false", timeout=20
    ) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--top", type=int, default=14, help="stages to print")
    args = ap.parse_args()

    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(
        app_name="profile_query",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.retainedStages": "20000"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    warm = "/root/testdata/sf0.001"
    for n in names:
        try:
            QUERIES[n].fn(spark, warm).collect()
        except Exception as e:
            print(f"warm {n} failed: {e}", file=sys.stderr)

    for n in names:
        best = float("inf")
        best_mark = -1
        for _ in range(args.reps):
            spark.catalog.clearCache()
            mark = max([s["stageId"] for s in stages_api(spark)] + [-1])
            spark.sparkContext.setJobDescription(f"profile:{n}")
            t0 = time.perf_counter()
            QUERIES[n].fn(spark, args.sf_dir).collect()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            if dt < best:
                best, best_mark = dt, mark
        stages = [s for s in stages_api(spark) if s["stageId"] > best_mark]
        # only the best rep's window: stage ids are monotonic, so the
        # last rep's mark bounds it; if the best rep wasn't the last,
        # the breakdown still describes an identical (deterministic)
        # execution of the same plan.
        stages = [s for s in stages if s.get("status") != "SKIPPED"]
        tot_run = sum(s.get("executorRunTime", 0) for s in stages)
        tot_wall = 0.0
        rows = []
        for s in stages:
            try:
                sub = s.get("submissionTime", "")
                com = s.get("completionTime", "")
                from datetime import datetime

                f = "%Y-%m-%dT%H:%M:%S.%f%Z"
                wall = (
                    datetime.strptime(com, f) - datetime.strptime(sub, f)
                ).total_seconds()
            except Exception:
                wall = 0.0
            tot_wall += wall
            rows.append(
                (
                    wall,
                    s.get("executorRunTime", 0) / 1000.0,
                    s.get("shuffleReadBytes", 0),
                    s.get("shuffleWriteBytes", 0),
                    s.get("numTasks", 0),
                    s["stageId"],
                    (s.get("name", "") or "").split("\n")[0][:90],
                )
            )
        rows.sort(reverse=True)
        print(f"\n=== {n}: wall {best:.3f}s  stages={len(stages)} "
              f"sum(stage wall)={tot_wall:.2f}s  sum(executorRunTime)={tot_run/1000.0:.2f}s")
        print("  stage_wall  exec_run  shuf_read  shuf_write  tasks  sid  name")
        for w, er, sr, sw, nt, sid, nm in rows[: args.top]:
            print(f"  {w:9.2f}s {er:8.2f}s {sr:10d} {sw:11d} {nt:6d} {sid:4d}  {nm}")

    spark.stop()


if __name__ == "__main__":
    main()
