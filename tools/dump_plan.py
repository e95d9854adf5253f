#!/usr/bin/env python
"""Dump `.explain("formatted")` for named catalog queries to files.

    python tools/dump_plan.py --queries dedup_ngram_blocked --out plans/r18 --suffix _after

Writes <out>/<query><suffix>.txt with the FORMATTED plan (pre-execution,
AdaptiveSparkPlan marked) — the plan-shape evidence (join strategy,
Exchange count, PushedFilters/ReadSchema, codegen spans, Python eval
nodes) for the optimization round's before/after files.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikidata_to_surrealdb_spark.plans.queries import QUERIES  # noqa: E402
from wikidata_to_surrealdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--out", default="plans/r18")
    ap.add_argument("--suffix", default="")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark(app_name="dump_plan")
    spark.sparkContext.setLogLevel("ERROR")
    for name in [n.strip() for n in args.queries.split(",") if n.strip()]:
        df = QUERIES[name].fn(spark, args.sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
