#!/usr/bin/env python
"""Empirical scaling probe (VERDICT r14 #3): validate the 100x story
with data, not just plan audits.

Stages a ~sf1 dataset by replicating sf0.1 ``--factor`` times with
key remaps that PRESERVE join semantics (orders/customer/lineitem
replicas reference each other's replica, dims stay fixed where the
facts reference them by key), then runs the most expensive non-probe
families once at sf0.1 and once at the scaled dir, recording wall
seconds AND max single-task executorRunTime (status REST taskSummary,
quantile 1.0). Prints a JSON report with per-family scaling exponents

    alpha = ln(T_scaled / T_base) / ln(factor)

alpha <= ~1 in max-task is the "no straggler cliff at scale" signal:
a super-linear max-task exponent means some partition grows faster
than the data and will be the 100 TB bottleneck.

Remap design (why each family's scaled input is honest):
- lineitem/orders: replica r remaps ``*_orderkey -> key*factor + r``
  and ``o_custkey -> key*factor + r`` so each replica joins its own
  customer replica; part/supplier keys unchanged -> per-part/supplier
  fan-in grows with volume, like a real scale-up of fixed catalogs.
- customer: ``c_custkey*factor + r`` (er_resolve's corpus grows 10x
  duplicate-dense — every name has factor-1 more exact copies).
- events: ``event_id*factor + r``, user_id/ts UNCHANGED — events per
  user per horizon grow by the factor, the exact density the trailing
  window decompositions must absorb.
- documents: ``doc_id*factor + r``, text unchanged (duplicate-dense,
  the LSH worst case, same design as bench's dedup_minhash_10x).
- embeddings: ``vec_id*factor + r``, vector unchanged (LSH buckets go
  factor-x denser).

Usage:
    python tools/scaling_probe.py [--factor 10] [--out /tmp/...] \
        [--families tpch_q1,tpch_q5,...] [--keep-staged]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from wikidata_to_surrealdb_spark.plans.queries import QUERIES  # noqa: E402
from wikidata_to_surrealdb_spark.session import get_spark  # noqa: E402

FAMILIES = [
    "tpch_q1",
    "tpch_q5",
    "tpch_q9",
    "dedup_minhash_lsh",
    "er_resolve",
    "sim_knn_join",
    "graph_pagerank",
    "events_trailing_window",
    "events_trailing_window_bounded",
]

# Streaming families (VERDICT r15 #5): multi-trigger jobs whose wall is
# n_batches x per-trigger floor + volume work, so the honest exponent is
# measured on the PER-BATCH time PAST the floor — the floor is estimated
# from the same job at sf0.001 (volume term ~0 there), subtracted from
# the mean per-batch trigger time at each tier, and alpha computed on
# the marginals. A wall-clock alpha over the full job would launder the
# fixed floor into fake sub-linearity.
STREAMING_FAMILIES = [
    "stream_sessionize_multibatch",
    "stream_incdedup_multibatch",
    "stream_funnel_multibatch",
]

_FUNNEL_STEPS = ["view", "click", "purchase"]


def run_streaming_family(spark, name: str, sf_dir: str, work: str):
    """One full multi-batch streaming run of ``name`` against
    ``sf_dir``; returns (wall_sec, per-batch progress rows). Slicing is
    untimed scaffolding (same discipline as bench.py's probes)."""
    from wikidata_to_surrealdb_spark.streaming.documents import (
        incremental_dedup_multibatch,
        slice_documents_table,
    )
    from wikidata_to_surrealdb_spark.streaming.events import (
        funnel_stateful_multibatch,
        sessionize_stateful_multibatch,
        slice_events_table,
    )

    os.makedirs(work, exist_ok=True)
    prog: list = []
    if name == "stream_incdedup_multibatch":
        sliced = slice_documents_table(
            spark,
            os.path.join(sf_dir, "documents.parquet"),
            os.path.join(work, "docs"),
        )
        t0 = time.perf_counter()
        incremental_dedup_multibatch(
            spark,
            sliced,
            os.path.join(work, "incdedup_work"),
            threshold=0.1,
            progress=prog,
        ).collect()
    else:
        sliced = slice_events_table(
            spark,
            os.path.join(sf_dir, "events.parquet"),
            os.path.join(work, "ev"),
        )
        fn = (
            sessionize_stateful_multibatch
            if name == "stream_sessionize_multibatch"
            else None
        )
        t0 = time.perf_counter()
        if fn is not None:
            fn(spark, sliced, progress=prog).collect()
        else:
            funnel_stateful_multibatch(
                spark, sliced, _FUNNEL_STEPS, within_seconds=86400,
                progress=prog,
            ).collect()
    wall = round(time.perf_counter() - t0, 3)
    return wall, prog


def mean_trigger_ms(prog: list) -> float | None:
    ms = [p["trigger_ms"] for p in prog if p.get("trigger_ms")]
    return round(sum(ms) / len(ms), 1) if ms else None

# (key remap columns) per replicated table; None = copy verbatim
COPY_TABLES = ("region", "nation", "supplier", "part")
REMAP = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def stage_scaled(spark, base_dir: str, out_dir: str, factor: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in COPY_TABLES:
        src, dst = f"{base_dir}/{t}.parquet", f"{out_dir}/{t}.parquet"
        spark.read.parquet(src).write.mode("overwrite").parquet(dst)
    rep = spark.range(factor).select(F.col("id").alias("_rep"))
    for t, keys in REMAP.items():
        df = spark.read.parquet(f"{base_dir}/{t}.parquet")
        big = df.crossJoin(rep)
        for k in keys:
            big = big.withColumn(
                k, F.col(k) * F.lit(factor) + F.col("_rep")
            )
        (
            big.drop("_rep")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/{t}.parquet")
        )


class TaskMeter:
    """Max single-task executorRunTime (ms) across the stages executed
    since ``mark()`` — the straggler signal wall time hides. Reads the
    same status REST API as bench.ShuffleMeter; any failure disables
    the meter (diagnostic, must never fail the probe)."""

    def __init__(self, spark):
        self.base = None
        try:
            url = spark.sparkContext.uiWebUrl
            app_id = spark.sparkContext.applicationId
            if url:
                self.base = f"{url}/api/v1/applications/{app_id}/stages"
        except Exception:
            self.base = None

    def _get(self, url: str):
        import urllib.request

        with urllib.request.urlopen(url, timeout=10) as r:
            return json.load(r)

    def mark(self) -> int:
        if self.base is None:
            return -1
        try:
            return max(
                [s["stageId"] for s in self._get(self.base)] + [-1]
            )
        except Exception:
            self.base = None
            return -1

    def max_task_ms_since(self, mark: int) -> float | None:
        if self.base is None:
            return None
        try:
            worst = 0.0
            for s in self._get(self.base):
                if s["stageId"] <= mark or s.get("status") == "SKIPPED":
                    continue
                url = (
                    f"{self.base}/{s['stageId']}/"
                    f"{s.get('attemptId', 0)}/taskSummary?quantiles=1.0"
                )
                try:
                    summ = self._get(url)
                except Exception:
                    continue  # stage may have no tasks / been evicted
                run = summ.get("executorRunTime") or [0.0]
                worst = max(worst, float(run[-1]))
            return worst
        except Exception:
            self.base = None
            return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/tmp/spark_graft_scaled_sf1")
    ap.add_argument("--families", default=",".join(FAMILIES))
    ap.add_argument(
        "--keep-staged",
        action="store_true",
        help="leave the scaled parquet dir on disk for reruns",
    )
    ap.add_argument(
        "--streaming",
        default="",
        help="comma list from STREAMING_FAMILIES to probe with the "
        "floor-corrected per-batch alpha (or 'all')",
    )
    args = ap.parse_args()
    names = [n.strip() for n in args.families.split(",") if n.strip()]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown catalog queries: {unknown}")

    spark = get_spark(
        app_name="scaling_probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "20000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    meter = TaskMeter(spark)

    # --keep-staged is a REUSE contract, not just a no-delete flag:
    # staging (a factor-x rewrite of six tables) dominates the probe's
    # cost, so a rerun against a kept dir skips it when every table
    # already landed (the _marker records base+factor so a kept dir
    # from a different configuration is never silently reused)
    marker = os.path.join(args.out, "_staged.json")
    want = {"base": os.path.abspath(args.base), "factor": args.factor}
    reuse = False
    if args.keep_staged and os.path.exists(marker):
        try:
            with open(marker) as f:
                reuse = json.load(f) == want
        except (OSError, ValueError):
            reuse = False
    if reuse:
        staging_sec = 0.0
        print("# reusing staged dir", args.out, file=sys.stderr)
    else:
        t0 = time.perf_counter()
        stage_scaled(spark, args.base, args.out, args.factor)
        staging_sec = round(time.perf_counter() - t0, 1)
        with open(marker, "w") as f:
            json.dump(want, f)

    # codegen warm outside every timed region
    warm_dir = "/root/testdata/sf0.001"
    for n in names:
        try:
            QUERIES[n].fn(spark, warm_dir).collect()
        except Exception:
            pass

    report: dict = {
        "factor": args.factor,
        "base": args.base,
        "staging_sec": staging_sec,
        "families": {},
    }
    ln_f = math.log(args.factor)
    for n in names:
        row: dict = {}
        for tier, sf_dir in (("base", args.base), ("scaled", args.out)):
            mark = meter.mark()
            t0 = time.perf_counter()
            try:
                QUERIES[n].fn(spark, sf_dir).collect()
                wall = round(time.perf_counter() - t0, 3)
            except Exception as e:
                row[tier] = {"err": str(e)[:200]}
                continue
            mt = meter.max_task_ms_since(mark)
            row[tier] = {"wall_sec": wall, "max_task_ms": mt}
        b, s = row.get("base", {}), row.get("scaled", {})

        # `is not None` + explicit degenerate marker, never truthiness:
        # a legitimate measurement that rounds to 0.0 must be REPORTED
        # as degenerate, not silently dropped (the ADVICE r10 rule the
        # isolated re-bench already follows)
        def alpha(key: str) -> float | str | None:
            bv, sv = b.get(key), s.get(key)
            if bv is None or sv is None:
                return None  # a tier errored; its row carries the err
            if bv <= 0 or sv <= 0:
                return f"degenerate ({key}: base={bv} scaled={sv})"
            return round(math.log(sv / bv) / ln_f, 3)

        for out_key, src_key in (
            ("alpha_wall", "wall_sec"),
            ("alpha_max_task", "max_task_ms"),
        ):
            a = alpha(src_key)
            if a is not None:
                row[out_key] = a
        report["families"][n] = row
        print(f"# {n}: {json.dumps(row)}", file=sys.stderr)

    snames = (
        list(STREAMING_FAMILIES)
        if args.streaming.strip() == "all"
        else [n.strip() for n in args.streaming.split(",") if n.strip()]
    )
    bad = [n for n in snames if n not in STREAMING_FAMILIES]
    if bad:
        raise SystemExit(f"unknown streaming families: {bad}")
    if snames:
        import tempfile

        report["streaming"] = {}
        floor_dir = "/root/testdata/sf0.001"
        for n in snames:
            row = {}
            # per-trigger floor: the same job on a tiny corpus is all
            # floor (volume term ~0 at 1k rows)
            _, fprog = run_streaming_family(
                spark, n, floor_dir, tempfile.mkdtemp(prefix="scp_floor_")
            )
            floor = mean_trigger_ms(fprog)
            row["floor_batch_ms"] = floor
            for tier, sf_dir in (("base", args.base), ("scaled", args.out)):
                try:
                    wall, prog = run_streaming_family(
                        spark, n, sf_dir, tempfile.mkdtemp(prefix="scp_str_")
                    )
                except Exception as e:
                    row[tier] = {"err": str(e)[:200]}
                    continue
                row[tier] = {
                    "wall_sec": wall,
                    "n_batches": len(prog),
                    "mean_batch_ms": mean_trigger_ms(prog),
                }
            b, s = row.get("base", {}), row.get("scaled", {})
            bm, sm = b.get("mean_batch_ms"), s.get("mean_batch_ms")
            if floor is not None and bm is not None and sm is not None:
                mb, ms_ = bm - floor, sm - floor
                if mb > 0 and ms_ > 0:
                    row["alpha_batch_marginal"] = round(
                        math.log(ms_ / mb) / ln_f, 3
                    )
                else:
                    row["alpha_batch_marginal"] = (
                        f"degenerate (marginal base={round(mb,1)} "
                        f"scaled={round(ms_,1)} ms — floor dominates)"
                    )
            if bm is not None and sm is not None:
                # floor-FREE difference measure: with equal batch
                # counts the per-trigger floor cancels exactly in the
                # tier difference, so under a linear volume model
                # T = floor + v*rows the base volume term is
                # delta/(factor-1). Robust to a contaminated sf0.001
                # floor estimate (e.g. first-trigger store creation):
                # delta <= 0 means the volume term is below host noise
                # at this factor — floor-dominated, trivially
                # sub-linear; a positive v with scaled mean ~
                # floor' + factor*v is consistent with a LINEAR
                # per-batch volume term (can't resolve beta != 1 with
                # two volume points; linear is the conservative read).
                row["batch_ms_delta"] = round(sm - bm, 1)
                row["linear_volume_term_ms"] = round(
                    (sm - bm) / (args.factor - 1), 1
                )
            print(f"# {n}: {json.dumps(row)}", file=sys.stderr)
            report["streaming"][n] = row

    if not args.keep_staged:
        shutil.rmtree(args.out, ignore_errors=True)
    print(json.dumps(report, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
