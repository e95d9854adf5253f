#!/usr/bin/env python
"""Isolated re-bench for flagged cross-round timing swings (VERDICT r9 #6).

The suite times ~80 queries back-to-back on a burstable VM, so a flagged
entry (normalized >1.3 vs the previous round) needs a fresh-session,
nothing-concurrent re-measurement before it can be classified as a plan
regression or host drift. This tool times ONLY the named catalog
queries (plus the synthetic z-order/round-robin layout pair with
--layout-pair), best-of-3 after an sf0.001 codegen warm, brackets the
run with bench.py's fixed-work calibration probe, and prints per-query
ratios against a reference record — by default the last COMMITTED
bench_full.json (git show HEAD:bench_full.json), i.e. the number the
driver's round record was built from.

    python tools/isolated_rebench.py --queries layout_zorder_scan,mm_ahash_neardup --layout-pair

Interpretation rule (same as bench.normalize_vs_prev, but here the
probe is trustworthy because the workload is tiny and uniform):
ratio/cal_drift <= ~1.1 in isolation => the suite flag was host/IO
weather; >1.3 reproducing in isolation => a real plan change, go read
the diff of that query's path.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time  # noqa: F401  (kept for interactive use)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from wikidata_to_surrealdb_spark.plans.queries import QUERIES  # noqa: E402
from wikidata_to_surrealdb_spark.session import get_spark  # noqa: E402


def load_reference(repo_dir: str, ref_path: str | None) -> dict:
    if ref_path:
        with open(ref_path) as f:
            return json.load(f)
    out = subprocess.run(
        ["git", "show", "HEAD:bench_full.json"],
        capture_output=True,
        text=True,
        cwd=repo_dir,
    )
    if out.returncode != 0:
        return {}
    try:
        return json.loads(out.stdout)
    except ValueError:
        return {}


# the bench-main-only measurements (not catalog queries) that the
# standing protocol must also be able to re-bench in isolation
# (VERDICT r14 #1): ingest-family probes map to _bench_ingest kwargs,
# the streaming multibatch probes re-run their slice+stream jobs
INGEST_PROBES = {
    "wd_ingest": {},
    "wd_ingest_unique": {"unique_content": True},
    "wd_ingest_skewed": {"skew": True},
    "wd_ingest_10x": {"replication": 200},
    "wd_ingest_10x_bz2": {"replication": 200, "compress": "bz2"},
}
STREAM_PROBES = (
    "stream_incdedup_multibatch",
    "stream_sessionize_multibatch",
    "stream_dedup_multibatch",
)
# the dedup/ER blowup probes share their staged-corpus + timed-body
# implementation with bench.main (module-level in bench.py), so the
# isolated numbers are comparable to the suite record by construction
SCALE_PROBES = ("dedup_minhash_10x",) + bench.ER_PAIR_PROBES


def run_probes(
    spark, probe_names, sf_dir, tmp, reps, timings, probe_info
) -> None:
    """Time the named bench-main probes exactly as bench.main does
    (same warm discipline: codegen warm at sf0.001 + one untimed
    target-scale run before the first timed ingest; slice staging
    untimed for the streaming jobs), best-of-``reps``."""
    import time as _t

    ingest_warmed = False
    for name in probe_names:
        if name in INGEST_PROBES:
            kwargs = dict(INGEST_PROBES[name])
            if not ingest_warmed:
                warm_dir = "/root/testdata/sf0.001"
                if os.path.isdir(warm_dir):
                    for wk in ({}, {"unique_content": True}, {"skew": True}):
                        try:
                            bench._bench_ingest(
                                spark, warm_dir, tmp, replication=1, **wk
                            )
                        except Exception:
                            pass
                bench._bench_ingest(spark, sf_dir, tmp)
                ingest_warmed = True
            info: dict = {}
            if kwargs.get("compress"):
                kwargs["info"] = info
            best, n = float("inf"), 0
            for _ in range(reps):
                s, n = bench._bench_ingest(spark, sf_dir, tmp, **kwargs)
                best = min(best, s)
            timings[name] = round(best, 3)
            probe_info[name] = {
                "entities_per_sec": round(n / best, 1),
                **({"bz2": info} if info else {}),
            }
        elif name == "stream_incdedup_multibatch":
            from wikidata_to_surrealdb_spark.streaming.documents import (
                incremental_dedup_multibatch,
                slice_documents_table,
            )

            doc_sliced = slice_documents_table(
                spark,
                os.path.join(sf_dir, "documents.parquet"),
                os.path.join(tmp, "iso_docs4"),
            )
            best, best_prog = float("inf"), []
            for i in range(reps):
                prog: list = []
                t0 = _t.perf_counter()
                incremental_dedup_multibatch(
                    spark,
                    doc_sliced,
                    os.path.join(tmp, f"iso_incwork_{i}"),
                    threshold=0.1,
                    progress=prog,
                ).collect()
                dt = _t.perf_counter() - t0
                if dt < best:
                    best, best_prog = dt, prog
            timings[name] = round(best, 3)
            probe_info[name] = {"batches": best_prog}
        elif name in STREAM_PROBES:
            from wikidata_to_surrealdb_spark.streaming.events import (
                event_dedup_multibatch,
                sessionize_stateful_multibatch,
                slice_events_table,
            )

            fn_mb = (
                sessionize_stateful_multibatch
                if name == "stream_sessionize_multibatch"
                else event_dedup_multibatch
            )
            ev_sliced = slice_events_table(
                spark,
                os.path.join(sf_dir, "events.parquet"),
                os.path.join(tmp, "iso_ev4"),
            )
            best, best_prog = float("inf"), []
            for _ in range(reps):
                prog = []
                t0 = _t.perf_counter()
                fn_mb(spark, ev_sliced, progress=prog).collect()
                dt = _t.perf_counter() - t0
                if dt < best:
                    best, best_prog = dt, prog
            timings[name] = round(best, 3)
            probe_info[name] = {"batches": best_prog}
        elif name == "dedup_minhash_10x":
            warm_dir = "/root/testdata/sf0.001"
            if os.path.isdir(warm_dir):
                try:
                    bench.time_dedup_minhash_10x(spark, warm_dir)
                except Exception:
                    pass
            timings[name] = bench.time_dedup_minhash_10x(
                spark, sf_dir, reps=reps
            )
        elif name in bench.ER_PAIR_PROBES:
            warm_dir = "/root/testdata/sf0.001"
            if os.path.isdir(warm_dir):
                try:
                    bench.time_er_pairs_probes(spark, warm_dir, [name])
                except Exception:
                    pass
            timings.update(
                bench.time_er_pairs_probes(spark, sf_dir, [name], reps=reps)
            )
        else:
            raise SystemExit(f"unknown probe: {name}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated catalog names (default: the layout pair "
        "unless --probes is given — an EXPLICIT value is always run)",
    )
    ap.add_argument(
        "--probes",
        default="",
        help=(
            "comma-separated bench-main probes (wd_ingest*, "
            "stream_*_multibatch, dedup_minhash_10x, er_pairs_*) to "
            "re-bench in isolation"
        ),
    )
    ap.add_argument(
        "--layout-pair",
        action="store_true",
        help="also time the synthetic layout_scan_zorder/_roundrobin pair",
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--ref",
        default=None,
        help="reference bench_full.json (default: git show HEAD:bench_full.json)",
    )
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    probe_names = [n.strip() for n in args.probes.split(",") if n.strip()]
    if args.queries is None:
        # probes are opt-in heavy: with --probes given and --queries
        # OMITTED, skip the default query pair. An explicitly typed
        # --queries value is always honored (None-default so argparse
        # can tell explicit from omitted — a user asking for both gets
        # both).
        queries_csv = "" if probe_names else "layout_zorder_scan,mm_ahash_neardup"
    else:
        queries_csv = args.queries
    names = [n.strip() for n in queries_csv.split(",") if n.strip()]
    if probe_names:
        bad = [
            n
            for n in probe_names
            if n not in INGEST_PROBES
            and n not in STREAM_PROBES
            and n not in SCALE_PROBES
        ]
        if bad:
            raise SystemExit(f"unknown probes: {bad}")
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown catalog queries: {unknown}")

    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ref = load_reference(repo_dir, args.ref)
    ref_q = ref.get("queries", {}) if isinstance(ref, dict) else {}
    ref_cal = None
    try:
        c = ref["calibration_sec"]
        ref_cal = (float(c["start"]) + float(c["end"])) / 2.0
    except (KeyError, TypeError, ValueError):
        pass
    ref_py_cal = None
    try:
        c = ref["calibration_py_sec"]
        ref_py_cal = (float(c["start"]) + float(c["end"])) / 2.0
    except (KeyError, TypeError, ValueError):
        pass

    # UI on like the main bench: the isolated triage should carry the
    # same shuffle-byte evidence (host-independent) as the suite record
    # it's adjudicating
    spark = get_spark(
        app_name="isolated_rebench",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "20000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    meter = bench.ShuffleMeter(spark)
    shuffle_bytes: dict[str, dict] = {}

    timings: dict[str, float] = {}
    with tempfile.TemporaryDirectory(prefix="wd_isorebench_") as tmp:
        warm_dir = "/root/testdata/sf0.001"
        if os.path.isdir(warm_dir):
            for n in names:
                try:
                    QUERIES[n].fn(spark, warm_dir).collect()
                except Exception:
                    pass
            if args.layout_pair:
                try:
                    bench.time_layout_pair(spark, warm_dir, tmp, {})
                except Exception:
                    pass

        cal_start = bench.calibrate(spark)
        py_cal_start = bench.calibrate_python()
        bench.time_queries(
            spark,
            args.sf_dir,
            names,
            timings,
            reps=args.reps,
            shuffle_bytes=shuffle_bytes,
            meter=meter,
        )
        probe_info: dict[str, dict] = {}
        if probe_names:
            run_probes(
                spark,
                probe_names,
                args.sf_dir,
                tmp,
                args.reps,
                timings,
                probe_info,
            )
        if args.layout_pair:
            pair: dict[str, float] = {}
            for _ in range(max(1, args.reps - 1)):
                one: dict[str, float] = {}
                bench.time_layout_pair(spark, args.sf_dir, tmp, one)
                for k, v in one.items():
                    pair[k] = min(pair.get(k, float("inf")), v)
            timings.update({k: round(v, 3) for k, v in pair.items()})
        cal_end = bench.calibrate(spark)
        py_cal_end = bench.calibrate_python()

    cal = (cal_start + cal_end) / 2.0
    py_cal = (py_cal_start + py_cal_end) / 2.0
    # distinguish "no reference calibration" (None) from "degenerate
    # reference" (<= 0, reported loudly) — and never drop a drift that
    # legitimately rounds to 0.0 (ADVICE r10)
    if ref_cal is None:
        cal_drift = None
    elif not isinstance(ref_cal, (int, float)) or ref_cal <= 0:
        raise SystemExit(
            f"reference calibration is degenerate ({ref_cal!r}); "
            "cannot normalize — fix or remove the reference record"
        )
    else:
        cal_drift = round(cal / ref_cal, 3)
    # the Python-probe twin (VERDICT r16 #2): for is_py_heavy queries
    # the py drift, not the JVM drift, is the host-weather estimator
    py_cal_drift = (
        round(py_cal / ref_py_cal, 3)
        if isinstance(ref_py_cal, (int, float)) and ref_py_cal > 0
        else None
    )
    report = {
        "sf_dir": args.sf_dir,
        "reps": args.reps,
        "calibration_sec": {"start": cal_start, "end": cal_end},
        "cal_drift_vs_ref": cal_drift,
        "calibration_py_sec": {"start": py_cal_start, "end": py_cal_end},
        "py_cal_drift_vs_ref": py_cal_drift,
        "isolated": {},
    }
    if probe_names:
        report["probe_info"] = probe_info
    # byte ratios only against a SAME-SCALE reference: shuffle volume is
    # data-sized, so an sf0.01 re-bench against the sf0.1 committed
    # record would read as a phantom 10x plan change (the same
    # both-present rule as bench.normalize_vs_prev / shuffle_vs_prev)
    ref_sf = ref.get("sf") if isinstance(ref, dict) else None
    run_sf_name = os.path.basename(args.sf_dir.rstrip("/"))
    try:
        run_sf = float(run_sf_name.replace("sf", ""))
    except ValueError:
        run_sf = None
    sf_comparable = ref_sf is not None and run_sf == ref_sf
    ref_sb = ref.get("shuffle_bytes", {}) if isinstance(ref, dict) else {}
    for n, t in timings.items():
        entry: dict = {"sec": t}
        sb = shuffle_bytes.get(n)
        if sb is not None:
            entry["shuffle"] = sb
            old_sb = ref_sb.get(n)
            if (
                sf_comparable
                and isinstance(old_sb, dict)
                and old_sb.get("write", 0) > 0
            ):
                # the byte verdict FIRST: identical bytes on a slow wall
                # is host weather, changed bytes is a plan change
                entry["shuffle_write_ratio"] = round(
                    sb.get("write", 0) / old_sb["write"], 3
                )
        prev = ref_q.get(n)
        if isinstance(prev, (int, float)) and prev > 0 and t > 0:
            entry["ref_sec"] = prev
            entry["nominal_ratio"] = round(t / prev, 3)
            # `is not None`, not truthiness: a drift that rounds to 0.0
            # must be REPORTED (as a division blow-up the reader sees),
            # never silently dropped (ADVICE r10)
            if cal_drift is not None and cal_drift > 0:
                entry["normalized_ratio"] = round(t / prev / cal_drift, 3)
            elif cal_drift is not None:
                entry["normalized_ratio"] = None
                entry["note"] = f"cal_drift degenerate ({cal_drift})"
            if (
                bench.is_py_heavy(n)
                and py_cal_drift is not None
                and py_cal_drift > 0
            ):
                entry["py_normalized_ratio"] = round(
                    t / prev / py_cal_drift, 3
                )
        report["isolated"][n] = entry
    print(json.dumps(report, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
