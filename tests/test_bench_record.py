"""Bench harness record-keeping guards (VERDICT r06 #1/#7).

Round 6's permanent bench record was lost to stdout-tail truncation
(`BENCH_r06.json: "parsed": null`), and round 6 added a per-query
failure branch (`timings[name] = -1.0`) with no test.  These tests pin
both behaviors so a refactor can't silently revert them:

* a raising query records -1.0 and the rest of the suite still runs;
* the emitted JSON line is compact, parseable, fits the driver's
  2000-char tail window (or ends with a headline line that does), and
  the full record lands in bench_full.json.
"""

from __future__ import annotations

import json
from types import SimpleNamespace

import bench


class _FakeDF:
    def collect(self):
        return [1]


def _good(spark, sf_dir):
    return _FakeDF()


def _bad(spark, sf_dir):
    raise RuntimeError("synthetic bench failure")


class _FakeCatalog:
    def clearCache(self):
        pass


class _FakeSpark:
    catalog = _FakeCatalog()


def test_failing_query_records_minus_one_and_suite_continues(capsys):
    qmap = {
        "ok_before": SimpleNamespace(fn=_good),
        "boom": SimpleNamespace(fn=_bad),
        "ok_after": SimpleNamespace(fn=_good),
    }
    timings: dict[str, float] = {}
    bench.time_queries(
        _FakeSpark(),
        "/nonexistent",
        ["ok_before", "boom", "ok_after"],
        timings,
        reps=1,
        queries=qmap,
    )
    assert timings["boom"] == -1.0
    assert timings["ok_before"] >= 0.0
    assert timings["ok_after"] >= 0.0  # suite continued past the failure
    assert "BENCH FAIL boom" in capsys.readouterr().err


def test_emit_record_compact_line_and_full_file(tmp_path, capsys):
    record = {
        "queries": {"q1": 0.5, "q2": -1.0},
        "stream_batches": {"s": {"n": 2, "ms": 10}},
        "metric": "m",
        "value": 0.5,
        "unit": "sec",
        "sf": 0.01,
        "ingest_entities_per_sec": 1.0,
        "calibration_sec": {"start": 0.1, "end": 0.1},
    }
    detail = {"s": [{"batch_id": 0, "trigger_ms": 4}, {"batch_id": 1, "trigger_ms": 6}]}
    out = tmp_path / "bench_full.json"
    line = bench.emit_record(record, detail, out_path=str(out))
    # printed line: compact separators, parses back to the record
    assert ", " not in line and ": " not in line
    assert json.loads(line) == record
    printed = capsys.readouterr().out.strip().splitlines()
    assert json.loads(printed[0]) == record
    # full-detail file keeps the per-batch breakdown
    full = json.loads(out.read_text())
    assert full["stream_batches_detail"] == detail
    assert full["queries"] == record["queries"]


def test_emit_record_oversized_line_appends_fitted_tail(tmp_path, capsys):
    # a queries map big enough to blow the tail budget must be followed
    # by a final FITTED line that fits the window and still carries the
    # per-query map for every BENCH_QUERIES entry (VERDICT r18 #1: the
    # old headline-only fallback left PERF per_query empty); probe
    # entries outside the suite may be dropped to a bench_full pointer
    record = {
        "queries": {name: 12.345 for name in bench.BENCH_QUERIES},
        "stream_batches": {},
        "metric": "m",
        "value": 24.6,
        "unit": "sec",
        "sf": 0.1,
        "ingest_entities_per_sec": 66742.0,
        "ingest_10x_entities_per_sec": 180882.0,
        "calibration_sec": {"start": 0.1, "end": 0.1},
    }
    # probe-tier entries big enough that the full map cannot fit
    for i in range(60):
        record["queries"][f"very_long_probe_entry_name_{i:04d}"] = 0.123
    bench.emit_record(record, None, out_path=str(tmp_path / "bench_full.json"))
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    tail = json.loads(lines[-1])
    assert len(lines[-1]) <= bench.TAIL_BUDGET
    assert tail["value"] == 24.6
    assert tail["ingest_entities_per_sec"] == 66742.0
    # every suite query survives on the final line (2-decimal precision
    # is acceptable; absence is not)
    for name in bench.BENCH_QUERIES:
        assert tail["queries"][name] in (12.345, 12.34, 12.35)
    assert tail["probes_in"] == "bench_full.json"


def test_fit_tail_line_prefers_full_map_when_it_fits():
    # when the complete map fits the window, no entry is dropped and no
    # pointer is emitted
    record = {
        "queries": {"q1": 1.234, "wd_probe_x": 0.5},
        "metric": "m",
        "value": 2.0,
        "unit": "sec",
        "sf": 0.1,
        "ingest_entities_per_sec": 1000.0,
        "smoke": {"n": 3, "fail": 0, "regressed": 0},
    }
    tail = json.loads(bench.fit_tail_line(record))
    assert tail["queries"] == {"q1": 1.234, "wd_probe_x": 0.5}
    assert "probes_in" not in tail
    assert tail["smoke"] == {"n": 3, "fail": 0, "regressed": 0}


def test_normalize_vs_prev_classifies_host_drift(tmp_path, capsys):
    # round-7 shape: host ran 2x slower — most queries nominally 2x
    # slower => the MEDIAN nominal ratio (the primary drift estimator;
    # the CPU probe over-corrects on mixed workloads, measured r8)
    # is 2.0 and the flat queries normalize to 1.0; one query genuinely
    # 3x slower => normalized 1.5, the only flagged regression
    prev = {
        "queries": {
            "flat1": 1.0,
            "flat2": 4.0,
            "regressed": 1.0,
            "gone": 2.0,
            "bad": -1.0,
        },
        "calibration_sec": {"start": 0.1, "end": 0.1},
        "sf": 0.1,
    }
    cur = {
        "queries": {
            "flat1": 2.0,
            "flat2": 8.0,
            "regressed": 3.0,
            "new": 1.0,
            "bad": 0.5,
        },
        "calibration_sec": {"start": 0.2, "end": 0.2},
        "metric": "m",
        "value": 5.0,
        "unit": "sec",
        "sf": 0.1,
    }
    norm = bench.normalize_vs_prev(cur, prev)
    assert norm["host_drift_ratio"] == 2.0  # the independent CPU probe
    assert norm["median_nominal_ratio"] == 2.0
    assert norm["normalized_vs_prev"] == {
        "flat1": 1.0,
        "flat2": 1.0,
        "regressed": 1.5,
    }
    assert norm["normalized_worst"] == {"query": "regressed", "ratio": 1.5}
    assert norm["normalized_regressed"] == ["regressed"]
    # no usable previous record => empty merge, never raises
    assert bench.normalize_vs_prev(cur, None) == {}
    assert bench.normalize_vs_prev(cur, {"queries": {}}) == {}
    # a prev record at a different scale factor is not comparable
    assert bench.normalize_vs_prev(cur, {**prev, "sf": 0.001}) == {}
    assert bench.normalize_vs_prev(cur, {**prev, "sf": 0.1}) != {}
    # a legacy/smoke prev record MISSING sf is incomparable too (not
    # silently assumed to match the current scale)
    no_sf = {k: v for k, v in prev.items() if k != "sf"}
    assert bench.normalize_vs_prev(cur, no_sf) == {}
    # ... and symmetrically when the CURRENT record lacks sf
    cur_no_sf = {k: v for k, v in cur.items() if k != "sf"}
    assert bench.normalize_vs_prev(cur_no_sf, prev) == {}
    # BOTH missing is still incomparable: the actual scales are unknown
    # and may differ (r9 ADVICE — None == None must not pass the guard)
    assert bench.normalize_vs_prev(cur_no_sf, no_sf) == {}

    # end-to-end through emit_record: prev on disk is read BEFORE the
    # overwrite, the full record carries the map, the printed line only
    # the 2-field headline
    out = tmp_path / "bench_full.json"
    out.write_text(json.dumps(prev))
    line = bench.emit_record(dict(cur), None, out_path=str(out))
    printed = json.loads(line)
    assert printed["host_drift"] == 2.0
    assert printed["norm_worst"] == "regressed:1.5"
    assert "normalized_vs_prev" not in printed
    full = json.loads(out.read_text())
    assert full["normalized_vs_prev"] == {
        "flat1": 1.0,
        "flat2": 1.0,
        "regressed": 1.5,
    }
    assert full["host_drift_ratio"] == 2.0
    assert full["median_nominal_ratio"] == 2.0
    capsys.readouterr()


def test_normalize_vs_prev_python_probe_families(tmp_path):
    """VERDICT r16 #2: Python-heavy families normalize against the
    Python/numpy probe, whose drift can diverge from the JVM probe's
    (r15 mm_decode_jpeg; r16's contradictory signature). Shape: the JVM
    probe reads calm (1.0x) while Python workers ran 3x slower — a
    py-heavy query nominally 3x slower is FLAT under py normalization
    (host), while one nominally 6x slower survives as a real flag.
    JVM-side queries are untouched by the py fields."""
    prev = {
        "queries": {
            "tpch_q1": 1.0,
            "flat2": 1.0,
            "flat3": 1.0,
            "mm_decode_jpeg": 2.0,
            "dedup_semantic": 1.0,
        },
        "calibration_sec": {"start": 0.1, "end": 0.1},
        "calibration_py_sec": {"start": 0.2, "end": 0.2},
        "sf": 0.1,
    }
    cur = {
        "queries": {
            "tpch_q1": 1.0,
            "flat2": 1.0,
            "flat3": 1.0,
            "mm_decode_jpeg": 6.0,
            "dedup_semantic": 6.0,
        },
        "calibration_sec": {"start": 0.1, "end": 0.1},
        "calibration_py_sec": {"start": 0.6, "end": 0.6},
        "sf": 0.1,
    }
    norm = bench.normalize_vs_prev(cur, prev)
    assert norm["python_drift_ratio"] == 3.0
    assert norm["host_drift_ratio"] == 1.0
    # median nominal is 1.0 (three flat JVM queries), so BOTH py-heavy
    # queries flag under the median normalization ...
    assert set(norm["normalized_regressed"]) == {
        "mm_decode_jpeg",
        "dedup_semantic",
    }
    # ... but the py probe separates throttling from regression:
    # 3x nominal / 3x py drift = flat; 6x nominal / 3x = real
    assert norm["py_normalized_vs_prev"] == {
        "mm_decode_jpeg": 1.0,
        "dedup_semantic": 2.0,
    }
    assert norm["py_normalized_regressed"] == ["dedup_semantic"]
    # JVM-side queries never appear in the py map
    assert "tpch_q1" not in norm["py_normalized_vs_prev"]
    # a reference without the py probe (pre-r17 records) degrades to
    # the median-only fields, never raises
    old_ref = {k: v for k, v in prev.items() if k != "calibration_py_sec"}
    norm2 = bench.normalize_vs_prev(cur, old_ref)
    assert "python_drift_ratio" not in norm2
    assert "normalized_vs_prev" in norm2


def test_isolated_rebench_probe_registry_matches_bench():
    """The isolated-rebench tool must be able to re-run every
    bench-main-only probe the suite records (the r16 flags included two
    the tool couldn't run in isolation): its scale-probe registry stays
    derived from bench's own probe set, and the shared timing bodies
    are the module-level bench functions, not copies."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "isolated_rebench",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "isolated_rebench.py",
        ),
    )
    ir = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ir)
    assert set(ir.SCALE_PROBES) == {"dedup_minhash_10x", *bench.ER_PAIR_PROBES}
    assert set(bench.ER_PAIR_PROBES) == {
        "er_pairs_1x_multipass",
        "er_pairs_4x_nation",
        "er_pairs_4x_multipass",
    }
    assert callable(bench.time_dedup_minhash_10x)
    assert callable(bench.time_er_pairs_probes)


def test_is_py_heavy_classification():
    assert bench.is_py_heavy("mm_decode_png")
    assert bench.is_py_heavy("dedup_semantic")
    assert bench.is_py_heavy("stream_sessionize_stateful")
    # masked-NFC text_clean and the persisted-index FTS serving paths
    # are JVM-dominated by design
    assert not bench.is_py_heavy("text_clean")
    assert not bench.is_py_heavy("b14_fts_indexed")
    assert not bench.is_py_heavy("tpch_q5")


def test_current_suite_final_line_fits_tail_window(tmp_path, capsys):
    # with the real BENCH_QUERIES list and realistic timing widths, the
    # FINAL printed line (the full record if it fits, else the fitted
    # tail line) must be valid JSON inside the driver's 2000-char tail
    # capture and carry the headline fields AND the per-query suite map
    record = {
        "queries": {name: 12.345 for name in bench.BENCH_QUERIES},
        "stream_batches": {
            "stream_sessionize_multibatch": {"n": 4, "ms": 1234},
            "stream_dedup_multibatch": {"n": 4, "ms": 1234},
        },
        "metric": f"suite wall ({len(bench.BENCH_QUERIES)}q+ingest+streaming)",
        "value": 123.456,
        "unit": "sec",
        "query_suite_sec": 98.765,
        "deliberate_probes_sec": 24.691,
        "sf": 0.1,
        "ingest_entities_per_sec": 66742.1,
        "ingest_10x_entities_per_sec": 180882.1,
        "calibration_sec": {"start": 0.123, "end": 0.123},
        "smoke": {
            "n": bench.SMOKE_TIER_SIZE,
            "fail": 0,
            "regressed": 2,
            "worst": "a_realistically_long_query_name:1.987",
        },
    }
    # extra entries main() adds outside BENCH_QUERIES
    for name in (
        "wd_ingest",
        "wd_ingest_unique",
        "wd_ingest_10x",
        "dedup_minhash_10x",
        "stream_sessionize_multibatch",
        "stream_dedup_multibatch",
        "layout_scan_zorder",
        "layout_scan_roundrobin",
        "fts_index_build",
    ):
        record["queries"][name] = 12.345
    bench.emit_record(record, None, out_path=str(tmp_path / "b.json"))
    final = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(final) <= bench.TAIL_BUDGET, (
        f"final bench line is {len(final)} chars — over the driver tail "
        "budget; the fitted-tail fallback in emit_record must kick in"
    )
    tail = json.loads(final)
    for key in (
        "value",
        "sf",
        # the baseline-gate rate must always survive the fallback
        "ingest_entities_per_sec",
        # VERDICT r14 #4: the split headline must survive the fallback
        "query_suite_sec",
        "deliberate_probes_sec",
    ):
        assert key in tail, final
    # VERDICT r18 #1: so must the per-query suite map
    for name in bench.BENCH_QUERIES:
        assert name in tail["queries"], name
    # the full query map stays recoverable from the bench_full.json file
    full = json.loads((tmp_path / "b.json").read_text())
    assert full["queries"] == record["queries"]


def test_adversarial_probe_variant_builders(tmp_path):
    """tools/adversarial_probe.py's corpus builders: every variant
    writes a loadable 10-table dir; injections land on the documented
    id residues (deterministic, so tool findings reproduce)."""
    import os
    import sys

    import duckdb

    sys.path.insert(0, os.path.join(os.path.dirname(bench.__file__), "tools"))
    import adversarial_probe as ap

    src = "/root/testdata/sf0.001"
    for variant in sorted(ap.DOC_SQL):
        dst = tmp_path / variant
        dst.mkdir()
        ap.build_variant(src, str(dst), variant)
        con = duckdb.connect()
        for t in ap.TABLES:
            assert (dst / f"{t}.parquet").exists(), (variant, t)
        n = con.sql(
            f"SELECT count(*) FROM '{dst}/documents.parquet'"
        ).fetchone()[0]
        base = con.sql(
            f"SELECT count(*) FROM '{src}/documents.parquet'"
        ).fetchone()[0]
        if variant == "dupdense":
            # the duplicate-density variant REPLICATES by design: x4
            # documents (2 exact copies + 1 near-copy per row, fresh
            # distinct ids), events untouched
            assert n == 4 * base, variant
            distinct = con.sql(
                f"SELECT count(DISTINCT doc_id) FROM '{dst}/documents.parquet'"
            ).fetchone()[0]
            src_distinct = con.sql(
                f"SELECT count(DISTINCT doc_id) FROM '{src}/documents.parquet'"
            ).fetchone()[0]
            assert distinct == 4 * src_distinct, variant
        else:
            assert n == base, variant  # injection never drops rows
        if variant == "null":
            nulls = con.sql(
                f"SELECT count(*) FROM '{dst}/documents.parquet' "
                "WHERE text IS NULL"
            ).fetchone()[0]
            assert nulls > 0
        if variant == "numeric":
            nonfinite = con.sql(
                f"SELECT count(*) FROM '{dst}/events.parquet' "
                "WHERE isnan(value) OR isinf(value)"
            ).fetchone()[0]
            assert nonfinite > 0
        if variant == "unicode":
            uni = con.sql(
                f"SELECT count(*) FROM '{dst}/documents.parquet' "
                "WHERE octet_length(encode(text)) > length(text)"
            ).fetchone()[0]
            assert uni > 0
        if variant == "hotkey":
            hot_ev = con.sql(
                f"SELECT count(*) FILTER (user_id = 777)::DOUBLE / count(*) "
                f"FROM '{dst}/events.parquet'"
            ).fetchone()[0]
            assert hot_ev > 0.5  # one user dominates the stream
            hot_src = con.sql(
                f"SELECT count(*) FILTER (source = 'hotsource')::DOUBLE / count(*) "
                f"FROM '{dst}/documents.parquet'"
            ).fetchone()[0]
            assert hot_src > 0.5
            # text/ids untouched — divergence on this variant is a
            # key-handling bug, never a content effect
            same_text = con.sql(
                f"SELECT count(*) FROM '{dst}/documents.parquet' d "
                f"JOIN '{src}/documents.parquet' s USING (doc_id) "
                f"WHERE d.text IS DISTINCT FROM s.text"
            ).fetchone()[0]
            assert same_text == 0
        con.close()
    # normalize: column-name order (a before b), float formatting,
    # NULL/NaN forms, row sort ('' < 'nan')
    rows = [(2.0, None), (1.0, float("nan"))]
    assert ap.normalize(rows, ["b", "a"]) == [
        ("", "2.000000"),
        ("nan", "1.000000"),
    ]


def test_smoke_candidates_exclude_main_tier_and_aliases():
    from wikidata_to_surrealdb_spark.plans.queries import QUERIES

    cands = bench.smoke_candidates()
    assert not set(cands) & set(bench.BENCH_QUERIES)
    assert all("alias" not in QUERIES[n].tags for n in cands)
    # every non-alias catalog query is timed SOMEWHERE: main tier,
    # smoke rotation, or a dedicated probe (SMOKE_EXCLUDE — each entry
    # must correspond to a suite timing under another name)
    non_alias = {n for n, s in QUERIES.items() if "alias" not in s.tags}
    assert (
        set(cands)
        | (set(bench.BENCH_QUERIES) & non_alias)
        | bench.SMOKE_EXCLUDE
    ) == non_alias
    assert bench.SMOKE_EXCLUDE <= non_alias  # no dangling exclusions


def test_smoke_rotation_covers_catalog_within_staleness_budget():
    """The done-criterion from VERDICT r9 #1: no catalog query may go
    >4 rounds without a timing. The rotation revisits every candidate
    within ceil(candidates/size) epochs — assert that stays <= 4 so
    catalog growth can't silently outpace the smoke tier."""
    import math

    n = len(bench.smoke_candidates())
    assert math.ceil(n / bench.SMOKE_TIER_SIZE) <= 4, (
        f"{n} smoke candidates at {bench.SMOKE_TIER_SIZE}/run "
        "exceeds the 4-round bench-staleness budget — raise "
        "SMOKE_TIER_SIZE or move queries into the main tier"
    )


def test_select_smoke_tier_never_timed_first_then_oldest():
    cands = bench.smoke_candidates()
    assert len(cands) > bench.SMOKE_TIER_SIZE  # rotation is meaningful
    # empty history: catalog order, first SIZE
    assert bench.select_smoke_tier({}) == cands[: bench.SMOKE_TIER_SIZE]
    # mark the first SIZE as timed at epoch 1: the NEXT slice rotates in
    hist = {n: {"epoch": 1, "sec": 0.5, "cal": 1.0} for n in cands[: bench.SMOKE_TIER_SIZE]}
    nxt = bench.select_smoke_tier(hist)
    assert nxt == cands[bench.SMOKE_TIER_SIZE : 2 * bench.SMOKE_TIER_SIZE] + cands[
        : max(0, bench.SMOKE_TIER_SIZE - (len(cands) - bench.SMOKE_TIER_SIZE))
    ]
    # oldest epoch wins over catalog position
    hist = {n: {"epoch": i + 2, "sec": 0.5} for i, n in enumerate(cands)}
    hist[cands[-1]] = {"epoch": 1, "sec": 0.5}
    assert bench.select_smoke_tier(hist)[0] == cands[-1]
    # malformed history entries sort as never-timed, not a crash
    assert bench.select_smoke_tier({cands[0]: "garbage"})[0] == cands[0]


def test_build_smoke_record_history_ratios_and_flags():
    prev = {
        "bench_epoch": 3,
        "smoke_history": {
            "flat": {"epoch": 1, "sec": 1.0, "cal": 1.0, "sf": 0.1},
            "slow": {"epoch": 2, "sec": 1.0, "cal": 1.0, "sf": 0.1},
            "untouched": {"epoch": 2, "sec": 9.9, "cal": 1.0, "sf": 0.1},
            "was_failed": {"epoch": 1, "sec": -1.0, "cal": 1.0, "sf": 0.1},
            # a locally-written timing at a different scale factor —
            # must be SKIPPED from ratios, not compared (ADVICE r10)
            "off_scale": {"epoch": 2, "sec": 0.1, "cal": 1.0, "sf": 0.001},
            # pre-sf-field legacy entry: unknown scale, also skipped
            "legacy": {"epoch": 2, "sec": 1.0, "cal": 1.0},
        },
    }
    timings = {
        "flat": 1.1,
        "slow": 2.0,
        "fresh": 0.3,
        "boom": -1.0,
        "was_failed": 0.7,
        "off_scale": 0.1,
        "legacy": 1.0,
    }
    full, headline = bench.build_smoke_record(timings, prev, cal_avg=1.25, sf=0.1)
    assert full["bench_epoch"] == 4
    assert full["smoke_tier"] == timings
    # history: every timed entry stamped at the new epoch (failures
    # too — the attempt happened), untouched entries carried forward;
    # entries now record the scale factor they were timed at
    assert full["smoke_history"]["flat"] == {
        "epoch": 4, "sec": 1.1, "cal": 1.25, "cal_py": None, "sf": 0.1
    }
    assert full["smoke_history"]["boom"]["sec"] == -1.0
    assert full["smoke_history"]["untouched"] == prev["smoke_history"]["untouched"]
    # ratios only where BOTH timings are positive AND both scale
    # factors are present and equal; epoch gap recorded
    assert set(full["smoke_vs_last"]) == {"flat", "slow"}
    assert full["smoke_sf_skipped"] == ["legacy", "off_scale"]
    assert full["smoke_vs_last"]["slow"] == {
        "ratio": 2.0,
        "epochs_ago": 2,
        "prev_cal": 1.0,
        "cal": 1.25,
    }
    assert full["smoke_regressed"] == ["slow"]
    assert headline == {"n": 7, "fail": 1, "regressed": 1, "worst": "slow:2.0"}
    # no previous record: epoch 1, no ratios, headline has no worst
    full0, head0 = bench.build_smoke_record({"a": 0.5}, None, cal_avg=1.0)
    assert full0["bench_epoch"] == 1
    assert full0["smoke_vs_last"] == {}
    assert "worst" not in head0
    # current run with no sf: nothing is comparable, everything skips
    fullx, _ = bench.build_smoke_record({"flat": 1.0}, prev, cal_avg=1.0)
    assert fullx["smoke_vs_last"] == {}
    assert fullx["smoke_sf_skipped"] == ["flat"]


def test_emit_record_extra_full_stays_off_printed_line(tmp_path, capsys):
    record = {
        "queries": {"q1": 0.5},
        "metric": "m",
        "value": 0.5,
        "unit": "sec",
        "sf": 0.01,
        "calibration_sec": {"start": 0.1, "end": 0.1},
        "smoke": {"n": 1, "fail": 0, "regressed": 0},
    }
    extra = {
        "bench_epoch": 7,
        "smoke_tier": {"x": 0.2},
        "smoke_history": {"x": {"epoch": 7, "sec": 0.2, "cal": 0.1}},
        "smoke_vs_last": {},
        "smoke_regressed": [],
    }
    out = tmp_path / "bench_full.json"
    line = bench.emit_record(dict(record), None, out_path=str(out), extra_full=extra)
    printed = json.loads(line)
    assert "smoke_history" not in printed and "smoke_tier" not in printed
    assert printed["smoke"] == {"n": 1, "fail": 0, "regressed": 0}
    full = json.loads(out.read_text())
    assert full["bench_epoch"] == 7
    assert full["smoke_history"]["x"]["sec"] == 0.2


def test_shuffle_vs_prev_classifies_regressions():
    """r11: byte-level consult for wall-time flags — unchanged shuffle
    bytes on a flagged query reads 'host-or-data', changed bytes read
    'plan-change', missing bytes read 'no-bytes'."""
    prev = {
        "sf": 0.1,
        "shuffle_bytes": {
            "flat": {"write": 1000, "read": 900},
            "grew": {"write": 1000, "read": 900},
            "vanished": {"write": 1000, "read": 0},
            "zero": {"write": 0, "read": 0},
        },
    }
    cur = {
        "flat": {"write": 1005, "read": 900},      # within 10%
        "grew": {"write": 2000, "read": 1800},     # doubled
        "vanished": {"write": 0, "read": 0},       # shuffle disappeared
        "zero": {"write": 0, "read": 0},           # never shuffled
        "fresh": {"write": 5, "read": 5},          # no prev entry
    }
    out = bench.shuffle_vs_prev(
        cur, prev, 0.1, ["flat", "grew", "vanished", "unbenched"]
    )
    assert out["shuffle_changed"] == ["grew", "vanished"]
    assert out["regressed_shuffle_verdict"] == {
        "flat": "host-or-data",
        "grew": "plan-change",
        "vanished": "plan-change",
        "unbenched": "no-bytes",
    }
    assert out["shuffle_vs_prev"]["grew"]["write_ratio"] == 2.0
    assert out["shuffle_vs_prev"]["zero"]["write_ratio"] == 1.0
    assert out["shuffle_vs_prev"]["vanished"]["write_ratio"] is None
    assert "fresh" not in out["shuffle_vs_prev"]
    # guards: sf mismatch / missing prev map / empty cur => {}
    assert bench.shuffle_vs_prev(cur, prev, 0.01, []) == {}
    assert bench.shuffle_vs_prev(cur, {"sf": 0.1}, 0.1, []) == {}
    assert bench.shuffle_vs_prev({}, prev, 0.1, []) == {}
    assert bench.shuffle_vs_prev(cur, None, 0.1, []) == {}


def test_emit_record_surfaces_spilled_queries(tmp_path, capsys):
    """r13 memory posture: a query spilling at bench scale must land in
    full['spilled_queries'] AND on the printed headline — never hidden
    inside the per-query shuffle map. Zero-spill runs record the empty
    list (the gate's green state is explicit)."""
    base = {
        "queries": {"q1": 0.5, "q2": 0.6},
        "metric": "m",
        "value": 1.1,
        "unit": "sec",
        "sf": 0.01,
        "calibration_sec": {"start": 0.1, "end": 0.1},
    }
    sb = {
        "q1": {"write": 10, "read": 10, "stages": 2, "peak_mem": 100},
        "q2": {
            "write": 10,
            "read": 10,
            "stages": 2,
            "peak_mem": 100,
            "disk_spill": 4096,
            "mem_spill": 0,
        },
    }
    out = tmp_path / "bench_full.json"
    line = bench.emit_record(
        dict(base), out_path=str(out), extra_full={"shuffle_bytes": sb}
    )
    full = json.loads(out.read_text())
    assert full["spilled_queries"] == ["q2"]
    assert json.loads(line)["spilled"] == ["q2"]
    capsys.readouterr()

    clean_sb = {q: {k: v for k, v in d.items() if "spill" not in k}
                for q, d in sb.items()}
    out2 = tmp_path / "bench_full2.json"
    line2 = bench.emit_record(
        dict(base), out_path=str(out2), extra_full={"shuffle_bytes": clean_sb}
    )
    full2 = json.loads(out2.read_text())
    assert full2["spilled_queries"] == []
    assert "spilled" not in json.loads(line2)
    capsys.readouterr()


def test_scaling_probe_remap_preserves_joins(spark, tmp_path):
    """tools/scaling_probe.py stage_scaled: the x-factor replication
    must preserve join semantics — every scaled lineitem row still
    finds its order, every scaled order its customer, and row counts
    grow by exactly the factor (dims copied verbatim)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(bench.__file__), "tools"))
    from scaling_probe import COPY_TABLES, REMAP, stage_scaled

    base = "/root/testdata/sf0.001"
    out = str(tmp_path / "scaled")
    stage_scaled(spark, base, out, factor=3)

    import pyspark.sql.functions as F

    for t in list(REMAP) + list(COPY_TABLES):
        n0 = spark.read.parquet(f"{base}/{t}.parquet").count()
        n1 = spark.read.parquet(f"{out}/{t}.parquet").count()
        want = n0 * 3 if t in REMAP else n0
        assert n1 == want, f"{t}: {n1} != {want}"

    li = spark.read.parquet(f"{out}/lineitem.parquet")
    od = spark.read.parquet(f"{out}/orders.parquet")
    cu = spark.read.parquet(f"{out}/customer.parquet")
    # no orphaned lineitems (anti-join empty) and no orphaned orders
    orphans_li = li.join(
        od, li.l_orderkey == od.o_orderkey, "left_anti"
    ).count()
    orphans_od = od.join(
        cu, od.o_custkey == cu.c_custkey, "left_anti"
    ).count()
    assert orphans_li == 0 and orphans_od == 0
    # per-order line multiplicity is preserved exactly (replica r of an
    # order gets exactly the original order's lines, not a mixture):
    # the lines-per-order histogram scales by exactly the factor
    def mult_hist(df):
        rows = (
            df.groupBy("l_orderkey")
            .agg(F.count("*").alias("lines"))
            .groupBy("lines")
            .agg(F.count("*").alias("orders"))
            .collect()
        )
        return sorted((r["lines"], r["orders"]) for r in rows)

    # exact equality after scaling by the factor — no floor division,
    # which would mask an off-by-up-to-(factor-1) corruption
    base_hist = mult_hist(spark.read.parquet(f"{base}/lineitem.parquet"))
    assert [(ln, n * 3) for ln, n in base_hist] == mult_hist(li)
