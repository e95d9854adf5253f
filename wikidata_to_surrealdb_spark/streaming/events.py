"""Structured Streaming over the events table.

The reference has no streaming surface (SURVEY §2A note) — this is part
of the driver-mandated extension set. Every operator here has a batch
twin in plans/queries.py so every streaming result is oracle-checkable
against the same SQL.

The operator classes, and what bounds their state:

- windowed aggregation / streaming dedup / HLL — watermark-bounded (or
  sketch-bounded) agg state; drained in COMPLETE mode, which applies
  no late-row filter, so they are pre-epoch-safe as-is.
- stream-stream attribution joins (inner + LEFT OUTER with the
  sentinel end-of-stream flush) — watermark + bounded event-time range
  give the eviction bound; they run on an internally
  +``_EPOCH_SHIFT_DAYS``-shifted clock because append-mode stateful
  operators DROP rows below the watermark, which starts at the epoch
  (pre-1970 events would be late-by-definition in batch one).
- applyInPandasWithState operators keyed by user — sessionization
  (state = the open session's running aggregates), the trailing window
  (state = the horizon buffer, with an int64-overflow guard), and the
  first-touch funnel (state = the reach-time prefix, at most
  len(steps) int64s). No watermark: each manages its own eviction, and
  all assume time-ordered micro-batch arrival (the
  :func:`slice_events_table` staging contract; equal timestamps never
  split across slices, so tie regimes stay batch-identical).

Design for scale: file-source streaming with ``maxFilesPerTrigger``
gives bounded micro-batches; the only data-sized shuffle anywhere is
the hash exchange on the group key; Arrow batches bound executor
memory in the Python-state operators.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _event_stream_source(
    spark: SparkSession, events_path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """readStream source for an events parquet table, whether the path is
    a Spark-written directory (events.parquet/part-*.parquet) or a single
    flat file.

    FileStreamSource wants a directory. A directory path streams directly;
    only a single-FILE path uses the dirname + pathGlobFilter=basename
    trick — applying that trick to a directory would glob for leaf files
    named like the directory and silently match nothing (the batch schema
    probe still succeeds, so no error would surface).
    """
    import os

    schema = spark.read.parquet(events_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isdir(events_path):
        stream = reader.parquet(events_path)
    else:
        stream = reader.option(
            "pathGlobFilter", os.path.basename(events_path)
        ).parquet(os.path.dirname(events_path))
    # nanos-as-long / NTZ parquet: restore a proper event-time column
    from wikidata_to_surrealdb_spark.sources.tables import normalize_ts

    return normalize_ts(stream)


def windowed_counts_stream_df(spark: SparkSession, events_path: str) -> DataFrame:
    """readStream from the events parquet -> 1h tumbling window counts
    with a 1h watermark (late data beyond that is dropped)."""
    stream = _event_stream_source(spark, events_path, max_files_per_trigger=8)
    return apply_windowed_counts(stream)


def apply_windowed_counts(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """1h tumbling-window counts with an event-time watermark. In append
    mode a window only emits once the watermark passes its end, and events
    arriving later than the watermark are dropped — the bounded-state
    contract that keeps this runnable forever at scale."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("hour_start"),
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
        )
    )


SESSION_SCHEMA = "user_id bigint, session_id bigint, n_events bigint, duration_sec bigint, session_value double"
# state carries the OPEN session's running aggregates, not just a cursor:
# a session spanning micro-batches must resume its counts, and value is
# kept in exact integer cents so resumed sums stay decimal-exact.
# n_vals counts NON-NULL values so an all-NULL session emits NULL like
# SQL SUM (and like the JVM events_sessionize variant) instead of 0.
#
# STATE-SCHEMA COMPATIBILITY: applyInPandasWithState deserializes stored
# state POSITIONALLY against this schema — a checkpoint written under a
# different layout (e.g. the pre-n_vals 5-field v1) fails to resume.
# Changing this layout is a breaking change for live deployments: bump
# _STATE_SCHEMA_VERSION below and start the query with a FRESH
# checkpoint location (there is no in-place state migration in Spark).
# Version history: v1 = 5 fields (no n_vals); v2 = current 6 fields.
_STATE_SCHEMA_VERSION = 2
_STATE_SCHEMA = (
    "session_id bigint, n_events bigint, min_us bigint, last_us bigint, "
    "cents bigint, n_vals bigint"
)
# Cheap import-time invariant so the version constant cannot silently
# drift from the actual layout: editing _STATE_SCHEMA without bumping
# the version (or vice versa) fails the first import, not a resume in
# production. Field count is a proxy for layout, which suffices for the
# v1->v2 history (5 vs 6 fields); a same-arity layout change must
# extend this map with the new version's count.
# An explicit raise, not `assert`: asserts are stripped under
# `python -O`, and this guard protects positional checkpoint
# deserialization — it must survive optimized bytecode (ADVICE r10).
if _STATE_SCHEMA.count(",") + 1 != {1: 5, 2: 6}[_STATE_SCHEMA_VERSION]:
    raise RuntimeError(
        "streaming state schema / version mismatch: bump "
        "_STATE_SCHEMA_VERSION when changing _STATE_SCHEMA "
        "(checkpoints deserialize positionally)"
    )


def sessionize_stateful_stream_df(
    spark: SparkSession, events_path: str, gap_sec: int = 1800
) -> DataFrame:
    """Custom stateful streaming operator: 30-min-gap sessionization via
    ``applyInPandasWithState`` keyed by user_id.

    State per user = the OPEN session's running aggregates (ordinal, count,
    min/max event time, exact value cents), so a session spanning
    micro-batches resumes where it left off — the update stream re-emits
    that session with its cumulative totals, and the LAST emission per
    (user_id, session_id) equals the batch sessionization (events must
    arrive time-ordered across batches, the file-source contract here).
    With a single availableNow batch the emitted rows ARE the batch
    sessionization, so the events_sessionize DuckDB oracle applies
    verbatim. At scale, state is O(users), the only shuffle is the hash
    exchange on user_id, and Arrow batches bound executor memory.
    """
    stream = _event_stream_source(spark, events_path)
    events = stream.select(
        "user_id", F.unix_micros("ts").alias("us"), "value"
    )
    return apply_sessionize(events, gap_sec=gap_sec)


def apply_sessionize(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Wire the stateful sessionizer onto a prepared streaming DataFrame
    with columns (user_id, us: bigint micros, value). Split out so tests
    can drive it from a multi-file (multi-batch) source."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def sessionize(key, pdf_iter, state: GroupState):
        import numpy as np
        import pandas as pd

        (user_id,) = key
        if state.exists:
            (
                open_sid,
                open_n,
                open_min,
                open_last,
                open_cents,
                open_nv,
            ) = state.get
        else:
            open_sid, open_n, open_min, open_last, open_cents, open_nv = (
                0,
                0,
                0,
                None,
                0,
                0,
            )

        # Vectorized per batch: gap detection, session ids, and per-session
        # aggregates are numpy cumsum/segment ops; only the OPEN session's
        # running totals cross batch boundaries through the state store.
        frames = [pdf for pdf in pdf_iter if len(pdf)]
        if not frames:
            yield pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "session_id": pd.Series([], dtype="int64"),
                    "n_events": pd.Series([], dtype="int64"),
                    "duration_sec": pd.Series([], dtype="int64"),
                    "session_value": pd.Series([], dtype="float64"),
                }
            )
            return
        batch = pd.concat(frames, ignore_index=True).sort_values("us")
        us = batch["us"].to_numpy(dtype=np.int64)
        # exact cents so the decimal-sum oracle reproduces bit-for-bit.
        # NULL values arrive as NaN, ±Inf has no cents form, and a
        # blind astype(int64) would turn either into INT64_MIN and
        # poison the session sum — accumulate 0 for out-of-domain
        # values and track the in-domain count so an all-excluded
        # session emits NULL exactly like the rep-guarded SQL SUM.
        # The mask mirrors functions.rep(value, 2) exactly: finite AND
        # |v| < 2^53/100 — beyond that the oracle's dsum NULLs the
        # value (r18 representability contract), and the cents grid
        # here must exclude the same rows or the engines diverge at
        # legal huge magnitudes.
        vals = batch["value"].to_numpy(dtype=np.float64)
        present = np.isfinite(vals) & (np.abs(vals) < 2.0**53 / 100.0)
        cents = np.where(present, np.round(np.where(present, vals, 0.0) * 100), 0).astype(
            np.int64
        )
        gap_us = gap_sec * 1_000_000
        prev = np.empty_like(us)
        prev[0] = open_last if open_last is not None else us[0] - gap_us - 1
        prev[1:] = us[:-1]
        new_sess = (us - prev) > gap_us  # True where a new session starts
        sid = open_sid + np.cumsum(new_sess)
        # per-session segment aggregates (sessions are contiguous runs)
        starts = np.flatnonzero(new_sess)
        bounds = np.concatenate(([0], starts, [len(us)]))
        seg = np.unique(bounds)
        seg_n = np.diff(seg)
        seg_first = us[seg[:-1]]
        seg_last = us[seg[1:] - 1]
        ccum = np.concatenate(([0], np.cumsum(cents)))
        seg_cents = ccum[seg[1:]] - ccum[seg[:-1]]
        nvcum = np.concatenate(([0], np.cumsum(present.astype(np.int64))))
        seg_nv = nvcum[seg[1:]] - nvcum[seg[:-1]]
        seg_sid = sid[seg[:-1]]
        # merge the carried open session into the first segment if the
        # first event continues it (no new-session flag at position 0)
        if not new_sess[0] and open_last is not None:
            seg_n[0] += open_n
            seg_first[0] = open_min
            seg_cents[0] += open_cents
            seg_nv[0] += open_nv
        rows = pd.DataFrame(
            {
                "user_id": np.full(len(seg_sid), user_id, dtype=np.int64),
                "session_id": seg_sid.astype(np.int64),
                "n_events": seg_n.astype(np.int64),
                "duration_sec": (seg_last - seg_first) // 1_000_000,
                "session_value": np.where(
                    seg_nv > 0, seg_cents / 100.0, np.nan
                ),
            }
        )
        state.update(
            (
                int(seg_sid[-1]),
                int(seg_n[-1]),
                int(seg_first[-1]),
                int(seg_last[-1]),
                int(seg_cents[-1]),
                int(seg_nv[-1]),
            )
        )
        yield rows

    return events.groupBy("user_id").applyInPandasWithState(
        sessionize,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stateful_streaming(
    spark: SparkSession,
    events_path: str,
    gap_sec: int = 1800,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Run the stateful sessionizer to completion (availableNow, single
    batch) into a memory sink and return the materialized sessions.
    ``state_partitions`` pins the state-store width for the run — a
    state-SIZING knob, not a parallelism knob (:class:`_state_partitions`);
    production callers size it to expected state volume, ``None`` keeps
    the session default."""
    table = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark, state_partitions):
        q = (
            sessionize_stateful_stream_df(spark, events_path, gap_sec)
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(table)


_TRAIL_STATE_SCHEMA = "ts array<bigint>, mic array<bigint>, ok array<boolean>"
_TRAIL_UDF_SCHEMA = (
    "event_id bigint, user_id bigint, ts_us bigint, trailing_n bigint, "
    "sum_mic bigint, n_ok bigint"
)


def apply_trailing_window(
    events: DataFrame, horizon_us: int = 3_600_000_000
) -> DataFrame:
    """Stateful streaming trailing window: for every arriving event,
    emit its count/sum over ``[ts - horizon, ts]`` of the SAME user's
    events — the state-store twin of the batch RANGE frame (and of the
    batch :func:`~wikidata_to_surrealdb_spark.operators.temporal.
    bounded_trailing_agg`).

    State per user is the horizon buffer: only events with
    ``ts >= max_seen_ts - horizon`` are kept, everything older is
    evicted at every trigger — so state is bounded by
    events-per-key-per-horizon, the same bound the batch decomposition
    achieves with (key, bucket) partitioning. This is the production
    answer to hot-key trailing analytics: the RANGE frame's giant
    per-key partition never materializes anywhere.

    Arrival contract (same as the stateful sessionizer): batches are
    time-ordered (the sliced file-source contract); an event older than
    ``max_seen - horizon`` when it arrives computes against whatever
    remains buffered — the watermark-style trade, late data cannot
    resurrect evicted history. Within a batch order is free: frames are
    computed over the SORTED union of buffer + batch, so same-``ts``
    peers see each other exactly like RANGE frame peers.

    Input columns: (event_id, user_id, us, mic, ok) where ``mic`` is
    the value already quantized JVM-side to exact DECIMAL(18,6)
    micro-units as a NEVER-NULL bigint (0 when absent) and ``ok`` marks
    presence — null-ness must travel as a separate boolean because a
    nullable int64 crosses Arrow into pandas as float64, which is only
    exact to 2^53 and would silently corrupt large micro-unit sums.
    The UDF only ever adds int64, so the sum is bit-identical to the
    SQL DECIMAL sum — and a per-buffer magnitude guard raises
    ``OverflowError`` before a prefix sum could wrap (abs-sum of the
    buffer+batch micro-units checked against 2^62), so the
    bit-identical claim can never silently degrade to modular
    arithmetic. Output adds (trailing_n, sum_mic, n_ok);
    ``sum_mic`` is meaningful only when ``n_ok > 0`` (SQL SUM over an
    all-NULL frame is NULL)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def trail(key, pdf_iter, state: GroupState):
        import numpy as np
        import pandas as pd

        (user_id,) = key
        if state.exists:
            st_ts, st_mic, st_ok = state.get
            st_ts = np.asarray(st_ts, dtype=np.int64)
            st_mic = np.asarray(st_mic, dtype=np.int64)
            st_ok = np.asarray(st_ok, dtype=bool)
        else:
            st_ts = np.empty(0, dtype=np.int64)
            st_mic = np.empty(0, dtype=np.int64)
            st_ok = np.empty(0, dtype=bool)

        frames = [pdf for pdf in pdf_iter if len(pdf)]
        if not frames:
            yield pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "ts_us": pd.Series([], dtype="int64"),
                    "trailing_n": pd.Series([], dtype="int64"),
                    "sum_mic": pd.Series([], dtype="int64"),
                    "n_ok": pd.Series([], dtype="int64"),
                }
            )
            return
        batch = pd.concat(frames, ignore_index=True)
        b_ts = batch["us"].to_numpy(dtype=np.int64)
        b_eid = batch["event_id"].to_numpy(dtype=np.int64)
        # mic arrives null-free int64 (exact through Arrow), presence
        # as its own boolean — see the docstring's 2^53 rationale
        b_mic = batch["mic"].to_numpy(dtype=np.int64)
        b_ok = batch["ok"].to_numpy(dtype=bool)
        b_mic = np.where(b_ok, b_mic, 0)

        # sorted union of the horizon buffer and this batch; frames are
        # range lookups into its prefix sums (peers included on both
        # edges, exactly the RANGE frame contract)
        all_ts = np.concatenate([st_ts, b_ts])
        all_mic = np.concatenate([np.where(st_ok, st_mic, 0), b_mic])
        all_ok = np.concatenate([st_ok, b_ok])
        order = np.argsort(all_ts, kind="stable")
        all_ts = all_ts[order]
        all_mic = all_mic[order]
        all_ok = all_ok[order]
        # overflow guard: the prefix sums below are int64 and numpy
        # int64 overflow is MODULAR — a horizon buffer whose absolute
        # micro-unit sum reaches 2^63 (~9 events at the DECIMAL(18,6)
        # magnitude cap) would wrap silently and diverge from the
        # DECIMAL oracle. The float64 abs-sum is exact to ~2^-52
        # relative, so comparing against a half-range bound (2^62)
        # cannot miss a true overflow nor false-positive below 2^61.
        if float(np.abs(all_mic.astype(np.float64)).sum()) >= float(2**62):
            raise OverflowError(
                "apply_trailing_window: per-key horizon buffer "
                f"micro-unit magnitude for user_id={user_id} exceeds "
                "2^62; int64 prefix sums would wrap. Shrink the "
                "horizon or rescale the value column."
            )
        pref_mic = np.concatenate(([0], np.cumsum(all_mic)))
        pref_ok = np.concatenate(
            ([0], np.cumsum(all_ok.astype(np.int64)))
        )
        lo = np.searchsorted(all_ts, b_ts - horizon_us, side="left")
        hi = np.searchsorted(all_ts, b_ts, side="right")
        out = pd.DataFrame(
            {
                "event_id": b_eid,
                "user_id": np.full(len(b_eid), user_id, dtype=np.int64),
                "ts_us": b_ts,
                "trailing_n": (hi - lo).astype(np.int64),
                "sum_mic": pref_mic[hi] - pref_mic[lo],
                "n_ok": pref_ok[hi] - pref_ok[lo],
            }
        )
        # evict: future frames (ts >= max_seen) reach back at most to
        # max_seen - horizon; keep the closed edge
        keep = all_ts >= all_ts[-1] - horizon_us
        # NULL-valued buffer entries round-trip as ok=False
        state.update(
            (
                [int(v) for v in all_ts[keep]],
                [int(v) for v in all_mic[keep]],
                [bool(v) for v in all_ok[keep]],
            )
        )
        yield out

    return events.groupBy("user_id").applyInPandasWithState(
        trail,
        outputStructType=_TRAIL_UDF_SCHEMA,
        stateStructType=_TRAIL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def trailing_window_stream_df(
    spark: SparkSession,
    events_path: str,
    horizon_us: int = 3_600_000_000,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Wire the stateful trailing window onto the events file source,
    with the value quantized to exact DECIMAL(18,6) micro-units
    JVM-SIDE (decimal multiply + bigint cast — the UDF never touches a
    float value), and the output sum reconstructed as an exact decimal
    so the result matches the batch RANGE-frame oracle bit-for-bit.

    Pass ``max_files_per_trigger=1`` with a time-ordered sliced dir
    (:func:`slice_events_table`) to pin one slice per micro-batch —
    the arrival contract the eviction logic requires; leaving it None
    relies on the source yielding batches in event-time order."""
    from wikidata_to_surrealdb_spark.functions import drep, fround

    stream = _event_stream_source(
        spark, events_path, max_files_per_trigger=max_files_per_trigger
    )
    mic = (drep(F.col("value"), 6) * 1_000_000).cast("bigint")
    ev = stream.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.coalesce(mic, F.lit(0)).alias("mic"),
        mic.isNotNull().alias("ok"),
    )
    out = apply_trailing_window(ev, horizon_us=horizon_us)
    return out.select(
        "event_id",
        "user_id",
        "ts_us",
        "trailing_n",
        fround(
            F.when(
                F.col("n_ok") > 0,
                F.col("sum_mic").cast("decimal(38,6)") / 1_000_000,
            ).cast("double"),
            2,
        ).alias("trailing_sum"),
    )


def trailing_window_streaming(
    spark: SparkSession,
    events_path: str,
    horizon_us: int = 3_600_000_000,
    max_files_per_trigger: int | None = None,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Run the stateful trailing window to completion (availableNow)
    into a memory sink and return the materialized per-event rows.
    ``state_partitions`` as in :func:`sessionize_stateful_streaming`."""
    table = f"stream_trail_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark, state_partitions):
        q = (
            trailing_window_stream_df(
                spark, events_path, horizon_us, max_files_per_trigger
            )
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(table)


def slice_events_table(
    spark: SparkSession,
    events_path: str,
    out_dir: str,
    slices: int = 4,
    files_per_slice: int = 1,
) -> str:
    """Materialize the events table as ``slices`` time-ordered parquet
    slices with increasing mtimes, so a file-source stream with
    ``maxFilesPerTrigger=files_per_slice`` replays them as separate
    micro-batches in event-time order — the cross-batch state path,
    for benchmarks/tests.

    Same staging contract as ``documents.slice_documents_table``
    (r15 symmetry): ``files_per_slice`` is the geometry (each slice =
    exactly that many same-mtime files; raise the reader's
    ``maxFilesPerTrigger`` with it or batch membership breaks, and a
    mismatched landing raises), and the mtime staging routes through
    the ``store_fs`` adapter so a scheme-qualified ``out_dir`` works."""
    import os
    import time as _time

    from wikidata_to_surrealdb_spark.sources.tables import normalize_ts
    from wikidata_to_surrealdb_spark.streaming import store_fs

    if files_per_slice < 1:
        raise ValueError(
            f"slice_events_table: files_per_slice must be >= 1, "
            f"got {files_per_slice}"
        )
    fs = store_fs.for_path(spark, out_dir)
    df = normalize_ts(spark.read.parquet(events_path))
    # slice on ts so batches are time-ordered (the stateful sessionizer's
    # arrival contract)
    ts_splits = (
        df.select(F.unix_micros("ts").alias("us"))
        .approxQuantile("us", [i / slices for i in range(1, slices)], 0.001)
    )
    bounds = [float("-inf"), *ts_splits, float("inf")]
    base = _time.time()
    for i in range(slices):
        lo, hi = bounds[i], bounds[i + 1]
        part = df.where(
            (F.unix_micros("ts") >= F.lit(lo)) & (F.unix_micros("ts") < F.lit(hi))
            if i > 0
            else F.unix_micros("ts") < F.lit(hi)
        )
        store_fs.write_staged_slice(
            fs,
            part,
            os.path.join(out_dir, f"slice={i}"),
            files_per_slice,
            base + i,
            "slice_events_table",
        )
    return out_dir


class _state_partitions:
    """Pin ``spark.sql.shuffle.partitions`` for the duration of a
    streaming query start+drain, then restore it.

    For a stateful stream the shuffle-partition count at FIRST batch
    becomes the state-store partition count for the query's lifetime —
    it is a state-sizing knob, not a parallelism knob. The session
    default (cluster width) is right for a 100 TB keyspace; for a small
    benchmark/test stream it just buys ``partitions x batches`` tasks of
    fixed state-store + Python-worker overhead (measured head-to-head in
    one session, best-of-2: the 4-batch sf0.1 sessionizer runs 5.3 s at
    8 partitions vs 6.5 s at 32 and 6.5 s at 4; uniform ~1.1-1.2 s
    per batch). Callers size it to expected state volume."""

    def __init__(self, spark: SparkSession, n: int | None):
        self.spark, self.n = spark, n

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        if self.n is not None:
            self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)


def _drain_progress(q, progress: list | None) -> None:
    """Append one row per completed micro-batch of ``q`` to ``progress``
    (batch id, input rows, trigger wall ms) — the per-batch breakdown
    that makes a multi-batch wall-clock number attributable."""
    if progress is None:
        return
    for p in q.recentProgress:
        if isinstance(p, str):  # some PySpark versions hand back JSON text
            import json as _json

            p = _json.loads(p)
        ops = p.get("stateOperators") or []
        progress.append(
            {
                "batch_id": p.get("batchId"),
                "input_rows": p.get("numInputRows"),
                "trigger_ms": (p.get("durationMs") or {}).get("triggerExecution"),
                # total state-store rows after the batch — the
                # observable for eviction/TTL behavior
                "state_rows": (
                    sum(o.get("numRowsTotal", 0) for o in ops) if ops else None
                ),
            }
        )


def sessionize_stateful_multibatch(
    spark: SparkSession,
    sliced_dir: str,
    gap_sec: int = 1800,
    state_partitions: int | None = 8,
    progress: list | None = None,
) -> DataFrame:
    """Run the stateful sessionizer over a pre-sliced events dir
    (:func:`slice_events_table`) one file per micro-batch, so the state
    store carries open sessions across ``slices`` real batches.

    Cost model (documented so the bench number is interpretable): the
    wall time is dominated by a per-micro-batch floor of
    state-store-partition tasks (each spins a Python worker for
    applyInPandasWithState), NOT by row volume — see
    :class:`_state_partitions` for why the default pins 8 here."""
    schema = spark.read.parquet(sliced_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(sliced_dir)
    )
    events = stream.select("user_id", F.unix_micros("ts").alias("us"), "value")
    table = f"stream_sessions_mb_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark, state_partitions):
        q = (
            apply_sessionize(events, gap_sec=gap_sec)
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    _drain_progress(q, progress)
    return spark.table(table)


def event_dedup_multibatch(
    spark: SparkSession,
    sliced_dir: str,
    state_partitions: int | None = 8,
    progress: list | None = None,
) -> DataFrame:
    """Streaming dedup over a pre-sliced events dir, one file per
    micro-batch — state merges (min ids / summed counts) across batches.
    Same per-batch state-store floor as
    :func:`sessionize_stateful_multibatch` (all-JVM agg, so the floor is
    smaller — no Python workers)."""
    schema = spark.read.parquet(sliced_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(sliced_dir)
    )
    dedup = (
        stream.withWatermark("ts", "2 hours")
        .groupBy("user_id", "event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.min("event_id").alias("keep_event_id"), F.count("*").alias("collapsed"))
    )
    table = f"stream_dedup_mb_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark, state_partitions):
        q = (
            dedup.writeStream.format("memory")
            .queryName(table)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    _drain_progress(q, progress)
    return spark.table(table)


def event_dedup_stream_df(
    spark: SparkSession, events_path: str, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact-dedup: collapse each (user, event_type, hour) to
    its first event — the streaming twin of the batch events_dedup.

    Keep-first is expressed as a watermarked streaming AGGREGATION
    (min(event_id) per key) rather than ``dropDuplicates``:
    dropDuplicates keeps whichever row a task sees first, which is
    nondeterministic once the source splits across partitions, while
    min() is order-independent — so the emitted rows equal the batch
    oracle exactly. The watermark bounds state: a key's hour expires
    once event time passes it by the watermark delay.
    """
    stream = _event_stream_source(spark, events_path, max_files_per_trigger=8)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            "user_id", "event_type", F.date_trunc("hour", "ts").alias("hour")
        )
        .agg(F.min("event_id").alias("keep_event_id"), F.count("*").alias("collapsed"))
        .select(
            "user_id",
            "event_type",
            F.unix_timestamp("hour").alias("hour_start"),
            "keep_event_id",
            F.col("collapsed").cast("bigint").alias("collapsed"),
        )
    )


def event_dedup_streaming(
    spark: SparkSession,
    events_path: str,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Run the streaming dedup to completion (availableNow, complete
    mode) into a memory sink — batch-equivalent, so the events_dedup
    oracle applies verbatim. ``state_partitions`` as in
    :func:`sessionize_stateful_streaming`."""
    table = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark, state_partitions):
        q = (
            event_dedup_stream_df(spark, events_path)
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(table)


def stream_to_parquet(
    result: DataFrame,
    out_path: str,
    checkpoint: str,
    output_mode: str = "append",
) -> None:
    """Run a streaming result to completion (availableNow) into a parquet
    file sink with a checkpoint — the production sink shape.

    Exactly-once comes from the pair: the checkpoint records which source
    files each batch consumed, and the file sink's _spark_metadata commit
    log records which output files each batch produced; a restart replays
    neither. Stopping mid-run and restarting with the same checkpoint
    resumes from the last committed batch (tested in test_streaming.py).
    """
    q = (
        result.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_counts_streaming(
    spark: SparkSession,
    events_path: str,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Run the stream to completion (availableNow) into a memory sink and
    return the materialized result — batch-equivalent by construction, so
    the events_window oracle applies. ``state_partitions`` as in
    :func:`sessionize_stateful_streaming`."""
    table = f"stream_counts_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark, state_partitions):
        q = (
            windowed_counts_stream_df(spark, events_path)
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(table)


def attribution_join_stream_df(
    spark: SparkSession,
    events_path: str,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked STREAM-STREAM join: attribute each purchase to the
    views by the same user in the preceding ``attribution_window`` —
    the classic ad-attribution shape, and the one streaming operator
    class (two unbounded inputs) the window/dedup/sessionize family
    doesn't cover.

    Scale contract: both sides carry a watermark and the join condition
    bounds event-time distance, so Spark derives a state-eviction bound
    — per-key state holds only ``attribution_window + watermark`` of
    events, NOT the whole history (an unbounded stream-stream join would
    otherwise accumulate state forever). The join itself shuffles on
    user_id like the batch twin; the state store is the only addition.

    Pre-epoch inputs: Structured Streaming's watermark starts at 0
    (the epoch), and a watermarked stateful operator DROPS input rows
    whose event time is below the current watermark — so pre-1970
    event times are late-by-definition in the first batch and silently
    vanish (found by the r15 preepoch sweep). The join therefore runs
    on an internally +:data:`_EPOCH_SHIFT_DAYS`-shifted clock (a fixed
    duration, so every event-time DIFFERENCE the condition and the
    watermark use is untouched) and unshifts on output — historical
    backfills back to ~year 970 compute exactly like the batch join.
    """
    shift = F.expr(f"INTERVAL {_EPOCH_SHIFT_DAYS} DAYS")
    purchases = (
        _event_stream_source(spark, events_path)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            (F.col("ts") + shift).alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    views = (
        _event_stream_source(spark, events_path)
        .where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("view_user_id"),
            (F.col("ts") + shift).alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    return purchases.join(
        views,
        (F.col("user_id") == F.col("view_user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (
            F.col("view_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}")
        ),
        "inner",
    ).select(
        "purchase_id",
        "user_id",
        (F.col("purchase_ts") - shift).alias("purchase_ts"),
        "purchase_value",
        "view_id",
        (F.col("view_ts") - shift).alias("view_ts"),
    )


def attribution_join_streaming(
    spark: SparkSession,
    events_path: str,
    attribution_window: str = "1 hour",
    state_partitions: int | None = 8,
) -> DataFrame:
    """Run the stream-stream attribution join to completion (availableNow,
    memory sink). Processed as one batch, no row outruns the watermark,
    so the result equals the batch join — the oracle the catalog uses.
    Like the other stateful runners, the state-store partition count is
    pinned small for bench/test corpora (see :class:`_state_partitions`);
    a stream-stream join keeps BOTH sides' buffered rows in the state
    store, so its per-partition fixed cost is the largest of the family."""
    table = f"stream_attr_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark, state_partitions):
        q = (
            attribution_join_stream_df(spark, events_path, attribution_window)
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(table)


def segment_enrich_stream_df(
    spark: SparkSession,
    events_path: str,
    customer_path: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STATIC enrichment join + windowed rollup: each streaming
    event is joined to the static customer dimension (broadcast — the
    dim rides to every task, the unbounded side never shuffles and the
    join holds NO state, unlike stream-stream joins), then aggregated
    per (hour, market segment, event type) with value kept in exact
    integer cents so resumed/merged partial sums stay decimal-exact.

    This is the canonical serving-pipeline shape: an infinite fact
    stream decorated with slowly-changing dimension attributes. At
    scale the only stateful operator is the watermark-bounded window
    aggregation; the enrichment itself is map-side."""
    stream = _event_stream_source(spark, events_path, max_files_per_trigger=8)
    dim = spark.read.parquet(customer_path).select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    # out-of-domain measures (non-finite OR |v| >= 2^53/100) carry no
    # exact cents representation: NULL them so the sum skips them
    # (matching the batch oracle's rep_sql guard) instead of
    # saturating/throwing mid-stream
    from wikidata_to_surrealdb_spark.functions import rep

    cents = F.floor(rep(F.col("value"), 2) * 100.0 + 0.5).cast("bigint")
    return (
        stream.withWatermark("ts", watermark)
        .join(F.broadcast(dim), "user_id")
        .groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "c_mktsegment",
            "event_type",
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(cents).cast("bigint").alias("total_cents"),
        )
        .select(
            F.unix_timestamp("hour").alias("hour_start"),
            "c_mktsegment",
            "event_type",
            "n_events",
            "total_cents",
        )
    )


def segment_enrich_streaming(
    spark: SparkSession,
    events_path: str,
    customer_path: str,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Run the stream-static enrichment to completion (availableNow,
    complete mode) into a memory sink — batch-equivalent, so a plain
    join+group-by oracle applies verbatim. ``state_partitions`` as in
    :func:`sessionize_stateful_streaming`."""
    table = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark, state_partitions):
        q = (
            segment_enrich_stream_df(spark, events_path, customer_path)
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(table)


def hll_registers_stream_df(spark: SparkSession, events_path: str) -> DataFrame:
    """Streaming HLL registers per event_type: the sketch update IS a
    streaming aggregation (groupBy(type, reg).max(rho)), so Spark's agg
    state is the sketch itself — bounded at |types| x 256 rows FOREVER,
    no watermark needed. That is the textbook streaming-sketch argument:
    unlike count-distinct via dropDuplicates (state = every key seen),
    the HLL register relation never grows past the sketch size, so an
    unbounded stream can run for months without state eviction policy."""
    from wikidata_to_surrealdb_spark.operators.sketch import hll_reg_rho_sql

    stream = _event_stream_source(spark, events_path, max_files_per_trigger=8)
    reg, rho = hll_reg_rho_sql("CAST(user_id AS STRING)")
    return (
        stream.select(
            "event_type", F.expr(reg).alias("reg"), F.expr(rho).alias("rho")
        )
        .groupBy("event_type", "reg")
        .agg(F.max("rho").alias("m"))
    )


def hll_distinct_streaming(
    spark: SparkSession,
    events_path: str,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Run the streaming HLL to completion (availableNow, complete mode)
    and estimate: per-event-type approx distinct users plus the '(all)'
    rollup merged from the SAME registers. Equals the batch
    sketch_hll_rollup bit-for-bit (registers are max-merged, order-free),
    so the identical oracle applies. ``state_partitions`` as in
    :func:`sessionize_stateful_streaming` — the register state is
    bounded at |types| x 256 rows, so the session-width store only buys
    per-task overhead (profiled: the 32-partition state stage carried
    ~22 s of executor time on a 20 KB shuffle)."""
    from wikidata_to_surrealdb_spark.operators.sketch import hll_estimate

    table = f"stream_hll_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark, state_partitions):
        q = (
            hll_registers_stream_df(spark, events_path)
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    regs = spark.table(table)
    per = hll_estimate(regs, ["event_type"])
    total = hll_estimate(regs, []).select(
        F.lit("(all)").alias("event_type"), "approx_distinct"
    )
    return per.unionAll(total)


_OUTER_SENTINEL_USER = -987654321

# Internal clock shift for the watermarked stream-stream joins: a FIXED
# duration (~1000 Julian years in days — never a YEAR interval, whose
# add/subtract round-trip clamps Feb 29), added before the watermark
# and subtracted on output. Structured Streaming's watermark begins at
# the epoch and stateful operators drop input rows older than the
# current watermark, so unshifted pre-1970 event times are
# late-by-definition in batch one (r15 preepoch sweep finding). The
# shift is transparent to every event-time DIFFERENCE (join window,
# watermark delay) and bounds supported input to ~[970 AD, 8999 AD].
_EPOCH_SHIFT_DAYS = 365_243


def attribution_join_outer_streaming(
    spark: SparkSession,
    events_path: str,
    staging_dir: str,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
    state_partitions: int | None = 8,
) -> DataFrame:
    """LEFT OUTER watermarked stream-stream join: every purchase is
    attributed to its preceding same-user views, and purchases with NO
    qualifying view still emit (NULL view columns) — but only once the
    watermark has passed them, because until then a matching view could
    still arrive. That makes outer results watermark-gated: a stream
    that simply ends leaves the last rows' outer state unemitted.

    The deterministic drain: stage the events as micro-batch one, then
    a SENTINEL batch (one far-future purchase+view for a reserved
    user_id) whose event time pushes BOTH sides' watermarks beyond
    every real event — the following trigger flushes all remaining
    unmatched purchases. The sentinel rows are excluded from the
    output by user id; this is the standard end-of-stream flush
    pattern for outer stream-stream joins, made explicit and testable.

    Scale contract is the inner join's: watermark + bounded event-time
    range give a state eviction bound; the outer buffer holds only
    not-yet-past-watermark purchases.
    """
    import os
    import time as _time

    from wikidata_to_surrealdb_spark.sources.tables import normalize_ts

    ev = normalize_ts(spark.read.parquet(events_path))
    os.makedirs(staging_dir, exist_ok=True)
    # partition-style dir names so both the batch schema probe and
    # the file stream treat the two batches as one table
    real_dir = os.path.join(staging_dir, "batch=0")
    ev.coalesce(1).write.mode("overwrite").parquet(real_dir)
    far = (
        ev.agg(F.max("ts").alias("m"))
        .select(
            F.col("m") + F.expr("INTERVAL 30 DAYS")
        )
        .first()[0]
    )
    sent = spark.createDataFrame(
        [
            (10**15, far, _OUTER_SENTINEL_USER, "purchase", 0.0, "{}"),
            (10**15 + 1, far, _OUTER_SENTINEL_USER, "view", 0.0, "{}"),
        ],
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    sent_dir = os.path.join(staging_dir, "batch=1")
    sent.coalesce(1).write.mode("overwrite").parquet(sent_dir)
    base = _time.time()
    for i, d in enumerate((real_dir, sent_dir)):
        for root, _, files in os.walk(d):
            for fname in files:
                os.utime(os.path.join(root, fname), (base + i, base + i))

    # same internal clock shift as the inner join (see
    # _EPOCH_SHIFT_DAYS): without it, pre-epoch purchases are dropped
    # as late in batch one and their outer NULL rows silently vanish
    shift = F.expr(f"INTERVAL {_EPOCH_SHIFT_DAYS} DAYS")
    purchases = (
        _event_stream_source(spark, staging_dir, max_files_per_trigger=1)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            (F.col("ts") + shift).alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    views = (
        _event_stream_source(spark, staging_dir, max_files_per_trigger=1)
        .where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("view_user_id"),
            (F.col("ts") + shift).alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    joined = purchases.join(
        views,
        (F.col("user_id") == F.col("view_user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (
            F.col("view_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}")
        ),
        "left_outer",
    ).select(
        "purchase_id",
        "user_id",
        (F.col("purchase_ts") - shift).alias("purchase_ts"),
        "purchase_value",
        "view_id",
        (F.col("view_ts") - shift).alias("view_ts"),
    )
    table = f"stream_attr_outer_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark, state_partitions):
        q = (
            joined.writeStream.format("memory")
            .queryName(table)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(table).where(
        F.col("user_id") != _OUTER_SENTINEL_USER
    )


_FUNNEL_UDF_SCHEMA = "user_id bigint, step_idx int, reached_us bigint"
# the reached set is always a PREFIX of the step list (step i requires
# step i-1), so state is just the reach times of that prefix — no
# sentinel values needed (a sentinel would collide with legitimate
# pre-epoch micros)
_FUNNEL_STATE_SCHEMA = "reached array<bigint>"


def apply_funnel_stateful(
    events: DataFrame,
    steps: list[str],
    within_us: int | None = None,
    ttl_us: int | None = None,
) -> DataFrame:
    """Stateful STREAMING first-touch funnel — the state-store twin of
    :func:`~wikidata_to_surrealdb_spark.operators.temporal.funnel`,
    completing the funnel family across both regimes the way the
    trailing-window family spans batch/decomposed/streaming.

    Per user, state is the reach-time prefix (step i is reached at the
    earliest event of type ``steps[i]`` STRICTLY after step i-1's
    reach time; ``within_us`` additionally bounds every later step to
    the horizon after step 0). A newly reached step emits
    ``(user_id, step_idx, reached_us)`` in the batch that reaches it —
    and under time-ordered arrival a first-touch reach time is FINAL
    (later batches only carry later events), so append mode needs no
    retraction. State is at most ``len(steps)`` int64s per user,
    forever — smaller than the sessionizer's.

    Arrival contract (same as the stateful sessionizer): micro-batches
    are time-ordered (:func:`slice_events_table`); within a batch,
    events are sorted by ``(us, event_type)`` — byte-identical to the
    batch operator's ``sort_array`` of ``(tp_ts, tp)`` structs, so
    same-timestamp peers tie-break identically cross-engine.

    Input columns: ``(user_id, us, tp)``, pre-filtered to step types
    (keep the filter JVM-side so the scan prunes).

    State bound (VERDICT r15 #6): reach state lives forever by default
    — correct for bounded user populations, O(distinct users x steps)
    for open-world key spaces. ``ttl_us`` (opt-in, requires
    ``within_us`` and an event-time WATERMARK on ``events``) evicts a
    user's state ``ttl_us`` after the funnel went FINAL: once the
    watermark passes ``reached[0] + within_us`` no future event can
    extend the funnel (every step > 0 fails the horizon check, step 0
    requires an empty reach), so eviction does not change the emitted
    set — UNLESS the corpus later carries a post-horizon step-0 event
    for an evicted user, which then starts a fresh funnel (the
    deliberate open-world trade: forgotten users are new users).
    Empty reach lists are never stored at all (storing ``[]`` is
    observationally identical to no state), so users who never hit
    step 0 cost nothing either way.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if ttl_us is not None:
        if within_us is None:
            raise ValueError(
                "apply_funnel_stateful: ttl_us requires within_us — "
                "without a horizon a funnel is never final and "
                "eviction would drop reachable steps"
            )
        if isinstance(ttl_us, bool) or not isinstance(ttl_us, int) or ttl_us < 0:
            raise ValueError(
                f"apply_funnel_stateful: ttl_us must be a non-negative "
                f"int, got {ttl_us!r}"
            )

    step_index = {s: i for i, s in enumerate(steps)}
    n_steps = len(steps)

    def fold(key, pdf_iter, state: GroupState):
        import numpy as np
        import pandas as pd

        empty_out = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "step_idx": pd.Series([], dtype="int32"),
                "reached_us": pd.Series([], dtype="int64"),
            }
        )
        if ttl_us is not None and state.hasTimedOut:
            # watermark passed reached[0] + within_us + ttl_us: the
            # funnel is final, the state is dead weight — evict
            state.remove()
            yield empty_out
            return

        (user_id,) = key
        reached = list(state.get[0]) if state.exists else []

        def arm_timeout() -> None:
            # timeout fires once the WATERMARK passes the funnel-final
            # time + slack; must be strictly above the current
            # watermark or Spark rejects it
            if ttl_us is None or not reached:
                return
            final_ms = (reached[0] + within_us + ttl_us) // 1000 + 1
            state.setTimeoutTimestamp(
                max(final_ms, state.getCurrentWatermarkMs() + 1)
            )

        frames = [pdf for pdf in pdf_iter if len(pdf)]
        if not frames:
            arm_timeout()
            yield empty_out
            return
        batch = pd.concat(frames, ignore_index=True)
        us = batch["us"].to_numpy(dtype=np.int64)
        tp = batch["tp"].to_numpy()
        # (us, tp-string) ascending == the batch fold's struct sort
        order = np.lexsort((tp, us))

        new_rows = []
        for j in order:
            i = step_index.get(tp[j])
            if i is None or i != len(reached) or i >= n_steps:
                continue
            t = int(us[j])
            if i > 0 and t <= reached[i - 1]:
                continue
            if i > 0 and within_us is not None and t > reached[0] + within_us:
                continue
            reached.append(t)
            new_rows.append((int(user_id), i + 1, t))
            if len(reached) == n_steps:
                break
        if reached:
            state.update(([int(t) for t in reached],))
            arm_timeout()
        # empty reach: leave no state behind — [] stored is
        # observationally identical to no state, so never-started
        # users cost nothing
        yield pd.DataFrame(
            new_rows, columns=["user_id", "step_idx", "reached_us"]
        ).astype(
            {"user_id": "int64", "step_idx": "int32", "reached_us": "int64"}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=_FUNNEL_UDF_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_us is None
            else GroupStateTimeout.EventTimeTimeout
        ),
    )


def funnel_stateful_multibatch(
    spark: SparkSession,
    sliced_dir: str,
    steps: list[str],
    within_seconds: int | None = None,
    state_partitions: int | None = 8,
    progress: list | None = None,
    ttl_seconds: int | None = None,
) -> DataFrame:
    """Run the stateful funnel over a pre-sliced events dir
    (:func:`slice_events_table`), one slice per micro-batch, to
    completion (availableNow, memory sink) — reach state threads
    across real batches, and with time-ordered arrival the union of
    emitted rows equals the batch funnel's reached set exactly.

    ``ttl_seconds`` (opt-in, needs ``within_seconds``) arms the
    event-time state eviction of :func:`apply_funnel_stateful` with a
    zero-delay watermark on ``ts`` — state for final funnels is
    dropped once the watermark passes the horizon + TTL."""
    schema = spark.read.parquet(sliced_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(sliced_dir)
    )
    if ttl_seconds is not None:
        # EventTimeTimeout requires a watermark; the pre-epoch-safe
        # shift is unnecessary here because the timeout timestamp is
        # clamped above the current watermark in the fold
        stream = stream.withWatermark("ts", "0 seconds")
    cols = [
        F.col("user_id"),
        F.unix_micros("ts").alias("us"),
        F.col("event_type").alias("tp"),
    ]
    if ttl_seconds is not None:
        # the watermarked column must survive to the stateful operator
        # or Spark rejects the event-time timeout at analysis
        cols.append(F.col("ts"))
    ev = stream.where(F.col("event_type").isin(list(steps))).select(*cols)
    within_us = None if within_seconds is None else within_seconds * 1_000_000
    ttl_us = None if ttl_seconds is None else ttl_seconds * 1_000_000
    table = f"stream_funnel_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark, state_partitions):
        q = (
            apply_funnel_stateful(ev, steps, within_us=within_us, ttl_us=ttl_us)
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    _drain_progress(q, progress)
    return spark.table(table)
