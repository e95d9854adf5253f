"""Temporal join operators: as-of join and interval (range) join.

Spark has no ASOF JOIN node (DuckDB/Pandas do), and a naive
``l.ts >= r.ts`` theta-join degenerates to BroadcastNestedLoop — O(n*m)
per key and a broadcast of a whole side. Both operators here are
re-expressed as single-shuffle DataFrame plans that survive the 100 TB
regime:

- **as-of join**: union the two sides, tag them, and run one
  ``last(..., ignorenulls)`` window per key ordered by time — the classic
  merge-join formulation. Cost = one hash shuffle on the key + one sort
  within partitions; no pair explosion whatsoever. The matched right-hand
  row is carried as a single struct so the match is row-atomic (per-column
  ``last`` would mix columns from different right rows when the right side
  has embedded nulls).
- **range join**: bucket time into fixed-width bins and equi-join on
  ``(key, bin)``; each interval is exploded only into the bins it covers
  (``ceil(len/width)+1`` rows), then the exact containment predicate
  filters in-bin false positives. Equi-join means hash shuffle /
  broadcast — never a nested loop. Bin width should be on the order of
  the typical interval length.

Reference parity: the reference (NexVeridian/wikidata-to-surrealdb) has
no temporal operators; these belong to the driver-mandated
training-pipeline extension family (event-stream enrichment).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _internal_names(taken: set[str], *wanted: str) -> list[str]:
    """Internal working-column names guaranteed not to collide with any
    user column on either side."""
    out = []
    for w in wanted:
        name = f"__asof_{w}"
        while name in taken:
            name += "_"
        taken.add(name)
        out.append(name)
    return out


def _qc(name: str) -> Column:
    """``F.col`` with the name backtick-quoted so a column literally
    named ``event.id`` resolves as one column, not a dot path (embedded
    backticks escaped by doubling, per Spark identifier rules)."""
    return F.col(f"`{name.replace('`', '``')}`")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "inner",
    tolerance_sec: float | None = None,
    suffix: str = "_r",
    tie_break: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` (backward as-of) sharing the join key(s).

    Ties on the exact same timestamp match (``<=`` semantics, like
    DuckDB ``ASOF JOIN ... ON r.ts <= l.ts``). ``how`` is ``inner``
    (drop unmatched left rows) or ``left`` (keep them with nulls).
    ``tolerance_sec`` drops matches older than the given horizon.

    When multiple right rows share the same (key, timestamp), the winner
    is deterministic: the greatest value of ``tie_break`` (a right-hand
    column, e.g. a sequence number) wins; without one, the greatest
    xxhash64 of the full right row wins — an arbitrary but run- and
    partitioning-stable choice.

    Right-hand columns are returned renamed with ``suffix`` when they
    collide with a left column (the timestamp column always carries it).
    """
    keys = [on] if isinstance(on, str) else list(on)
    carry = [c for c in right.columns if c not in keys]
    if tie_break is not None and tie_break not in carry:
        raise ValueError(f"tie_break {tie_break!r} is not a non-key right column")
    out_name = {
        c: (c + suffix if c in left.columns or c == right_ts else c) for c in carry
    }
    taken = set(left.columns) | set(right.columns)
    c_t, c_r, c_side, c_tb, c_m = _internal_names(taken, "t", "r", "side", "tb", "m")

    # one struct per right row => last() matches a whole row atomically
    r_struct = F.struct(*[F.col(c).alias(c) for c in carry])
    r_tb = (
        F.col(tie_break) if tie_break is not None else F.xxhash64(r_struct)
    )
    r_u = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(c_t),
        r_struct.alias(c_r),
        F.lit(0).alias(c_side),
        r_tb.alias(c_tb),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
    )
    l_u = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias(c_t),
        F.lit(None).cast(r_u.schema[c_r].dataType).alias(c_r),
        F.lit(1).alias(c_side),
        F.lit(None).cast(r_u.schema[c_tb].dataType).alias(c_tb),
        *[F.col(c) for c in left.columns if c not in keys],
    )

    # right rows (side 0) sort before left rows (side 1) at equal ts, so
    # an exactly-simultaneous right row is visible to the left row; among
    # equal-ts right rows the tie-break orders them totally, so last()
    # picks the greatest deterministically (nulls_first keeps left rows'
    # null tie-break from sorting after right rows).
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(c_t), F.col(c_side), F.col(c_tb).asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = r_u.unionByName(l_u).withColumn(
        c_m, F.last(c_r, ignorenulls=True).over(w)
    )
    out = matched.where(F.col(c_side) == 1)
    if tolerance_sec is not None:
        horizon = F.col(c_t).cast("double") - F.lit(float(tolerance_sec))
        out = out.withColumn(
            c_m,
            F.when(F.col(c_m)[right_ts].cast("double") >= horizon, F.col(c_m)),
        )
    if how == "inner":
        out = out.where(F.col(c_m).isNotNull())
    elif how != "left":
        raise ValueError(f"how must be inner|left, got {how!r}")
    proj: list[Column] = [F.col(k) for k in keys]
    proj += [F.col(c) for c in left.columns if c not in keys]
    proj += [F.col(c_m)[c].alias(out_name[c]) for c in carry]
    return out.select(*proj)


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_start: str = "start_ts",
    right_end: str = "end_ts",
    bin_width_sec: float = 300.0,
    how: str = "inner",
) -> DataFrame:
    """Join left *point* rows into right *interval* rows
    (``start <= ts < end``) sharing the key(s), as an equi-join.

    Both sides map time onto ``floor(epoch / bin_width)`` bins; an
    interval row is exploded into every bin it overlaps, then the exact
    predicate prunes in-bin misses. With ``bin_width`` ~= the typical
    interval length each interval lands in <= 2-3 bins, so the exploded
    size stays O(|right|) and the join is a plain hash shuffle on
    ``(keys..., bin)`` that AQE can broadcast when one side is small.
    """
    keys = [on] if isinstance(on, str) else list(on)
    wsec = float(bin_width_sec)
    (bin_col,) = _internal_names(set(left.columns) | set(right.columns), "bin")

    def _bin(c: Column) -> Column:
        return F.floor(c.cast("double") / F.lit(wsec)).cast("long")

    r_b = right.withColumn(
        bin_col,
        F.explode(F.sequence(_bin(F.col(right_start)), _bin(F.col(right_end)))),
    )
    l_b = left.withColumn(bin_col, _bin(F.col(left_ts)))
    cond = [l_b[k] == r_b[k] for k in keys] + [
        l_b[bin_col] == r_b[bin_col],
        l_b[left_ts] >= r_b[right_start],
        l_b[left_ts] < r_b[right_end],
    ]
    joined = l_b.join(r_b, cond, how="inner" if how == "inner" else "left_outer")
    # drop the duplicated key/bin columns from the right side
    out = joined.drop(r_b[bin_col]).drop(l_b[bin_col])
    for k in keys:
        out = out.drop(r_b[k])
    return out


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """First-touch ordered funnel: for each user, step i counts as
    reached at the EARLIEST event of type ``steps[i]`` strictly after the
    user's step i-1 reach time (step 0: the user's earliest such event).
    Optional ``within_seconds`` additionally requires every later step to
    land within that horizon of the step-0 time.

    Returns ``(user_col, step, step_idx, reached_ts)`` — one row per
    reached step.

    Plan: filter to step events (pushed to the scan), ONE hash shuffle on
    the user key, ``sort_array(collect_list(...))`` + an ``aggregate``
    higher-order fold that threads the reach-times array through the
    user's time-ordered events — all array-local JVM codegen, no
    per-step self-joins (a k-step funnel as k joins would be k shuffles
    and k scans at 100 TB; this is one of each). Per-user event counts
    bound the array size, the usual streaming-analytics assumption.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    n = len(steps)

    def _lit(s: str) -> str:
        # step names are spliced into SQL text below; escape so a step
        # containing a quote/backslash can't break the expression
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    mp = "map(" + ", ".join(f"{_lit(s)}, {i}" for i, s in enumerate(steps)) + ")"
    within = (
        f" AND (i = 0 OR e.tp_ts <= element_at(acc, 1) "
        f"+ make_interval(0, 0, 0, 0, 0, 0, {int(within_seconds)}))"
        if within_seconds is not None
        else ""
    )
    fold = f"""
      aggregate(
        _ev,
        array_repeat(CAST(NULL AS TIMESTAMP), {n}),
        (acc, e) -> transform(acc, (x, i) ->
          CASE
            WHEN x IS NULL AND i = element_at({mp}, e.tp)
             AND (i = 0 OR (element_at(acc, i) IS NOT NULL
                            AND e.tp_ts > element_at(acc, i))){within}
            THEN e.tp_ts ELSE x END))
    """
    per_user = (
        df.where(F.col(type_col).isin(list(steps)))
        .groupBy(user_col)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("tp_ts"), F.col(type_col).alias("tp")
                    )
                )
            ).alias("_ev")
        )
        .select(user_col, F.expr(fold).alias("_reached"))
    )
    steps_arr = "array(" + ", ".join(_lit(s) for s in steps) + ")"
    return (
        per_user.select(
            user_col,
            F.posexplode(F.col("_reached")).alias("step_idx", "reached_ts"),
        )
        .where(F.col("reached_ts").isNotNull())
        .select(
            user_col,
            F.expr(f"element_at({steps_arr}, step_idx + 1)").alias("step"),
            (F.col("step_idx") + 1).cast("int").alias("step_idx"),
            "reached_ts",
        )
    )


_PERIODS = {"month": 12, "quarter": 4, "year": 1}


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "quarter",
) -> DataFrame:
    """Cohort retention matrix: users grouped by the period of their FIRST
    activity, with distinct-user counts at each period offset since.

    Returns ``(cohort, offset_periods, users)`` — cohort as a label like
    ``1995-Q2``, offset 0 = the cohort period itself.

    Plan: one user-keyed aggregation for first-activity, a user-keyed
    join back (same key — AQE co-locates the exchanges), then one
    (cohort, offset)-keyed count-distinct. Offsets are integer calendar
    arithmetic (year/quarter/month extraction), not interval division, so
    the same expressions run in the oracle.
    """
    if period not in _PERIODS:
        raise ValueError(f"period must be one of {sorted(_PERIODS)}")
    per_year = _PERIODS[period]

    def pidx(c: Column) -> Column:
        if period == "year":
            return F.year(c)
        if period == "quarter":
            return F.year(c) * 4 + (F.quarter(c) - 1)
        return F.year(c) * 12 + (F.month(c) - 1)

    def label(c: Column) -> Column:
        if period == "year":
            return F.year(c).cast("string")
        if period == "quarter":
            return F.concat(
                F.year(c).cast("string"), F.lit("-Q"), F.quarter(c).cast("string")
            )
        return F.concat(
            F.year(c).cast("string"),
            F.lit("-"),
            F.lpad(F.month(c).cast("string"), 2, "0"),
        )

    first = df.groupBy(F.col(user_col).alias("_u")).agg(
        F.min(ts_col).alias("_ft")
    )
    joined = df.join(first, df[user_col] == first["_u"])
    return (
        joined.groupBy(
            label(F.col("_ft")).alias("cohort"),
            (pidx(F.col(ts_col)) - pidx(F.col("_ft")))
            .cast("int")
            .alias("offset_periods"),
        )
        .agg(F.countDistinct(user_col).alias("users"))
    )


def top_paths(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
    prefix_len: int = 5,
    k: int = 20,
) -> DataFrame:
    """Path (user-journey) analysis: each user's first ``prefix_len``
    events in (time, tie) order joined into a path string, counted across
    users, top-``k`` paths returned.

    Returns ``(path, users)``.

    Plan: ONE user-keyed shuffle; the per-user ordering, prefix slice and
    join are array-local (`sort_array` on a (ts, tie, type) struct — the
    tie column makes the order total, so results are deterministic under
    any partitioning); the final count groups on the path string and the
    top-k is orderBy().limit() = TakeOrderedAndProject. Per-user event
    counts bound the collected arrays.
    """
    per_user = (
        df.groupBy(user_col)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("t"),
                        F.col(tie_col).alias("i"),
                        F.col(type_col).alias("e"),
                    )
                )
            ).alias("_ev")
        )
        .select(
            user_col,
            F.array_join(
                F.transform(
                    F.slice("_ev", 1, prefix_len), lambda s: s.getField("e")
                ),
                ">",
            ).alias("path"),
        )
    )
    return (
        per_user.groupBy("path")
        .agg(F.count(F.lit(1)).alias("users"))
        .orderBy(F.desc("users"), F.col("path"))
        .limit(k)
    )


def bounded_trailing_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    horizon: int,
    count_name: str = "trailing_n",
    sum_name: str = "trailing_sum",
    sum_scale: int = 6,
    id_col: str | None = None,
    check_unique: bool = True,
) -> DataFrame:
    """Trailing-horizon count/sum — ``count(*)``/``sum(value)`` over
    ``RANGE BETWEEN horizon PRECEDING AND CURRENT ROW`` per key — with
    **(key, time-bucket) parallelism** instead of one window partition
    per key.

    The plain RANGE-frame formulation puts each key's entire history in
    ONE window partition; under key skew that is the one per-key
    operation that cannot be salted (r13 hotkey probe: 80 % of events on
    one user made ``events_trailing_window`` a 1.43x single-task
    straggler). This operator is the bounded-history answer: because the
    frame only ever reaches ``horizon`` back, an event's frame is
    contained in its own time bucket of width ``horizon`` plus the one
    before it. So:

    1. bucket every event: ``b = floor(ts / horizon)``;
    2. each event contributes TWO rows to one union relation — a *data*
       row in its own bucket and a *probe* row at ``(key, b-1)`` with
       ordering time ``ts - horizon``;
    3. one window over ``(key, bucket)`` ordered by that time computes,
       with RANGE frames (so timestamp ties stay frame peers, exactly
       like the original), a running prefix at data rows (the own-bucket
       part: every earlier in-bucket event is within ``horizon`` by
       construction) and a suffix at probe rows (the previous-bucket
       part: data with ``ts' >= ts - horizon``; probes sort before
       equal-time data so the closed frame edge is kept);
    4. a final ``groupBy`` on the row id adds the two pieces.

    Row identity: when ``id_col`` is given it is the row id (must be
    unique AND non-NULL — NULL ids all share one combine group, so the
    guard raises a dedicated error on any NULL id; the final combine
    shuffles on that narrow key instead of the all-columns struct);
    otherwise the row id is the struct of all columns, so rows of
    ``df`` must be distinct. Either way a
    violated precondition would collapse rows in step 4 into silently
    short sums, so ``check_unique=True`` (the default) plants an
    in-plan guard — each combine group must contain exactly one data
    row — that raises at execution time on the first duplicate. The
    guard rides inside the ``count_name``/``sum_name`` output columns
    (zero extra exchanges); a caller that prunes BOTH away also prunes
    the check. Pass ``check_unique=False`` only when uniqueness is
    already guaranteed upstream.

    Decimal partial sums make the split exact: the two pieces are summed
    in ``DECIMAL(18, sum_scale)`` and added, which is associative, so the
    result is bit-identical to the single-frame sum. Null semantics
    match too (sum is NULL iff every value in the frame is NULL).

    Cost: two hash exchanges — ``(key, bucket)`` for the window and the
    row id for the final combine — vs the single-key formulation's one.
    The trade is deliberate: both of this plan's exchanges hash on keys
    whose cardinality GROWS with data (hot key x bucket, and the unique
    row id), so the max task is bounded by events-per-key-per-horizon,
    not events-per-key. Use the plain RANGE frame when keys are known to
    be well distributed; use this when one key can own the stream.

    The reference (NexVeridian/wikidata-to-surrealdb) has no windowed
    analytics; this extends the driver-mandated event-stream family.
    """
    if horizon <= 0:
        raise ValueError(f"bounded_trailing_agg: horizon must be > 0, got {horizon}")
    if id_col is not None and id_col not in df.columns:
        raise ValueError(
            f"bounded_trailing_agg: id_col {id_col!r} not in {df.columns}"
        )
    taken = set(df.columns)
    c_bucket, c_t, c_to, c_isdata, c_val, c_rid, c_n, c_s, c_chk, c_g = (
        _internal_names(
            taken,
            "bucket", "t", "to", "isdata", "val", "rid", "n", "s",
            "chk", "g",
        )
    )
    dec = f"decimal(18,{sum_scale})"
    base = df.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(value_col).cast(dec).alias(c_val),
        # backtick-quoted resolution, so a column literally named
        # 'event.id' lands as one struct field, not a dot path
        F.struct(*[_qc(c).alias(c) for c in df.columns]).alias(c_rid),
    )
    # exact integer bucket: double division can round a just-below-
    # integer quotient up at epoch-microsecond magnitudes, and plain
    # `div` truncates toward zero (ts=-1 and ts=+1 would share bucket
    # 0, breaking the two-piece decomposition for pre-epoch data) —
    # (t - pmod(t, h)) div h is an exact bigint FLOOR division for
    # either sign
    h = int(horizon)
    t_sql = f"CAST(`{ts_col}` AS BIGINT)"
    bucket_expr = F.expr(f"({t_sql} - pmod({t_sql}, {h})) div {h}")
    data = base.select(
        F.col(key_col),
        bucket_expr.alias(c_bucket),
        F.col(ts_col).cast("long").alias(c_t),
        F.lit(1).alias(c_isdata),
        F.col(c_val),
        F.col(c_rid),
    )
    probe = base.select(
        F.col(key_col),
        (bucket_expr - F.lit(1)).alias(c_bucket),
        (F.col(ts_col).cast("long") - F.lit(horizon)).alias(c_t),
        F.lit(0).alias(c_isdata),
        F.lit(None).cast(dec).alias(c_val),
        F.col(c_rid),
    )
    u = data.unionByName(probe)
    # one ordering, two RANGE frames. Ordering by (2*t + isdata) keeps a
    # single numeric RANGE key while sorting probes (isdata=0) before
    # data (isdata=1) at equal time, so the prefix at a data row sees
    # every in-bucket event with ts' <= ts (ties included, like the
    # original frame peers) and the suffix at a probe row sees every
    # previous-bucket event with ts' >= ts - horizon (closed edge).
    u = u.withColumn(c_to, F.col(c_t) * F.lit(2) + F.col(c_isdata))
    w = Window.partitionBy(key_col, c_bucket).orderBy(c_to)
    prefix = w.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    suffix = w.rangeBetween(Window.currentRow, Window.unboundedFollowing)
    piece_n = F.when(
        F.col(c_isdata) == 1, F.sum(c_isdata).over(prefix)
    ).otherwise(F.sum(c_isdata).over(suffix))
    piece_s = F.when(
        F.col(c_isdata) == 1, F.sum(c_val).over(prefix)
    ).otherwise(F.sum(c_val).over(suffix))
    pieces = u.select(
        F.col(c_rid),
        F.col(c_isdata),
        piece_n.alias(c_n),
        piece_s.alias(c_s),
    )
    # combine key: the explicit id when given (narrow shuffle key),
    # else the all-columns struct; each group holds exactly the data
    # row + probe row of ONE source row when the precondition holds,
    # so sum(isdata) == 1 IS the uniqueness check
    # item access ([...]) resolves the field BY NAME with no dot-path
    # parsing, so an id column whose name contains a '.' still works
    group_key = (
        F.col(c_rid)[id_col].alias(c_g)
        if id_col is not None
        else F.col(c_rid).alias(c_g)
    )
    combined = pieces.groupBy(group_key).agg(
        F.first(c_rid).alias(c_rid),
        F.sum(c_n).cast("bigint").alias(count_name),
        # NULL iff both pieces are NULL iff every frame value is NULL --
        # sum() already skips NULLs and DECIMAL addition is exact, so
        # the two-piece sum is bit-identical to the one-frame sum
        F.sum(c_s).alias(sum_name),
        F.sum(c_isdata).alias(c_chk),
    )
    if check_unique:
        # in-plan guard: evaluates per output row inside the same
        # codegen stage, raises on the first collapsed duplicate
        # NULL ids all land in ONE combine group (groupBy treats NULLs
        # as equal), so two DISTINCT rows with NULL ids would trip the
        # duplicate guard even though the struct-key mode keeps them
        # apart — raise a dedicated, accurate error for that case
        null_id_err = (
            F.raise_error(
                F.lit(
                    "bounded_trailing_agg: id_col "
                    f"{id_col!r} contains NULL — NULL ids cannot "
                    "identify rows (all NULLs share one combine "
                    "group); drop/repair NULL ids or omit id_col to "
                    "use whole-row identity"
                )
            )
            if id_col is not None
            else None
        )

        def guarded(col: str):
            base_case = F.when(F.col(c_chk) == 1, F.col(col))
            if null_id_err is not None:
                base_case = F.when(
                    F.col(c_g).isNull(), null_id_err
                ).when(F.col(c_chk) == 1, F.col(col))
            return base_case.otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "bounded_trailing_agg: duplicate row id — "
                        ),
                        # concat returns NULL if any piece is NULL,
                        # which would erase the whole diagnostic for
                        # duplicate NULL ids — spell those out
                        F.coalesce(
                            F.col(c_g).cast("string"), F.lit("NULL")
                        ),
                        F.lit(
                            " appears more than once; pass a unique "
                            "id_col or deduplicate the input "
                            "(check_unique=False skips this guard)"
                        ),
                    )
                )
            ).alias(col)

        out_n, out_s = guarded(count_name), guarded(sum_name)
    else:
        out_n, out_s = F.col(count_name), F.col(sum_name)
    return combined.select(
        # item access resolves each struct field by exact name, so
        # original column names containing '.' survive the round-trip
        *[F.col(c_rid)[c].alias(c) for c in df.columns],
        out_n,
        out_s,
    )
