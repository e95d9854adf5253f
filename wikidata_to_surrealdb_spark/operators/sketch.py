"""Deterministic, engine-portable approximate-distinct sketch (KMV).

Spark's ``approx_count_distinct`` (HLL++) and DuckDB's ``approx_*`` are
black boxes with different internals — their estimates can never
hash-match across engines, so they can't sit behind the driver's oracle
gate. The K-Minimum-Values sketch (Bar-Yossef et al. 2002) can: it needs
only (1) a uniform hash — md5, bit-identical in both engines — and
(2) the k-th smallest hash value, a fully deterministic order statistic.
Estimate: ``(k - 1) / v_k`` where ``v_k`` is the k-th min hash mapped to
[0, 1).

Scale shape: a naive ``distinct().orderBy().limit(k)`` ships EVERY
distinct hash through the exchange. Instead the k minima are found with
a hash-threshold prefilter (the theta-sketch trick): a bounded-state
stats pass (count + HLL estimate D-hat, partial aggs only — no data
shuffle) picks a threshold t ~ oversample*k/D-hat; only hashes below t
(~oversample*k of them, regardless of cardinality) enter the
distinct/top-k. Correctness never depends on t — if at least k distinct
hashes fall below t, the k global minima all do too; a verification
rescan (probability ~exp(-k*oversample/3), i.e. never) covers the miss
case. KMV sketches stay mergeable (union hash sets, re-take k smallest)
for partitioned/streaming rollups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# numeric value of the first 12 hex chars (48 bits — exact in BIGINT and
# DOUBLE) of an md5 hex digest; the SAME SQL text runs in Spark and
# DuckDB (ANSI position(x IN y), substring, integer literals).
HEX_SPACE = 16**12


def hex12_num_sql(h: str) -> str:
    """SQL expression: integer value of the first 12 hex chars of ``h``."""
    # CAST every term to BIGINT explicitly: Spark's ANSI mode otherwise
    # multiplies the INT position() result with INT arithmetic and
    # overflows at 16^8 (DuckDB auto-widens; the cast is a no-op there).
    terms = " + ".join(
        f"CAST(position(substring({h}, {i + 1}, 1) IN '0123456789abcdef') - 1"
        f" AS BIGINT) * CAST({16 ** (11 - i)} AS BIGINT)"
        for i in range(12)
    )
    return f"({terms})"


def _threshold_hex(frac: float) -> str:
    """12-lower-hex-char string t such that ``h < t`` (string compare on
    the md5 hex digest) keeps ~``frac`` of a uniform hash space."""
    thr = max(1, min(HEX_SPACE, int(frac * HEX_SPACE)))
    return format(thr, "012x")


def threshold_hex_col(count_col: Column, budget: float) -> Column:
    """Column form of :func:`_threshold_hex` for per-group thresholds:
    the 12-lower-hex string keeping ~``budget`` of ``count_col`` uniform
    md5 hashes, or NULL when the group is already within budget (no
    filter needed). Shared by the grouped KMV sketch and the stratified
    sampler so the clamping/width rules stay in one place."""
    frac = F.least(F.lit(1.0), F.lit(float(budget)) / count_col.cast("double"))
    return F.when(
        count_col > budget,
        F.lower(
            F.lpad(
                F.hex(
                    F.greatest(
                        F.lit(1),
                        (frac * F.lit(float(HEX_SPACE))).cast("bigint"),
                    )
                ),
                12,
                "0",
            )
        ),
    )


def kmv_distinct(
    df: DataFrame,
    col: str | Column,
    k: int = 64,
    seed: str = "kmv-v1",
    oversample: float = 8.0,
) -> DataFrame:
    """One-row DataFrame: (kmv_k, n_hashes, kmv_estimate) — the KMV
    approximate distinct count of ``col``.

    If the column has fewer than k distinct values the sketch holds them
    all and the estimate is exact (standard KMV small-cardinality
    fallback). ``n_hashes`` is the number of hashes actually held
    (min(k, distinct)).

    Plan shape (the 100 TB contract): a stats pass with bounded
    aggregation state (count + HLL D-hat; partial aggs, no data rows
    shuffled) chooses a hash threshold keeping ~``oversample * k``
    candidate hashes; the distinct/top-k then exchanges only those
    candidates — per map task at most the distinct hashes below t, so
    exchange volume is O(oversample * k) rows instead of the full
    cardinality. The threshold only ever prunes; the k global minima are
    below it whenever >= k distinct hashes are (verified, with a full
    rescan fallback whose trigger probability is ~exp(-k*oversample/3)).
    This function runs the stats pass (and the k-row verification count)
    eagerly; the returned 1-row plan is lazy.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    if oversample <= 0:
        raise ValueError("oversample must be > 0")
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(F.concat(F.lit(seed + ":"), c.cast("string")))
    hashes = df.select(h.alias("h")).where(F.col("h").isNotNull())
    stats = hashes.agg(
        F.count("*").alias("n"), F.approx_count_distinct("h").alias("d")
    ).first()
    filtered = stats["n"] > 0 and stats["d"] > oversample * k
    if filtered:
        cand = hashes.where(
            F.col("h") < F.lit(_threshold_hex(oversample * k / stats["d"]))
        )
    else:
        cand = hashes
    kmin = cand.distinct().orderBy("h").limit(k)
    if filtered and kmin.count() < k:
        # HLL overestimated the cardinality badly enough that < k distinct
        # hashes fell below t: fall back to the unfiltered scan.
        kmin = hashes.distinct().orderBy("h").limit(k)
    num = F.expr(hex12_num_sql("h"))
    return (
        kmin.select(F.col("h"), num.alias("hnum"))
        .agg(
            F.count("*").alias("n_hashes"),
            F.max("hnum").alias("vk"),
        )
        .select(
            F.lit(k).cast("bigint").alias("kmv_k"),
            F.col("n_hashes").cast("bigint").alias("n_hashes"),
            F.when(
                F.col("n_hashes") < k, F.col("n_hashes").cast("double")
            )
            .otherwise(
                (F.lit(k - 1) * F.lit(float(HEX_SPACE))) / F.col("vk").cast("double")
            )
            .alias("kmv_estimate_raw"),
        )
    )


def sample_quantiles(
    df: DataFrame,
    value_col: str,
    id_col: str,
    ps: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99),
    k: int = 1024,
    seed: str = "sq-v1",
) -> DataFrame:
    """Deterministic sampled quantiles: one row per probe ``p`` with
    (p, q_value, sample_size).

    The sample is the ``k`` rows whose md5(seed:id) hashes are smallest —
    a bottom-k hash sample, i.e. a uniform random sample that is (1)
    DETERMINISTIC (same data, same sample — retry/engine-stable, unlike
    ``TABLESAMPLE``), and (2) MERGEABLE (union two samples, re-take the k
    smallest hashes == the sample of the union), the property that lets
    per-partition / per-day sketches roll up. The quantile at ``p`` is
    the sample value at rank ceil(p * m) ordered by (value, hash) —
    percentile_disc semantics with a deterministic tie-break. Rank error
    is O(1/sqrt(k)) of the population.

    Duplicate ``id_col`` values hash identically, so the bottom-k cut is
    taken on the composite key (hash, value): ties at the boundary then
    resolve identically in Spark and the oracle. (Rows duplicated in
    BOTH id and value are interchangeable, so any residual tie is
    value-invariant.)

    Plan shape: bottom-k-by-hash compiles to TakeOrderedAndProject —
    per-partition top-k merged on the driver, NO shuffle at any scale;
    the rank window then runs over k rows (single tiny task by design).
    Unlike t-digest/KLL this is engine-portable: the oracle reproduces
    the exact sample and the exact answers."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if not ps or not all(0 < p <= 1 for p in ps):
        raise ValueError("each p must be in (0, 1]")
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    # NULL ids hash to NULL, which Spark's ascending sort puts FIRST
    # (nondeterministic tie-break among them) and DuckDB's puts last —
    # exclude them so the sample stays deterministic and engine-identical
    sample = (
        df.where(F.col(value_col).isNotNull() & F.col(id_col).isNotNull())
        .select(h.alias("_h"), F.col(value_col).alias("_v"))
        .orderBy("_h", "_v")
        .limit(k)
    )
    w = Window.orderBy("_v", "_h")
    ranked = sample.withColumn("_r", F.row_number().over(w)).withColumn(
        "_m", F.count("*").over(Window.partitionBy(F.lit(1)))
    )
    # attach probes by filtering a literal array per row instead of
    # joining a probe relation: the rank condition mixes columns from
    # both sides, which a join could only plan as a nested loop
    lit_ps = F.array(*[F.lit(float(p)) for p in ps])
    matched = F.filter(
        lit_ps,
        lambda p: F.ceil(p * F.col("_m")).cast("int") == F.col("_r"),
    )
    return (
        ranked.select(
            F.explode(matched).alias("p"),
            F.col("_v").alias("q_value"),
            F.col("_m").cast("bigint").alias("sample_size"),
        )
        .orderBy("p")
    )


def sample_quantiles_oracle_sql(
    table: str,
    value_col: str,
    id_col: str,
    ps: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99),
    k: int = 1024,
    seed: str = "sq-v1",
) -> str:
    """DuckDB twin of :func:`sample_quantiles` (identical sample,
    identical ranks, identical values)."""
    plist = ", ".join(repr(float(p)) for p in ps)
    return f"""
    WITH s AS (
      SELECT md5('{seed}:' || CAST({id_col} AS VARCHAR)) AS h,
             {value_col} AS v
      FROM {table}
      WHERE {value_col} IS NOT NULL AND {id_col} IS NOT NULL
      ORDER BY h, v LIMIT {k}
    ), r AS (
      SELECT v, h,
             row_number() OVER (ORDER BY v, h) AS r,
             count(*) OVER () AS m
      FROM s
    ), p AS (SELECT CAST(unnest([{plist}]) AS DOUBLE) AS p)
    SELECT p.p, r.v AS q_value, CAST(r.m AS BIGINT) AS sample_size
    FROM r JOIN p ON r.r = CAST(ceil(p.p * r.m) AS INT)
    ORDER BY p.p
    """


def _cm_bucket_sql(value_expr: str, d: int, seed: str, width: int) -> str:
    """SQL: count-min cell for ``value_expr`` in row ``d`` (md5-derived,
    engine-portable)."""
    h = f"md5('{d}:{seed}:' || {value_expr})"
    return f"({hex12_num_sql(h)} % {width})"


def countmin_build(
    df: DataFrame,
    col: str = "term",
    width: int = 512,
    depth: int = 4,
    seed: str = "cm-v1",
) -> DataFrame:
    """Count-min sketch of a value stream (Cormode & Muthukrishnan 2005):
    ``depth`` md5-derived hash rows x ``width`` cells; cell = count of
    items hashing there. Returns (d, bucket, c) — width*depth rows total,
    independent of stream size.

    Scale shape: the d-fold explode is map-local; the only shuffle keys
    on (d, bucket) — at most width*depth distinct keys, so map-side
    partial aggregation collapses each partition to <= width*depth rows
    before the exchange. Sketches are mergeable by cell-wise addition
    (union two sketches -> groupBy (d, bucket) sum), the streaming/
    partitioned rollup property that exact counts lack."""
    rows = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.expr(_cm_bucket_sql(col, d, seed, width)).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("_r"))
        .select("_r.d", "_r.bucket")
        .groupBy("d", "bucket")
        .agg(F.count("*").cast("bigint").alias("c"))
    )


def countmin_estimate(
    cm: DataFrame,
    values: list[str],
    width: int = 512,
    depth: int = 4,
    seed: str = "cm-v1",
) -> DataFrame:
    """Point-frequency estimates for literal ``values`` from a
    countmin_build sketch: est = min over hash rows of the value's cell
    count (an upper bound on the true count; error <= stream_size * e /
    width with probability 1 - e^-depth). The probe set is a literal
    VALUES relation broadcast against the fixed-size sketch."""
    spark = cm.sparkSession
    from wikidata_to_surrealdb_spark.functions import local_relation

    probes = local_relation(spark, [(v,) for v in values], "value string")
    cells = probes.select(
        "value",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.expr(_cm_bucket_sql("value", d, seed, width)).alias(
                            "bucket"
                        ),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("_r"),
    ).select("value", "_r.d", "_r.bucket")
    return (
        cells.join(cm, ["d", "bucket"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("bigint").alias("cm_est"))
    )


def kmv_distinct_by(
    df: DataFrame,
    group_col: str,
    col: str,
    k: int = 32,
    seed: str = "kmv-v1",
    oversample: float = 8.0,
) -> DataFrame:
    """Grouped KMV: one approximate-distinct estimate PER GROUP (e.g.
    distinct users per event type) — one row per group:
    (group, n_hashes, kmv_estimate_raw).

    Shape: a per-group stats pass (HLL D-hat per group; bounded partial
    aggs, exchange = one sketch row per group) derives a per-group hash
    threshold keeping ~``oversample * k`` hashes; the thresholds
    broadcast-join back onto the pair stream (caller contract: the
    group-cardinality table fits a broadcast — thousands to millions of
    groups, not billions), the filtered pairs are deduped (bounded
    exchange: O(oversample * k) per group, not the per-group
    cardinality), and a per-group rank window keeps the k smallest —
    groups parallelize across the cluster, per-group state is O(k).
    Groups below ``oversample * k`` estimated cardinality skip the
    filter entirely, so the small-cardinality exact fallback of
    :func:`kmv_distinct` is preserved. A verification pass (eager, cheap
    — it counts the k-row-per-group candidate set) rescans only the
    groups where the threshold left < k distinct hashes (probability
    ~exp(-k*oversample/3) per group, i.e. never).
    """
    from pyspark.sql.window import Window

    if k < 2:
        raise ValueError("k must be >= 2")
    if oversample <= 0:
        raise ValueError("oversample must be > 0")
    h = F.md5(F.concat(F.lit(seed + ":"), F.col(col).cast("string")))
    raw_pairs = df.where(F.col(col).isNotNull()).select(
        F.col(group_col), h.alias("h")
    )
    ok = float(oversample * k)
    stats = raw_pairs.groupBy(group_col).agg(
        F.approx_count_distinct("h").alias("_dhat")
    )
    # per-group 12-hex-char threshold; NULL = no filter (small group)
    t_hex = threshold_hex_col(F.col("_dhat"), ok)
    # eqNullSafe joins throughout: a NULL group key is a legitimate group
    # (the pre-threshold implementation kept it) and an equi-join would
    # silently drop it.
    thresholds = stats.select(
        F.col(group_col).alias("_tg"), t_hex.alias("_t"), "_dhat"
    )
    pairs = (
        raw_pairs.join(
            F.broadcast(thresholds),
            F.col(group_col).eqNullSafe(F.col("_tg")),
        )
        .where(F.col("_t").isNull() | (F.col("h") < F.col("_t")))
        .select(group_col, "h")
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("h")
    kmin = pairs.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)

    # verification: any filtered group left with < k distinct hashes is
    # rescanned unfiltered (never happens with 8x oversample; the count
    # itself runs over the already-pruned candidate set, so it's cheap).
    # Anchored on `thresholds`, NOT on the kept rows: a group whose
    # threshold keeps ZERO candidates has no kmin rows to group and would
    # otherwise vanish from the check — and from the output.
    kept = kmin.groupBy(group_col).agg(F.count("*").alias("_n"))
    short = (
        thresholds.join(
            kept, F.col("_tg").eqNullSafe(F.col(group_col)), "left"
        )
        .where(
            F.col("_t").isNotNull()
            & (F.coalesce(F.col("_n"), F.lit(0)) < k)
        )
        .select(F.col("_tg").alias("_bad"))
    )
    if short.count() > 0:
        exact_pairs = (
            raw_pairs.join(
                F.broadcast(short),
                F.col(group_col).eqNullSafe(F.col("_bad")),
                "left_semi",
            )
            .distinct()
        )
        exact_kmin = exact_pairs.withColumn("_rn", F.row_number().over(w)).where(
            F.col("_rn") <= k
        )
        kmin = (
            kmin.join(
                F.broadcast(short),
                F.col(group_col).eqNullSafe(F.col("_bad")),
                "left_anti",
            )
            .union(exact_kmin)
        )
    num = F.expr(hex12_num_sql("h"))
    return (
        kmin.select(F.col(group_col), num.alias("hnum"))
        .groupBy(group_col)
        .agg(
            F.count("*").cast("bigint").alias("n_hashes"),
            F.max("hnum").alias("vk"),
        )
        .select(
            group_col,
            "n_hashes",
            F.when(F.col("n_hashes") < k, F.col("n_hashes").cast("double"))
            .otherwise(
                (F.lit(k - 1) * F.lit(float(HEX_SPACE))) / F.col("vk").cast("double")
            )
            .alias("kmv_estimate_raw"),
        )
    )


# ---------------------------------------------------------------------------
# HyperLogLog (deterministic, engine-portable, mergeable)
# ---------------------------------------------------------------------------
#
# Same motivation as KMV above: Spark's approx_count_distinct and DuckDB's
# approx_* can never hash-match. This HLL is built from md5 + integer CASE
# arithmetic only, so both engines compute IDENTICAL registers and — since
# the estimator text below is shared verbatim — bit-identical estimates.
# Registers are the classic Flajolet et al. 2007 sketch: p = 8 (m = 256
# registers), register index = first byte of md5, rho = leading-zero count
# of the next 48 hash bits + 1. Register relations are MERGEABLE: the
# union of two sketches is groupBy(register).max(rho) — which is what
# makes per-partition partial aggregation (and cross-group rollups) free.

_HLL_M = 256  # registers (p = 8)
_HLL_BITS = 48  # rho bits (12 hex chars)
# CAST: DuckDB types a bare decimal literal as DECIMAL and overflows
# multiplying it; both engines parse the literal to the same double.
_HLL_ALPHA = f"CAST({0.7213 / (1 + 1.079 / 256)!r} AS DOUBLE)"


def _hll_rho_sql(v: str) -> str:
    """rho = leading zeros of the 48-bit value + 1, as a searched CASE
    (exact integer comparisons — no log2, which is libm and not
    bit-portable)."""
    branches = "".join(
        f" WHEN {v} >= {2 ** (47 - i)} THEN {i + 1}" for i in range(48)
    )
    return f"(CASE{branches} ELSE 49 END)"


def _hll_term_sql(m: str) -> str:
    """2^(49 - M) as an exact BIGINT (M in 1..49): the register's
    2^-M indicator scaled by 2^49 so the harmonic-mean denominator sums
    in exact integer arithmetic, immune to float-order drift."""
    branches = "".join(
        f" WHEN {m} = {j} THEN CAST({2 ** (49 - j)} AS BIGINT)" for j in range(1, 50)
    )
    return f"(CASE{branches} END)"


def hll_reg_rho_sql(str_expr: str) -> tuple[str, str]:
    """(register, rho) SQL texts for an already-string-cast value
    expression. The same text runs on Spark and DuckDB."""
    h = f"md5({str_expr})"
    reg = (
        f"(CAST(position(substring({h}, 1, 1) IN '0123456789abcdef') - 1 AS BIGINT)"
        f" * 16"
        f" + CAST(position(substring({h}, 2, 1) IN '0123456789abcdef') - 1 AS BIGINT))"
    )
    v48 = hex12_num_sql(f"substring({h}, 3, 12)")
    return reg, _hll_rho_sql(f"({v48})")


def hll_estimate_sql(sum_terms: str, n_regs: str) -> str:
    """Estimate SQL from the summed non-empty register terms and the
    non-empty register count — shared verbatim by both engines so the
    double arithmetic is bit-identical. Includes the small-range
    linear-counting correction (ln via the bit-portable plog10)."""
    from wikidata_to_surrealdb_spark.functions import plog10_sql

    # empty registers contribute 2^49 each (rho 0 -> 2^-0 = 1)
    s = f"(({sum_terms}) + ({_HLL_M} - ({n_regs})) * CAST({2 ** 49} AS BIGINT))"
    v = f"({_HLL_M} - ({n_regs}))"
    raw = f"(({_HLL_ALPHA} * 65536.0) / (CAST({s} AS DOUBLE) / {float(2 ** 49)}))"
    lc = f"(256.0 * ({plog10_sql(f'256.0 / {v}')}) * 2.302585092994046)"
    return f"(CASE WHEN {raw} <= 640.0 AND {v} > 0 THEN {lc} ELSE {raw} END)"


def hll_registers(
    df: DataFrame, value_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Per-group HLL register relation ``group_cols + (reg, m)``.

    ONE shuffle on (group, reg) — at most |groups| * 256 rows survive the
    map-side partial max, so shuffle volume is sketch-sized, not
    data-sized: the whole point of HLL at 100 TB. The output is a
    first-class mergeable sketch table: persist it partitioned by group,
    and any later union/rollup is a 256-row-per-group max."""
    group_cols = group_cols or []
    reg, rho = hll_reg_rho_sql(f"CAST({value_col} AS STRING)")
    keyed = df.select(
        *group_cols, F.expr(reg).alias("reg"), F.expr(rho).alias("rho")
    )
    return keyed.groupBy(*group_cols, "reg").agg(F.max("rho").alias("m"))


def hll_estimate(
    registers: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Distinct-count estimates from a register relation (per group, or
    one global row when ``group_cols`` is empty — merging registers of
    every group first, which is how sketches roll up)."""
    group_cols = group_cols or []
    merged = registers.groupBy(*group_cols, "reg").agg(F.max("m").alias("m"))
    per_group = merged.groupBy(*group_cols).agg(
        F.sum(F.expr(_hll_term_sql("m"))).alias("_s"),
        F.count(F.lit(1)).alias("_n"),
    )
    est = F.expr(hll_estimate_sql("_s", "_n"))
    from wikidata_to_surrealdb_spark.functions import fround

    return per_group.select(
        *group_cols, fround(est, 4).alias("approx_distinct")
    )


def kmv_set_ops(
    df: DataFrame,
    group_col: str,
    col: str,
    group_a: str,
    group_b: str,
    k: int = 64,
    seed: str = "kmv-v1",
) -> DataFrame:
    """KMV sketch SET ALGEBRA (Beyer et al. 2007): estimate the distinct
    union, intersection, and Jaccard of two sets from their bottom-k
    hash sketches alone — the primitive that answers "how much do these
    two corpora overlap?" without ever joining them.

    Method: per set, the k smallest md5(seed:value) hashes; the union
    sketch is the k smallest of the merged sketches, giving the
    standard KMV union estimate; within the union sketch, the fraction
    ``rho`` of hashes present in BOTH input sketches estimates
    Jaccard, and ``rho * union_est`` the intersection. When a side has
    fewer than k distinct values its sketch IS the set, and small
    unions are exact (the usual KMV fallback).

    Determinism: md5 basis and first-minimum tie-freedom (hashes are
    distinct with overwhelming probability; md5 collisions would break
    far more than this) — the DuckDB oracle replays the estimator bit
    for bit, estimates included.

    Scale: each sketch is a distinct + TakeOrderedAndProject over one
    group's values — bounded k-row outputs; everything after operates
    on <= 3k rows. (For corpora where even the per-group distinct is
    the bottleneck, the same threshold prefilter kmv_distinct uses
    applies; at sketch sizes this small it has never been the cost.)
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    h = F.md5(F.concat(F.lit(seed + ":"), F.col(col).cast("string")))

    def sketch(group: str) -> DataFrame:
        return (
            df.where(F.col(group_col) == group)
            .select(h.alias("h"))
            .where(F.col("h").isNotNull())
            .distinct()
            .orderBy("h")
            .limit(k)
        )

    ha, hb = sketch(group_a), sketch(group_b)
    u = ha.union(hb).distinct().orderBy("h").limit(k)
    both = ha.join(hb, "h", "left_semi")
    marked = u.join(
        both.withColumn("_inboth", F.lit(True)), "h", "left"
    )
    num = F.expr(hex12_num_sql("h"))
    agg = marked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_u"),
        F.max(num).alias("vk"),
        F.sum(F.when(F.col("_inboth"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_both"),
    )
    union_est = F.when(
        F.col("n_u") < k, F.col("n_u").cast("double")
    ).otherwise(
        (F.lit(k - 1) * F.lit(float(HEX_SPACE))) / F.col("vk").cast("double")
    )
    from wikidata_to_surrealdb_spark.functions import fround

    return agg.select(
        F.lit(k).cast("bigint").alias("kmv_k"),
        F.col("n_u").alias("n_union_hashes"),
        F.col("n_both").alias("n_shared_hashes"),
        fround(union_est, 4).alias("union_est"),
        fround(
            (F.col("n_both").cast("double") / F.col("n_u").cast("double"))
            * union_est,
            4,
        ).alias("inter_est"),
        fround(
            F.col("n_both").cast("double") / F.col("n_u").cast("double"), 4
        ).alias("jaccard_est"),
    )
