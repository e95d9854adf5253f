"""Deterministic, engine-portable approximate-distinct sketch (KMV).

Spark's ``approx_count_distinct`` (HLL++) and DuckDB's ``approx_*`` are
black boxes with different internals — their estimates can never
hash-match across engines, so they can't sit behind the driver's oracle
gate. The K-Minimum-Values sketch (Bar-Yossef et al. 2002) can: it needs
only (1) a uniform hash — md5, bit-identical in both engines — and
(2) the k-th smallest hash value, a fully deterministic order statistic.
Estimate: ``(k - 1) / v_k`` where ``v_k`` is the k-th min hash mapped to
[0, 1).

Scale shape: the k smallest hashes of a 100 TB column are computed as a
per-partition top-k merged on the driver (Spark's TakeOrderedAndProject
— no global sort, no full shuffle), and KMV sketches are mergeable
(union the hash sets, re-take k smallest) for partitioned/streaming
rollups.
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


def kmv_distinct(
    df: DataFrame, col: str | Column, k: int = 64, seed: str = "kmv-v1"
) -> DataFrame:
    """One-row DataFrame: (kmv_k, n_hashes, kmv_estimate) — the KMV
    approximate distinct count of ``col``.

    If the column has fewer than k distinct values the sketch holds them
    all and the estimate is exact (standard KMV small-cardinality
    fallback). ``n_hashes`` is the number of hashes actually held
    (min(k, distinct)).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(F.concat(F.lit(seed + ":"), c.cast("string")))
    kmin = (
        df.select(h.alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
        .orderBy("h")
        .limit(k)
    )
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
    probes = spark.createDataFrame([(v,) for v in values], "value string")
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
) -> DataFrame:
    """Grouped KMV: one approximate-distinct estimate PER GROUP (e.g.
    distinct users per event type) — one row per group:
    (group, n_hashes, kmv_estimate_raw).

    Shape: distinct (group, hash) pairs (map-side combine collapses
    duplicates before the shuffle), then a per-group rank window keeps
    the k smallest hashes — the window partitions by group, so a
    thousand groups parallelize across the cluster; per-group state is
    O(k). Same estimator and small-cardinality fallback as
    :func:`kmv_distinct`."""
    from pyspark.sql.window import Window

    if k < 2:
        raise ValueError("k must be >= 2")
    h = F.md5(F.concat(F.lit(seed + ":"), F.col(col).cast("string")))
    pairs = (
        df.where(F.col(col).isNotNull())
        .select(F.col(group_col), h.alias("h"))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("h")
    kmin = pairs.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
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
