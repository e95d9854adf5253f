"""Partitioned table layout + small-file compaction.

At 100 TB the physical layout is as load-bearing as the plan: a
date/hour-partitioned table lets every time-bounded scan prune whole
directories before a single byte is read (PartitionFilters in the scan
node, no footer reads for pruned partitions), and the file-count/size
profile decides scheduler overhead — a million 1 MB files costs more in
task setup + NameNode/listing pressure than the scan itself.

Two failure modes this module addresses:
- **Over-fragmentation at write time**: a naive
  ``df.write.partitionBy(dt)`` emits one file per (task, partition-value)
  pair — with 1000 tasks × 365 days that is 365k files of a few KB.
  ``write_partitioned`` repartitions on the partition columns first
  (+ an optional split factor for hot partitions), so each partition
  directory gets a bounded number of near-target-size files.
- **Accumulated fragmentation**: streaming/incremental appends grow
  small files over time. ``compact_partitions`` rewrites only the
  fragmented partitions (files < threshold), sized to a target
  bytes-per-file, atomically via dynamic partition overwrite — untouched
  partitions are never rewritten (crucial when 99% of a 100 TB table is
  cold history).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | str,
    files_per_partition: int = 1,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` directory-partitioned by ``partition_by`` with a
    bounded file count per partition value.

    The pre-write repartition keys on the partition columns (plus a
    uniform salt when ``files_per_partition > 1`` so one hot partition
    value can still spread over several writer tasks/files). One shuffle
    at write time buys every future reader partition pruning and a sane
    file profile. ``max_records_per_file`` additionally caps row count
    per file (Spark splits oversized writer outputs transparently)."""
    cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    if files_per_partition < 1:
        raise ValueError("files_per_partition must be >= 1")
    if files_per_partition == 1:
        spread = df.repartition(*[F.col(c) for c in cols])
    else:
        salt = (F.crc32(F.concat_ws("\x1f", *[F.col(c) for c in cols]))
                + F.spark_partition_id()) % files_per_partition
        spread = df.repartition(
            *[F.col(c) for c in cols], salt.alias("_file_salt")
        )
    writer = spread.write.mode(mode).partitionBy(*cols)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def partition_file_profile(spark: SparkSession, path: str) -> DataFrame:
    """File-level layout profile of a partitioned parquet table:
    (partition_dir, n_files, total_bytes, min/max file bytes). Driver-side
    directory listing — metadata only, never reads data files. At real
    scale, swap the listing for the catalog's file index; the contract
    (decide which partitions need compaction) is unchanged."""
    rows = []
    for dirpath, _dirnames, filenames in os.walk(path):
        data = [f for f in filenames if f.endswith(".parquet")]
        if not data:
            continue
        rel = os.path.relpath(dirpath, path)
        sizes = [os.path.getsize(os.path.join(dirpath, f)) for f in data]
        rows.append((rel, len(sizes), sum(sizes), min(sizes), max(sizes)))
    from wikidata_to_surrealdb_spark.functions import local_relation

    return local_relation(
        spark,
        rows,
        "partition_dir string, n_files bigint, total_bytes bigint, "
        "min_file_bytes bigint, max_file_bytes bigint",
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_by: list[str] | str,
    target_file_bytes: int = 128 * 1024 * 1024,
    small_file_bytes: int | None = None,
) -> list[str]:
    """Rewrite fragmented partitions of a parquet table to ~target-size
    files; return the rewritten partition dirs.

    A partition qualifies when it has >1 file and its mean file size is
    below ``small_file_bytes`` (default: target/2). Qualifying partitions
    are re-read with a partition-pruned scan, coalesced to
    ceil(total_bytes / target_file_bytes) files, and swapped in via
    dynamic partition overwrite — an atomic per-partition replace that
    leaves every other partition byte-identical (no full-table rewrite,
    no reader downtime)."""
    cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    small = small_file_bytes if small_file_bytes is not None else target_file_bytes // 2
    profile = partition_file_profile(spark, path).collect()
    todo = [
        r
        for r in profile
        if r["n_files"] > 1 and r["total_bytes"] / r["n_files"] < small
    ]
    if not todo:
        return []
    rewritten = []
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        for r in todo:
            # partition_dir like "dt=2024-01-01[/hour=3]" -> equality filters
            filt = F.lit(True)
            for piece in r["partition_dir"].split(os.sep):
                k, _, v = piece.partition("=")
                if k not in cols:
                    raise ValueError(
                        f"unexpected partition dir {r['partition_dir']!r}: "
                        f"{k!r} not in partition_by={cols}"
                    )
                filt = filt & (F.col(k).cast("string") == v)
            n_out = max(1, -(-r["total_bytes"] // target_file_bytes))
            (
                spark.read.parquet(path)
                .where(filt)
                .coalesce(n_out)
                .write.mode("overwrite")
                .partitionBy(*cols)
                .parquet(path)
            )
            rewritten.append(r["partition_dir"])
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return rewritten


def cluster_by_zorder(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits_per_dim: int = 8,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-order (Morton-curve) clustering on 2+ numeric columns at write
    time — multi-dimensional data skipping where :func:`cluster_by` only
    handles one.

    Each column is quantile-bucketed to ``2^bits_per_dim`` ranks (the
    boundaries come from one ``approxQuantile`` pass; rank-normalizing
    defeats skew, which a min/max linear scale would not), the per-column
    ranks are bit-interleaved into a Morton code, and the table is
    range-partitioned + sorted on that code. Every output file then
    covers a small hyper-rectangle of the key space, so parquet row-group
    min/max stats prune scans predicated on ANY of the clustered columns
    (~1/num_files^(1/d) of the data per point predicate, vs no pruning
    after a round-robin write). The interleave is a pure JVM expression;
    the only wide op is the range repartition the write needs anyway.
    """
    if len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns; use cluster_by for 1")
    if not 1 <= bits_per_dim <= 16:
        raise ValueError("bits_per_dim must be in [1, 16]")
    if bits_per_dim * len(cols) > 63:
        # shiftleft on a long wraps the shift amount mod 64: bit 79 would
        # alias onto bit 15 and silently corrupt the space-filling order
        raise ValueError(
            f"bits_per_dim * len(cols) = {bits_per_dim * len(cols)} exceeds "
            "63 — the interleaved code must fit a signed 64-bit long"
        )
    n_buckets = 1 << bits_per_dim
    # quantile boundaries per column (driver-side, write-time only)
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.stat.approxQuantile(cols, probs, 0.001)
    rank_cols = []
    for c, bs in zip(cols, bounds):
        arr = F.array(*[F.lit(float(b)) for b in bs])
        # rank = how many boundaries lie at/below the value: 0..n_buckets-1
        rank = F.size(
            F.filter(arr, lambda b: b <= F.col(c).cast("double"))
        )
        rank_cols.append(rank)
    z = F.lit(0).cast("long")
    for bit in range(bits_per_dim):
        for d, rank in enumerate(rank_cols):
            z = z + (
                F.shiftleft(
                    F.shiftright(rank.cast("long"), bit).bitwiseAND(F.lit(1)),
                    bit * len(cols) + d,
                )
            )
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def cluster_by(
    df: DataFrame,
    path: str,
    cluster_cols: list[str] | str,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Range-cluster a table on ``cluster_cols`` at write time:
    ``repartitionByRange`` (sampled range boundaries -> each output file
    covers a narrow, near-disjoint slice of the cluster key) +
    ``sortWithinPartitions`` (row groups inside a file are ordered, so
    their min/max spans are narrow too).

    Why: parquet readers prune ROW GROUPS by column min/max statistics.
    After a round-robin write every file's min/max spans the whole key
    domain and nothing prunes; after a range-clustered write a point or
    range predicate on the cluster key touches ~1/num_files of the data.
    This is the single-dimension version of Z-ordering — for multi-column
    skipping, put the highest-selectivity column first (later columns
    only order within equal prefixes).
    """
    cols = [cluster_cols] if isinstance(cluster_cols, str) else list(cluster_cols)
    (
        df.repartitionByRange(num_files, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )
