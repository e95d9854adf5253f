"""Layout tests: partitioned writes bound file counts, readers prune
partitions, compaction rewrites only fragmented partitions and preserves
data exactly."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from wikidata_to_surrealdb_spark.sources.layout import (
    compact_partitions,
    partition_file_profile,
    write_partitioned,
)


@pytest.fixture()
def events(spark, sf_dir):
    from wikidata_to_surrealdb_spark.sources.tables import load_sf_dir

    df = load_sf_dir(spark, sf_dir, ("events",))["events"]
    return df.withColumn("dt", F.to_date("ts"))


def _files(path):
    return glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)


def _checksum(df):
    cols = [c for c in df.columns]
    return df.select(
        F.sum(F.crc32(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])))
    ).collect()[0][0]


def test_write_partitioned_bounds_files(spark, events, tmp_path):
    out = str(tmp_path / "ev")
    write_partitioned(events, out, "dt", files_per_partition=1)
    dirs = [d for d in os.listdir(out) if d.startswith("dt=")]
    assert dirs
    for d in dirs:
        assert len(_files(os.path.join(out, d))) == 1


def test_reader_prunes_partitions(spark, events, tmp_path):
    out = str(tmp_path / "ev")
    write_partitioned(events, out, "dt", files_per_partition=1)
    one_day = sorted(
        d.split("=", 1)[1] for d in os.listdir(out) if d.startswith("dt=")
    )[0]
    pruned = spark.read.parquet(out).where(F.col("dt") == one_day)
    # inputFiles() lists pre-pruning; the executed scan carries the
    # partition predicate in PartitionFilters (directory-level pruning)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "dt" in pf[0] and "isnotnull" in pf[0]
    per_day = events.where(F.col("dt") == one_day).count()
    assert pruned.count() == per_day > 0


def test_compact_partitions_merges_small_files(spark, events, tmp_path):
    out = str(tmp_path / "ev")
    # fragment deliberately: many writer tasks per partition value
    events.repartition(8).write.partitionBy("dt").parquet(out)
    before = partition_file_profile(spark, out).collect()
    assert max(r["n_files"] for r in before) > 1
    checksum_before = _checksum(spark.read.parquet(out))
    count_before = spark.read.parquet(out).count()

    rewritten = compact_partitions(
        spark, out, "dt", target_file_bytes=512 * 1024 * 1024
    )
    assert rewritten  # every partition was fragmented
    after = {r["partition_dir"]: r for r in partition_file_profile(spark, out).collect()}
    for d in rewritten:
        assert after[d]["n_files"] == 1
    assert spark.read.parquet(out).count() == count_before
    assert _checksum(spark.read.parquet(out)) == checksum_before


def test_compact_skips_healthy_partitions(spark, events, tmp_path):
    out = str(tmp_path / "ev")
    write_partitioned(events, out, "dt", files_per_partition=1)
    files_before = {f: os.path.getmtime(f) for f in _files(out)}
    rewritten = compact_partitions(spark, out, "dt")
    assert rewritten == []
    assert {f: os.path.getmtime(f) for f in _files(out)} == files_before


def test_write_partitioned_rejects_bad_split(spark, events, tmp_path):
    with pytest.raises(ValueError, match="files_per_partition"):
        write_partitioned(events, str(tmp_path / "x"), "dt", files_per_partition=0)


def test_cluster_by_produces_disjoint_file_ranges(spark, events, tmp_path):
    import pyarrow.parquet as pq

    out = str(tmp_path / "clustered")
    from wikidata_to_surrealdb_spark.sources.layout import cluster_by

    cluster_by(events.drop("dt"), out, "user_id", num_files=4)
    ranges = []
    for f in _files(out):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.row_group(rg).num_columns)
                if md.row_group(rg).column(i).path_in_schema == "user_id"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 2
    # consecutive files cover non-overlapping user_id slices
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, ranges
    # data survives intact
    assert spark.read.parquet(out).count() == events.count()


def test_cluster_by_zorder_bounds_both_dimensions(spark, tmp_path):
    """After a z-ordered write, EVERY file covers a small rectangle of
    the 2-D key space — both columns' per-file spans shrink, which is
    what row-group min/max pruning needs for predicates on either column
    (a round-robin write leaves every file spanning ~the full range)."""
    from wikidata_to_surrealdb_spark.sources.layout import cluster_by_zorder

    df = spark.range(20000).select(
        (F.col("id") % 997).cast("double").alias("x"),
        ((F.col("id") * 7919) % 1009).cast("double").alias("y"),
    )
    zdir = str(tmp_path / "zorder")
    cluster_by_zorder(df, zdir, ["x", "y"], bits_per_dim=8, num_files=16)

    rrdir = str(tmp_path / "roundrobin")
    df.repartition(16).write.parquet(rrdir)

    def avg_span(path, col, full):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name())
            .agg((F.max(col) - F.min(col)).alias("span"))
            .agg(F.avg("span"))
            .first()[0]
        )
        return per_file / full

    for col, full in (("x", 996.0), ("y", 1008.0)):
        z = avg_span(zdir, col, full)
        rr = avg_span(rrdir, col, full)
        assert z < 0.65, (col, z)
        assert rr > 0.9, (col, rr)  # the baseline really is unclustered
        assert z < rr / 1.5


def test_cluster_by_zorder_validation(spark, tmp_path):
    import pytest

    from wikidata_to_surrealdb_spark.sources.layout import cluster_by_zorder

    df = spark.range(10).select(F.col("id").cast("double").alias("x"))
    with pytest.raises(ValueError, match=">= 2"):
        cluster_by_zorder(df, str(tmp_path / "z"), ["x"])
    with pytest.raises(ValueError, match="bits_per_dim"):
        cluster_by_zorder(
            df.withColumn("y", F.col("x")), str(tmp_path / "z"), ["x", "y"],
            bits_per_dim=0,
        )
