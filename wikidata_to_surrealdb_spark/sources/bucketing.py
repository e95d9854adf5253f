"""Bucketed table materialization — co-located joins without a shuffle.

The reference's record links (Entity.claims -> Claims.id) make the
entity/claims join the single hottest path of the query surface. At 100 TB
that join's exchange dominates; hash-bucketing both sides on the join key
at write time removes it entirely: Spark's scan reports the bucket
distribution, so SortMergeJoin runs with NO Exchange on either side, and
aggregations on the bucket key skip their shuffle too.

Bucketing requires writing through the catalog (``saveAsTable``); passing
``path`` keeps the data external at a location of the caller's choosing.
Pick ``num_buckets`` so one bucket ~ one task's memory at target scale
(e.g. 100 TB / 4096 buckets ~ 25 GB per bucket file set, split further by
row groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str] | str,
    num_buckets: int = 64,
    sort_cols: list[str] | str | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Write ``df`` hash-bucketed by ``bucket_cols`` and return the
    catalog-backed DataFrame whose scans carry the bucket distribution."""
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode(mode).format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)
    return df.sparkSession.table(table_name)
