"""Bucketed materialization removes the join/agg exchange on the key."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidata_to_surrealdb_spark.sources.bucketing import materialize_bucketed

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    bl = materialize_bucketed(
        li, "b_lineitem", "l_orderkey", num_buckets=8, path=str(tmp_path / "bl")
    )
    bo = materialize_bucketed(
        orders, "b_orders", "o_orderkey", num_buckets=8, path=str(tmp_path / "bo")
    )
    try:
        # force SMJ so the test observes bucketing, not broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bl.join(bo, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and the result is still correct
        expect = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).count()
        assert joined.count() == expect

        # aggregation on the bucket key also skips its shuffle
        agg = bl.groupBy("l_orderkey").agg(F.sum("l_quantity"))
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in agg_plan, agg_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_table_memo_invalidates_on_file_rewrite(spark, tmp_path):
    """Rewriting one table file in place (parent dir mtime untouched) must
    serve the NEW data, not a stale memoized plan/view."""
    import shutil

    from pyspark.sql import functions as F

    from wikidata_to_surrealdb_spark.sources.tables import register_views

    sf = tmp_path / "sf"
    sf.mkdir()
    spark.range(5).select(F.col("id").alias("r_regionkey")).coalesce(1).toPandas().to_parquet(
        sf / "region.parquet"
    )
    t1 = register_views(spark, str(sf))
    assert t1["region"].count() == 5
    # rewrite the FILE in place; keep the directory's mtime fixed
    dir_stat = sf.stat()
    spark.range(9).select(F.col("id").alias("r_regionkey")).coalesce(1).toPandas().to_parquet(
        sf / "region.parquet"
    )
    import os

    os.utime(sf, (dir_stat.st_atime, dir_stat.st_mtime))
    t2 = register_views(spark, str(sf))
    assert t2["region"].count() == 9
    assert spark.table("region").count() == 9
