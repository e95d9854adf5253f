"""local_relation contract (ADVICE r18): arity validation up front and
an Exception-wide fallback to the plain createDataFrame path."""

from __future__ import annotations

import pytest

from wikidata_to_surrealdb_spark.functions import local_relation


def test_local_relation_rejects_wrong_arity(spark):
    # too many values: the old positional indexing silently dropped the
    # trailing element where createDataFrame(rows, schema) raised
    with pytest.raises(ValueError, match="3 values for 2 schema columns"):
        local_relation(spark, [(1, "a", "extra")], "id bigint, name string")
    # too few: used to surface as a bare IndexError mid-conversion
    with pytest.raises(ValueError, match="1 values for 2 schema columns"):
        local_relation(spark, [(1, "a"), (2,)], "id bigint, name string")


def test_local_relation_falls_back_on_conversion_error(spark, monkeypatch):
    # simulate the Arrow/pandas conversion blowing up mid-flight (e.g.
    # pyarrow absent with fallback disabled): the documented contract is
    # the plain relation, not a propagated error
    import pandas as pd

    class Boom(pd.Series):
        def __init__(self, *a, **k):
            raise RuntimeError("arrow conversion failed")

    # a real type, so PySpark's own isinstance(data, pd.Series) checks
    # keep working — only local_relation's column construction blows up
    monkeypatch.setattr(pd, "Series", Boom)
    out = local_relation(spark, [(1, "a"), (2, "b")], "id bigint, name string")
    assert sorted((r["id"], r["name"]) for r in out.collect()) == [
        (1, "a"),
        (2, "b"),
    ]


def test_local_relation_rows_roundtrip(spark):
    rows = [(1, -0.0), (2, 5e-324), (3, None)]
    out = local_relation(spark, rows, "id bigint, x double")
    got = {r["id"]: r["x"] for r in out.collect()}
    import math

    assert math.copysign(1.0, got[1]) == -1.0
    assert got[2] == 5e-324
    assert got[3] is None


def test_respread_exchange_plans_returned_unchanged_without_execution(spark):
    """VERDICT r18 #7: respread probes df.rdd, which on an
    exchange-bearing plan executes its AQE stages eagerly. The guard
    must return such plans unchanged WITHOUT running any job."""
    from pyspark.sql import functions as F

    from wikidata_to_surrealdb_spark.functions import respread

    base = spark.range(0, 1000).withColumn("k", F.col("id") % 7)
    agg = base.groupBy("k").agg(F.sum("id").alias("s"))
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    out = respread(agg)
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert out is agg, "exchange-bearing plan must be returned unchanged"
    assert after == before, "respread must not execute jobs on a shuffle plan"
    # and results are unaffected
    assert {(r["k"], r["s"]) for r in out.collect()} == {
        (r["k"], r["s"]) for r in base.groupBy("k").agg(F.sum("id").alias("s")).collect()
    }


def test_respread_narrow_scan_still_spreads(spark, tmp_path):
    from wikidata_to_surrealdb_spark.functions import respread

    p = str(tmp_path / "one.parquet")
    spark.range(0, 100).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    out = respread(df)
    assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    assert out.count() == 100
