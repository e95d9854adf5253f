"""Incremental view maintenance (operators/ivm.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikidata_to_surrealdb_spark.operators import ivm

SPEC = [("count", "*"), ("dsum", "v"), ("min", "v"), ("max", "v")]


def _rows(spark, data):
    return spark.createDataFrame(data, ["k", "v"])


def test_delta_merge_equals_full_recompute(spark):
    base_rows = _rows(spark, [("a", 1.5), ("a", 2.25), ("b", 10.0)])
    delta = _rows(spark, [("a", 3.0), ("c", 7.5)])  # new group 'c'
    base = ivm.build_agg(base_rows, ["k"], SPEC)
    merged = ivm.delta_merge_agg(base, delta, ["k"], SPEC)
    full = ivm.build_agg(base_rows.unionAll(delta), ["k"], SPEC)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_delta_merge_associative_chain(spark):
    base_rows = _rows(spark, [("a", 1.0)])
    d1 = _rows(spark, [("a", 2.0), ("b", 4.0)])
    d2 = _rows(spark, [("b", 8.0)])
    base = ivm.build_agg(base_rows, ["k"], SPEC)
    chained = ivm.delta_merge_agg(
        ivm.delta_merge_agg(base, d1, ["k"], SPEC), d2, ["k"], SPEC
    )
    one_shot = ivm.delta_merge_agg(base, d1.unionAll(d2), ["k"], SPEC)
    assert sorted(map(tuple, chained.collect())) == sorted(
        map(tuple, one_shot.collect())
    )


def test_untouched_groups_pass_through(spark):
    base = ivm.build_agg(_rows(spark, [("a", 1.0), ("z", 5.0)]), ["k"], SPEC)
    merged = ivm.delta_merge_agg(base, _rows(spark, [("a", 1.0)]), ["k"], SPEC)
    z = {r.k: (r.n, float(r.sum_v)) for r in merged.collect()}["z"]
    assert z == (1, 5.0)


def test_build_agg_rejects_unknown_func(spark):
    with pytest.raises(ValueError):
        ivm.build_agg(_rows(spark, [("a", 1.0)]), ["k"], [("avg", "v")])


def test_sum_stays_exact_decimal(spark):
    # 0.1 summed 100x: float drift would show; decimal path is exact
    rows = _rows(spark, [("a", 0.1)] * 100)
    agg = ivm.build_agg(rows, ["k"], [("dsum", "v")])
    (r,) = agg.collect()
    assert float(r.sum_v) == 10.0
    assert "decimal" in dict(agg.dtypes)["sum_v"]
