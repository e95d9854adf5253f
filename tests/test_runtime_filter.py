"""Bloom-filter runtime join pruning (operators/runtime_filter.py)."""

from __future__ import annotations

from wikidata_to_surrealdb_spark.operators import runtime_filter as rf


def test_bloom_semi_join_no_false_negatives(spark):
    big = spark.range(0, 5000).selectExpr("id AS k", "id * 2 AS payload")
    small = spark.range(0, 5000, 37).selectExpr("id AS k")
    got = sorted(r.k for r in rf.bloom_semi_join(big, small, "k").collect())
    want = sorted(r.k for r in big.join(small, "k", "left_semi").collect())
    assert got == want


def test_bloom_prunes_before_join(spark):
    big = spark.range(0, 20000).selectExpr("id AS k")
    small = spark.range(0, 20000, 500).selectExpr("id AS k")  # 40 keys
    passed, total = rf.bloom_pass_count(big, small, "k")
    assert total == 20000
    # 4096 bits / 3 hashes / 40 keys -> fp rate ~ (120/4096)^3 ~ 2.5e-5
    assert passed < 100


def test_bloom_build_is_word_bounded(spark):
    small = spark.range(0, 100000).selectExpr("id AS k")  # saturate
    (row,) = rf.bloom_build(small, "k", bits=1024).collect()
    assert len(row["_bloom_words"]) <= 1024 // 64


def test_bloom_handles_empty_small_side(spark):
    big = spark.range(0, 100).selectExpr("id AS k")
    small = spark.range(0, 0).selectExpr("id AS k")
    assert rf.bloom_semi_join(big, small, "k").count() == 0


def test_bloom_string_keys(spark):
    big = spark.createDataFrame([(f"u{i}",) for i in range(500)], ["k"])
    small = spark.createDataFrame([("u7",), ("u42",), ("u499",)], ["k"])
    got = {r.k for r in rf.bloom_semi_join(big, small, "k").collect()}
    assert got == {"u7", "u42", "u499"}
