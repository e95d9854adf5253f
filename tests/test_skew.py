"""Salted join: result parity with a plain join + hot-key spreading."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidata_to_surrealdb_spark.operators.skew import (
    SALT_COL,
    _deterministic_salt,
    salted_join,
)


def _skewed_frames(spark):
    # 20k rows of key=1 (the hot key) + 2k scattered keys
    big = spark.range(22000).select(
        F.when(F.col("id") < 20000, 1).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 7).alias("payload"),
    )
    small = spark.range(100).select(
        F.col("id").alias("sk"), F.concat(F.lit("dim_"), F.col("id")).alias("name")
    )
    return big, small


def test_salted_join_matches_plain_join(spark):
    big, small = _skewed_frames(spark)
    plain = big.join(small, big["k"] == small["sk"]).agg(
        F.count("*"), F.sum("payload")
    ).first()
    salted = salted_join(big, small, "k", "sk", salt=8).agg(
        F.count("*"), F.sum("payload")
    ).first()
    assert tuple(salted) == tuple(plain)


def test_salted_join_left_keeps_unmatched(spark):
    big, small = _skewed_frames(spark)
    small_half = small.where(F.col("sk") < 50)
    plain = big.join(small_half, big["k"] == small_half["sk"], "left").count()
    salted = salted_join(big, small_half, "k", "sk", salt=8, how="left").count()
    assert salted == plain == big.count()


def test_hot_key_spreads_over_salts(spark):
    big, _ = _skewed_frames(spark)
    salts = (
        big.withColumn(SALT_COL, _deterministic_salt(big, 8))
        .where(F.col("k") == 1)
        .select(SALT_COL)
        .distinct()
        .count()
    )
    assert salts == 8  # the hot key's rows now occupy 8 shuffle partitions


def test_hot_keys_limits_small_side_replication(spark):
    big, small = _skewed_frames(spark)
    plain = big.join(small, big["k"] == small["sk"]).count()
    salted = salted_join(big, small, "k", "sk", salt=8, hot_keys=[1])
    assert salted.count() == plain
    # replication factor: only the hot key is replicated 8x
    s = small.withColumn(
        SALT_COL,
        F.explode(
            F.when(
                F.col("sk").isin([1]), F.sequence(F.lit(0), F.lit(7))
            ).otherwise(F.array(F.lit(0)))
        ),
    )
    assert s.count() == 100 + 7


def test_salted_join_rejects_preserving_small_side(spark):
    """right/full would emit `salt` null-extended duplicates of each
    unmatched small-side row (it is replicated per salt) — refuse."""
    import pytest

    from wikidata_to_surrealdb_spark.operators.skew import salted_join

    big = spark.range(10).withColumnRenamed("id", "k")
    small = spark.range(3).withColumnRenamed("id", "sk")
    for how in ("right", "full", "outer", "left_anti"):
        with pytest.raises(ValueError, match="inner"):
            salted_join(big, small, "k", "sk", how=how)


def test_detect_hot_keys_finds_planted_key(spark):
    from wikidata_to_surrealdb_spark.operators.skew import detect_hot_keys

    big, _ = _skewed_frames(spark)
    # 22k rows < min_sample_rows -> exact count path; key 1 holds ~91%
    hot = detect_hot_keys(big, "k", threshold_ratio=0.01)
    assert hot[0] == 1
    # every other key holds 20/22000 < 1%: only the planted key is hot
    assert hot == [1]


def test_detect_hot_keys_sampled_path(spark):
    from wikidata_to_surrealdb_spark.operators.skew import detect_hot_keys

    big, _ = _skewed_frames(spark)
    hot = detect_hot_keys(
        big, "k", threshold_ratio=0.05, sample_fraction=0.5, min_sample_rows=1000
    )
    assert hot == [1]  # the 91% key cannot be missed at a 50% sample


def test_detect_hot_keys_validation(spark):
    import pytest

    from wikidata_to_surrealdb_spark.operators.skew import detect_hot_keys

    big, _ = _skewed_frames(spark)
    with pytest.raises(ValueError, match="threshold_ratio"):
        detect_hot_keys(big, "k", threshold_ratio=0.0)
    with pytest.raises(ValueError, match="sample_fraction"):
        detect_hot_keys(big, "k", sample_fraction=1.5)


def test_salted_join_auto_detect_matches_plain(spark):
    big, small = _skewed_frames(spark)
    plain = (
        big.join(small, big["k"] == small["sk"])
        .agg(F.count("*").alias("n"), F.sum("payload").alias("s"))
        .first()
    )
    auto = (
        salted_join(big, small, "k", "sk", salt=8, auto_detect=True)
        .agg(F.count("*").alias("n"), F.sum("payload").alias("s"))
        .first()
    )
    assert (auto["n"], auto["s"]) == (plain["n"], plain["s"])


def test_salted_join_auto_detect_exclusive_with_hot_keys(spark):
    import pytest

    big, small = _skewed_frames(spark)
    with pytest.raises(ValueError, match="not both"):
        salted_join(big, small, "k", "sk", hot_keys=[1], auto_detect=True)


def test_salted_join_auto_detect_no_hot_keys_degenerates(spark):
    """Uniform keys: detection returns [], the join must still be exact
    (salt collapses to 0 everywhere)."""
    big = spark.range(1000).select((F.col("id") % 100).alias("k"))
    small = spark.range(100).select(F.col("id").alias("sk"))
    n = salted_join(big, small, "k", "sk", auto_detect=True).count()
    assert n == 1000
