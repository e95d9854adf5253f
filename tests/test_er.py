"""Entity-resolution operator semantics (operators/er.py)."""

from __future__ import annotations

from wikidata_to_surrealdb_spark.operators import er


def _people(spark):
    rows = [
        (1, "Ada Lovelace", "uk"),
        (2, "Ada  Lovelace!", "uk"),  # canonicalizes identically -> dist 0
        (3, "Ada Lovelase", "uk"),  # one typo -> dist 1
        (4, "Alan Turing", "uk"),
        (5, "Ada Lovelace", "us"),  # same name, different block -> no pair
        (6, "Grace Hopper", "us"),
        (7, "Grace Hoppers", "us"),  # dist 1
    ]
    return spark.createDataFrame(rows, ["id", "name", "country"])


def test_blocked_fuzzy_pairs_blocks_and_thresholds(spark):
    df = _people(spark)
    pairs = er.blocked_fuzzy_pairs(df, "id", "name", ["country"], max_dist=1)
    got = {(r.id_a, r.id_b, r.dist) for r in pairs.collect()}
    assert got == {(1, 2, 0), (1, 3, 1), (2, 3, 1), (6, 7, 1)}
    # cross-block identical names (1 vs 5) must NOT pair


def test_blocked_fuzzy_pairs_max_block_guard(spark):
    df = _people(spark)
    # uk block has 4 members, us block 3: cap at 3 drops the uk block
    pairs = er.blocked_fuzzy_pairs(
        df, "id", "name", ["country"], max_dist=1, max_block=3
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(6, 7)}


def test_blocked_fuzzy_pairs_oversize_raise(spark):
    """VERDICT r15 #3: the blocking-stage occupancy guard fails LOUDLY
    when armed — a pathological (low-cardinality-key) block raises at
    execution time with the block key and size in the message, instead
    of silently burning a quadratic join or silently dropping merges."""
    import pytest

    df = _people(spark)
    # uk block has 4 members: cap at 3 with oversize='raise'
    pairs = er.blocked_fuzzy_pairs(
        df, "id", "name", ["country"], max_dist=1, max_block=3,
        oversize="raise",
    )
    with pytest.raises(Exception, match="max_block=3"):
        pairs.collect()
    # resolve_entities arms the same guard (raise is ITS default)
    with pytest.raises(Exception, match="max_block=3"):
        er.resolve_entities(
            df, "id", "name", ["country"], max_dist=1, max_block=3
        ).collect()
    # multipass path arms it too
    with pytest.raises(Exception, match="max_block=3"):
        er.resolve_entities_multipass(
            df, "id", "name", [["country"]], max_dist=1, max_block=3
        ).collect()
    # default (max_block=None) stays unguarded — pinned catalog entry
    assert er.resolve_entities(
        df, "id", "name", ["country"], max_dist=1
    ).count() == 7
    # bad mode rejected at plan build
    with pytest.raises(ValueError, match="oversize"):
        er.blocked_fuzzy_pairs(
            df, "id", "name", ["country"], max_block=3, oversize="warn"
        )


def test_oversize_raise_fires_with_all_duplicate_ids(spark):
    """ADVICE r16: the degenerate block where NO pair survives
    ``id_a < id_b`` (all rows share one id) must still raise when
    armed — the guard rides the block-key columns, which the join
    hashes for every row of both sides, not the match key, which an
    empty-candidate block might never evaluate. Both join shapes
    (shuffle and broadcast_build) are pinned."""
    import pytest

    rows = [(9, f"name {i}", "uk") for i in range(4)]
    df = spark.createDataFrame(rows, ["id", "name", "country"])
    for bcast in (False, True):
        pairs = er.blocked_fuzzy_pairs(
            df, "id", "name", ["country"], max_dist=1, max_block=3,
            oversize="raise", broadcast_build=bcast,
        )
        with pytest.raises(Exception, match="max_block=3"):
            pairs.collect()


def test_resolve_entities_transitive_and_singletons(spark):
    rows = [
        (10, "aaaa", "x"),
        (11, "aaab", "x"),  # dist 1 from 10
        (12, "aabb", "x"),  # dist 1 from 11, dist 2 from 10
        (13, "zzzz", "x"),  # singleton
    ]
    df = spark.createDataFrame(rows, ["id", "name", "country"])
    out = er.resolve_entities(df, "id", "name", ["country"], max_dist=1)
    got = {(r.id, r.entity_id) for r in out.collect()}
    # 10~11~12 chain collapses via closure even though 10-12 dist is 2
    assert got == {(10, 10), (11, 10), (12, 10), (13, 13)}


def test_canonical_strips_and_lowercases(spark):
    df = spark.createDataFrame([("A  b-C_1!",)], ["s"])
    assert df.select(er.canonical(df["s"]).alias("k")).first().k == "abc1"


def test_multipass_dist1_recall_total(spark):
    # canonical keys are fixed-length 8; the pass regions are DISJOINT
    # and COVERING (prefix chars 1-5, suffix chars 6-8), so any single
    # substitution perturbs exactly one pass's key and the OTHER pass
    # catches the pair: a suffix-region edit (1~2) is caught by the
    # prefix pass, a prefix-region edit (1~3) by the suffix pass.
    rows = [
        (1, "id-000100", "x"),
        (2, "id-000200", "x"),  # dist 1 from #1, edit at pos 6 (suffix)
        (3, "id-100100", "x"),  # dist 1 from #1, edit at pos 3 (prefix)
        (4, "zz-999999", "x"),  # singleton
    ]
    df = spark.createDataFrame(rows, ["id", "name", "country"])
    from pyspark.sql import functions as F

    side = df.withColumn("_k", er.canonical(F.col("name"))).select(
        "id",
        "name",
        "country",
        F.expr("substring(_k, 1, 5)").alias("_pre"),
        F.expr("substring(_k, greatest(length(_k) - 2, 1), 3)").alias("_suf"),
    )
    passes = [["country", "_pre"], ["country", "_suf"]]
    pairs = er.multipass_fuzzy_pairs(side, "id", "name", passes, max_dist=1)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(1, 2), (1, 3)}
    # each single pass alone misses the pair whose edit is in ITS region
    pre_only = {
        (r.id_a, r.id_b)
        for r in er.blocked_fuzzy_pairs(
            side, "id", "name", ["country", "_pre"], max_dist=1
        ).collect()
    }
    suf_only = {
        (r.id_a, r.id_b)
        for r in er.blocked_fuzzy_pairs(
            side, "id", "name", ["country", "_suf"], max_dist=1
        ).collect()
    }
    assert pre_only == {(1, 2)} and suf_only == {(1, 3)}

    out = er.resolve_entities_multipass(side, "id", "name", passes, max_dist=1)
    got = {(r.id, r.entity_id) for r in out.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 4)}
