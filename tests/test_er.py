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
