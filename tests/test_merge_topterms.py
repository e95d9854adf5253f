"""Unit tests for ingest.merge_loads, text.top_terms and
similarity.normalize_quantize edge cases."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from wikidata_to_surrealdb_spark.operators import ingest, similarity, text

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "wikidata_to_surrealdb_spark",
    "data",
)


def test_merge_loads_last_load_wins(spark):
    v1 = ingest.load_dump(spark, os.path.join(DATA, "media_dump.json"), "json")
    v2 = ingest.load_dump(spark, os.path.join(DATA, "media_dump_v2.json"), "json")
    merged = ingest.merge_loads(v1, v2)

    ent = {r["id"]["id"]: r["label"] for r in merged.entity.collect()}
    assert ent[101] == "Graph Wars, season 1 remastered"  # replaced
    assert ent[100] == "Graph Wars"  # persisted from v1
    assert 104 in ent  # new in v2
    assert len(ent) == 5

    # the Claims ROW is replaced wholesale, not merged: Q101's claims in
    # v2 carry episodes=+13
    c101 = (
        merged.claims.where(F.col("id.id") == 101)
        .select(F.explode("claims").alias("c"))
        .where(F.col("c.id.id") == 1113)
        .select("c.value.quantity.amount")
        .collect()
    )
    assert [r["amount"] for r in c101] == [13.0]


def test_merge_loads_partitioning_independent(spark):
    v1 = ingest.load_dump(spark, os.path.join(DATA, "media_dump.json"), "json")
    v2 = ingest.load_dump(spark, os.path.join(DATA, "media_dump_v2.json"), "json")
    a = sorted(
        (r["id"]["id"], r["label"])
        for r in ingest.merge_loads(v1, v2).entity.collect()
    )
    v1r = ingest.WikidataTables(
        entity=v1.entity.repartition(5),
        property=v1.property,
        lexeme=v1.lexeme,
        claims=v1.claims.repartition(3),
    )
    b = sorted(
        (r["id"]["id"], r["label"])
        for r in ingest.merge_loads(v1r, v2).entity.collect()
    )
    assert a == b


def test_top_terms_df_not_tf_and_tiebreak(spark):
    df = spark.createDataFrame(
        [
            (1, "zeta zeta zeta alpha", "en"),  # tf spam on zeta: df still 1
            (2, "alpha beta", "en"),
            (3, "beta alpha", "en"),
        ],
        "doc_id bigint, text string, lang string",
    )
    out = [
        (r["term"], r["df"], r["rank"])
        for r in text.top_terms(df, k=3).orderBy("rank").collect()
    ]
    # alpha df=3; beta df=2; zeta df=1 (NOT 3 despite tf=3)
    assert out == [("alpha", 3, 1), ("beta", 2, 2), ("zeta", 1, 3)]


def test_normalize_quantize_zero_vector_and_clamp(spark):
    """r17 vecstress contract: a zero vector cannot be unit-normalized
    and is DROPPED by the validity gate (the pre-r17 keep-with-NULL-
    checksum behavior was Spark-side only — its oracle hashed zero
    vectors, a latent divergence the vecstress axis surfaced)."""
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [3.0, 4.0])],
        "vec_id bigint, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in similarity.normalize_quantize(df).collect()}
    assert set(out) == {2}
    assert out[2]["l2_norm"] == 5.0 and out[2]["q_checksum"] is not None
