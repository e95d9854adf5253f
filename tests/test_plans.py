"""Plan-quality regression tests: the properties that matter at 100 TB.

Correctness is covered by the oracle suite; these tests pin the *physical
plans* — predicate pushdown reaching the parquet scan, column pruning,
broadcast of filtered dimensions, and no Python evaluation in JVM-only
hot paths. A refactor that silently turns a pushed filter into a
post-scan filter or un-broadcasts a dim join fails here, not in prod.
"""

from __future__ import annotations

import pytest

from wikidata_to_surrealdb_spark.plans.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "b02_scalar_filter")
    assert "PushedFilters: [IsNotNull(o_orderpriority)" in plan or (
        "EqualTo(o_orderpriority,1-URGENT)" in plan
    ), plan


def test_column_pruning(spark):
    # q3 touches 4 of 11 lineitem columns; the scan must not read more
    import re

    plan = _plan(spark, "tpch_q3")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    li = [s for s in schemas if "l_orderkey" in s]
    assert li, plan
    read_cols = {c.split(":")[0] for c in li[0].split(",")}
    assert read_cols == {"l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"}


@pytest.mark.parametrize("name", ["tpch_q3", "tpch_q5", "tpch_q10", "b03_link_join"])
def test_dim_joins_broadcast(spark, name):
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "tpch_q1",
        "b14_fts",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "text_quality",
        "text_fingerprint",
        "sim_bruteforce",
        "events_sessionize",
        "wd_claims_path",
        "curation_repetition",
        "curation_gopher_filter",
        "curation_hash_split",
        "curation_passage_dedup",
        "curation_pii_redact",
        "curation_corpus_stats",
        "sketch_kmv_distinct",
        "events_analytics",
    ],
)
def test_hot_paths_are_jvm_only(spark, name):
    """No row-at-a-time or Arrow Python evaluation inside the declared
    JVM-only operators — everything must stay in codegen."""
    plan = _plan(spark, name)
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan
    assert "MapInPandas" not in plan, plan


def test_multimodal_is_arrow_batched(spark):
    plan = _plan(spark, "mm_decode_features")
    assert "MapInPandas" in plan  # and not per-row BatchEvalPython
    assert "BatchEvalPython" not in plan


def test_ingest_is_shuffle_free_until_dedup(spark, tmp_path):
    """The dump->tables pipeline's only wide operator is the id-collision
    window; parsing/flattening/routing must stay narrow."""
    from tests import wikidata_fixtures as fx
    from wikidata_to_surrealdb_spark.operators.ingest import (
        load_dump,
        parse_entities,
        transform_entities,
    )
    from wikidata_to_surrealdb_spark.sources.dump_reader import read_dump_lines

    path = tmp_path / "dump.json"
    fx.write_fixture(str(path), fx.entity_fixture_lines(wrapper=True))
    transformed = transform_entities(
        parse_entities(read_dump_lines(spark, str(path), "json"))
    )
    plan = transformed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_snowball_gate(spark):
    """snowball now works via the repo Porter2 port (no external lib);
    unknown stemmer names still fail fast."""
    from wikidata_to_surrealdb_spark.operators import text

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert text.analyze_text(docs, stemmer="snowball").limit(5).count() > 0
    with pytest.raises(ValueError, match="unknown stemmer"):
        text.analyze_text(docs, stemmer="porter")


@pytest.mark.parametrize(
    "name",
    [
        "dedup_ngram_blocked",
        "curation_nb_classifier",
        "er_resolve_prefix",
        "text_bpe_encode",
        "events_trailing_window",
        "curation_quality_topk",
        "curation_c4_span_dedup",
    ],
)
def test_round7_hot_paths_are_jvm_only(spark, name):
    plan = _plan(spark, name)
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan
    assert "MapInPandas" not in plan, plan


@pytest.mark.parametrize("name", ["dedup_semantic", "mm_ahash_neardup"])
def test_round7_pandas_stages_are_arrow_batched(spark, name):
    # clusters/codecs go through applyInPandas/mapInPandas (Arrow), never
    # row-at-a-time Python
    plan = _plan(spark, name)
    assert "FlatMapGroupsInPandas" in plan or "MapInPandas" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_nb_model_join_strategies(spark):
    """curation.nb_quality_classifier(broadcast_model=...) — both plans
    pinned: True broadcasts the |V|-row model into the token-stream
    join (no exchange on w); False routes the same join through a plain
    word-keyed shuffle join (the at-web-scale path for an over-budget
    vocabulary). Same rows either way."""
    from pyspark.sql import functions as F

    from wikidata_to_surrealdb_spark.operators import curation

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pos = F.col("source").isin("src0", "src1")

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    bcast = curation.nb_quality_classifier(docs, pos, broadcast_model=True)
    shuf = curation.nb_quality_classifier(docs, pos, broadcast_model=False)
    # broadcast path: the model side of the w-join arrives by broadcast
    p_b = plan_of(bcast)
    assert "BroadcastHashJoin [w" in p_b, p_b
    # shuffle path: the w-join is a shuffle join (SMJ or shuffled-hash
    # in the initial plan — AQE may still improve it at runtime, which
    # is exactly the behavior we want at scale)
    p_s = plan_of(shuf)
    assert "SortMergeJoin [w" in p_s or "ShuffledHashJoin [w" in p_s, p_s
    # identical results
    a = sorted(map(tuple, bcast.collect()))
    b = sorted(map(tuple, shuf.collect()))
    assert a == b


def test_closure_round_exchange_budget(spark):
    """One connected-components round (large-star -> small-star) has a
    bounded exchange count — the closure loop multiplies whatever this
    plan costs by the round count, so a regression here (e.g. reverting
    the r7 one-fewer-exchange-per-round union-of-disjoint-orientations
    invariant, commit e143e0c) taxes every closure consumer
    (dedup_clusters, sim_knn_clusters, er_resolve*). Pinned against the
    measured plan of the current implementation."""
    from pyspark.sql import functions as F

    from wikidata_to_surrealdb_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "src bigint, dst bigint"
    )
    sym = graph._undirect(edges, "src", "dst").where(F.col("_a") != F.col("_b"))
    e = sym.where(F.col("_a") > F.col("_b")).localCheckpoint()
    one_round = graph._small_star(
        graph._large_star(
            e.union(e.select(F.col("_b").alias("_a"), F.col("_a").alias("_b")))
        )
    )
    plan = one_round._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 11, plan


def test_scaled_lateness_audit_has_no_global_window(spark):
    """stream_lateness_audit_scaled exists to remove the rank variant's
    single-partition global window: batch assignment must be a pure map
    against a broadcast 1-row bounds relation. The only Window allowed
    in the plan is the prefix-max over the 4-row per-batch maxima."""
    plan = _plan(spark, "stream_lateness_audit_scaled")
    assert plan.count("Window") <= 1, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_default_lateness_audit_is_the_scaled_plan(spark):
    """Round-9 deprecation: the plain name is an alias of the scaled
    implementation — no caller reaches the bounded variant's one-task
    global-rank plan by default. The original lives on, tagged."""
    from wikidata_to_surrealdb_spark.plans.queries import QUERIES

    spec = QUERIES["stream_lateness_audit"]
    scaled = QUERIES["stream_lateness_audit_scaled"]
    assert spec.fn is scaled.fn
    assert spec.oracle == scaled.oracle
    assert "alias" in spec.tags
    bounded = QUERIES["stream_lateness_audit_bounded"]
    assert "bounded-replay-only" in bounded.tags
    # and the aliased default truly has no global-order rank window
    plan = _plan(spark, "stream_lateness_audit")
    assert plan.count("Window") <= 1, plan


def test_containment_reads_materialized_index_once(spark):
    """The posting-list index is localCheckpoint-materialized, so the
    final plan must NOT replay the corpus-sized shingle/window subtree
    per join branch: zero Window nodes (the df window ran once, inside
    the checkpointed subtree) and both size joins read the stored
    index."""
    plan = _plan(spark, "dedup_containment")
    assert "Window [count(1)" not in plan, plan
    assert plan.count("Scan ExistingRDD") >= 2, plan  # sizes + pairs branches
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_recall_panel_plan_shape(spark):
    """r11 panel scale-shape pins: the candidate joins in the rerank
    arms must be BROADCAST (candidates are B*refine rows by
    construction — a sort-merge join would shuffle the full corpus),
    the per-batch partial top-k runs in Python via mapInPandas /
    ArrowEvalPython (never row-at-a-time PythonUDF), and no
    CartesianProduct survives anywhere (the tiny panel relations
    plan as LocalTableScan x broadcast)."""
    plan = _plan(spark, "sim_ann_recall_panel")
    assert "CartesianProduct" not in plan, plan
    assert "MapInPandas" in plan or "mapInPandas" in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    # sort-merge joining the corpus against 800-row candidates would be
    # the classic silent scale killer here
    assert "SortMergeJoin" not in plan, plan


def test_diversity_sample_pins_window_group_limit(spark):
    """VERDICT r11 #4: diversity_sample's per-stratum row_number pick
    relies on Spark's rank-limit pushdown (WindowGroupLimit) so each
    stratum is top-(per_bucket) FILTERED — crucially with a *Partial*
    pass before the exchange, so at most per_bucket rows per stratum
    per map partition cross the shuffle instead of the full stratum
    (n/2^bits rows for 4 survivors at scale). A Spark-version or plan
    regression that drops the pushdown and silently reverts to a full
    per-stratum sort fails here."""
    from wikidata_to_surrealdb_spark.operators.similarity import (
        diversity_sample,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    df = diversity_sample(emb)
    df.collect()  # executed plan (post-AQE) is the one that matters
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    assert ", Partial" in plan, plan  # map-side pre-shuffle limit
    assert ", Final" in plan, plan
