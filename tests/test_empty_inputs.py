"""Totality sweep: every operator must degrade gracefully on EMPTY
input relations — empty filter results, empty partitions, and empty
incremental batches are normal states in a 100 TB pipeline, and an
operator that throws (rather than returning an empty/identity result)
turns a quiet day into a paged incident.  This suite was motivated by
three real findings of that class: ``observed_profile`` raised
TypeError on an empty corpus, ``multipass_fuzzy_pairs([])`` raised
AttributeError, and ``pagerank`` divided by N=0 on an empty edge set
(all fixed in round 8)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikidata_to_surrealdb_spark.operators import (
    curation,
    dedup,
    er,
    graph,
    similarity,
    sketch,
    skew,
    temporal,
    text,
)

DOCS = "doc_id bigint, text string, lang string, source string, n_chars bigint"
EMBS = "vec_id bigint, embedding array<float>, label int"
EVENTS = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)
EDGES = "src bigint, dst bigint"
CUST = "c_custkey bigint, c_name string, c_nationkey bigint"


@pytest.fixture(scope="module")
def empties(spark):
    return {
        "docs": spark.createDataFrame([], DOCS),
        "embs": spark.createDataFrame([], EMBS),
        "events": spark.createDataFrame([], EVENTS),
        "edges": spark.createDataFrame([], EDGES),
        "cust": spark.createDataFrame([], CUST),
    }


CASES = {
    "dedup_exact": lambda t: dedup.exact_dedup(t["docs"]),
    "dedup_minhash": lambda t: dedup.minhash_dedup(t["docs"]),
    "dedup_simhash": lambda t: dedup.simhash_dedup(t["docs"]),
    "dedup_substring": lambda t: dedup.substring_dedup(t["docs"]),
    "dedup_containment": lambda t: dedup.containment_pairs(t["docs"]),
    "dedup_incremental": lambda t: dedup.incremental_minhash_dedup(
        t["docs"], t["docs"]
    ),
    "dedup_semantic": lambda t: dedup.semantic_dedup(t["embs"], k=4),
    "sim_brute_topk": lambda t: similarity.brute_force_topk(
        t["embs"], [0.0] * 64
    ),
    "sim_kmeans": lambda t: similarity.kmeans_train(t["embs"], k=4)[0],
    "sim_knn_join": lambda t: similarity.knn_join(t["embs"]),
    "sim_normalize_quantize": lambda t: similarity.normalize_quantize(
        t["embs"]
    ),
    # r11: LSH-stratified diversity downsample total on empty corpus
    "sim_diversity_sample": lambda t: similarity.diversity_sample(t["embs"]),
    "sim_hard_negatives": lambda t: similarity.hard_negatives(t["embs"]),
    "sim_banded_pairs": lambda t: similarity.ann_banded_pairs_gemm(t["embs"]),
    # r10: exact ground-truth top-k and the recall roll-up must both be
    # total on an empty corpus (the roll-up still reports one (0, k)
    # row per method — a zero-recall report, not a crash)
    "sim_exact_topk": lambda t: similarity.exact_topk_int(
        t["embs"], [0.0] * 64
    ),
    "sim_ann_recall": lambda t: similarity.ann_recall(
        {"m": similarity.exact_topk_int(t["embs"], [0.0] * 64)},
        similarity.exact_topk_int(t["embs"], [0.0] * 64),
        k=10,
    ),
    # r11: an empty corpus means an empty query panel — every panel
    # stage must be total on zero queries (truth/methods empty, the
    # roll-up reports (0, 0) per method rather than crashing)
    "sim_ann_recall_panel": lambda t: similarity.ann_recall_panel(
        {"m": similarity.exact_topk_int_panel(t["embs"], [])},
        similarity.exact_topk_int_panel(t["embs"], []),
        k=10,
    ),
    # r11: the exact prefix-filter join and the LSH banding profile
    # must be total on an empty corpus (empty pair set / all-zero
    # counts per config, not a crash)
    "dedup_jaccard_prefix_join": lambda t: dedup.jaccard_prefix_join(
        t["docs"]
    ),
    "dedup_lsh_recall_profile": lambda t: dedup.lsh_recall_profile(
        t["docs"]
    ),
    "cur_repetition": lambda t: curation.repetition_stats(t["docs"]),
    "cur_gopher": lambda t: curation.gopher_filter(t["docs"]),
    "cur_hash_split": lambda t: curation.hash_split(t["docs"]),
    "cur_stratified_sample": lambda t: curation.stratified_sample(t["docs"]),
    "cur_pack_sequences": lambda t: curation.pack_sequences(t["docs"]),
    "cur_decontaminate": lambda t: curation.decontaminate(
        t["docs"], t["docs"]
    ),
    "cur_corpus_mix": lambda t: curation.corpus_mix(t["docs"]),
    "cur_weighted_sample": lambda t: curation.weighted_sample(t["docs"]),
    "cur_importance_weights": lambda t: curation.importance_weights(
        t["docs"], F.col("source") == "x"
    ),
    "cur_nb_classifier": lambda t: curation.nb_quality_classifier(
        t["docs"], F.col("source") == "x"
    ),
    "cur_c4_span_dedup": lambda t: curation.c4_sentence_span_dedup(t["docs"]),
    "cur_observed_profile": lambda t: curation.observed_profile(t["docs"]),
    "cur_passage_stats": lambda t: curation.passage_stats(t["docs"]),
    "cur_pii_redact": lambda t: curation.pii_redact(t["docs"]),
    "cur_corpus_stats": lambda t: curation.corpus_stats(t["docs"]),
    "cur_expectations": lambda t: curation.expectations_report(
        t["docs"], {"has_text": "length(text) > 0"}
    ),
    "sketch_kmv": lambda t: sketch.kmv_distinct(t["docs"], "text"),
    "sketch_quantiles": lambda t: sketch.sample_quantiles(
        t["events"], "value", "event_id"
    ),
    "sketch_countmin": lambda t: sketch.countmin_build(
        t["docs"].select(F.col("text").alias("term"))
    ),
    "sketch_hll": lambda t: sketch.hll_registers(t["events"], "user_id"),
    "sketch_kmv_by": lambda t: sketch.kmv_distinct_by(
        t["events"], "event_type", "user_id"
    ),
    # r11: per-source tokenizer eval must be total on an empty corpus
    "text_bpe_fertility": lambda t: text.bpe_fertility(t["docs"], []),
    "text_analyze": lambda t: text.analyze_text(t["docs"]),
    "text_top_terms": lambda t: text.top_terms(t["docs"]),
    "text_quality": lambda t: text.quality_score(t["docs"]),
    "text_lang_id": lambda t: text.lang_id(t["docs"]),
    "text_winnow": lambda t: text.winnow_fingerprints(t["docs"]),
    "text_chunk": lambda t: text.chunk_documents(t["docs"]),
    "text_lm": lambda t: text.lm_score(
        t["docs"], text.train_char_lm(t["docs"]), "text", "doc_id"
    ),
    "text_clean": lambda t: text.clean_text(t["docs"]),
    "text_keywords": lambda t: text.keywords(t["docs"]),
    "text_bpe_train": lambda t: text.bpe_train(t["docs"], merges=2),
    "text_bpe_batched": lambda t: text.bpe_train_batched(
        t["docs"], rounds=2, batch=2
    ),
    "text_bpe_apply": lambda t: text.bpe_apply(t["docs"], [("a", "b")]),
    "graph_cc": lambda t: graph.connected_components(t["edges"]),
    "graph_pagerank": lambda t: graph.pagerank(t["edges"], iterations=2),
    "graph_triangles": lambda t: graph.triangle_count(t["edges"]),
    "graph_khop": lambda t: graph.khop(
        t["edges"], t["edges"].select(F.col("src").alias("node")), 2
    ),
    "er_pairs": lambda t: er.blocked_fuzzy_pairs(
        t["cust"], "c_custkey", "c_name", ["c_nationkey"]
    ),
    "er_resolve": lambda t: er.resolve_entities(
        t["cust"], "c_custkey", "c_name", ["c_nationkey"]
    ),
    "tmp_asof": lambda t: temporal.asof_join(
        t["events"], t["events"], "user_id"
    ),
    "tmp_funnel": lambda t: temporal.funnel(t["events"], ["a", "b"]),
    "tmp_retention": lambda t: temporal.retention_cohorts(
        t["events"], "user_id", "ts"
    ),
    "tmp_paths": lambda t: temporal.top_paths(t["events"]),
    "skew_hot_keys": lambda t: skew.detect_hot_keys(t["events"], "user_id"),
    "skew_salted_join": lambda t: skew.salted_join(
        t["events"],
        t["events"].select(F.col("user_id").alias("uk"), "value"),
        "user_id",
        "uk",
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_empty_input_is_total(empties, name):
    out = CASES[name](empties)
    # DataFrame-returning operators must also EXECUTE cleanly; a few
    # (observed_profile, kmv sketches) legitimately return summary rows
    # on empty input — the contract is "no exception", not "no rows"
    if hasattr(out, "collect"):
        out.collect()
