"""FTS analyzer unit behavior (B14): filter order and oracle mirroring."""

from __future__ import annotations

from wikidata_to_surrealdb_spark.operators import text
from wikidata_to_surrealdb_spark.plans.queries import QUERIES


def test_ascii_fold_before_tokenize(spark):
    """'café' must analyze to the term 'cafe': the fold has to run while
    the token is intact (lowercase -> fold -> split). Folding after the
    [^a-z0-9]+ split silently dropped diacritics ('café' -> 'caf')."""
    docs = spark.createDataFrame(
        [(1, "Café menu"), (2, "naïve approach"), (3, "Zażółć gęślą jaźń")],
        "doc_id bigint, text string",
    )
    terms = {
        (r["doc_id"], r["term"])
        for r in text.analyze_text(docs).collect()
    }
    assert (1, "cafe") in terms
    assert (2, "naive") in terms
    assert (3, "zazolc") in terms
    assert not any(t == "caf" for _, t in terms)


def test_oracle_shares_fold_map():
    """The DuckDB b14 oracles must run the identical translate() map in
    the identical position (inside lower(), before the split)."""
    frag = text.ascii_fold_sql("lower(text)")
    assert frag in QUERIES["b14_fts"].oracle
    assert frag in QUERIES["b14_fts_ranked"].oracle
