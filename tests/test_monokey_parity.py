"""Cross-engine parity on FULLY DEGENERATE keys (r16, new axis).

The monokey variant collapses every discriminating attribute the clean
testdata relies on: one text/lang/source for all documents, one user
and one timestamp for all events, one vector for all embeddings. By
construction that reaches the regimes the clean data never can — a
single LSH bucket holding the whole corpus in every banded family,
df == N collapsing idf to 0 (BM25 negative-constant), cardinality-1
blocking/window/groupBy keys, 100%-tie orderings (documented id
tie-breaks decide everything), and seed-class conditions matching
NOTHING (or everything).

The r16 debut sweep found two real bugs, both the empty-class regime,
both fixed:

* ``nb_quality_classifier`` — an empty seed class made the unsmoothed
  prior ``plog10(0)`` (~-9.3e8), whose e12 fixed-point blows BIGINT in
  BOTH engines (Spark long-overflow in codegen, DuckDB
  ConversionException). Priors are now Laplace-smoothed
  ``(n_c + 1) / (n + 2)`` in both engines.
* ``train_char_lm`` — a DSIR target class no document matches trains
  an LM with vocabulary 0, and the uniform fallback divided by zero
  (Spark ANSI error vs DuckDB NULL). The fallback now divides by
  ``greatest(v, 1)`` in both engines: an empty model is well-defined
  and uninformative.

This suite re-runs Spark-vs-DuckDB parity for the degeneracy-sensitive
subset over the same injected corpus so the class stays fixed.
(Full-catalog sweeps live in tools/adversarial_probe.py
--variant monokey.)
"""

from __future__ import annotations

import math
import shutil

import duckdb
import pytest

from wikidata_to_surrealdb_spark.plans.queries import QUERIES

SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

_MONO_TEXT = (
    "the quick brown fox jumps over the lazy dog while merge vector "
    "stream pipelines shuffle data every day and the quick fox jumps "
    "again over the same lazy stream of data"
)

# the degeneracy-sensitive subset: the two fixed bug sites and their
# consumers, the single-bucket LSH families, df==N text scoring, the
# constant-column sketches, and the all-ties orderings
NAMES = [
    "curation_nb_classifier",
    "curation_quality_topk",
    "dedup_quality_survivor",
    "curation_importance_weights",
    "text_lm_score",
    "dedup_minhash_lsh",
    "dedup_embedding",
    "sim_ann_bucketed",
    "sim_knn_join",
    "sim_diversity_sample",
    "sim_topk",
    "b14_fts_bm25",
    "sketch_sample_quantiles",
    "events_sessionize",
    "events_funnel",
]


@pytest.fixture(scope="module")
def monokey_sf_dir(tmp_path_factory):
    """sf0.001 with all discriminating attributes collapsed —
    deterministic (pure rewrites, no randomness), so failures
    reproduce."""
    dst = tmp_path_factory.mktemp("sf_monokey")
    con = duckdb.connect()
    con.sql(f"""
      COPY (SELECT doc_id, '{_MONO_TEXT}' AS text, 'xx' AS lang,
                   'mono' AS source,
                   CAST({len(_MONO_TEXT)} AS BIGINT) AS n_chars
            FROM read_parquet('{SRC}/documents.parquet'))
      TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    con.sql(f"""
      COPY (SELECT event_id, TIMESTAMP '2024-01-15 12:00:00' AS ts,
                   CAST(777 AS BIGINT) AS user_id, event_type, value,
                   props
            FROM read_parquet('{SRC}/events.parquet'))
      TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    con.sql(f"""
      COPY (SELECT e.vec_id,
                   (SELECT embedding
                    FROM read_parquet('{SRC}/embeddings.parquet')
                    ORDER BY vec_id LIMIT 1) AS embedding,
                   e.label
            FROM read_parquet('{SRC}/embeddings.parquet') e)
      TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")
    con.close()
    for t in TABLES:
        if t not in ("documents", "events", "embeddings"):
            shutil.copyfile(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    return str(dst)


@pytest.fixture(scope="module")
def monokey_oracles(monokey_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{monokey_sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def nv(v):
        if v is None:
            return ""
        if isinstance(v, float):
            return "nan" if math.isnan(v) else f"{v:.6f}"
        return str(v)

    out = [tuple(nv(r[i]) for i in order) for r in rows]
    out.sort()
    return out


@pytest.mark.parametrize("name", NAMES)
def test_monokey_parity(spark, monokey_sf_dir, monokey_oracles, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, monokey_sf_dir)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    rel = monokey_oracles.sql(spec.oracle)
    d_cols, d_rows = rel.columns, rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: rows spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn, dn = _normalize(s_rows, s_cols), _normalize(d_rows, d_cols)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch on monokey data: {diffs}")
